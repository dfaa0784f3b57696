"""zkvm_tpu -- a TPU-native PLONK proving framework on JAX/XLA/Pallas.

Re-designed from scratch with the capabilities of the reference Rust stack
(coset-bls12_381 / coset-jubjub / coset-poseidon / coset-merkle /
poseidon-merkle / plonk / merkle-plonk): BLS12-381 + Jubjub arithmetic,
Poseidon hashing, KZG10 commitments, a 4-wire PLONK composer with the full
widget set, and a Merkle-membership batch proving service -- with the hot
compute paths (NTT, MSM, Poseidon, quotient evaluation) running as batched
limb kernels on TPU via JAX/Pallas and scaling over device meshes.
"""

__version__ = "0.2.0"

import os as _os

# Persistent XLA compile cache: the MSM/NTT kernel specializations take
# minutes to compile through a remote-device tunnel; recurring shapes must
# hit the cache across processes (override dir via ZKVM_JAX_CACHE).
try:  # pragma: no cover - depends on jax version/options
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("ZKVM_JAX_CACHE", "/tmp/zkvm_tpu_jax_cache"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

from . import params  # noqa: F401,E402
