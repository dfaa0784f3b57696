"""zkvm_tpu -- a TPU-native PLONK proving framework on JAX/XLA/Pallas.

Re-designed from scratch with the capabilities of the reference Rust stack
(coset-bls12_381 / coset-jubjub / coset-poseidon / coset-merkle /
poseidon-merkle / plonk / merkle-plonk): BLS12-381 + Jubjub arithmetic,
Poseidon hashing, KZG10 commitments, a 4-wire PLONK composer with the full
widget set, and a Merkle-membership batch proving service -- with the hot
compute paths (NTT, MSM, Poseidon, quotient evaluation) running as batched
limb kernels on TPU via JAX/Pallas and scaling over device meshes.
"""

__version__ = "0.1.0"

from . import params  # noqa: F401
