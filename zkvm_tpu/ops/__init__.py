"""Device-side (JAX/XLA/Pallas) kernels: limb field arithmetic, NTT, Poseidon, MSM.

All kernels operate on planar little-endian 16-bit-limb uint32 tensors
(`[..., L]`) in Montgomery form and are exact integer computations -- results
are bit-identical across CPU/TPU backends and are tested against the
Python-int reference in zkvm_tpu.fields.
"""

from .limb_field import FieldSpec, FR, FQ, JUBJUB_FR

__all__ = ["FieldSpec", "FR", "FQ", "JUBJUB_FR"]
