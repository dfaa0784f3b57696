"""PLONK proof system (TurboPLONK variant with 4 wires + lookup-free widgets).

Mirrors the reference `plonk` crate capability-for-capability: Composer with
the full gadget library, KZG10 commitments, widget prover/verifier keys,
quotient/linearization pipeline, merlin-compatible transcript, and
proof/key serialization.  Hot polynomial work (NTT, MSM, pointwise quotient)
runs on device via zkvm_tpu.ops.
"""

from .polynomial import Polynomial
from .evaluations import Evaluations

__all__ = ["Polynomial", "Evaluations"]
