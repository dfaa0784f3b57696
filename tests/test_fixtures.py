"""Byte-stability KATs for the on-disk artifact formats.

The reference pins its formats through Rust type layouts (rkyv / coset-bytes
/ msgpacker+miniz for compression, compress.rs:15-120); with no cargo in
this environment, committed fixtures are the drift alarm: any change to the
compression container, prover bundle or verifier bundle layout fails here
and must be a deliberate, versioned decision.
"""

from pathlib import Path

from zkvm_tpu.fields import Fr
from zkvm_tpu.plonk.composer import Circuit, Composer
from zkvm_tpu.plonk.constraint_system import Constraint

FIXTURES = Path(__file__).parent / "fixtures"


class FixedCircuit(Circuit):
    def circuit(self, c):
        a = c.append_witness(Fr(3))
        b = c.append_witness(Fr(5))
        o = c.gate_add(Constraint().left(1).right(1).a(a).b(b))
        c.assert_equal_constant(o, Fr(8), None)
        x = c.gate_mul(Constraint().mult(1).a(a).b(b))
        c.assert_equal_constant(x, Fr(15), None)
        c.component_boolean(c.append_witness(Fr(1)))


def test_compressed_circuit_bytes_stable():
    blob = FixedCircuit().compress()
    expect = (FIXTURES / "compressed_circuit_v1.bin").read_bytes()
    assert blob == expect


def test_compressed_circuit_fixture_loads():
    from zkvm_tpu.plonk.compress import CompressedCircuit

    blob = (FIXTURES / "compressed_circuit_v1.bin").read_bytes()
    comp = CompressedCircuit.from_bytes(blob)
    assert isinstance(comp, Composer)
    assert len(comp.constraints) == len(
        _fresh_composer().constraints)


def _fresh_composer():
    comp = Composer.initialized()
    FixedCircuit().circuit(comp)
    return comp


def test_prover_verifier_bundles_stable():
    from zkvm_tpu.plonk import Compiler, PublicParameters
    from zkvm_tpu.plonk.prover import Prover
    from zkvm_tpu.plonk.verifier import Verifier
    from zkvm_tpu.rng import StdRng

    pp = PublicParameters.setup(1 << 6, StdRng(1234))
    prover, verifier = Compiler.compile_with_circuit(
        pp, b"fixture", FixedCircuit())
    pb = (FIXTURES / "prover_bundle_v1.bin").read_bytes()
    vb = (FIXTURES / "verifier_bundle_v1.bin").read_bytes()
    assert prover.to_bytes() == pb
    assert verifier.to_bytes() == vb
    # and the committed bundles round trip into working objects
    p2 = Prover.try_from_bytes(pb)
    v2 = Verifier.try_from_bytes(vb)
    proof, pis = p2.prove(StdRng(5), FixedCircuit())
    v2.verify(proof, pis)
