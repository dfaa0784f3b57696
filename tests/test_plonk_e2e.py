"""End-to-end PLONK tests: compile -> prove -> verify round trips.

Mirrors the de-facto integration tests embedded in the reference (widget
circuit tests in proof_system/widget.rs and the composer test gadgets).
"""

import pytest

from zkvm_tpu.curves.jubjub import JubjubAffine, JubjubExtended
from zkvm_tpu.fields import Fr, JubjubFr
from zkvm_tpu.plonk import (Compiler, Composer, Constraint, Circuit,
                            ProofVerificationError, Proof, Prover,
                            PublicParameters, Verifier)
from zkvm_tpu.rng import StdRng


class DummyCircuit(Circuit):
    """a * b + a + b + 4 == result, with result exposed as public input.

    Selectors must not depend on the witness (the preprocessed keys bake
    them in); the instance-specific output is bound through the PI column.
    """

    def __init__(self, a=3, b=5):
        self.a = Fr(a)
        self.b = Fr(b)

    def circuit(self, composer: Composer):
        a = composer.append_witness(self.a)
        b = composer.append_witness(self.b)
        constraint = (Constraint().mult(1).left(1).right(1).constant(4)
                      .a(a).b(b))
        c = composer.gate_add(constraint)
        expected = self.a * self.b + self.a + self.b + Fr(4)
        # c - PI == 0 gate: output as public input
        composer.append_gate(Constraint().left(1).a(c).public(-expected))


class RangeLogicCircuit(Circuit):
    """Exercises range, logic and select gadgets."""

    def __init__(self, x=0x3FF):
        self.x = Fr(x)

    def circuit(self, composer: Composer):
        x = composer.append_witness(self.x)
        composer.component_range(x, 16)  # 32-bit range
        y = composer.append_witness(Fr(0xAB))
        composer.append_logic_and(x, y, 16)
        composer.append_logic_xor(x, y, 16)
        bit = composer.append_witness(Fr.one())
        composer.component_boolean(bit)
        composer.component_select(bit, x, y)


class EccCircuit(Circuit):
    """Exercises fixed-base and variable-base ECC gadgets."""

    def __init__(self, scalar=1234567):
        self.scalar = JubjubFr(scalar)

    def circuit(self, composer: Composer):
        w = composer.append_witness(Fr(self.scalar.value))
        p = composer.component_mul_generator(w, JubjubAffine.generator())
        expected = (JubjubExtended.generator() * self.scalar).to_affine()
        composer.assert_equal_public_point(p, expected)
        q = composer.append_point(expected)
        composer.component_add_point(p, q)


@pytest.fixture(scope="module")
def pp():
    return PublicParameters.setup(1 << 7, StdRng(0x10))


def test_dummy_circuit_prove_verify(pp):
    prover, verifier = Compiler.compile(pp, b"dummy", DummyCircuit)
    proof, public_inputs = prover.prove(StdRng(0xDEA1), DummyCircuit())
    assert len(public_inputs) == 1
    verifier.verify(proof, public_inputs)  # must not raise


def test_different_witness_same_circuit(pp):
    prover, verifier = Compiler.compile(pp, b"dummy", DummyCircuit)
    circ = DummyCircuit(a=11, b=13)
    proof, public_inputs = prover.prove(StdRng(1), circ)
    verifier.verify(proof, public_inputs)


def test_tampered_public_input_fails(pp):
    prover, verifier = Compiler.compile(pp, b"dummy", DummyCircuit)
    proof, public_inputs = prover.prove(StdRng(2), DummyCircuit())
    with pytest.raises(ProofVerificationError):
        verifier.verify(proof, [public_inputs[0] + Fr.one()])


def test_tampered_proof_fails(pp):
    prover, verifier = Compiler.compile(pp, b"dummy", DummyCircuit)
    proof, public_inputs = prover.prove(StdRng(3), DummyCircuit())
    proof.evaluations.a_eval = proof.evaluations.a_eval + Fr.one()
    with pytest.raises(ProofVerificationError):
        verifier.verify(proof, public_inputs)


def test_proof_serde_roundtrip(pp):
    prover, verifier = Compiler.compile(pp, b"dummy", DummyCircuit)
    proof, public_inputs = prover.prove(StdRng(4), DummyCircuit())
    blob = proof.to_bytes()
    assert len(blob) == Proof.SIZE == 11 * 48 + 15 * 32
    back = Proof.from_bytes(blob)
    assert back.to_bytes() == blob
    verifier.verify(back, public_inputs)


def test_prover_verifier_serde_roundtrip(pp):
    prover, verifier = Compiler.compile(pp, b"dummy", DummyCircuit)
    prover2 = Prover.try_from_bytes(prover.to_bytes())
    verifier2 = Verifier.try_from_bytes(verifier.to_bytes())
    proof, public_inputs = prover2.prove(StdRng(5), DummyCircuit())
    verifier2.verify(proof, public_inputs)
    # deterministic: same seed through fresh prover gives identical proof
    proof_orig, _ = prover.prove(StdRng(5), DummyCircuit())
    assert proof_orig.to_bytes() == proof.to_bytes()


def test_range_logic_circuit(pp):
    prover, verifier = Compiler.compile(pp, b"rl", RangeLogicCircuit)
    proof, public_inputs = prover.prove(StdRng(6), RangeLogicCircuit(0x123))
    verifier.verify(proof, public_inputs)


@pytest.mark.slow
def test_ecc_circuit():
    pp_big = PublicParameters.setup(1 << 11, StdRng(0x11))
    prover, verifier = Compiler.compile(pp_big, b"ecc", EccCircuit)
    proof, public_inputs = prover.prove(StdRng(7), EccCircuit())
    verifier.verify(proof, public_inputs)
