"""Circuit compression round trips (plonk/src/composer/compress.rs parity)."""

from zkvm_tpu.fields import Fr
from zkvm_tpu.plonk import Compiler, Composer, PublicParameters
from zkvm_tpu.plonk.compress import CompressedCircuit
from zkvm_tpu.rng import StdRng
from tests.test_plonk_e2e import DummyCircuit


def _composer_for(circuit):
    composer = Composer.initialized()
    circuit.circuit(composer)
    return composer


def test_compress_roundtrip_preserves_structure():
    circuit = DummyCircuit()
    original = _composer_for(circuit)
    blob = circuit.compress()
    restored = CompressedCircuit.from_bytes(blob)
    assert len(restored.constraints) == len(original.constraints)
    assert len(restored.witnesses) == len(original.witnesses)
    assert (restored.public_input_indexes()
            == original.public_input_indexes())
    for g1, g2 in zip(original.constraints, restored.constraints):
        for name in ("q_m", "q_l", "q_r", "q_o", "q_f", "q_c", "q_arith",
                     "q_range", "q_logic", "q_fixed_group_add",
                     "q_variable_group_add"):
            assert getattr(g1, name) == getattr(g2, name), name
        assert (g1.a, g1.b, g1.c, g1.d) == (g2.a, g2.b, g2.c, g2.d)


def test_compression_shrinks():
    circuit = DummyCircuit()
    blob = circuit.compress()
    # raw gate data would be 12 selectors * 32 bytes per gate
    raw = len(_composer_for(circuit).constraints) * 12 * 32
    assert 0 < len(blob) < raw


def test_compile_with_compressed_proves():
    circuit = DummyCircuit()
    blob = circuit.compress()
    pp = PublicParameters.setup(1 << 7, StdRng(0x20))
    prover, verifier = Compiler.compile_with_compressed(pp, b"dummy", blob)
    # the compiled keys must be identical to compiling from the circuit
    prover2, verifier2 = Compiler.compile(pp, b"dummy", DummyCircuit)
    assert prover.verifier_key.to_bytes() == prover2.verifier_key.to_bytes()
    proof, public_inputs = prover.prove(StdRng(1), DummyCircuit(a=2, b=9))
    verifier.verify(proof, public_inputs)


def test_hades_seeded_dictionary_is_stable():
    from zkvm_tpu.plonk.compress import _legacy_hades_constants, _scalar_map

    consts = _legacy_hades_constants()
    assert len(consts) == 67 * 5
    m = _scalar_map(True)
    assert m[0] == 0 and m[1] == 1 and m[Fr.MODULUS - 1] == 2
    assert len(m) > 300
