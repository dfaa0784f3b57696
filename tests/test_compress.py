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


def test_msgpack_payload_kat():
    """Hand-derived msgpack KAT for the pre-compression payload bytes.

    The reference packs `CompressedCircuit` with msgpacker 0.4.8 derive
    (compress.rs:66-195): struct fields sequentially (no outer header),
    bool as 0xc2/0xc3, usize minimally (fixint/uint8/16/32/64),
    Vec<T> as msgpack array, [u8; 32] scalars as bin8, and deflates the
    result.  This test rebuilds the expected payload for a 2-gate circuit
    byte by byte from the msgpack spec -- independently of compress.py's
    packer -- and asserts the DECOMPRESSED container bytes match exactly
    (the deflate stream itself is compressor-dependent and not compared,
    per the read path which accepts any raw-deflate stream).
    """
    import zlib

    from zkvm_tpu.plonk.constraint_system import Constraint, Witness

    composer = Composer.uninitialized()
    for v in (0, 7, 11):
        composer.append_witness(Fr(v))
    w0, w1, w2 = Witness(0), Witness(1), Witness(2)
    # gate 0: q_m=1, q_l=2, q_o=-1, arithmetic; wires a=w0 b=w1 c=w2
    g0 = Constraint.arithmetic(
        Constraint().mult(1).left(2).output(Fr.MODULUS - 1)
        .a(w0).b(w1).c(w2))
    composer.append_custom_gate(g0)
    # gate 1: q_l=1 + public input; wires a=w0
    g1 = Constraint.arithmetic(Constraint().left(1).public(Fr(5)).a(w0))
    composer.append_custom_gate(g1)

    blob = CompressedCircuit.from_composer(False, composer)
    payload = zlib.decompress(blob, wbits=-15)

    expected = bytearray()
    expected += b"\xc2"              # hades_optimization: false
    expected += b"\x91\x01"          # public_inputs: [1]
    expected += b"\x03"              # witnesses: 3
    # scalars beyond the {0, 1, -1} seed, first-use order: [2]
    expected += b"\x92"[:0] + b"\x91"
    expected += b"\xc4\x20" + (2).to_bytes(32, "little")
    # polynomials: two selector combos, 11 scalar indexes each
    # (q_m q_l q_r q_o q_f q_c q_arith q_range q_logic q_fixed q_var)
    expected += b"\x92"
    expected += bytes([1, 3, 0, 2, 0, 0, 1, 0, 0, 0, 0])   # gate 0
    expected += bytes([0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0])   # gate 1
    # constraints: (polynomial, a, b, c, d)
    expected += b"\x92"
    expected += bytes([0, 0, 1, 2, 0])
    expected += bytes([1, 0, 0, 0, 0])
    assert payload == bytes(expected)

    # and the KAT circuit round-trips
    restored = CompressedCircuit.from_bytes(blob)
    assert len(restored.constraints) == 2
    assert restored.public_input_indexes() == [1]


def test_hades_seeded_dictionary_is_stable():
    from zkvm_tpu.plonk.compress import _legacy_hades_constants, _scalar_map

    consts = _legacy_hades_constants()
    assert len(consts) == 67 * 5
    m = _scalar_map(True)
    assert m[0] == 0 and m[1] == 1 and m[Fr.MODULUS - 1] == 2
    assert len(m) > 300
