"""Poseidon golden-vector tests -- THE bit-exactness anchor.

Inputs/digests transcribed from coset-poseidon/src/hades.rs:73-142 (the
reference's own test suite).  The test sponge there uses a zero tag, which
pins the Hades permutation and the SAFE absorb/squeeze mechanics exactly.
"""

from zkvm_tpu.fields import Fr
from zkvm_tpu.hashes import Domain, Hash, ScalarPermutation
from zkvm_tpu.hashes.safe import Call, IOPatternViolation, Sponge

import pytest

TEST_INPUTS = [
    "bb67ed265bf1db490ded2e1ede55c0d14c55521509dc73f9c354e98ab76c9625",
    "7e74220084d75e10c89e9435d47bb5b8075991b2e29be3b84421dac3b1ee6007",
    "5ce5481a4d78cca03498f72761da1b9f1d2aa8fb300be39f0e4fe2534f9d4308",
    "b1e710e3c4a8c35154b0ce4e4f4af6f498ebd79f8e7cdf3150372c7501be250b",
    "33c9e2025f86b5d82149f1ab8e20a168fc3d99d09b48cbce0286db8752cc3306",
    "e98206bfdce791e4e5144079b997d4fc25006194b35655f0e48490b26e24ea35",
    "86d2a95cc552de8d5bb20bd4a407fee5ffdc314e93dfe6b2dc792bc71fd8cc2d",
    "4edd8307ce28a8c70963d20a7bc28df1e1720bbbc93878a18bd07fad7d51fa15",
    "eabc7a296704a68aa01f95adc85f6dd758b175745336d8fc795a17984024b21e",
    "cfc108673c93df305e31c283b9c767b7097ae4e174a223e0c24b15a67b701a3a",
]

GOLDEN = {
    3: "0x26abf2d0476f154e69bf19740092fe36265680c294462b8e759ad73a99567dd5",
    4: "0x1cc40219c7ec92919d6db7a41cd41953333a2ed544606daca182e4eaa6c7db2d",
    5: "0x707c98a0e9a6e4832ac33ee08811bce122017a58dbbbf66a2f6fcdc69d45462d",
    6: "0x26905a794d3d2fb0c3ed2276abc696c27a5bfdea7f106e596cbeedd86891c461",
    8: "0x1b98a2c5f1fe54d21b5ce9bf0dcc99ea8784a64f3c544fa06d3f73569741006e",
    10: "0x211b7ea21c9afca93dabdfbda8b2d5275b2dd802fed87bb431e98557c61667d2",
}


class _ZeroTagPermutation(ScalarPermutation):
    """The reference golden test stubs tag() to zero (hades.rs:57-60)."""

    def tag(self, data: bytes) -> Fr:
        return Fr.zero()


def _hash_for_test(inputs):
    io = [Call.absorb(len(inputs)), Call.absorb(1), Call.squeeze(1)]
    sponge = Sponge.start(_ZeroTagPermutation(), io, 0)
    sponge.absorb(len(inputs), inputs)
    sponge.absorb(1, [Fr.one()])
    sponge.squeeze(1)
    return sponge.finish()[0]


def test_poseidon_golden_digests():
    inputs = [Fr.from_hex_str(s) for s in TEST_INPUTS]
    for n, expected in GOLDEN.items():
        assert repr(_hash_for_test(inputs[:n])) == expected, f"n={n}"


def test_hades_determinism():
    # hades/permutation/scalar.rs:89-100
    p = ScalarPermutation()
    x = p.permute([Fr(17)] * 5)
    y = p.permute([Fr(17)] * 5)
    z = p.permute([Fr(19)] * 5)
    assert x == y and x != z


def test_hash_api():
    inputs = [Fr(i + 1) for i in range(4)]
    d1 = Hash.digest(Domain.Merkle4, inputs)
    assert len(d1) == 1
    # deterministic
    assert Hash.digest(Domain.Merkle4, inputs) == d1
    # domain separation
    h2 = Hash(Domain.Other)
    h2.update(inputs)
    assert h2.finalize() != d1
    # truncated digest fits jubjub scalar
    t = Hash.digest_truncated(Domain.Other, inputs)
    assert t[0].value < (1 << 250)
    assert t[0].value == Hash.digest(Domain.Other, inputs)[0].value & ((1 << 250) - 1)


def test_hash_multi_output():
    h = Hash(Domain.Other)
    h.update([Fr(5), Fr(6)])
    h.output_len(3)
    out = h.finalize()
    assert len(out) == 3 and len(set(x.value for x in out)) == 3


def test_merkle_domain_constraints():
    with pytest.raises(IOPatternViolation):
        Hash.digest(Domain.Merkle4, [Fr(1)] * 3)
    with pytest.raises(IOPatternViolation):
        Hash.digest(Domain.Merkle2, [Fr(1)] * 4)


def test_segmented_absorb_equals_aggregated():
    # absorbing in two segments == one segment of the sum (io aggregation)
    a = [Fr(9), Fr(8), Fr(7)]
    h1 = Hash(Domain.Other)
    h1.update(a)
    h2 = Hash(Domain.Other)
    h2.update(a[:1])
    h2.update(a[1:])
    assert h1.finalize() == h2.finalize()
