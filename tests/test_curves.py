"""Curve layer tests: group laws, serialization vectors, pairing bilinearity.

The hex vectors are transcribed from the reference's
src/tests/g{1,2}_compressed_valid_test_vectors.dat (points i*G compressed).
"""

import random

import pytest

from zkvm_tpu import params
from zkvm_tpu.fields import Fr, JubjubFr
from zkvm_tpu.curves import (
    G1Affine, G1Projective, G2Affine, G2Projective,
    JubjubAffine, JubjubExtended,
    pairing, multi_miller_loop, final_exponentiation, G2Prepared, Gt,
)
from zkvm_tpu.curves.jubjub import AffineNielsPoint, dhke, hash_to_point

G1_VECTORS = [
    (0, "c00000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000"),
    (1, "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac586c55e83ff97a1aeffb3af00adb22c6bb"),
    (2, "a572cbea904d67468808c8eb50a9450c9721db309128012543902d0ac358a62ae28f75bb8f1c7c42c39a8c5529bf0f4e"),
    (3, "89ece308f9d1f0131765212deca99697b112d61f9be9a5f1f3780a51335b3ff981747a0b2ca2179b96d2c0c9024e5224"),
    (4, "ac9b60d5afcbd5663a8a44b7c5a02f19e9a77ab0a35bd65809bb5c67ec582c897feb04decc694b13e08587f3ff9b5b60"),
    (5, "b0e7791fb972fe014159aa33a98622da3cdc98ff707965e536d8636b5fcc5ac7a91a8c46e59a00dca575af0f18fb13dc"),
    (6, "a6e82f6da4520f85c5d27d8f329eccfa05944fd1096b20734c894966d12a9e2a9a9744529d7212d33883113a0cadb909"),
    (7, "b928f3beb93519eecf0145da903b40a4c97dca00b21f12ac0df3be9116ef2ef27b2ae6bcd4c5bc2d54ef5a70627efcb7"),
    (100, "a29e520a73ec28f4e2e45050c93080eeaee57af1108e659d740897c3ced76ceb75d106cb00d7ed25ec221874bf4b235a"),
    (999, "b94ba65546846b439edbfc9da84c1c2d2af3d0ede8c88ec50fce2e1c3f782e932205982683f0802a4dce313610bbb2db"),
]

G2_VECTORS = [
    (0, "c00000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000"),
    (1, "93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049334cf11213945d57e5ac7d055d042b7e024aa2b2f08f0a91260805272dc51051c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8"),
    (2, "aa4edef9c1ed7f729f520e47730a124fd70662a904ba1074728114d1031e1572c6c886f6b57ec72a6178288c47c335771638533957d540a9d2370f17cc7ed5863bc0b995b8825e0ee1ea1e1e4d00dbae81f14b0bf3611b78c952aacab827a053"),
    (3, "89380275bbc8e5dcea7dc4dd7e0550ff2ac480905396eda55062650f8d251c96eb480673937cc6d9d6a44aaa56ca66dc122915c824a0857e2ee414a3dccb23ae691ae54329781315a0c75df1c04d6d7a50a030fc866f09d516020ef82324afae"),
    (100, "954652140e62a2ab469f312baae81dc4c4aeb239681be4955a2dc767d359b155798f46a57a40efdf0584c690c06a2e570e47ce1c5a59c4e396ed9c30756a1ed8592a917ea2be7d45db5092791e4806d788cbd12356d8a41c0b99ea290e6d31da"),
    (999, "b58f8116e02e856737dfccdad0a7f100f813c36f9a35349e7ea62facb2824c9277bd34e6581df83deaf3c126e712f15e0b2fd8eb8ae8e2df5281e47abf6334ca1ec378061143ce7c1c804ad9c409c42dab34c78d9d7904a8754cb2817a93c7ea"),
]


def test_g1_serialization_vectors():
    for i, hexv in G1_VECTORS:
        p = (G1Projective.generator() * i).to_affine()
        assert p.to_compressed().hex() == hexv, f"i={i}"
        assert G1Affine.from_compressed(bytes.fromhex(hexv)) == p


def test_g2_serialization_vectors():
    for i, hexv in G2_VECTORS:
        p = (G2Projective.generator() * i).to_affine()
        assert p.to_compressed().hex() == hexv, f"i={i}"
        assert G2Affine.from_compressed(bytes.fromhex(hexv)) == p


def test_g1_group_laws():
    g = G1Projective.generator()
    assert g.is_on_curve()
    assert (g + g) == g.double()
    assert g.double() + g == g * 3
    assert (g * 5) - (g * 3) == g.double()
    assert (g * Fr.MODULUS).is_identity()
    # identity handling in complete formulas
    ident = G1Projective.identity()
    assert (g + ident) == g and ident.double().is_identity()
    # mixed add
    assert g.add_mixed((g * 7).to_affine()) == g * 8


def test_g1_uncompressed_and_raw():
    p = (G1Projective.generator() * 12345).to_affine()
    assert G1Affine.from_uncompressed(p.to_uncompressed()) == p
    assert G1Affine.from_slice_unchecked(p.to_raw_bytes()) == p
    ident = G1Affine.identity()
    assert G1Affine.from_uncompressed(ident.to_uncompressed()).is_identity()
    assert G1Affine.from_slice_unchecked(ident.to_raw_bytes()).is_identity()


def test_g1_batch_normalize():
    g = G1Projective.generator()
    pts = [g * i for i in [0, 3, 1, 7, 0, 2]]
    affs = G1Projective.batch_normalize(pts)
    for p, a in zip(pts, affs):
        assert p.to_affine() == a


def test_g1_subgroup_and_curve_checks():
    g = G1Affine.generator()
    assert g.is_on_curve() and g.is_torsion_free()
    # a point on the curve but not in the subgroup (cofactor != 1)
    from zkvm_tpu.fields import Fp
    x = Fp(3)
    while True:
        y2 = x.square() * x + Fp(params.G1_B)
        y = y2.sqrt()
        if y is not None:
            cand = G1Affine(x, y)
            if not cand.is_torsion_free():
                break
        x = x + Fp(1)
    assert cand.is_on_curve() and not cand.is_torsion_free()
    assert cand.to_projective().clear_cofactor().to_affine().is_torsion_free()
    # compressed decode of a non-subgroup point is rejected
    raw = bytearray(cand.x.to_bytes())
    raw[0] |= 0x80
    if cand.y.lexicographically_largest():
        raw[0] |= 0x20
    assert G1Affine.from_compressed(bytes(raw)) is None


def test_pairing_bilinearity():
    g1, g2 = G1Affine.generator(), G2Affine.generator()
    e = pairing(g1, g2)
    assert not e.is_identity()  # non-degenerate
    a, b = 17, 23
    lhs = pairing((g1 * a).to_affine(), (g2 * b).to_affine())
    assert lhs == e * (a * b)
    # additivity in the first slot
    p1, p2 = (g1 * 5).to_affine(), (g1 * 9).to_affine()
    assert pairing((g1 * 14).to_affine(), g2) == pairing(p1, g2) + pairing(p2, g2)
    # identity slots
    assert pairing(G1Affine.identity(), g2).is_identity()
    assert pairing(g1, G2Affine.identity()).is_identity()


def test_multi_miller_loop_kzg_style():
    # e(A, X) * e(B, -H) == 1  <=>  e(A, X) == e(B, H); the verifier's check
    g1, g2 = G1Affine.generator(), G2Affine.generator()
    x = 111
    a = (g1 * 7).to_affine()
    b = (g1 * (7 * x)).to_affine()
    xh = (g2 * x).to_affine()
    f = multi_miller_loop([(a, G2Prepared(xh)), ((-b), G2Prepared(g2))])
    assert final_exponentiation(f).is_identity()
    # and fails on a wrong witness
    bad = (g1 * (7 * x + 1)).to_affine()
    f2 = multi_miller_loop([(a, G2Prepared(xh)), ((-bad), G2Prepared(g2))])
    assert not final_exponentiation(f2).is_identity()


def test_jubjub_group_and_encoding():
    g = JubjubExtended.generator()
    assert g.is_on_curve()
    assert (g + g) == g.double()
    assert g.double() + g == g * 3
    assert (g * JubjubFr.MODULUS).is_identity()  # prime-order generator
    nums = JubjubExtended.generator_nums()
    assert nums.is_on_curve() and (nums * JubjubFr.MODULUS).is_identity()
    # encoding round trip with sign bit
    for k in [1, 2, 5, 0xDEAD]:
        p = (g * k).to_affine()
        assert JubjubAffine.from_bytes(p.to_bytes()) == p
        assert JubjubAffine.from_bytes((-p).to_bytes()) == -p
    ident = JubjubAffine.identity()
    assert JubjubAffine.from_bytes(ident.to_bytes()) == ident


def test_jubjub_niels_and_wnaf_mul():
    g = JubjubExtended.generator()
    k = JubjubFr(0x1234567890ABCDEF1122334455667788)
    expected = g * k
    # Niels multiply_bits (MSB-first bits of canonical encoding)
    bits = list(reversed(k.to_bits()))
    niels = AffineNielsPoint(g.to_affine())
    assert niels.multiply_bits(bits) == expected
    # wNAF reconstruction through point arithmetic
    naf = k.compute_windowed_naf(3)
    acc = JubjubExtended.identity()
    for d in reversed(naf):
        acc = acc.double()
        if d > 0:
            acc = acc + (g * d)
        elif d < 0:
            acc = acc - (g * (-d))
    assert acc == expected


def test_jubjub_dhke():
    a, b = JubjubFr(1234567), JubjubFr(7654321)
    g = JubjubExtended.generator()
    assert dhke(a, g * b) == dhke(b, g * a)


def test_jubjub_hash_to_point():
    p = hash_to_point(b"zkvm-tpu test")
    assert p.is_on_curve() and p.is_torsion_free() and not p.is_identity()
    assert p == hash_to_point(b"zkvm-tpu test")
    assert p != hash_to_point(b"zkvm-tpu test2")


def test_jubjub_map_unmap_roundtrip():
    """map_to_point embeds a u64 into the v-coordinate low bytes and
    unmap_from_point recovers it (coset.rs:202-239 + its test)."""
    import random

    from zkvm_tpu.curves.jubjub import (JubjubExtended, map_to_point,
                                        unmap_from_point)

    rng = random.Random(77)
    for _ in range(8):
        value = rng.randrange(1 << 64)
        point = map_to_point(value)
        assert isinstance(point, JubjubExtended)
        assert point.is_torsion_free() and not point.is_identity()
        assert unmap_from_point(point) == value
