"""KZG10 commitment scheme tests (mirrors kzg10/key.rs:258-493 test module)."""

import pytest

from zkvm_tpu.fields import Fr
from zkvm_tpu.plonk.kzg10 import (AggregateProof, CommitKey, Commitment,
                                  KZGError, KZGProof, OpeningKey,
                                  PublicParameters, powers_of)
from zkvm_tpu.plonk.polynomial import Polynomial
from zkvm_tpu.plonk.transcript import Transcript
from zkvm_tpu.rng import StdRng


@pytest.fixture(scope="module")
def setup25():
    pp = PublicParameters.setup(25, StdRng(42))
    ck, ok = pp.trim(25)
    return pp, ck, ok


def rand_poly(degree, rng):
    return Polynomial([Fr.random(rng) for _ in range(degree + 1)])


def open_single(ck, poly, value, point):
    witness = poly.ruffini(point)
    return KZGProof(ck.commit(witness), value, ck.commit(poly))


def test_powers_of():
    x = Fr(10)
    ps = powers_of(x, 100)
    assert len(ps) == 101
    for i, p in enumerate(ps):
        assert p == x.pow(i)


def test_basic_commit_open_check(setup25):
    _, ck, ok = setup25
    rng = StdRng(1)
    point = Fr(10)
    poly = rand_poly(25, rng)
    value = poly.evaluate(point)
    proof = open_single(ck, poly, value, point)
    assert ok.check(point, proof)
    bad = KZGProof(proof.commitment_to_witness, value + Fr.one(),
                   proof.commitment_to_polynomial)
    assert not ok.check(point, bad)


def test_batch_verification(setup25):
    _, ck, ok = setup25
    rng = StdRng(2)
    pa, pb = Fr(10), Fr(11)
    poly_a = rand_poly(25, rng)
    proof_a = open_single(ck, poly_a, poly_a.evaluate(pa), pa)
    poly_b = rand_poly(24, rng)
    proof_b = open_single(ck, poly_b, poly_b.evaluate(pb), pb)
    assert ok.batch_check([pa, pb], [proof_a, proof_b], Transcript(b""))


def test_aggregate_witness():
    rng = StdRng(3)
    pp = PublicParameters.setup(27, rng)
    ck, ok = pp.trim(27)
    point = Fr(10)
    polys = [rand_poly(25, rng), rand_poly(27, rng), rand_poly(26, rng)]
    t = Transcript(b"agg_flatten")
    v = t.challenge_scalar(b"v_challenge")
    witness_poly = CommitKey.compute_aggregate_witness(polys, point, v)
    agg = AggregateProof(ck.commit(witness_poly))
    for p in polys:
        agg.add_part(p.evaluate(point), ck.commit(p))
    t2 = Transcript(b"agg_flatten")
    v2 = t2.challenge_scalar(b"v_challenge")
    assert ok.check(point, agg.flatten(v2))


def test_commit_degree_bounds(setup25):
    _, ck, _ = setup25
    from zkvm_tpu.plonk.errors import PolynomialDegreeTooLarge

    with pytest.raises(PolynomialDegreeTooLarge):
        ck.commit(rand_poly(ck.max_degree() + 1, StdRng(4)))


def test_trim_truncates():
    pp = PublicParameters.setup(31, StdRng(5))
    ck, _ = pp.trim(8)
    assert ck.max_degree() == 8 + PublicParameters.ADDED_BLINDING_DEGREE


def test_pp_serde_roundtrip():
    pp = PublicParameters.setup(7, StdRng(6))
    back = PublicParameters.from_slice(pp.to_var_bytes())
    assert back.commit_key == pp.commit_key
    assert back.opening_key.to_bytes() == pp.opening_key.to_bytes()


def test_pp_raw_serde_roundtrip():
    pp = PublicParameters.setup(7, StdRng(7))
    back = PublicParameters.from_slice_unchecked(pp.to_raw_var_bytes())
    assert back.commit_key == pp.commit_key
    assert back.opening_key.to_bytes() == pp.opening_key.to_bytes()


def test_commitment_serde():
    from zkvm_tpu.curves.g1 import G1Affine

    c = Commitment(G1Affine.generator())
    assert Commitment.from_bytes(c.to_bytes()) == c
    assert len(c.to_bytes()) == 48


def test_opening_key_serde(setup25):
    _, _, ok = setup25
    back = OpeningKey.from_bytes(ok.to_bytes())
    assert back.to_bytes() == ok.to_bytes()
