"""Native C library (zkvm_tpu/native/bls.c) pinned bit-exact against the
exact-int Python implementations it accelerates: MSM vs msm_variable_base,
Miller loop / final exponentiation vs curves.fast_tower, Keccak-f[1600] vs
the transcript's Python permutation."""

import random

import pytest

from zkvm_tpu.curves.g1 import G1Affine, G1Projective
from zkvm_tpu.curves.g2 import G2Affine
from zkvm_tpu.curves.msm import msm_host, msm_variable_base
from zkvm_tpu.fields import Fr
from zkvm_tpu.native import (get_lib, native_final_exp, native_miller_loop,
                             native_msm, native_pairing_check)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="no C compiler available")


def _points(n, seed):
    rng = random.Random(seed)
    g = G1Projective.generator()
    return [(g * rng.getrandbits(64)).to_affine() for _ in range(n)]


@pytest.mark.parametrize("n", [1, 2, 17, 64, 300])
def test_native_msm_matches_host(n):
    rng = random.Random(n)
    pts = _points(n, n)
    scs = [Fr(rng.getrandbits(255)) for _ in range(n)]
    if n > 2:
        pts[0] = G1Affine.identity()
        scs[1] = Fr.zero()
        scs[-1] = Fr(Fr.MODULUS - 1)
    want = msm_variable_base(pts, scs)
    got = msm_host(pts, scs)
    assert got == want
    x, y, inf = native_msm(pts, scs)
    wa = want.to_affine()
    assert (inf and wa.is_identity()) or (x == wa.x.value
                                          and y == wa.y.value)


def test_native_pairing_matches_python_tower():
    import importlib

    pr = importlib.import_module("zkvm_tpu.curves.pairing")
    from zkvm_tpu.curves import fast_tower

    p = G1Affine.generator()
    q = G2Affine.generator()
    f_py = pr._fp12_to_tuple(pr.multi_miller_loop([(p, pr.G2Prepared(q))]))
    assert native_miller_loop([(p, q)]) == f_py
    assert native_final_exp(f_py) == fast_tower.final_exp(f_py)


def test_native_pairing_check_bilinear():
    rng = random.Random(3)
    g = G1Projective.generator()
    q = G2Affine.generator()
    a = rng.getrandbits(128)
    aq = (q.to_projective() * Fr(a)).to_affine()
    good = [((g * a).to_affine(), q), ((-g).to_affine(), aq)]
    assert native_pairing_check(good)
    bad = [((g * (a + 1)).to_affine(), q), ((-g).to_affine(), aq)]
    assert not native_pairing_check(bad)


def test_native_keccak_matches_python():
    from zkvm_tpu.native import native_keccak_f1600
    from zkvm_tpu.plonk import transcript as tmod

    rng = random.Random(9)
    state_c = bytearray(rng.randrange(256) for _ in range(200))
    state_py = bytearray(state_c)
    assert native_keccak_f1600(state_c)
    # run the pure-Python permutation body (bypass the native fast path)
    import os

    os.environ["ZKVM_NO_NATIVE"] = "1"
    try:
        import zkvm_tpu.native as nat

        saved = (nat._LIB, nat._TRIED)
        nat._LIB, nat._TRIED = None, True
        tmod.keccak_f1600(state_py)
        nat._LIB, nat._TRIED = saved
    finally:
        del os.environ["ZKVM_NO_NATIVE"]
    assert state_c == state_py
