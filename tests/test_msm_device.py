"""Device MSM pipeline tests: the batch-affine halving-tree bucket
accumulator (ops/msm_tree.py) pinned bit-exact against the host MSM
(multiscalar_mul.rs:143-220 semantics), plus the affine add / batched
inversion building blocks."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zkvm_tpu.fields import Fp, Fr
from zkvm_tpu.curves import G1Projective
from zkvm_tpu.curves.msm import msm_variable_base
from zkvm_tpu.ops import g1_ops
from zkvm_tpu.ops import limb_field as lf
from zkvm_tpu.ops import msm as dmsm
from zkvm_tpu.ops import msm_tree
from zkvm_tpu.ops.limb_field import FQ, FR


def _points(n, seed):
    rng = random.Random(seed)
    g = G1Projective.generator()
    return [(g * rng.getrandbits(64)).to_affine() for _ in range(n)]


def _decode(x, y, inf, i):
    if int(inf[i]):
        return G1Projective.identity()
    rinv = pow(FQ.R, -1, FQ.modulus)
    xv = lf.limbs_to_int(np.asarray(x)[:, i]) * rinv % FQ.modulus
    yv = lf.limbs_to_int(np.asarray(y)[:, i]) * rinv % FQ.modulus
    return G1Projective(Fp(xv), Fp(yv), Fp(1))


def test_batch_inv():
    rng = random.Random(1)
    vals = [rng.randrange(1, FQ.modulus) for _ in range(256)]
    arr = lf.to_mont(FQ, FQ.to_raw_array(vals))
    inv = msm_tree.batch_inv(arr)
    got = FQ.from_mont_array(inv)
    for v, g in zip(vals, got):
        assert g == pow(v, -1, FQ.modulus)


def test_affine_pair_add_edge_cases():
    pts = _points(6, 7)
    p0, p1 = pts[0], pts[1]
    cases = [
        (p0, p1, (p0.to_projective() + p1.to_projective()).to_affine()),
        (p0, p0, (p0.to_projective() + p0.to_projective()).to_affine()),
        (p0, -p0, None),                                       # P + (-P)
        (p0, None, p0),                                        # P + inf
        (None, p1, p1),                                        # inf + Q
        (None, None, None),                                    # inf + inf
    ]

    def enc(side):
        xs = np.zeros((FQ.n_limbs, len(cases)), np.uint32)
        ys = np.zeros_like(xs)
        infs = np.zeros(len(cases), np.uint32)
        for i, c in enumerate(cases):
            p = c[side]
            if p is None:
                infs[i] = 1
            else:
                xs[:, i] = lf.int_to_limbs(p.x.value * FQ.R % FQ.modulus,
                                           FQ.n_limbs)
                ys[:, i] = lf.int_to_limbs(p.y.value * FQ.R % FQ.modulus,
                                           FQ.n_limbs)
        return jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(infs)

    xl, yl, il = enc(0)
    xr, yr, ir = enc(1)
    x3, y3, i3 = jax.jit(msm_tree.affine_pair_add)(xl, yl, il, xr, yr, ir)
    for i, (_, _, expected) in enumerate(cases):
        got = _decode(x3, y3, np.asarray(i3), i)
        if expected is None:
            assert got.is_identity(), f"case {i}"
        else:
            assert got.to_affine() == expected, f"case {i}"


def test_ptree_pipeline_direct():
    """The projective halving-tree pipeline (ops/msm.py) pinned directly
    against the host MSM at a size that exercises the levels, the reject
    compaction and the scan tail (n=2048, c=10 -> half=512, 2 levels)."""
    rng = random.Random(11)
    n = 2048
    points = _points(n, 11)
    points[5] = points[4]  # duplicate point (doubling inside a bucket)
    scalars = [Fr(rng.randrange(Fr.MODULUS)) for _ in range(n)]
    scalars[7] = Fr.zero()
    scalars[4] = scalars[5]

    ctx = dmsm.MSMContext(points)
    pts, pinf, pm = ctx._padded(n)
    limbs = FR.to_raw_array([s.value for s in scalars])[None]
    c = 10
    sums = dmsm._msm_ptree_pipeline(c, pm, pinf, limbs)
    host = [np.asarray(t) for t in jax.device_get(sums)]
    got = dmsm._host_window_fold(host, c, host[0].shape[0], 1, [n])[0]
    assert got == msm_variable_base(points, scalars)


@pytest.mark.parametrize("n", [4096])
def test_tree_pipeline_matches_host(n):
    """MSMContext dispatch at 4096 (scan path; the halving tree is pinned
    separately by test_ptree_pipeline_direct), adversarial scalars mixed
    in."""
    rng = random.Random(99)
    points = _points(n, 99)
    scalars = [Fr(rng.getrandbits(260)) for _ in range(n - 8)]
    scalars += [Fr.zero(), Fr.one(), Fr.one(), Fr(2), scalars[0],
                Fr(Fr.MODULUS - 1), Fr(1 << 200), Fr(513)]
    rng.shuffle(scalars)

    ctx = dmsm.MSMContext(points)
    got = ctx.msm(scalars)
    assert got == msm_variable_base(points, scalars)


def test_tree_pipeline_multi_set_prefixes():
    """msm_many with several scalar sets of different lengths over one
    point set (the commit_many_mont shape)."""
    n = 4096
    rng = random.Random(5)
    points = _points(n, 5)
    sets = [[Fr(rng.getrandbits(255)) for _ in range(k)]
            for k in (n, n - 700, 1500)]
    ctx = dmsm.MSMContext(points)
    got = ctx.msm_many(sets)
    for g, s in zip(got, sets):
        assert g == msm_variable_base(points[: len(s)], s)
