"""Interpret-mode bit-equality tests for the pallas TPU kernels.

tests/conftest.py forces the CPU backend, where the public wrappers route
around pallas; these tests call the kernels directly with interpret=True so
the fused in-kernel arithmetic (_mont_mul_k CIOS, _add_k/_sub_k, the Hades
round structure, the RCB15 addition) is pinned against the jnp reference
implementations without TPU hardware.  Sizes deliberately cross block
boundaries (e.g. 513 lanes with block 256) to cover the padding paths.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

import zkvm_tpu.ops.limb_field as lf
from zkvm_tpu import params
from zkvm_tpu.ops import g1_ops, pallas_field
from zkvm_tpu.ops.limb_field import FQ, FR

rng = random.Random(0xBEEF)


def _rand_fr(n):
    return FR.to_mont_array([rng.randrange(params.FR_MODULUS)
                             for _ in range(n)])


def _rand_points(n):
    """Random-ish G1 batch: multiples of the generator via host group ops."""
    from zkvm_tpu.curves.g1 import G1Affine

    pts = [(G1Affine.generator() * rng.randrange(1, 1 << 64)).to_affine()
           for _ in range(n)]
    return g1_ops.affine_to_device(pts)


def test_mont_mul_pallas_matches_jnp():
    n = 513  # crosses the 256-lane block boundary
    a, b = _rand_fr(n), _rand_fr(n)
    got = pallas_field.mont_mul_pallas(FR, a, b, block=256, interpret=True)
    want = lf.mont_mul(FR, a, b)
    assert (np.asarray(got) == np.asarray(want)).all()


def test_butterfly_pallas_matches_jnp():
    n = 513
    even, odd, tw = _rand_fr(n), _rand_fr(n), _rand_fr(n)
    plus, minus = pallas_field.butterfly_pallas(even, odd, tw, block=256,
                                                interpret=True)
    t = lf.mont_mul(FR, odd, tw)
    assert (np.asarray(plus) == np.asarray(lf.add(FR, even, t))).all()
    assert (np.asarray(minus) == np.asarray(lf.sub(FR, even, t))).all()


def test_padd_pallas_matches_jnp():
    n = 130  # crosses a 128-lane block with block=128
    p = _rand_points(n)
    q = _rand_points(n)
    got = pallas_field.padd_pallas(p, q, block=128, interpret=True)
    want = g1_ops._padd_jnp(p, q)
    for g, w in zip(got, want):
        assert (np.asarray(g) == np.asarray(w)).all()


def test_padd_pallas_ilp_matches_jnp():
    """ILP-grouped kernel (stacked CIOS groups) bit-equal to the jnp padd,
    including identity operands and doubling."""
    n = 130
    p = _rand_points(n)
    q = _rand_points(n)
    got = pallas_field.padd_pallas_ilp(p, q, block=128, interpret=True)
    want = g1_ops._padd_jnp(p, q)
    for g, w in zip(got, want):
        assert (np.asarray(g) == np.asarray(w)).all()
    ident = g1_ops.identity_batch((n,))
    got_i = pallas_field.padd_pallas_ilp(p, ident, block=128, interpret=True)
    want_i = g1_ops._padd_jnp(p, ident)
    for g, w in zip(got_i, want_i):
        assert (np.asarray(g) == np.asarray(w)).all()
    got_d = pallas_field.padd_pallas_ilp(p, p, block=128, interpret=True)
    want_d = g1_ops._padd_jnp(p, p)
    for g, w in zip(got_d, want_d):
        assert (np.asarray(g) == np.asarray(w)).all()


def test_padd_pallas_identity_and_doubling():
    n = 128
    p = _rand_points(n)
    ident = g1_ops.identity_batch((n,))
    got = pallas_field.padd_pallas(p, ident, block=128, interpret=True)
    want = g1_ops._padd_jnp(p, ident)
    for g, w in zip(got, want):
        assert (np.asarray(g) == np.asarray(w)).all()
    got2 = pallas_field.padd_pallas(p, p, block=128, interpret=True)
    want2 = g1_ops._pdouble_jnp(p)
    # complete formulas: P+P must equal the dedicated doubling
    from zkvm_tpu.fields import Fp

    for i in (0, 63, 127):
        a = g1_ops.device_to_projective(got2, i)
        b = g1_ops.device_to_projective(want2, i)
        assert a == b


def test_hades_permute_pallas_matches_host():
    from zkvm_tpu.hashes.hades import ScalarPermutation
    from zkvm_tpu.fields import Fr

    batch = 3
    states = [[rng.randrange(params.FR_MODULUS) for _ in range(5)]
              for _ in range(batch)]
    flat = [v for st in states for v in st]
    arr = FR.to_mont_array(flat)  # [L, batch*5]
    dev = jnp.transpose(arr.reshape(FR.n_limbs, batch, 5), (2, 0, 1))
    out = pallas_field.hades_permute_pallas(dev, block=128, interpret=True)
    # decode [5, L, batch]
    host_out = FR.from_mont_array(jnp.transpose(out, (2, 1, 0)))
    for b in range(batch):
        expect = ScalarPermutation().permute([Fr(v) for v in states[b]])
        got = host_out[b * 5:(b + 1) * 5]
        assert [Fr(v) for v in got] == list(expect)


def test_ntt_fold_kernel_matches_jnp():
    """The MXU-NTT split-fold reduction kernel vs the lf reference."""
    from zkvm_tpu.ops import ntt_mxu

    m, b = 8, 128
    limbs = np.zeros((ntt_mxu._NB // 2, m, b), dtype=np.uint32)
    for i in range(m):
        for j in range(b):
            val = rng.randrange(1 << 518)
            for k in range(ntt_mxu._NB // 2):
                limbs[k, i, j] = (val >> (16 * k)) & 0xFFFF
    got = ntt_mxu._fold_pallas_interpret(jnp.asarray(limbs))
    q = params.FR_MODULUS
    for i in range(m):
        for j in range(b):
            val = 0
            for k in range(ntt_mxu._NB // 2):
                val |= int(limbs[k, i, j]) << (16 * k)
            want = val % q
            limb_out = int(lf.limbs_to_int(np.asarray(got)[:, i, j]))
            assert limb_out == want, (i, j)


def test_ntt_carry_fold_kernel_matches_host():
    """The fused carry+fold kernel vs host big-int: s32 byte columns with
    matmul-scale magnitudes (up to 256 * 255^2 < 2^24) reduce mod p in one
    pass.  513 lanes after flattening crosses the 128-lane padding path."""
    from zkvm_tpu.ops import ntt_mxu

    m, b = 3, 171  # m*b = 513 lanes
    d = np.zeros((ntt_mxu._NB, m, b), dtype=np.int32)
    for i in range(m):
        for j in range(b):
            # byte-product columns like the DFT produces: the top columns
            # stay small so the final carry dies inside the spare columns
            for t in range(2 * ntt_mxu._P - 1):
                d[t, i, j] = rng.randrange(1 << 24)
    got = ntt_mxu._carry_fold_pallas_interpret(jnp.asarray(d))
    q = params.FR_MODULUS
    for i in range(m):
        for j in range(b):
            val = sum(int(d[t, i, j]) << (8 * t)
                      for t in range(ntt_mxu._NB))
            want = val % q
            limb_out = int(lf.limbs_to_int(np.asarray(got)[:, i, j]))
            assert limb_out == want, (i, j)


def test_window_fold_pallas_matches_host():
    """The fused window-fold kernel (one launch, in-kernel Horner chain)
    matches the host bigint fold on real points, multiple sets."""
    from zkvm_tpu.curves.g1 import G1Affine, G1Projective
    from zkvm_tpu.fields import Fp, Fr
    from zkvm_tpu.ops import msm as msm_mod

    c, w_count, n_sets = 4, 5, 3
    pts = [(G1Affine.generator()
            * Fr(rng.randrange(1, params.FR_MODULUS))).to_affine()
           for _ in range(w_count * n_sets)]
    dev = g1_ops.affine_to_device(pts)
    sums = tuple(jnp.asarray(np.asarray(t).T[:, :, None]) for t in dev)
    out = np.asarray(pallas_field.window_fold_pallas(
        c, w_count, n_sets, *sums, interpret=True))
    host = msm_mod._host_window_fold(
        [np.asarray(t) for t in sums], c, w_count, n_sets, [1] * n_sets)
    rinv = pow(FQ.R, -1, FQ.modulus)
    for s_i in range(n_sets):
        gx, gy, gz = (lf.limbs_to_int(out[k][:, s_i]) * rinv % FQ.modulus
                      for k in range(3))
        assert G1Projective(Fp(gx), Fp(gy), Fp(gz)) == host[s_i]
