"""Batch-affine halving-tree MSM bucket accumulation.

Round-2's device MSM (ops/msm.py) reduced sorted points to bucket sums with
an inclusive `associative_scan` of complete projective additions (~2 point
adds per point at 12 Montgomery muls each).  This module replaces the scan
with the classic batch-affine reduction used by the fastest GPU MSMs,
re-designed for the TPU's fixed-shape SIMD model:

  1. points sorted by bucket id per window row (unchanged);
  2. log(N/half) *halving levels*: adjacent pairs are added with the
     AFFINE chord/tangent formulas -- 4 Montgomery muls per pair plus a
     SHARED batched inversion (two prefix-product scans, ~4 muls/pair
     amortized) -- and the pair merges only when both elements belong to
     the same bucket; otherwise the right element survives and the left is
     *rejected*.  Total work: ~1 pair-add per point (a reduction tree, not
     a scan), each ~8 muls on 2 coordinates vs the scan's 2x12 muls on 3;
  3. rejects at one level have pairwise-distinct bucket ids (the array is
     bucket-sorted and only the left of a boundary pair can be rejected),
     so each level has at most `half` real rejects: one cheap u32 key sort
     compacts them to `half` slots;
  4. the compacted rejects from every level plus the final residual array
     (at most (levels+1)*half elements, ~16x smaller than N) are re-sorted
     by bucket and fed to the round-2 projective scan/boundary/suffix-fold
     stage to produce the per-window sums.

Everything is fixed-shape and data-oblivious; window sums are bit-identical
to the host pippenger (tests/test_msm_device.py).  Reference semantics:
coset-bls12_381/src/coset/multiscalar_mul.rs:143-220.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import g1_ops
from . import limb_field as lf
from .limb_field import FQ

# Tree path: smaller windows than the scan path -- bucket-phase cost is no
# longer quadratic-ish in 2^c, and fewer buckets make the reject bound (and
# the final combined array) small.
#
# MEASURED (round 3, one v5e chip): the batch-AFFINE tree is SLOWER than
# the scan pipeline at every size tried -- 16.6k points/s @2^13 (scan: 46k)
# and 35.4k @2^16 (scan: 85k).  The halving levels save projective adds but
# pay two full-length Montgomery-product scans per batched inversion plus a
# reject-compaction sort per level, which together exceed the saved padd
# work.  Kept as an opt-in experiment (set TREE_MIN_POINTS lower to
# enable); the production successor is the PROJECTIVE halving tree in
# ops/msm.py (`_msm_ptree_pipeline`): same reject/compaction structure, no
# inversions -- the per-level cost is exactly one complete pallas padd.
TREE_WINDOW_BITS = 10
TREE_MIN_POINTS = 1 << 62


def _all_eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Limbwise equality over [..., L, M] -> bool [..., M]."""
    return jnp.all(a == b, axis=-2)


def _sel(mask: jnp.ndarray, a, b):
    """mask [..., M] selecting between limb tensors [..., L, M]."""
    return jnp.where(mask[..., None, :], a, b)


@functools.lru_cache(maxsize=1)
def _fq_inv_bits() -> np.ndarray:
    """Bits of p-2, MSB first, for the Fermat inversion fori_loop."""
    e = FQ.modulus - 2
    nbits = e.bit_length()
    return np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                    dtype=np.uint32)


def _mont_inv_fori(t: jnp.ndarray) -> jnp.ndarray:
    """Fermat inversion a^(p-2) with a compact fori_loop graph.

    `lf.mont_pow` unrolls ~550 multiplies into the traced graph; this is a
    381-step fori_loop with one square + one select-multiply per step --
    tiny lanes ([B, L, 1] totals), so latency is irrelevant but graph size
    is not (the whole MSM pipeline is one jitted program).
    """
    bits = jnp.asarray(_fq_inv_bits())
    one = jnp.broadcast_to(jnp.asarray(FQ.one_mont)[:, None],
                           t.shape).astype(jnp.uint32)

    def body(i, acc):
        acc = lf.mont_mul(FQ, acc, acc)
        with_mul = lf.mont_mul(FQ, acc, t)
        return jnp.where(bits[i] > 0, with_mul, acc)

    return jax.lax.fori_loop(0, bits.shape[0], body, one)


def batch_inv(t: jnp.ndarray) -> jnp.ndarray:
    """Batched Montgomery inversion along the last axis of [..., L, M].

    Montgomery's trick in scan form: prefix products, ONE Fermat inversion
    of the running total per batch row, suffix products; inv(t_i) =
    prefix_{i-1} * suffix_{i+1} * inv(total).  Inputs must be non-zero
    (callers select 1 into dead lanes).
    """
    mul = lambda a, b: lf.mont_mul(FQ, a, b)
    ax = t.ndim - 1
    pre = jax.lax.associative_scan(mul, t, axis=ax)
    suf = jax.lax.associative_scan(mul, t, axis=ax, reverse=True)
    inv_tot = _mont_inv_fori(pre[..., -1:])
    one = jnp.broadcast_to(jnp.asarray(FQ.one_mont)[:, None],
                           t.shape[:-1] + (1,)).astype(jnp.uint32)
    left = jnp.concatenate([one, pre[..., :-1]], axis=-1)
    right = jnp.concatenate([suf[..., 1:], one], axis=-1)
    return mul(mul(left, right), jnp.broadcast_to(inv_tot, t.shape))


def affine_pair_add(xl, yl, il, xr, yr, ir):
    """Branchless complete affine addition of two point batches.

    Coordinates [..., L, M] Montgomery, flags [..., M] uint32 (1 = point at
    infinity).  Handles identity operands, doubling (chord -> tangent) and
    P + (-P) -> infinity with selects; the division is one SHARED batched
    inversion.  ~4 muls + the amortized inversion per lane -- vs 12 for the
    complete projective add.  y == 0 cannot occur for non-identity points
    (no 2-torsion in the BLS12-381 G1 subgroup).
    """
    add = lambda a, b: lf.add(FQ, a, b)
    sub = lambda a, b: lf.sub(FQ, a, b)
    mul = lambda a, b: lf.mont_mul(FQ, a, b)

    x_eq = _all_eq(xl, xr)
    y_eq = _all_eq(yl, yr)
    real = (il == 0) & (ir == 0)
    dbl = x_eq & y_eq & real

    xsq = mul(xl, xl)
    num = _sel(dbl, add(add(xsq, xsq), xsq), sub(yr, yl))
    den = _sel(dbl, add(yl, yl), sub(xr, xl))
    # division result is unused for identity operands and P + (-P); park a 1
    # there so the shared product chain stays invertible
    degenerate = ~real | (x_eq & ~y_eq)
    one = jnp.broadcast_to(jnp.asarray(FQ.one_mont)[:, None],
                           den.shape).astype(jnp.uint32)
    inv = batch_inv(_sel(degenerate, one, den))

    lam = mul(num, inv)
    x3 = sub(sub(mul(lam, lam), xl), xr)
    y3 = sub(mul(lam, sub(xl, x3)), yl)

    res_inf = x_eq & ~y_eq & real  # P + (-P)
    out_x = _sel(il > 0, xr, _sel(ir > 0, xl, x3))
    out_y = _sel(il > 0, yr, _sel(ir > 0, yl, y3))
    out_i = jnp.where(il > 0, ir,
                      jnp.where(ir > 0, jnp.zeros_like(ir),
                                res_inf.astype(ir.dtype)))
    return out_x, out_y, out_i


def _signed_digit_tensors(limbs: jnp.ndarray, c: int):
    """Shared with ops.msm (imported there; re-exported to avoid a cycle)."""
    from .msm import _signed_digit_tensors as impl

    return impl(limbs, c)


def _take_lanes(t: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along the last axis with a shared [M] index vector."""
    return jnp.take(t, idx, axis=t.ndim - 1)


@functools.partial(jax.jit, static_argnums=(0,))
def _msm_tree_pipeline(c: int, px, py, pinf, limbs):
    """points: [24, N] affine Montgomery x/y + [N] infinity flags;
    limbs: [S, 16, N] canonical scalars.  Returns [S*W, 24, 1] x/y/z window
    sums (set-major), same contract as msm._msm_pipeline."""
    s, _, n = limbs.shape
    half = 1 << (c - 1)
    sent = half + 1
    d = _signed_digit_tensors(limbs, c)  # [S, W, N]
    w_count = d.shape[1]
    b = s * w_count
    dflat = d.reshape(b, n)

    bucket = jnp.where(dflat == 0, sent, jnp.abs(dflat))
    bucket = jnp.where(pinf[None, :] > 0, sent, bucket)

    idx_bits = max(n - 1, 1).bit_length()
    assert (sent << idx_bits) < (1 << 31)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    packed = jax.lax.sort((bucket.astype(jnp.int32) << idx_bits) | iota,
                          dimension=-1)
    sid = packed >> idx_bits
    perm = packed & ((1 << idx_bits) - 1)
    dsort = jnp.take_along_axis(dflat, perm, axis=1)

    x = jnp.moveaxis(jnp.take(px, perm, axis=1), 0, 1)  # [B, 24, N]
    y = jnp.moveaxis(jnp.take(py, perm, axis=1), 0, 1)
    y = lf.select(dsort < 0, lf.neg(FQ, y), y)
    inf = (sid >= sent).astype(jnp.uint32)

    # halve until the residual is ~bucket-count sized; bounded by the
    # 2-adicity of n so every level stays integral
    two_adic = (n & -n).bit_length() - 1
    levels = min(max(0, (n // half).bit_length() - 1), two_adic)
    parts_sid, parts_x, parts_y, parts_inf = [], [], [], []

    for _ in range(levels):
        m2 = x.shape[-1]
        m = m2 // 2
        ev = jnp.arange(0, m2, 2, dtype=jnp.int32)
        od = ev + 1
        xl, yl = _take_lanes(x, ev), _take_lanes(y, ev)
        xr, yr = _take_lanes(x, od), _take_lanes(y, od)
        sl, sr = sid[:, 0::2], sid[:, 1::2]
        il, ir = inf[:, 0::2], inf[:, 1::2]
        same = sl == sr
        x3, y3, i3 = affine_pair_add(xl, yl, il, xr, yr, ir)
        x = _sel(same, x3, xr)
        y = _sel(same, y3, yr)
        inf = jnp.where(same, i3, ir)
        sid = sr
        # rejects: left of every boundary pair; distinct sids within a level
        rsid = jnp.where(same | (il > 0), sent, sl)
        if m > half:
            pos_bits = max(m - 1, 1).bit_length()
            riota = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (b, m))
            rpacked = jax.lax.sort((rsid.astype(jnp.int32) << pos_bits)
                                   | riota, dimension=-1)[:, :half]
            rs = rpacked >> pos_bits
            rp = rpacked & ((1 << pos_bits) - 1)
            rx = jnp.take_along_axis(xl, rp[:, None, :], axis=2)
            ry = jnp.take_along_axis(yl, rp[:, None, :], axis=2)
        else:
            pad = half - m
            rs = jnp.pad(rsid, [(0, 0), (0, pad)], constant_values=sent)
            rx = jnp.pad(xl, [(0, 0), (0, 0), (0, pad)])
            ry = jnp.pad(yl, [(0, 0), (0, 0), (0, pad)])
        parts_sid.append(rs)
        parts_x.append(rx)
        parts_y.append(ry)
        parts_inf.append((rs >= sent).astype(jnp.uint32))

    # residual array joins as one more part (sids may repeat; that is fine,
    # the final stage handles arbitrary sorted multiplicity)
    parts_sid.append(jnp.where(inf > 0, sent, sid))
    parts_x.append(x)
    parts_y.append(y)
    parts_inf.append(inf)

    csid = jnp.concatenate(parts_sid, axis=-1)
    cx = jnp.concatenate(parts_x, axis=-1)
    cy = jnp.concatenate(parts_y, axis=-1)
    m_tot = csid.shape[-1]
    pad = (-m_tot) % 128
    if pad:
        csid = jnp.pad(csid, [(0, 0), (0, pad)], constant_values=sent)
        cx = jnp.pad(cx, [(0, 0), (0, 0), (0, pad)])
        cy = jnp.pad(cy, [(0, 0), (0, 0), (0, pad)])
        m_tot += pad

    pos_bits = max(m_tot - 1, 1).bit_length()
    ciota = jnp.broadcast_to(jnp.arange(m_tot, dtype=jnp.int32), (b, m_tot))
    cpacked = jax.lax.sort((csid.astype(jnp.int32) << pos_bits) | ciota,
                           dimension=-1)
    ss = cpacked >> pos_bits
    pp = cpacked & ((1 << pos_bits) - 1)
    sx = jnp.take_along_axis(cx, pp[:, None, :], axis=2)
    sy = jnp.take_along_axis(cy, pp[:, None, :], axis=2)
    sinf = ss >= sent

    # lift to projective and run the round-2 scan/boundary/suffix stage on
    # the ~N/16-sized combined array
    one = jnp.broadcast_to(jnp.asarray(FQ.one_mont)[:, None],
                           sx.shape).astype(jnp.uint32)
    zero = jnp.zeros_like(sx)
    xv = _sel(sinf, zero, sx)
    yv = _sel(sinf, one, sy)
    zv = _sel(sinf, zero, one)

    prefix = jax.lax.associative_scan(g1_ops.padd, (xv, yv, zv), axis=2)
    ident = g1_ops.identity_batch((b, 1))
    pref = tuple(jnp.concatenate([i, t], axis=-1)
                 for i, t in zip(ident, prefix))  # [B, L, M+1]

    targets = jnp.arange(half + 1, dtype=jnp.int32)
    cnt = jax.vmap(
        lambda row: jnp.searchsorted(row, targets, side="right"))(ss)
    take = lambda t, idx: jnp.take_along_axis(t, idx[:, None, :], axis=2)
    hi = tuple(take(t, cnt[:, 1:]) for t in pref)
    lo = tuple(take(t, cnt[:, :-1]) for t in pref)
    buckets = g1_ops.padd(hi, g1_ops.pneg(lo))  # [B, L, half]

    suf = jax.lax.associative_scan(g1_ops.padd, buckets, axis=2,
                                   reverse=True)
    m = half
    while m > 1:
        m //= 2
        suf = g1_ops.padd(tuple(t[..., :m] for t in suf),
                          tuple(t[..., m:] for t in suf))
    return suf  # [B, L, 1]
