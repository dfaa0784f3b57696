"""Schoolbook Montgomery field kernels in a full-tile [L, 8, Bc] layout.

The CIOS kernels in pallas_field.py carry an [L+1, B] accumulator through a
fori_loop: every step rebuilds it with concatenations and extracts single
[1, B] rows (1/8 sublane utilization), which caps the whole MSM pipeline at
~15% of the VPU's measured mul/mask stream rate.  These kernels restructure
the multiply as a fully-unrolled SOS (separated operand scanning) schoolbook
product over values shaped [8, Bc] -- one full (8, 128)-vreg tile per limb
-- with no loop-carried tensor, no concatenations and no single-row ops:

  * operands: 16-bit limbs, one [8, Bc] slice per limb;
  * phase 1: asymmetric 16x8-bit products (a_i * b8_j < 2^24) accumulated
    straight into u32 columns at 8-bit stride -- no mask/shift per product
    (headroom: <= 48 products of < 2^24 plus reduction terms stay < 2^31);
  * phase 2: radix-2^16 Montgomery reduction with lazy carries (the
    running pair R, S propagates carries; m*p8 products also < 2^24).

Reference semantics: the Montgomery multiplies in
coset-bls12_381/src/fp.rs and scalar.rs (CIOS on u64); bit-identical
results, pinned against limb_field.mont_mul in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import params
from . import limb_field as lf
from .limb_field import FQ, LIMB_BITS, LIMB_MASK

MASK8 = 0xFF
MASK16 = 0xFFFF


def _school_mul_rows(spec, a_rows, b_rows):
    """Montgomery product of two limb-row lists (any matching shapes).

    a_rows, b_rows: lists of L u32 values (16-bit limbs, little-endian).
    Returns L result rows.  Fully unrolled; no loop-carried tensors.
    """
    l = spec.n_limbs
    np0 = int(spec.nprime & LIMB_MASK)
    p8 = []
    for k in range(l):
        pk = int(spec.p_limbs[k])
        p8.append(pk & 0xFF)
        p8.append(pk >> 8)

    # b in 8-bit limbs (2L rows, values < 2^8)
    b8 = []
    for j in range(l):
        b8.append(b_rows[j] & MASK8)
        b8.append(b_rows[j] >> 8)

    # phase 1: cols[k] = sum_{2i+j=k} a_i * b8_j   (products < 2^24)
    # col count: 2i+j <= 2(l-1) + (2l-1) = 4l - 3; plus phase-2 writes up to
    # 2t+j <= 2(l-1) + 2l - 1 = 4l - 3 as well.
    ncols = 4 * l - 2
    cols = [None] * ncols
    for i in range(l):
        ai = a_rows[i]
        for j in range(2 * l):
            k = 2 * i + j
            t = ai * b8[j]
            cols[k] = t if cols[k] is None else cols[k] + t
    zero = jnp.zeros_like(a_rows[0])
    for k in range(ncols):
        if cols[k] is None:
            cols[k] = zero

    # phase 2: radix-2^16 Montgomery steps with lazy carries.
    # R holds the running total at 8-bit position 2t, S at 2t+1.
    res, top_carry = _mont_reduce_cols(l, np0, p8, cols, zero)

    # conditional subtract: result < 2p, subtract p when >= p or top carry
    return _cond_sub_p(spec, res, top_carry)


def _mont_reduce_cols(l, np0, p8, cols, zero):
    """Radix-2^16 Montgomery reduction of 8-bit-stride columns.

    cols: list of 4l-2 u32 values (< ~2^30 each) holding the double-width
    product at 8-bit positions.  Returns (16-bit result rows, top_carry).
    R tracks the fully-carried value at position 2t, S the raw value at
    2t+1 (carries flow into it lazily when forming v16)."""
    ncols = len(cols)
    R = cols[0]
    S = cols[1]
    for t in range(l):
        mid = S + (R >> 8)
        v16 = (R & MASK8) | ((mid << 8) & 0xFF00)
        m = (v16 * np0) & MASK16
        R = R + m * p8[0]
        S = S + m * p8[1] + (R >> 8)
        for j in range(2, 2 * l):
            cols[2 * t + j] = cols[2 * t + j] + m * p8[j]
        carry = S >> 8
        nxt = 2 * t + 2
        R = cols[nxt] + carry
        S = cols[nxt + 1] if nxt + 1 < ncols else zero

    # R/S hold positions 2l, 2l+1; propagate carries through the top half.
    out8 = []
    for k in range(2 * l):
        out8.append(R & MASK8)
        carry = R >> 8
        idx = 2 * l + k + 2
        R = S + carry
        S = (cols[idx] if idx < ncols else zero)
    top_carry = R  # value at position 2^(16*2l - ... ) -- 0 or 1

    # pack to 16-bit limbs
    return [out8[2 * k] | (out8[2 * k + 1] << 8) for k in range(l)], top_carry


def _cond_sub_p(spec, rows, top_carry):
    """rows (< 2p, 16-bit limbs) -> canonical; top_carry adds 2^(16L)."""
    l = spec.n_limbs
    borrow = jnp.zeros_like(rows[0], dtype=jnp.int32)
    diff = []
    for k in range(l):
        v = rows[k].astype(jnp.int32) - int(spec.p_limbs[k]) - borrow
        diff.append((v & LIMB_MASK).astype(jnp.uint32))
        borrow = (v >> LIMB_BITS) & 1
    under = borrow.astype(jnp.uint32) > top_carry  # borrow=1 & no carry
    return [jnp.where(under, rows[k], diff[k]) for k in range(l)]


def _school_mul_const_rows(spec, a_rows, c_limbs):
    """Montgomery product with a compile-time constant operand."""
    l = spec.n_limbs
    np0 = int(spec.nprime & LIMB_MASK)
    p8 = []
    for k in range(l):
        pk = int(spec.p_limbs[k])
        p8.append(pk & 0xFF)
        p8.append(pk >> 8)
    c8 = []
    for j in range(l):
        cj = int(c_limbs[j])
        c8.append(cj & 0xFF)
        c8.append(cj >> 8)

    ncols = 4 * l - 2
    cols = [None] * ncols
    for i in range(l):
        ai = a_rows[i]
        for j in range(2 * l):
            if c8[j] == 0:
                continue
            k = 2 * i + j
            t = ai * c8[j]
            cols[k] = t if cols[k] is None else cols[k] + t
    zero = jnp.zeros_like(a_rows[0])
    for k in range(ncols):
        if cols[k] is None:
            cols[k] = zero

    res, top_carry = _mont_reduce_cols(l, np0, p8, cols, zero)
    return _cond_sub_p(spec, res, top_carry)


def _add_rows(spec, a_rows, b_rows):
    """(a + b) mod p on limb-row lists."""
    l = spec.n_limbs
    s = []
    carry = None
    for k in range(l):
        v = a_rows[k] + b_rows[k]
        if carry is not None:
            v = v + carry
        s.append(v & MASK16)
        carry = v >> LIMB_BITS
    return _cond_sub_p(spec, s, carry)


def _sub_rows(spec, a_rows, b_rows):
    """(a - b) mod p on limb-row lists."""
    l = spec.n_limbs
    diff = []
    borrow = jnp.zeros_like(a_rows[0], dtype=jnp.int32)
    for k in range(l):
        v = a_rows[k].astype(jnp.int32) - b_rows[k].astype(jnp.int32) - borrow
        diff.append(v & LIMB_MASK)
        borrow = (v >> LIMB_BITS) & 1
    under = borrow > 0
    # re-add p where underflowed
    out = []
    carry = None
    for k in range(l):
        v = diff[k] + jnp.where(under, int(spec.p_limbs[k]), 0)
        if carry is not None:
            v = v + carry
        out.append((v & LIMB_MASK).astype(jnp.uint32))
        carry = v >> LIMB_BITS
    return out


_B3_LIMBS = tuple(int(x) for x in lf.int_to_limbs(
    3 * params.G1_B * FQ.R % FQ.modulus, FQ.n_limbs))


def _padd_rows(x1, y1, z1, x2, y2, z2):
    """Complete RCB15 G1 addition (a=0) on limb-row lists."""
    mul = functools.partial(_school_mul_rows, FQ)
    add = functools.partial(_add_rows, FQ)
    sub = functools.partial(_sub_rows, FQ)
    mul_b3 = lambda t: _school_mul_const_rows(FQ, t, _B3_LIMBS)

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    t3 = sub(sub(mul(add(x1, y1), add(x2, y2)), t0), t1)
    t4 = sub(sub(mul(add(y1, z1), add(y2, z2)), t1), t2)
    t5 = sub(sub(mul(add(x1, z1), add(x2, z2)), t0), t2)
    t6 = mul_b3(t2)
    z3 = add(t1, t6)
    t1n = sub(t1, t6)
    y3 = mul_b3(t5)
    x3 = sub(mul(t3, t1n), mul(t4, y3))
    t0_3 = add(add(t0, t0), t0)
    y3o = add(mul(t1n, z3), mul(y3, t0_3))
    z3o = add(mul(z3, t4), mul(t0_3, t3))
    return x3, y3o, z3o


def _rows_of(ref, l):
    """[1, L, 8, Bc] ref -> list of L [8, Bc] rows."""
    v = ref[:]
    return [v[0, k] for k in range(l)]


def _padd_kernel(x1r, y1r, z1r, x2r, y2r, z2r, x3r, y3r, z3r):
    l = FQ.n_limbs
    args = [_rows_of(r, l) for r in (x1r, y1r, z1r, x2r, y2r, z2r)]
    x3, y3, z3 = _padd_rows(*args)
    x3r[:] = jnp.stack(x3)[None]
    y3r[:] = jnp.stack(y3)[None]
    z3r[:] = jnp.stack(z3)[None]


def padd_pallas_school(p, q, lane_block: int = 256, interpret: bool = False):
    """Complete G1 addition; operands [..., L, B] -> same, via the
    schoolbook full-tile kernel.  B must be a multiple of 8*lane_block is
    NOT required -- inputs are padded."""
    shape = p[0].shape
    lead = shape[:-2]
    b = shape[-1]
    if b == 0 or any(s == 0 for s in lead):
        return p
    l = FQ.n_limbs
    flat = [t.reshape((-1, l, b)) for t in (*p, *q)]
    w = flat[0].shape[0]
    # pad lanes to a multiple of 8*lane_block, then view as [w, L, 8, b8]
    unit = 8 * lane_block
    bb = -(-b // unit) * unit
    if bb != b:
        flat = [jnp.pad(t, [(0, 0), (0, 0), (0, bb - b)]) for t in flat]
    b8 = bb // 8
    flat = [t.reshape(w, l, 8, b8) for t in flat]
    nb = b8 // lane_block
    spec = pl.BlockSpec((1, l, 8, lane_block), lambda i, j: (i, 0, 0, j))
    out = pl.pallas_call(
        _padd_kernel,
        grid=(w, nb),
        in_specs=[spec] * 6,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((w, l, 8, b8), jnp.uint32)] * 3,
        interpret=interpret,
    )(*flat)
    out = [t.reshape(w, l, bb)[..., :b].reshape(shape) for t in out]
    return tuple(out)
