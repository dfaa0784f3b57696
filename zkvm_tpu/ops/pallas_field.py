"""Pallas TPU kernels for the hot field/group operations.

The jnp-level kernels in limb_field/g1_ops stream every intermediate through
HBM (each Montgomery step is a separate XLA op); these fused kernels keep
the whole computation VMEM-resident: one HBM read of the operands, one
write of the result.

  * `hades_permute_pallas`: the full 68-round Poseidon permutation on a
    [5, L, B] state -- the flagship hashing kernel.
  * `padd_pallas`: complete RCB15 G1 addition on [L, B] coordinate blocks
    (12 Montgomery muls fused) -- the MSM workhorse.

Both run the same in-kernel CIOS Montgomery multiply (`_mont_mul_k`) over
16-bit limbs: a fori_loop with a small [L+1, B] accumulator (registers/VMEM),
magnitudes < 2^24 so no per-step carries.  On non-TPU backends the public
wrappers fall back to the jnp implementations (bit-identical results).
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
from .limb_field import FQ, FR, LIMB_BITS, LIMB_MASK


def _on_tpu() -> bool:
    import os

    if os.environ.get("ZKVM_NO_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# -----------------------------------------------------------------------------
# In-kernel field arithmetic (traced helpers over jnp values)
# -----------------------------------------------------------------------------

def _mont_mul_k(spec, a, b, p_col=None):
    """CIOS Montgomery product for [L, B] values inside a kernel.

    Field constants enter as per-limb python scalars (pallas kernels cannot
    capture array constants), so m*p unrolls into L scalar multiplies.
    """
    l = spec.n_limbs
    np0 = int(spec.nprime & LIMB_MASK)
    p_ints = [int(x) for x in spec.p_limbs]
    zeros1 = jnp.zeros((1,) + a.shape[1:], dtype=jnp.uint32)
    acc = jnp.zeros((l + 1,) + a.shape[1:], dtype=jnp.uint32)
    cat = functools.partial(jnp.concatenate, axis=0)
    # unrolled over b's limbs; static-slice adds only (Mosaic lowers neither
    # dynamic_slice nor scatter-add on values)
    for j in range(l):
        pa = a * b[j:j + 1]
        acc = acc + cat([pa & LIMB_MASK, zeros1]) + cat([zeros1, pa >> LIMB_BITS])
        m = ((acc[0:1] & LIMB_MASK) * np0) & LIMB_MASK
        mp = cat([m * pk for pk in p_ints])
        acc = acc + cat([mp & LIMB_MASK, zeros1]) + cat([zeros1, mp >> LIMB_BITS])
        carry = acc[0:1] >> LIMB_BITS
        acc = cat([acc[1:2] + carry, acc[2:], zeros1])
    return _normalize_sub_p(spec, acc, p_col)


def _mont_mul_const_k(spec, a, c_limbs, p_col=None):
    """CIOS product with a compile-time constant operand (unrolled)."""
    l = spec.n_limbs
    np0 = int(spec.nprime & LIMB_MASK)
    p_ints = [int(x) for x in spec.p_limbs]
    zeros1 = jnp.zeros((1,) + a.shape[1:], dtype=jnp.uint32)
    acc = jnp.zeros((l + 1,) + a.shape[1:], dtype=jnp.uint32)
    cat = functools.partial(jnp.concatenate, axis=0)
    for j in range(l):
        bj = int(c_limbs[j])
        if bj:
            pa = a * bj
            acc = (acc + cat([pa & LIMB_MASK, zeros1])
                   + cat([zeros1, pa >> LIMB_BITS]))
        m = ((acc[0:1] & LIMB_MASK) * np0) & LIMB_MASK
        mp = cat([m * pk for pk in p_ints])
        acc = acc + cat([mp & LIMB_MASK, zeros1]) + cat([zeros1, mp >> LIMB_BITS])
        carry = acc[0:1] >> LIMB_BITS
        acc = cat([acc[1:2] + carry, acc[2:], zeros1])
    return _normalize_sub_p(spec, acc, p_col)


def _shift_rows(t, d, axis=0, fill=0):
    """Shift limb rows up-index by d along `axis` (row k -> k+d); `fill`
    enters at the low rows.  One concatenation -- no per-row loop."""
    if d == 0:
        return t
    lo = [slice(None)] * t.ndim
    lo[axis] = slice(0, d)
    hi = [slice(None)] * t.ndim
    hi[axis] = slice(0, t.shape[axis] - d)
    head = jnp.full_like(t[tuple(lo)], fill)
    return jnp.concatenate([head, t[tuple(hi)]], axis=axis)


def _row(t, k, axis=0):
    """Row k along `axis`, kept as a size-1 dim (broadcast-ready)."""
    sl = [slice(None)] * t.ndim
    sl[axis] = slice(k, k + 1) if k >= 0 else slice(k, None)
    return t[tuple(sl)]


def _const_col(vals, ndim, axis=0, dtype=jnp.uint32):
    """Per-limb python ints -> an [L]-along-`axis` broadcastable constant.

    Built from scalar fills (pallas kernels cannot capture array
    constants); XLA folds it outside kernels."""
    shape = tuple([1] * ndim)
    rows = [jnp.full(shape, int(v), dtype) for v in vals]
    return jnp.concatenate(rows, axis=axis)


def _ks_carry(g, p, axis=0):
    """Kogge-Stone inclusive prefix of the carry operator along `axis`.

    g, p: uint32 0/1 tensors (generate / propagate per limb row).
    Returns Ginc with Ginc[k] = carry-out of row k under ripple rules
    (Ginc[k] = g[k] | (p[k] & Ginc[k-1])) -- log2(L) whole-tensor steps
    instead of an L-step row loop."""
    n = g.shape[axis]
    sh = 1
    while sh < n:
        g = g | (p & _shift_rows(g, sh, axis))
        p = p & _shift_rows(p, sh, axis, fill=1)
        sh *= 2
    return g


def _carry_norm(acc, n_out, axis=0):
    """Carry-normalize limb columns (rows < 2^19) to n_out 16-bit limbs:
    two local carry rounds then a Kogge-Stone lookahead -- whole-tensor
    ops only (the previous unrolled row loop cost ~30 cycles per tiny
    [1, B] op and dominated every add/sub in the kernels)."""
    c = acc.shape[axis]
    if c < n_out:
        shape = list(acc.shape)
        shape[axis] = n_out - c
        acc = jnp.concatenate(
            [acc, jnp.zeros(tuple(shape), acc.dtype)], axis=axis)
    elif c > n_out:
        sl = [slice(None)] * acc.ndim
        sl[axis] = slice(0, n_out)
        acc = acc[tuple(sl)]
    s = acc
    # local rounds: rows < 2^19 -> carries < 8 -> rows <= 2^16-1+7 ->
    # carries <= 1 -> rows <= 2^16
    for _ in range(2):
        s = (s & LIMB_MASK) + _shift_rows(s >> LIMB_BITS, 1, axis)
    d = s & LIMB_MASK
    g = s >> LIMB_BITS                      # 0/1
    p = (d == LIMB_MASK).astype(jnp.uint32)
    c_in = _shift_rows(_ks_carry(g, p, axis), 1, axis)
    return (d + c_in) & LIMB_MASK


def _sub_limbs(a, b, axis=0):
    """a - b over 16-bit limb rows along `axis`; returns (diff, under).

    b: a broadcastable tensor/column or a list of per-limb python ints.
    `under` is a keepdims boolean (size-1 limb dim).  Borrow propagation
    via Kogge-Stone lookahead (log-depth whole-tensor ops)."""
    if isinstance(b, (list, tuple)):
        bt = _const_col(b, a.ndim, axis, jnp.int32)
    else:
        bt = b.astype(jnp.int32)
    v = a.astype(jnp.int32) - bt            # (-2^16, 2^16)
    d = (v & LIMB_MASK).astype(jnp.uint32)
    g = ((v >> 31) & 1).astype(jnp.uint32)  # borrow generate
    p = (d == 0).astype(jnp.uint32)         # borrow propagate
    binc = _ks_carry(g, p, axis)
    b_in = _shift_rows(binc, 1, axis)
    diff = ((d.astype(jnp.int32) - b_in.astype(jnp.int32)) & LIMB_MASK)
    return diff.astype(jnp.uint32), _row(binc, -1, axis) > 0


def _normalize_sub_p(spec, acc, p_col=None, axis=0):
    """Normalize an [L+1]-row accumulator (< 2p) to L canonical limbs."""
    l = spec.n_limbs
    s = _carry_norm(acc, l + 1, axis)
    carry_set = _row(s, l, axis) > 0
    sl = [slice(None)] * s.ndim
    sl[axis] = slice(0, l)
    body = s[tuple(sl)]
    p_limbs = ([int(x) for x in spec.p_limbs] if p_col is None else p_col)
    diff, under = _sub_limbs(body, p_limbs, axis)
    need = carry_set | ~under
    return jnp.where(need, diff, body)


def _add_k(spec, a, b, p_col=None, axis=0):
    """(a + b) mod p over 16-bit limb rows."""
    shape = list(a.shape)
    shape[axis] = 1
    return _normalize_sub_p(spec, jnp.concatenate(
        [a + b, jnp.zeros(tuple(shape), dtype=jnp.uint32)], axis=axis),
        p_col, axis)


def _sub_k(spec, a, b, p_col=None, axis=0):
    """(a - b) mod p over 16-bit limb rows."""
    diff, under = _sub_limbs(a, b, axis)
    if p_col is None:
        p_col = _const_col([int(x) for x in spec.p_limbs], a.ndim, axis)
    p_rows = jnp.where(under, p_col, jnp.uint32(0))
    return _carry_norm(diff + p_rows, spec.n_limbs, axis)


# -----------------------------------------------------------------------------
# Elementwise fused Montgomery multiply (used by NTT glue/coset scaling and
# any pointwise polynomial product: one HBM round trip instead of a 16-step
# lax.scan with an HBM-resident accumulator)
# -----------------------------------------------------------------------------

def _mont_mul_ew_kernel(spec, a_ref, b_ref, o_ref):
    p_col = _const_col([int(x) for x in spec.p_limbs], 2)
    o_ref[:] = _mont_mul_k(spec, a_ref[:], b_ref[:], p_col)


def mont_mul_pallas(spec, a, b, block: int = 2048, interpret: bool = False):
    """Pointwise Montgomery product over limb-LEADING [L, B] tensors."""
    l = spec.n_limbs
    bsz = a.shape[-1]
    block = min(block, max(128, -(-bsz // 128) * 128))
    if bsz % block:
        pad = block - bsz % block
        a = jnp.pad(a, [(0, 0), (0, pad)])
        b = jnp.pad(b, [(0, 0), (0, pad)])
    nb = a.shape[-1] // block
    spec_blk = pl.BlockSpec((l, block), lambda i: (0, i))
    out = pl.pallas_call(
        functools.partial(_mont_mul_ew_kernel, spec),
        grid=(nb,),
        in_specs=[spec_blk] * 2,
        out_specs=spec_blk,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        interpret=interpret,
    )(a, b)
    return out[:, :bsz]


# -----------------------------------------------------------------------------
# Hades permutation kernel
# -----------------------------------------------------------------------------

_W = params.HADES_WIDTH
_ROUNDS = params.HADES_ROUNDS
_HALF = params.HADES_FULL_ROUNDS // 2


@functools.lru_cache(maxsize=1)
def _hades_consts():
    from ..hashes.poseidon_constants import MDS_MATRIX, ROUND_CONSTANTS

    def mont(v):
        return lf.int_to_limbs(v * FR.R % FR.modulus, FR.n_limbs)

    arc = np.stack([np.stack([mont(v) for v in row]) for row in ROUND_CONSTANTS])
    mds = np.stack([np.stack([mont(v) for v in row]) for row in MDS_MATRIX])
    mask = np.zeros((_ROUNDS, _W), dtype=np.uint32)
    mask[:_HALF, :] = 1
    mask[_HALF + params.HADES_PARTIAL_ROUNDS:, :] = 1
    mask[_HALF:_HALF + params.HADES_PARTIAL_ROUNDS, _W - 1] = 1
    return arc.astype(np.uint32), mds.astype(np.uint32), mask


def _hades_kernel(state_ref, arc_ref, mds_ref, mask_ref, out_ref):
    """68 rounds over one [5, L, B] block, fully VMEM-resident."""
    state = state_ref[:]  # [5, L, B]
    p_col = _const_col([int(x) for x in FR.p_limbs], 2)

    def round_body(r, s):
        arc = arc_ref[pl.ds(r, 1)][0]    # [5, L]
        mask = mask_ref[pl.ds(r, 1)][0]  # [5]
        rows = []
        for i in range(_W):
            x = _add_k(FR, s[i], arc[i][:, None], p_col)
            x2 = _mont_mul_k(FR, x, x, p_col)
            x4 = _mont_mul_k(FR, x2, x2, p_col)
            x5 = _mont_mul_k(FR, x4, x, p_col)
            rows.append(jnp.where((mask[i] != 0)[None, None], x5, x))
        mds = mds_ref[:]
        out_rows = []
        for row in range(_W):
            acc = _mont_mul_k(FR, rows[0], mds[row, 0][:, None], p_col)
            for col in range(1, _W):
                acc = _add_k(FR, acc,
                             _mont_mul_k(FR, rows[col], mds[row, col][:, None],
                                         p_col), p_col)
            out_rows.append(acc)
        return jnp.stack(out_rows, axis=0)

    out_ref[:] = jax.lax.fori_loop(0, _ROUNDS, round_body, state)


def hades_permute_pallas(state: jnp.ndarray,
                         block: int = 512,
                         interpret: bool = False) -> jnp.ndarray:
    """Full Hades permutation on [5, L, B] via one fused kernel."""
    arc, mds, mask = _hades_consts()
    b = state.shape[-1]
    if b % block:
        pad = block - b % block
        state = jnp.pad(state, [(0, 0), (0, 0), (0, pad)])
    nb = state.shape[-1] // block
    out = pl.pallas_call(
        _hades_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((_W, FR.n_limbs, block), lambda i: (0, 0, i)),
            pl.BlockSpec((_ROUNDS, _W, FR.n_limbs), lambda i: (0, 0, 0)),
            pl.BlockSpec((_W, _W, FR.n_limbs), lambda i: (0, 0, 0)),
            pl.BlockSpec((_ROUNDS, _W), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_W, FR.n_limbs, block), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct(state.shape, jnp.uint32),
        interpret=interpret,
    )(state, jnp.asarray(arc), jnp.asarray(mds), jnp.asarray(mask))
    return out[..., :b]


def _mont_mul_scr(spec, a, b, scr, p_col):
    """CIOS Montgomery product with a VMEM scratch ref for b's limbs.

    The fully-unrolled `_mont_mul_k` emits ~24x the code (Mosaic compiles
    of the MSM pipeline took minutes per shape) and holds ~90 live
    temporaries (capping padd blocks at 1024 lanes before VMEM stack OOM).
    Staging b into a scratch ref allows a fori_loop with dynamic limb reads
    (pl.ds on refs is supported; on values it is not).  `p_col` is the
    modulus as an [L, 1] value (kernels cannot capture array constants, so
    it arrives as a kernel input): m*p is then ONE broadcast multiply
    instead of L scalar row-products -- the dominant op count of the
    unrolled form."""
    import jax

    l = spec.n_limbs
    np0 = int(spec.nprime & LIMB_MASK)
    scr[:] = b
    zeros1 = jnp.zeros((1,) + a.shape[1:], dtype=jnp.uint32)
    cat = functools.partial(jnp.concatenate, axis=0)

    def body(j, acc):
        bj = scr[pl.ds(j, 1), :]
        pa = a * bj
        # m needs only the updated low column, so a*b and m*p low/high
        # pieces combine BEFORE touching the accumulator: 3 [L+1, B]
        # materializations per iteration instead of 6 (the accumulator
        # rebuilds are the kernel's VMEM-traffic bound, not the multiplies)
        m = (((acc[0:1] + pa[0:1]) & LIMB_MASK) * np0) & LIMB_MASK
        mp = m * p_col
        lo = (pa & LIMB_MASK) + (mp & LIMB_MASK)          # < 2^17
        hi = (pa >> LIMB_BITS) + (mp >> LIMB_BITS)
        acc = (acc + cat([lo, zeros1]) + cat([zeros1, hi]))
        carry = acc[0:1] >> LIMB_BITS
        return cat([acc[1:2] + carry, acc[2:], zeros1])

    acc0 = jnp.zeros((l + 1,) + a.shape[1:], dtype=jnp.uint32)
    acc = jax.lax.fori_loop(0, l, body, acc0)
    return _normalize_sub_p(spec, acc, p_col)


def _mont_mul_scr2(spec, a, b, scr, p_col):
    """CIOS Montgomery product consuming TWO of b's limbs per fori step.

    The serial kernel's cost is dominated by the accumulator rebuild (three
    [L+1, B] concatenations per limb); folding b_{2j} and b_{2j+1} in one
    step amortizes that bookkeeping over twice the multiply work: ~30% less
    VMEM traffic and half the loop trips.  Requires even L (both fields:
    16, 24).  Bit-identical to `_mont_mul_scr`.
    """
    import jax

    l = spec.n_limbs
    assert l % 2 == 0
    np0 = int(spec.nprime & LIMB_MASK)
    scr[:] = b
    tail = a.shape[1:]
    zeros1 = jnp.zeros((1,) + tail, dtype=jnp.uint32)
    zeros2 = jnp.zeros((2,) + tail, dtype=jnp.uint32)
    cat = functools.partial(jnp.concatenate, axis=0)

    def body(j, acc):
        b0 = scr[pl.ds(2 * j, 1), :]
        b1 = scr[pl.ds(2 * j + 1, 1), :]
        pa0 = a * b0
        m0 = (((acc[0:1] + pa0[0:1]) & LIMB_MASK) * np0) & LIMB_MASK
        mp0 = m0 * p_col
        pa1 = a * b1
        lo0 = (pa0 & LIMB_MASK) + (mp0 & LIMB_MASK)
        hi0 = (pa0 >> LIMB_BITS) + (mp0 >> LIMB_BITS)
        # column 1 before folding m1*p: everything that lands there
        c0 = (acc[0:1] + lo0[0:1]) >> LIMB_BITS
        v1 = acc[1:2] + lo0[1:2] + hi0[0:1] + (pa1[0:1] & LIMB_MASK) + c0
        m1 = ((v1 & LIMB_MASK) * np0) & LIMB_MASK
        mp1 = m1 * p_col
        lo1 = (pa1 & LIMB_MASK) + (mp1 & LIMB_MASK)
        hi1 = (pa1 >> LIMB_BITS) + (mp1 >> LIMB_BITS)
        acc = (acc + cat([lo0, zeros2]) + cat([zeros1, hi0 + lo1, zeros1])
               + cat([zeros2, hi1]))
        carry0 = acc[0:1] >> LIMB_BITS   # low 16 bits zero by choice of m0
        c1col = acc[1:2] + carry0
        carry1 = c1col >> LIMB_BITS      # low 16 bits zero by choice of m1
        return cat([acc[2:3] + carry1, acc[3:], zeros2])

    acc0 = jnp.zeros((l + 2,) + tail, dtype=jnp.uint32)
    acc = jax.lax.fori_loop(0, l // 2, body, acc0)
    return _normalize_sub_p(spec, acc[: l + 1], p_col)


# -----------------------------------------------------------------------------
# G1 complete-addition kernel (RCB15 algorithm 7, a=0)
# -----------------------------------------------------------------------------

_B3_LIMBS = tuple(int(x) for x in lf.int_to_limbs(
    3 * params.G1_B * FQ.R % FQ.modulus, FQ.n_limbs))


def _padd_vals(p_col, scr, P, Q, mul_impl=_mont_mul_scr):
    """RCB15 complete addition (algorithm 7, a=0) on (x, y, z) [L, B]
    value triples inside a kernel; shared by the block-padd kernel and the
    fused window-fold kernel."""
    mul = lambda a, b: mul_impl(FQ, a, b, scr, p_col)
    add = lambda a, b: _add_k(FQ, a, b, p_col)
    sub = lambda a, b: _sub_k(FQ, a, b, p_col)
    mul_b3 = lambda t: _mont_mul_const_k(FQ, t, _B3_LIMBS, p_col)
    x1, y1, z1 = P
    x2, y2, z2 = Q
    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    t3 = sub(sub(mul(add(x1, y1), add(x2, y2)), t0), t1)
    t4 = sub(sub(mul(add(y1, z1), add(y2, z2)), t1), t2)
    t5 = sub(sub(mul(add(x1, z1), add(x2, z2)), t0), t2)
    t6 = mul_b3(t2)
    z3 = add(t1, t6)
    t1 = sub(t1, t6)
    y3 = mul_b3(t5)
    x3 = sub(mul(t3, t1), mul(t4, y3))
    t0_3 = add(add(t0, t0), t0)
    y3 = add(mul(t1, z3), mul(y3, t0_3))
    z3 = add(mul(z3, t4), mul(t0_3, t3))
    return x3, y3, z3


def _padd_kernel(p_r, x1r, y1r, z1r, x2r, y2r, z2r, x3r, y3r, z3r, scr,
                 mul_impl=_mont_mul_scr):
    p_col = p_r[:]  # [L, 1] modulus column (broadcasts against [L, B])
    x3, y3, z3 = _padd_vals(p_col, scr,
                            (x1r[0], y1r[0], z1r[0]),
                            (x2r[0], y2r[0], z2r[0]), mul_impl)
    x3r[0], y3r[0], z3r[0] = x3, y3, z3


def padd_pallas(p, q, block: int = 1024, interpret: bool = False,
                mul_impl=_mont_mul_scr):
    """Complete G1 addition on limb-major point batches (any batch shape)."""
    shape = p[0].shape
    lead = shape[:-2]
    b = shape[-1]
    if b == 0 or any(s == 0 for s in lead):
        return p  # empty batch (associative_scan edge slices)
    block = min(block, max(128, -(-b // 128) * 128))  # avoid huge pads
    flat = [t.reshape((-1,) + shape[-2:]) for t in (*p, *q)]
    w = flat[0].shape[0]
    if b % block:
        pad = block - b % block
        flat = [jnp.pad(t, [(0, 0), (0, 0), (0, pad)]) for t in flat]
    bb = flat[0].shape[-1]
    nb = bb // block
    spec = pl.BlockSpec((1, FQ.n_limbs, block), lambda i, j: (i, 0, j))
    p_arr = jnp.asarray(np.asarray(FQ.p_limbs, dtype=np.uint32))[:, None]
    p_spec = pl.BlockSpec((FQ.n_limbs, 1), lambda i, j: (0, 0))
    out = pl.pallas_call(
        functools.partial(_padd_kernel, mul_impl=mul_impl),
        grid=(w, nb),
        in_specs=[p_spec] + [spec] * 6,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct(flat[0].shape, jnp.uint32)] * 3,
        scratch_shapes=[pltpu.VMEM((FQ.n_limbs, block), jnp.uint32)],
        interpret=interpret,
    )(p_arr, *flat)
    return tuple(t[..., :b].reshape(shape) for t in out)


def padd_pallas_2l(p, q, block: int = 1024, interpret: bool = False):
    """`padd_pallas` with the two-limb-per-step CIOS multiply."""
    return padd_pallas(p, q, block=block, interpret=interpret,
                       mul_impl=_mont_mul_scr2)


# -----------------------------------------------------------------------------
# ILP-grouped G1 addition: batch independent Montgomery products
# -----------------------------------------------------------------------------
#
# The serial-kernel padd issues its 14 CIOS multiplies one after another;
# every fori step's accumulator rebuild depends on the previous step, so the
# VPU stalls on the dependency chain.  RCB15's multiply DAG has width >= 2
# throughout: grouped as 3+3+2+3+3 stacked multiplies ([G, L, B] operands
# through one shared fori loop) the chain amortizes over G independent
# lanes-groups.

def _mont_mul_scr_m(spec, a, b, scr, p_col):
    """CIOS Montgomery product over stacked [G, L, B] operand groups.

    Same algorithm as `_mont_mul_scr`; `scr` is a [G_max, L, B] VMEM ref
    staging b's limbs (G <= G_max; only the first G rows are used)."""
    import jax

    l = spec.n_limbs
    g = a.shape[0]
    np0 = int(spec.nprime & LIMB_MASK)
    scr[pl.ds(0, g)] = b
    zeros1 = jnp.zeros(a.shape[:-2] + (1,) + a.shape[-1:], dtype=jnp.uint32)
    cat = functools.partial(jnp.concatenate, axis=-2)

    def body(j, acc):
        bj = scr[pl.ds(0, g), pl.ds(j, 1), :]
        pa = a * bj
        m = (((acc[..., 0:1, :] + pa[..., 0:1, :]) & LIMB_MASK) * np0) \
            & LIMB_MASK
        mp = m * p_col
        lo = (pa & LIMB_MASK) + (mp & LIMB_MASK)
        hi = (pa >> LIMB_BITS) + (mp >> LIMB_BITS)
        acc = acc + cat([lo, zeros1]) + cat([zeros1, hi])
        carry = acc[..., 0:1, :] >> LIMB_BITS
        return cat([acc[..., 1:2, :] + carry, acc[..., 2:, :], zeros1])

    acc0 = jnp.zeros(a.shape[:-2] + (l + 1,) + a.shape[-1:],
                     dtype=jnp.uint32)
    acc = jax.lax.fori_loop(0, l, body, acc0)
    return _normalize_sub_p(spec, acc, p_col, axis=-2)


def _mont_mul_scr_m2(spec, a, b, scr, p_col):
    """Grouped [G, L, B] CIOS consuming two b-limbs per step (the
    `_mont_mul_scr2` bookkeeping over `_mont_mul_scr_m`'s group axis)."""
    import jax

    l = spec.n_limbs
    assert l % 2 == 0
    g = a.shape[0]
    np0 = int(spec.nprime & LIMB_MASK)
    scr[pl.ds(0, g)] = b
    tail = a.shape[-1:]
    zeros1 = jnp.zeros(a.shape[:-2] + (1,) + tail, dtype=jnp.uint32)
    zeros2 = jnp.zeros(a.shape[:-2] + (2,) + tail, dtype=jnp.uint32)
    cat = functools.partial(jnp.concatenate, axis=-2)

    def body(j, acc):
        b0 = scr[pl.ds(0, g), pl.ds(2 * j, 1), :]
        b1 = scr[pl.ds(0, g), pl.ds(2 * j + 1, 1), :]
        pa0 = a * b0
        m0 = (((acc[..., 0:1, :] + pa0[..., 0:1, :]) & LIMB_MASK) * np0) \
            & LIMB_MASK
        mp0 = m0 * p_col
        pa1 = a * b1
        lo0 = (pa0 & LIMB_MASK) + (mp0 & LIMB_MASK)
        hi0 = (pa0 >> LIMB_BITS) + (mp0 >> LIMB_BITS)
        c0 = (acc[..., 0:1, :] + lo0[..., 0:1, :]) >> LIMB_BITS
        v1 = (acc[..., 1:2, :] + lo0[..., 1:2, :] + hi0[..., 0:1, :]
              + (pa1[..., 0:1, :] & LIMB_MASK) + c0)
        m1 = ((v1 & LIMB_MASK) * np0) & LIMB_MASK
        mp1 = m1 * p_col
        lo1 = (pa1 & LIMB_MASK) + (mp1 & LIMB_MASK)
        hi1 = (pa1 >> LIMB_BITS) + (mp1 >> LIMB_BITS)
        acc = (acc + cat([lo0, zeros2]) + cat([zeros1, hi0 + lo1, zeros1])
               + cat([zeros2, hi1]))
        carry0 = acc[..., 0:1, :] >> LIMB_BITS
        c1col = acc[..., 1:2, :] + carry0
        carry1 = c1col >> LIMB_BITS
        return cat([acc[..., 2:3, :] + carry1, acc[..., 3:, :], zeros2])

    acc0 = jnp.zeros(a.shape[:-2] + (l + 2,) + tail, dtype=jnp.uint32)
    acc = jax.lax.fori_loop(0, l // 2, body, acc0)
    return _normalize_sub_p(spec, acc[..., : l + 1, :], p_col, axis=-2)


def _padd_kernel_ilp(p_r, b3_r, x1r, y1r, z1r, x2r, y2r, z2r,
                     x3r, y3r, z3r, scr, mul_m=_mont_mul_scr_m):
    p_col = p_r[:]
    b3_col = b3_r[:]
    add = lambda a, b: _add_k(FQ, a, b, p_col)
    sub = lambda a, b: _sub_k(FQ, a, b, p_col)

    def mul_group(pairs):
        a = jnp.stack([p[0] for p in pairs])
        b = jnp.stack([p[1] for p in pairs])
        r = mul_m(FQ, a, b, scr, p_col)
        return tuple(r[i] for i in range(len(pairs)))

    x1, y1, z1 = x1r[0], y1r[0], z1r[0]
    x2, y2, z2 = x2r[0], y2r[0], z2r[0]
    t0, t1, t2, t3, t4, t5 = mul_group([
        (x1, x2), (y1, y2), (z1, z2),
        (add(x1, y1), add(x2, y2)),
        (add(y1, z1), add(y2, z2)),
        (add(x1, z1), add(x2, z2))])
    t3 = sub(sub(t3, t0), t1)
    t4 = sub(sub(t4, t1), t2)
    t5 = sub(sub(t5, t0), t2)
    b3b = jnp.broadcast_to(b3_col, t2.shape)
    t6, y3 = mul_group([(t2, b3b), (t5, b3b)])
    z3 = add(t1, t6)
    t1 = sub(t1, t6)
    t0_3 = add(add(t0, t0), t0)
    u1, u2, u3, u4, u5, u6 = mul_group([
        (t3, t1), (t4, y3), (t1, z3),
        (y3, t0_3), (z3, t4), (t0_3, t3)])
    x3r[0] = sub(u1, u2)
    y3r[0] = add(u3, u4)
    z3r[0] = add(u5, u6)


def padd_pallas_ilp(p, q, block: int = 1024, interpret: bool = False,
                    mul_m=_mont_mul_scr_m):
    """`padd_pallas` with the ILP-grouped kernel (bit-identical results)."""
    shape = p[0].shape
    lead = shape[:-2]
    b = shape[-1]
    if b == 0 or any(s == 0 for s in lead):
        return p
    block = min(block, max(128, -(-b // 128) * 128))
    flat = [t.reshape((-1,) + shape[-2:]) for t in (*p, *q)]
    w = flat[0].shape[0]
    if b % block:
        pad = block - b % block
        flat = [jnp.pad(t, [(0, 0), (0, 0), (0, pad)]) for t in flat]
    bb = flat[0].shape[-1]
    nb = bb // block
    spec = pl.BlockSpec((1, FQ.n_limbs, block), lambda i, j: (i, 0, j))
    p_arr = jnp.asarray(np.asarray(FQ.p_limbs, dtype=np.uint32))[:, None]
    b3_arr = jnp.asarray(np.asarray(_B3_LIMBS, dtype=np.uint32))[:, None]
    cspec = pl.BlockSpec((FQ.n_limbs, 1), lambda i, j: (0, 0))
    out = pl.pallas_call(
        functools.partial(_padd_kernel_ilp, mul_m=mul_m),
        grid=(w, nb),
        in_specs=[cspec, cspec] + [spec] * 6,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct(flat[0].shape, jnp.uint32)] * 3,
        scratch_shapes=[pltpu.VMEM((6, FQ.n_limbs, block), jnp.uint32)],
        interpret=interpret,
    )(p_arr, b3_arr, *flat)
    return tuple(t[..., :b].reshape(shape) for t in out)


def padd_pallas_ilp2l(p, q, block: int = 1024, interpret: bool = False):
    """ILP-grouped kernel with the two-limb-per-step CIOS multiply."""
    return padd_pallas_ilp(p, q, block=block, interpret=interpret,
                           mul_m=_mont_mul_scr_m2)


# -----------------------------------------------------------------------------
# NTT butterfly kernel: one fused (mul, add, sub) stage over [L, B] lanes
# -----------------------------------------------------------------------------

def _butterfly_kernel(even_ref, odd_ref, tw_ref, plus_ref, minus_ref):
    even = even_ref[:]
    p_col = _const_col([int(x) for x in FR.p_limbs], 2)
    t = _mont_mul_k(FR, odd_ref[:], tw_ref[:], p_col)
    plus_ref[:] = _add_k(FR, even, t, p_col)
    minus_ref[:] = _sub_k(FR, even, t, p_col)


def butterfly_pallas(even, odd, tw, block: int = 1024,
                     interpret: bool = False):
    """One NTT butterfly stage (even +/- tw*odd) fused in VMEM."""
    b = even.shape[-1]
    block = min(block, max(128, -(-b // 128) * 128))
    if b % block:
        pad = block - b % block
        even, odd, tw = (jnp.pad(t, [(0, 0), (0, pad)])
                         for t in (even, odd, tw))
    nb = even.shape[-1] // block
    spec = pl.BlockSpec((FR.n_limbs, block), lambda i: (0, i))
    plus, minus = pl.pallas_call(
        _butterfly_kernel,
        grid=(nb,),
        in_specs=[spec] * 3,
        out_specs=[spec] * 2,
        out_shape=[jax.ShapeDtypeStruct(even.shape, jnp.uint32)] * 2,
        interpret=interpret,
    )(even, odd, tw)
    return plus[:, :b], minus[:, :b]


# -----------------------------------------------------------------------------
# Fused window fold: sum_w 2^(c*w) * S_w in ONE kernel
# -----------------------------------------------------------------------------

def _window_fold_kernel(c, w_count, p_r, x_r, y_r, z_r, ox, oy, oz, scr):
    """Highest-window-first Horner chain, fully VMEM-resident.

    Inputs [W, L, S] (already reversed: row 0 = highest window); the
    eager lax.scan version dispatched ~W*(c+1) tiny pallas launches per
    fold -- this kernel runs the whole chain in one launch."""
    p_col = p_r[:]
    l = FQ.n_limbs
    s = x_r.shape[-1]
    one = _const_col([int(v) for v in FQ.one_mont], 2)
    zero = jnp.zeros((l, s), jnp.uint32)
    acc0 = (zero, jnp.broadcast_to(one, (l, s)), zero)

    def body(w, acc):
        for _ in range(c):
            acc = _padd_vals(p_col, scr, acc, acc, _mont_mul_scr2)
        row = (x_r[pl.ds(w, 1)][0], y_r[pl.ds(w, 1)][0],
               z_r[pl.ds(w, 1)][0])
        return _padd_vals(p_col, scr, acc, row, _mont_mul_scr2)

    acc = jax.lax.fori_loop(0, w_count, body, acc0)
    ox[:], oy[:], oz[:] = acc


def window_fold_pallas(c: int, w_count: int, n_sets: int, x, y, z,
                       interpret: bool = False):
    """Fold [S*W, L, 1] window sums into [3, L, S] totals (one launch).

    total = sum_w 2^(c*w) * S_w via the classic highest-window-first
    double-and-add; bit-identical to the host bigint chain."""
    l = FQ.n_limbs
    t = tuple(jnp.transpose(a.reshape(n_sets, w_count, l), (1, 2, 0))
              for a in (x, y, z))          # [W, L, S]
    rev = tuple(a[::-1] for a in t)        # highest window first
    s_pad = _align128_lanes(n_sets)
    if s_pad != n_sets:
        rev = tuple(jnp.pad(a, [(0, 0), (0, 0), (0, s_pad - n_sets)])
                    for a in rev)          # pad lanes never read back
    p_arr = jnp.asarray(np.asarray(FQ.p_limbs, dtype=np.uint32))[:, None]
    p_spec = pl.BlockSpec((l, 1), lambda: (0, 0))
    spec = pl.BlockSpec((w_count, l, s_pad), lambda: (0, 0, 0))
    ospec = pl.BlockSpec((l, s_pad), lambda: (0, 0))
    out = pl.pallas_call(
        functools.partial(_window_fold_kernel, c, w_count),
        in_specs=[p_spec] + [spec] * 3,
        out_specs=[ospec] * 3,
        out_shape=[jax.ShapeDtypeStruct((l, s_pad), jnp.uint32)] * 3,
        scratch_shapes=[pltpu.VMEM((l, s_pad), jnp.uint32)],
        interpret=interpret,
    )(p_arr, *rev)
    return jnp.stack(out)[:, :, :n_sets]  # [3, L, S]


def _align128_lanes(v: int) -> int:
    return -(-v // 128) * 128
