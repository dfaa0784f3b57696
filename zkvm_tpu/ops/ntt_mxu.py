"""MXU-native NTT: field DFTs as limb-sliced integer matmuls.

The reference evaluates polynomials with a serial Cooley-Tukey butterfly
(plonk/src/fft/domain.rs:286-340).  Round 1 replaced that with a batched
VPU butterfly; this module is the round-2 redesign that moves the NTT onto
the MXU (the TPU's 128x128 systolic array), where the chip's FLOPs live:

  * A size-m <= 256 DFT over Fr is a matrix multiply Y = W @ X with
    W[k, j] = root^(k*j).  Field elements are sliced into 8-bit limbs; the
    limb-slice products are exact in bfloat16 x bfloat16 -> float32 MXU
    accumulation (products <= 255^2, contraction <= 256 summands, so every
    partial sum stays below 2^24 and f32 arithmetic is exact).
  * Larger sizes use the recursive Cooley-Tukey (4-step/Bailey)
    decomposition n = a*b: b-point DFTs, twiddle glue w^(j1*k2), a-point
    DFTs -- each level is again a batched matmul.  A 2^16 NTT is two
    matmul passes of ~17 G MACs each, i.e. MXU work measured in
    microseconds, versus log2(n) HBM-bound gather stages for a butterfly.

The big-integer products (<= 256 * p^2 < 2^518) are reassembled from the
byte-plane matmul outputs with one carry scan and reduced mod p with the
2^256 / 2^512 split-fold (two Montgomery multiplies by precomputed
constants).  Everything is exact integer arithmetic end to end, so results
are bit-identical to the host reference on every backend (CPU tests run
the same code through XLA:CPU f32 matmuls).

Montgomery form passes through untouched: inputs are x*R, the DFT matrix is
plain root powers, so outputs are (X*R) -- still Montgomery.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from . import limb_field as lf
from .limb_field import FR

_Q = params.FR_MODULUS

_MAX_RADIX = 256  # contraction length cap for exact f32 accumulation

# Byte planes per Fr element: 16 u16 limbs -> 32 bytes.
_P = 2 * FR.n_limbs
# Byte positions of the reassembled product: 2^518 needs 65 bytes; the
# carry scan runs over a few spare columns so the final carry is zero.
_NB = 2 * _P + 4

# Split-fold constants: value = A + 2^256*B + 2^512*C (raw 16-limb chunks);
# mont_mul(B, K1) = B * 2^256 mod p since K1 = 2^256 * R mod p.
_K1 = lf.int_to_limbs((1 << 256) * FR.R % _Q, FR.n_limbs)
_K2 = lf.int_to_limbs((1 << 512) * FR.R % _Q, FR.n_limbs)


def _factor(n: int) -> list[int]:
    """Split n = 2^L into the fewest radices <= 256, sizes balanced."""
    log_n = n.bit_length() - 1
    if n <= _MAX_RADIX:
        return [n]
    k = -(-log_n // 8)  # passes needed
    base, rem = divmod(log_n, k)
    return [1 << (base + 1)] * rem + [1 << base] * (k - rem)


@functools.lru_cache(maxsize=None)
def _dft_matrix_bytes(m: int, root: int) -> np.ndarray:
    """[P*m, m] bfloat16 byte planes of W[k, j] = root^(k*j) mod q.

    Row index is (byte_plane, k) with the plane slowest, so a single matmul
    yields every (plane, out) pair."""
    w = np.ones((m, m), dtype=object)
    # column-wise pow: root^(k*j) = (root^k)^j, built with cumulative muls
    rk = 1
    for k in range(m):
        cur = 1
        for j in range(m):
            w[k, j] = cur
            cur = cur * rk % _Q
        rk = rk * root % _Q
    planes = np.zeros((_P, m, m), dtype=np.uint8)
    for p in range(_P):
        shift = 8 * p
        for k in range(m):
            for j in range(m):
                planes[p, k, j] = (w[k, j] >> shift) & 0xFF
    return planes.reshape(_P * m, m).astype(jnp.bfloat16)


@functools.lru_cache(maxsize=None)
def _glue_table(a: int, b: int, root: int) -> np.ndarray:
    """Montgomery [L, a, b] table of root^(j1*k2) (the 4-step twiddles)."""
    vals = []
    ra = 1
    for j1 in range(a):
        cur = 1
        for k2 in range(b):
            vals.append(cur)
            cur = cur * ra % _Q
        ra = ra * root % _Q
    # host-only encoding: plans may be first built under an active jit
    # trace (a device op there would yield that trace's tracer)
    return FR.to_mont_array_np(vals).reshape(FR.n_limbs, a, b)


def _mont_mul_lead(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """mont_mul for limb-LEADING tensors [L, ...] (lf wants limbs at -2)."""
    from . import pallas_field

    lead = x.shape[1:]
    xf = x.reshape(FR.n_limbs, -1)
    yf = jnp.broadcast_to(y, x.shape).reshape(FR.n_limbs, -1)
    if pallas_field._on_tpu():
        out = pallas_field.mont_mul_pallas(FR, xf, yf)
    else:
        out = jnp.swapaxes(
            lf.mont_mul(FR, jnp.swapaxes(xf[:, None, :], 0, 1),
                        jnp.swapaxes(yf[:, None, :], 0, 1)), 0, 1)
    return out.reshape((FR.n_limbs,) + lead)


def _fold_body(v):
    """Split-fold reduce [34, ...] raw u16 limbs -> [16, ...] mod p."""
    from . import pallas_field as pf

    lo = v[0:16]
    mid = v[16:32]
    hi = jnp.concatenate(
        [v[32:34], jnp.zeros((14,) + v.shape[1:], jnp.uint32)], axis=0)
    p_ints = [int(t) for t in FR.p_limbs]
    p_col = pf._const_col(p_ints, lo.ndim)
    for _ in range(2):  # lo < 2^256 < 3p: two conditional subtracts
        d, under = pf._sub_limbs(lo, p_ints)
        lo = jnp.where(under, lo, d)
    y = pf._add_k(FR, lo, pf._mont_mul_const_k(FR, mid, _K1, p_col), p_col)
    return pf._add_k(FR, y, pf._mont_mul_const_k(FR, hi, _K2, p_col), p_col)


def _fold_kernel(limbs_ref, out_ref):
    """Split-fold reduce: [34, M, B] raw u16 limbs -> [16, M, B] mod p."""
    out_ref[:] = _fold_body(limbs_ref[:])


def _carry_fold_kernel(d_ref, out_ref):
    """Fused carry + split-fold: [68, B] s32 byte columns -> [16, B] mod p.

    Replaces the XLA lax.scan carry (68 sequential HBM-bound steps) and
    the u16 repack with ONE pallas pass: the carry chain unrolls over
    registers inside the kernel, so the byte-product tensor is read from
    HBM exactly once (VERDICT r2 item 6: fold the NTT glue into the fold
    kernel)."""
    d = d_ref[:]
    carry = jnp.zeros_like(d[0])
    limbs = []
    for t in range(_NB // 2):
        v0 = d[2 * t] + carry
        v1 = d[2 * t + 1] + (v0 >> 8)
        carry = v1 >> 8
        limbs.append(((v0 & 0xFF) | ((v1 & 0xFF) << 8)).astype(jnp.uint32))
    out_ref[:] = _fold_body(jnp.stack(limbs))


def _fold_pallas(limbs: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """[34, M, B] -> [16, M, B] via the fused kernel (TPU hot path).

    The reduction is elementwise over (M, B), so the tensor is flattened to
    2D and tiled at a fixed 2048-lane block: every fold in every transform
    shares ONE kernel shape (one Mosaic compile) and the in-kernel CIOS
    temporaries stay well under the VMEM stack limit (3D m-major blocks
    were observed to OOM Mosaic's scoped allocation on v5e)."""
    from jax.experimental import pallas as pl

    _, m, b = limbs.shape
    flat = limbs.reshape(_NB // 2, m * b)
    total = flat.shape[-1]
    block = min(2048, max(128, -(-total // 128) * 128))
    if total % block:
        flat = jnp.pad(flat, [(0, 0), (0, block - total % block)])
    nb = flat.shape[-1] // block
    out = pl.pallas_call(
        _fold_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((_NB // 2, block), lambda i: (0, i))],
        out_specs=pl.BlockSpec((FR.n_limbs, block), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((FR.n_limbs, flat.shape[-1]),
                                       jnp.uint32),
        interpret=interpret,
    )(flat)
    return out[:, :m * b].reshape(FR.n_limbs, m, b)


def _fold_pallas_interpret(limbs: jnp.ndarray) -> jnp.ndarray:
    """Interpret-mode entry for CPU tests (tests/test_pallas_kernels.py)."""
    return _fold_pallas(limbs, interpret=True)


def _carry_fold_pallas(d: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """[68, M, B] s32 byte columns -> [16, M, B] mod p, one fused pass.

    Same fixed 2048-lane 2D tiling as `_fold_pallas` (one Mosaic compile
    shared by every transform size)."""
    from jax.experimental import pallas as pl

    _, m, b = d.shape
    flat = d.reshape(_NB, m * b)
    total = flat.shape[-1]
    block = min(2048, max(128, -(-total // 128) * 128))
    if total % block:
        flat = jnp.pad(flat, [(0, 0), (0, block - total % block)])
    nb = flat.shape[-1] // block
    out = pl.pallas_call(
        _carry_fold_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((_NB, block), lambda i: (0, i))],
        out_specs=pl.BlockSpec((FR.n_limbs, block), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((FR.n_limbs, flat.shape[-1]),
                                       jnp.uint32),
        interpret=interpret,
    )(flat)
    return out[:, :m * b].reshape(FR.n_limbs, m, b)


def _carry_fold_pallas_interpret(d: jnp.ndarray) -> jnp.ndarray:
    """Interpret-mode entry for CPU tests."""
    return _carry_fold_pallas(d, interpret=True)


def _dft_leaf(x: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Matmul DFT along the last axis.  x: [L, *lead, m] u32 Montgomery."""
    m = x.shape[-1]
    lead = x.shape[1:-1]
    bflat = int(np.prod(lead)) if lead else 1

    # bytes: [P, *lead, m] with plane p = 2*i + hi/lo of limb i
    b8 = jnp.stack([x & 0xFF, x >> 8], axis=1).reshape((_P,) + lead + (m,))

    if _P * m * _P * bflat > (1 << 28):
        # large transforms: the full C tensor is 1024x the data (tens of
        # GB at 2^19-scale batches) -- fori_loop the dot over b's byte
        # planes so peak memory is one [P*m, bflat] plane and the traced
        # graph stays small (unrolled chunks overflowed the remote-compile
        # request size limit at the 2^16-gate flagship scale)
        rhs3 = jnp.moveaxis(b8, -1, 1).reshape(_P, m, bflat) \
            .astype(jnp.bfloat16)

        def chunk_body(mm, d):
            plane = jax.lax.dynamic_index_in_dim(rhs3, mm, 0,
                                                 keepdims=False)
            c_m = jnp.dot(table, plane, preferred_element_type=jnp.float32)
            upd = c_m.reshape(_P, m, bflat).astype(jnp.int32)
            cur = jax.lax.dynamic_slice(d, (mm, 0, 0), (_P, m, bflat))
            return jax.lax.dynamic_update_slice(d, cur + upd, (mm, 0, 0))

        d = jax.lax.fori_loop(0, _P, chunk_body,
                              jnp.zeros((_NB, m, bflat), jnp.int32))
    else:
        rhs = jnp.moveaxis(b8, -1, 0).reshape(m, _P * bflat) \
            .astype(jnp.bfloat16)
        c = jnp.dot(table, rhs, preferred_element_type=jnp.float32)
        c = c.reshape(_P, m, _P, bflat).astype(jnp.int32)
        # anti-diagonal byte accumulation: D[t] = sum_{k+m'=t} C[k,:,m',:]
        d = jnp.zeros((_NB, m, bflat), jnp.int32)
        for mm in range(_P):
            d = d.at[mm:mm + _P].add(c[:, :, mm, :])

    from . import pallas_field

    if pallas_field._on_tpu():
        # fused carry + fold: one pallas pass straight from byte columns
        y = _carry_fold_pallas(d)                    # [16, m, bflat]
        y = jnp.swapaxes(y, 1, 2)                    # [16, bflat, m]
    else:
        # carry scan: s32 byte columns -> u16 limbs
        def carry_body(carry, col):
            v = col + carry
            return v >> 8, v & 0xFF

        _, bytes_out = jax.lax.scan(
            carry_body, jnp.zeros((m, bflat), jnp.int32), d)
        pairs = bytes_out.reshape(_NB // 2, 2, m, bflat)
        limbs = (pairs[:, 0] + (pairs[:, 1] << 8)).astype(jnp.uint32)
        # split-fold reduction mod p, limbs at -2 for the lf kernels
        lo = jnp.moveaxis(limbs[0:16], 0, -2)        # [m, 16, bflat]
        mid = jnp.moveaxis(limbs[16:32], 0, -2)
        hi = jnp.pad(limbs[32:], [(0, 16 - (_NB // 2 - 32)), (0, 0), (0, 0)])
        hi = jnp.moveaxis(hi, 0, -2)
        lo = lf._cond_sub_p(FR, lf._cond_sub_p(FR, lo))  # < 2^256 -> < p
        y = lf.add(FR, lo, lf.mont_mul(FR, mid, _K1))
        y = lf.add(FR, y, lf.mont_mul(FR, hi, _K2))
        y = jnp.transpose(y, (1, 2, 0))              # [16, bflat, m]
    return y.reshape((FR.n_limbs,) + lead + (m,))


class _Plan:
    """One Cooley-Tukey level: n = a * b with precomputed tables."""

    __slots__ = ("n", "leaf_table", "a", "b", "glue", "sub_b", "sub_a",
                 "_dev")

    def __init__(self, n: int, root: int, radices: list[int]):
        # tables are built as NUMPY: a plan can be first built inside
        # somebody else's jit trace (e.g. DistributedDomain._build under a
        # round program), and a table materialized with device ops there
        # would be that trace's tracer -- caching it in MXUTransform._cache
        # would leak it into every later trace.  The device LIFT of a numpy
        # constant, by contrast, is always a concrete array, so it is
        # cached after the first use (_lift): re-lifting per call paid a
        # full host->device table upload per eager transform, which on a
        # remote-attached TPU turned a 7ms 2^16 fft into seconds.
        self.n = n
        self._dev = {}
        if len(radices) == 1:
            self.leaf_table = _dft_matrix_bytes(n, root)
            self.a = self.b = self.glue = self.sub_b = self.sub_a = None
        else:
            self.leaf_table = None
            a = radices[0]
            b = n // a
            self.a, self.b = a, b
            self.glue = _glue_table(a, b, root)
            self.sub_b = _Plan(b, pow(root, a, _Q), radices[1:])
            self.sub_a = _Plan(a, pow(root, b, _Q), [a])

    def _lift(self, name: str) -> jnp.ndarray:
        """Device lift of a numpy table, cached ONLY when concrete.

        Eagerly applied transforms would otherwise re-upload every table
        per call (a full host->device transfer each -- seconds per 2^16
        fft on a remote-attached TPU); under a jit trace jnp.asarray
        returns that trace's tracer, which must not be cached (it would
        leak into every later trace) and costs nothing anyway -- the
        constant is baked into the compiled program."""
        dev = self._dev.get(name)
        if dev is None:
            dev = jnp.asarray(getattr(self, name))
            if not isinstance(dev, jax.core.Tracer):
                self._dev[name] = dev
        return dev

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """DFT along the last axis of [L, *lead, n]."""
        if self.n == 1:
            return x
        if self.leaf_table is not None:
            return _dft_leaf(x, self._lift("leaf_table"))
        a, b = self.a, self.b
        lead = x.shape[1:-1]
        # x[j], j = j1 + a*j2  ->  A[.., j1, j2]
        xa = jnp.swapaxes(x.reshape(x.shape[:-1] + (b, a)), -1, -2)
        xb = self.sub_b.apply(xa)                      # [.., j1, k2]
        glue = self._lift("glue").reshape(
            (FR.n_limbs,) + (1,) * len(lead) + (a, b))
        xb = _mont_mul_lead(xb, glue)
        xc = self.sub_a.apply(jnp.swapaxes(xb, -1, -2))  # [.., k2, k1]
        # X[k2 + b*k1]: row-major [k1, k2]
        return jnp.swapaxes(xc, -1, -2).reshape(x.shape[:-1] + (self.n,))


class MXUTransform:
    """Cached forward-or-inverse NTT of a fixed size along the last axis."""

    _cache: dict[tuple[int, int], "MXUTransform"] = {}

    def __new__(cls, n: int, root: int):
        key = (n, root)
        if key not in cls._cache:
            inst = super().__new__(cls)
            inst.plan = _Plan(n, root, _factor(n)) if n > 1 else None
            inst.n = n
            cls._cache[key] = inst
        return cls._cache[key]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [L, *lead, n] u32 Montgomery -> transformed along last axis."""
        if self.plan is None:
            return x
        return self.plan.apply(x)

    def apply_axis(self, x: jnp.ndarray, axis: int) -> jnp.ndarray:
        """Transform along `axis` (axis 0 = limbs is not allowed)."""
        if axis in (-1, x.ndim - 1):
            return self(x)
        y = jnp.moveaxis(x, axis, -1)
        return jnp.moveaxis(self(y), -1, axis)
