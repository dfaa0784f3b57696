"""Batched prime-field arithmetic on 16-bit-limb uint32 tensors.

TPU has no 64-bit integer multiplier; we use base-2^16 limbs so that limb
products fit exactly in uint32 and column accumulations stay well below 2^32
(<= 2*L*(2^16-1) pieces of < 2^16 each: < 2^22 for L <= 32).  Everything is
fixed-shape, branch-free, and exact.

Design notes (TPU + XLA):
  * The schoolbook product is ONE batched integer matmul: split the exact
    u32 outer product into 16-bit lo/hi pieces and contract them against a
    constant one-hot "column routing" tensor.  This maps onto the MXU/VPU
    instead of an unrolled shift-add chain, and keeps the traced graph tiny.
  * Carry/borrow propagation is inherently sequential; it runs as a
    `lax.scan` over the limb axis (3-op body, batch-wide vector steps), not
    an unrolled ripple -- XLA compile time stays linear in limb count.

Field elements live in Montgomery form (x*R mod p, R = 2^(16L)) in `[..., L]`
uint32 arrays.  The reference equivalents are the CIOS Montgomery kernels in
coset-bls12_381/src/scalar.rs:484-570 and fp.rs; we use the SOS (separated
operand scanning) formulation which vectorizes better.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import params

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(value: int, n_limbs: int) -> np.ndarray:
    return np.array(
        [(value >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n_limbs)],
        dtype=np.uint32,
    )


def limbs_to_int(limbs) -> int:
    out = 0
    for i, l in enumerate(np.asarray(limbs, dtype=np.uint64).tolist()):
        out |= int(l) << (LIMB_BITS * i)
    return out


@dataclass(frozen=True)
class FieldSpec:
    """Static parameters binding the limb kernels to one prime field."""

    name: str
    modulus: int
    n_limbs: int

    @functools.cached_property
    def R(self) -> int:
        return (1 << (LIMB_BITS * self.n_limbs)) % self.modulus

    @functools.cached_property
    def R2(self) -> int:
        return (self.R * self.R) % self.modulus

    @functools.cached_property
    def nprime(self) -> int:
        # -p^{-1} mod 2^(16L)
        return (-pow(self.modulus, -1, 1 << (LIMB_BITS * self.n_limbs))) % (
            1 << (LIMB_BITS * self.n_limbs)
        )

    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return int_to_limbs(self.modulus, self.n_limbs)

    @functools.cached_property
    def np_limbs(self) -> np.ndarray:
        return int_to_limbs(self.nprime, self.n_limbs)

    @functools.cached_property
    def r2_limbs(self) -> np.ndarray:
        return int_to_limbs(self.R2, self.n_limbs)

    @functools.cached_property
    def one_mont(self) -> np.ndarray:
        """1 in Montgomery form (= R mod p)."""
        return int_to_limbs(self.R % self.modulus, self.n_limbs)

    # ---- host <-> device conversion (canonical ints <-> Montgomery limbs) ----
    def to_mont_array(self, values) -> jnp.ndarray:
        """Encode canonical python ints as Montgomery limb tensor [len, L]."""
        arr = np.stack(
            [int_to_limbs((int(v) % self.modulus) * self.R % self.modulus, self.n_limbs)
             for v in values]
        )
        return jnp.asarray(arr)

    def from_mont_array(self, arr) -> list[int]:
        """Decode a Montgomery limb tensor back to canonical python ints."""
        host = np.asarray(jax.device_get(arr), dtype=np.uint64)
        rinv = pow(self.R, -1, self.modulus)
        flat = host.reshape(-1, self.n_limbs)
        out = [limbs_to_int(row) * rinv % self.modulus for row in flat]
        return out

    def to_raw_array(self, values) -> jnp.ndarray:
        """Encode canonical ints WITHOUT the Montgomery factor (for digits etc.)."""
        arr = np.stack([int_to_limbs(int(v) % self.modulus, self.n_limbs) for v in values])
        return jnp.asarray(arr)


FR = FieldSpec("Fr", params.FR_MODULUS, 16)
FQ = FieldSpec("Fq", params.FP_MODULUS, 24)
JUBJUB_FR = FieldSpec("JubjubFr", params.JUBJUB_FR_MODULUS, 16)


# =============================================================================
# Core kernels.  All take/return uint32 [..., L] tensors; `spec` is static.
# =============================================================================

def _mul_accum(a: jnp.ndarray, b, n_cols: int) -> jnp.ndarray:
    """Column accumulator of the schoolbook product a*b (no carry norm).

    a: [..., La] normalized 16-bit limbs; b: [..., Lb] tensor or a host
    np.uint32[Lb] constant vector.  Returns [..., n_cols] uint32 columns,
    each < 2^22 (sum of <= 2*min(La,Lb) pieces < 2^16).

    One lax.scan over b's limbs; each step adds the shifted partial product
    (lo/hi 16-bit pieces of a * b_j) into an [..., La+Lb] accumulator via a
    dynamic-slice window.  Intermediates stay operand-sized (no outer
    product) and the traced graph is constant in limb count.
    """
    if isinstance(b, np.ndarray):
        b = jnp.broadcast_to(jnp.asarray(b, dtype=jnp.uint32), a.shape)
    l_a = a.shape[-1]
    l_b = b.shape[-1]
    acc0 = jnp.zeros(a.shape[:-1] + (l_a + l_b,), dtype=jnp.uint32)
    zeros1 = jnp.zeros(a.shape[:-1] + (1,), dtype=jnp.uint32)

    def body(acc, j):
        bj = jax.lax.dynamic_index_in_dim(b, j, axis=b.ndim - 1,
                                          keepdims=True)
        p = a * bj  # exact: < 2^32
        contrib = (jnp.concatenate([p & LIMB_MASK, zeros1], axis=-1)
                   + jnp.concatenate([zeros1, p >> LIMB_BITS], axis=-1))
        window = jax.lax.dynamic_slice_in_dim(acc, j, l_a + 1, axis=acc.ndim - 1)
        acc = jax.lax.dynamic_update_slice_in_dim(
            acc, window + contrib, j, axis=acc.ndim - 1)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, jnp.arange(l_b))
    if n_cols > l_a + l_b:
        pad = [(0, 0)] * (acc.ndim - 1) + [(0, n_cols - l_a - l_b)]
        return jnp.pad(acc, pad)
    return acc[..., :n_cols]


def _carry16(acc: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Propagate carries over the last axis, producing n_out 16-bit limbs.

    acc columns must be < 2^31-ish; runs as a scan over the limb axis (the
    only inherently serial part of the arithmetic).
    """
    n_in = acc.shape[-1]
    if n_in < n_out:
        pad = [(0, 0)] * (acc.ndim - 1) + [(0, n_out - n_in)]
        acc = jnp.pad(acc, pad)
    cols = jnp.moveaxis(acc[..., :n_out], -1, 0)

    def body(carry, col):
        v = col + carry
        return v >> LIMB_BITS, v & LIMB_MASK

    _, outs = jax.lax.scan(body, jnp.zeros(acc.shape[:-1], jnp.uint32), cols)
    return jnp.moveaxis(outs, 0, -1)


def _borrow_sub(a: jnp.ndarray, b) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(a - b) limbwise with borrow scan; returns (diff, underflowed?).

    b may be a tensor of the same shape or a host constant limb vector.
    """
    if isinstance(b, np.ndarray):
        b = jnp.broadcast_to(jnp.asarray(b), a.shape)
    av = jnp.moveaxis(a, -1, 0).astype(jnp.int32)
    bv = jnp.moveaxis(b, -1, 0).astype(jnp.int32)

    def body(borrow, ab):
        x, y = ab
        v = x - y - borrow
        return (v >> LIMB_BITS) & 1, (v & LIMB_MASK).astype(jnp.uint32)

    borrow, outs = jax.lax.scan(body, jnp.zeros(a.shape[:-1], jnp.int32), (av, bv))
    return jnp.moveaxis(outs, 0, -1), borrow > 0


def _cond_sub_p(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Subtract p where a >= p (single reduction step)."""
    diff, under = _borrow_sub(a, spec.p_limbs)
    return jnp.where(under[..., None], a, diff)


@functools.partial(jax.jit, static_argnums=0)
def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p, both in the same (Montgomery or raw) domain."""
    s = _carry16(a + b, spec.n_limbs + 1)
    carry_set = s[..., spec.n_limbs] > 0
    body = s[..., : spec.n_limbs]
    diff, under = _borrow_sub(body, spec.p_limbs)
    # subtract p if the 2^(16L) bit is set or body >= p (at most one needed:
    # a, b < p so a + b < 2p < 2^(16L) + p)
    need = carry_set | ~under
    return jnp.where(need[..., None], diff, body)


@functools.partial(jax.jit, static_argnums=0)
def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p."""
    diff, under = _borrow_sub(a, b)
    # add p back where we underflowed
    padd_ = _carry16(diff + jnp.where(under[..., None],
                                      jnp.asarray(spec.p_limbs), jnp.uint32(0)),
                     spec.n_limbs)
    return jnp.where(under[..., None], padd_, diff)


@functools.partial(jax.jit, static_argnums=0)
def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """(-a) mod p (p - a, with -0 = 0)."""
    diff, _ = _borrow_sub(jnp.broadcast_to(jnp.asarray(spec.p_limbs), a.shape), a)
    return jnp.where(is_zero(spec, a)[..., None], jnp.zeros_like(a), diff)


def is_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def _mont_reduce(spec: FieldSpec, t_cols: jnp.ndarray) -> jnp.ndarray:
    """SOS Montgomery reduction of product columns (2L cols, each < 2^22)."""
    l = spec.n_limbs
    t = _carry16(t_cols, 2 * l)
    m = _carry16(_mul_accum(t[..., :l], spec.np_limbs, l), l)
    u = _mul_accum(m, spec.p_limbs, 2 * l + 1)
    u = u.at[..., : 2 * l].add(t)
    u = _carry16(u, 2 * l + 1)
    res = u[..., l: 2 * l]  # (t + m*p)/R < 2p fits in L limbs (2p < 2^(16L))
    return _cond_sub_p(spec, res)


@functools.partial(jax.jit, static_argnums=0)
def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod p (SOS: t=a*b; m=t*p' mod R; (t+mp)/R)."""
    return _mont_reduce(spec, _mul_accum(a, b, 2 * spec.n_limbs))


def mont_square(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


def mont_mul_const(spec: FieldSpec, a: jnp.ndarray, c_mont: np.ndarray) -> jnp.ndarray:
    """Montgomery product with a host-constant operand.

    Reuses the generic mont_mul kernel (one jit specialization per shape,
    not per constant -- the matmul formulation gains nothing from folding)."""
    c = jnp.broadcast_to(jnp.asarray(c_mont, dtype=jnp.uint32), a.shape)
    return mont_mul(spec, a, c)


def to_mont(spec: FieldSpec, a_raw: jnp.ndarray) -> jnp.ndarray:
    """Raw limbs -> Montgomery form (multiply by R2)."""
    return mont_mul_const(spec, a_raw, spec.r2_limbs)


def from_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical raw limbs (multiply by 1)."""
    one_raw = np.zeros(spec.n_limbs, dtype=np.uint32)
    one_raw[0] = 1
    return mont_mul_const(spec, a, one_raw)


def mont_pow(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e (Montgomery in/out) for a host-static exponent, square-and-multiply."""
    result = jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape).astype(jnp.uint32)
    base = a
    while e > 0:
        if e & 1:
            result = mont_mul(spec, result, base)
        e >>= 1
        if e:
            base = mont_square(spec, base)
    return result


def mont_inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Batched inversion via Fermat (a^(p-2)); zero maps to zero."""
    return mont_pow(spec, a, spec.modulus - 2)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask ? a : b with mask shaped [...] over limb tensors [..., L]."""
    return jnp.where(mask[..., None], a, b)
