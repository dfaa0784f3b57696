"""Batched prime-field arithmetic on 16-bit-limb uint32 tensors.

TPU has no 64-bit integer multiplier; we use base-2^16 limbs so that limb
products fit exactly in uint32 and column accumulations stay well below 2^32
(<= 2*L*(2^16-1)^... < 2^22 for L <= 32).  Everything is fixed-shape,
branch-free, and exact -- XLA fuses the elementwise chains onto the VPU.

Field elements live in Montgomery form (x*R mod p, R = 2^(16L)) in `[..., L]`
uint32 arrays.  The reference equivalents are the CIOS Montgomery kernels in
coset-bls12_381/src/scalar.rs:484-570 and fp.rs; we use the SOS (separated
operand scanning) formulation which vectorizes better.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

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

def _carry16(acc: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Propagate carries over the last axis, producing n_out 16-bit limbs.

    acc columns must be < 2^31 - slack; runs an unrolled dependent chain of
    cheap vector ops (the only serial part of the arithmetic).
    """
    n_in = acc.shape[-1]
    outs = []
    carry = jnp.zeros(acc.shape[:-1], dtype=jnp.uint32)
    for k in range(n_out):
        v = (acc[..., k] if k < n_in else jnp.zeros_like(carry)) + carry
        outs.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(outs, axis=-1)


def _mul_accum(a: jnp.ndarray, b_limbs, n_cols: int) -> jnp.ndarray:
    """Column accumulator of the schoolbook product a*b (no carry norm).

    a: [..., L] normalized 16-bit limbs; b_limbs: [..., L] tensor or a host
    np.uint32[L] constant vector. Returns [..., n_cols] uint32 columns where
    column k = sum_{i+j=k} (lo16 of a_i*b_j) + sum_{i+j=k-1} (hi16 of a_i*b_j).
    """
    L = a.shape[-1]
    is_const = isinstance(b_limbs, np.ndarray)
    acc = jnp.zeros(a.shape[:-1] + (n_cols,), dtype=jnp.uint32)
    pad_cfg = [(0, 0)] * (a.ndim - 1)
    for j in range(L):
        bj = int(b_limbs[j]) if is_const else b_limbs[..., j : j + 1]
        if is_const and bj == 0:
            continue
        p = a * bj  # exact: < 2^32
        lo = p & LIMB_MASK
        hi = p >> LIMB_BITS
        # shifted accumulate via pad (XLA fuses this far better than scatter)
        w_lo = min(L, n_cols - j)
        if w_lo > 0:
            acc = acc + jnp.pad(lo[..., :w_lo], pad_cfg + [(j, n_cols - j - w_lo)])
        w_hi = min(L, n_cols - j - 1)
        if w_hi > 0:
            acc = acc + jnp.pad(hi[..., :w_hi], pad_cfg + [(j + 1, n_cols - j - 1 - w_hi)])
    return acc


def _geq(a: jnp.ndarray, b_const: np.ndarray) -> jnp.ndarray:
    """a >= b (b a host constant limb vector), elementwise over batch."""
    # compare from most significant limb down
    L = a.shape[-1]
    gt = jnp.zeros(a.shape[:-1], dtype=jnp.bool_)
    eq = jnp.ones(a.shape[:-1], dtype=jnp.bool_)
    for k in range(L - 1, -1, -1):
        bk = int(b_const[k])
        gt = gt | (eq & (a[..., k] > bk))
        eq = eq & (a[..., k] == bk)
    return gt | eq


def _sub_const(a: jnp.ndarray, b_const: np.ndarray) -> jnp.ndarray:
    """a - b mod 2^(16L) for a host constant b (no underflow handling)."""
    L = a.shape[-1]
    outs = []
    borrow = jnp.zeros(a.shape[:-1], dtype=jnp.int32)
    for k in range(L):
        v = a[..., k].astype(jnp.int32) - int(b_const[k]) + borrow
        outs.append((v & LIMB_MASK).astype(jnp.uint32))
        borrow = v >> LIMB_BITS  # arithmetic shift: 0 or -1
    return jnp.stack(outs, axis=-1)


def _cond_sub_p(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Subtract p where a >= p (single reduction step)."""
    need = _geq(a, spec.p_limbs)
    return jnp.where(need[..., None], _sub_const(a, spec.p_limbs), a)


@functools.partial(jax.jit, static_argnums=0)
def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p, both in the same (Montgomery or raw) domain."""
    s = _carry16(a + b, spec.n_limbs + 1)
    # if the 2^(16L) carry limb is set, or s >= p, subtract p. a,b < p so
    # a+b < 2p < 2^(16L)+p -> at most one subtraction; fold carry into compare.
    carry_set = s[..., spec.n_limbs] > 0
    body = s[..., : spec.n_limbs]
    need = carry_set | _geq(body, spec.p_limbs)
    return jnp.where(need[..., None], _sub_const(body, spec.p_limbs), body)


@functools.partial(jax.jit, static_argnums=0)
def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p."""
    L = spec.n_limbs
    outs = []
    borrow = jnp.zeros(a.shape[:-1], dtype=jnp.int32)
    for k in range(L):
        v = a[..., k].astype(jnp.int32) - b[..., k].astype(jnp.int32) + borrow
        outs.append((v & LIMB_MASK).astype(jnp.uint32))
        borrow = v >> LIMB_BITS
    d = jnp.stack(outs, axis=-1)
    underflow = borrow < 0
    # add p back where we underflowed
    outs2 = []
    carry = jnp.zeros(a.shape[:-1], dtype=jnp.uint32)
    pl = spec.p_limbs
    for k in range(L):
        v = d[..., k] + jnp.where(underflow, jnp.uint32(int(pl[k])), jnp.uint32(0)) + carry
        outs2.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(outs2, axis=-1)


@functools.partial(jax.jit, static_argnums=0)
def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """(-a) mod p (p - a, with -0 = 0)."""
    is_zero_mask = is_zero(spec, a)
    d = _sub_const_rev(spec, a)
    return jnp.where(is_zero_mask[..., None], jnp.zeros_like(a), d)


def _sub_const_rev(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """p - a for a < p."""
    L = spec.n_limbs
    outs = []
    borrow = jnp.zeros(a.shape[:-1], dtype=jnp.int32)
    for k in range(L):
        v = int(spec.p_limbs[k]) - a[..., k].astype(jnp.int32) + borrow
        outs.append((v & LIMB_MASK).astype(jnp.uint32))
        borrow = v >> LIMB_BITS
    return jnp.stack(outs, axis=-1)


def is_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


@functools.partial(jax.jit, static_argnums=0)
def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod p (SOS: t=a*b; m=t*p' mod R; (t+mp)/R)."""
    L = spec.n_limbs
    t = _carry16(_mul_accum(a, b, 2 * L), 2 * L)
    m = _carry16(_mul_accum(t[..., :L], spec.np_limbs, L), L)
    u = _mul_accum(m, spec.p_limbs, 2 * L + 1)
    u = u.at[..., : 2 * L].add(t)
    u = _carry16(u, 2 * L + 1)
    res = u[..., L : 2 * L]  # (t + m*p)/R < 2p fits in L limbs (2p < 2^(16L))
    return _cond_sub_p(spec, res)


def mont_square(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _mont_mul_const_impl(spec: FieldSpec, a: jnp.ndarray, c_tuple: tuple) -> jnp.ndarray:
    c_mont = np.array(c_tuple, dtype=np.uint32)
    L = spec.n_limbs
    t = _carry16(_mul_accum(a, c_mont, 2 * L), 2 * L)
    m = _carry16(_mul_accum(t[..., :L], spec.np_limbs, L), L)
    u = _mul_accum(m, spec.p_limbs, 2 * L + 1)
    u = u.at[..., : 2 * L].add(t)
    u = _carry16(u, 2 * L + 1)
    return _cond_sub_p(spec, u[..., L : 2 * L])


def mont_mul_const(spec: FieldSpec, a: jnp.ndarray, c_mont: np.ndarray) -> jnp.ndarray:
    """Montgomery product with a host-constant operand (folds limb constants)."""
    return _mont_mul_const_impl(spec, a, tuple(int(x) for x in c_mont))


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
