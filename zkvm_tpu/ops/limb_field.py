"""Batched prime-field arithmetic on 16-bit-limb uint32 tensors.

TPU has no 64-bit integer multiplier; we use base-2^16 limbs so that limb
products fit exactly in uint32 and column accumulations stay well below 2^32
(<= 2*L*(2^16-1) pieces of < 2^16 each: < 2^22 for L <= 32).  Everything is
fixed-shape, branch-free, and exact.

LAYOUT (TPU-critical): element batches are stored LIMB-MAJOR -- shape
`[..., L, B]` with the limb axis second-to-last (sublanes, L = 16/24 are
multiples of the 8-row tile) and the batch axis last (128-wide vector
lanes).  A batch-major `[..., B, L]` layout wastes 8x lane width and
tile-pads every intermediate (fatal at large batches).

Design notes (XLA):
  * The schoolbook product accumulates shifted partial products under a
    lax.scan over the second operand's limbs -- intermediates stay
    operand-sized and the traced graph is constant in limb count.
  * Carry/borrow propagation is inherently sequential; it also runs as a
    lax.scan over the limb axis (3-op body, batch-wide vector steps).

Field elements live in Montgomery form (x*R mod p, R = 2^(16L)).  The
reference equivalents are the CIOS Montgomery kernels in
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

_AXIS = -2  # the limb axis


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
        """Encode canonical python ints as a Montgomery limb tensor [L, N].

        Limb packing is vectorized through the byte encoding; the Montgomery
        factor is applied with ONE device multiply (to_mont) instead of a
        per-element host bigint multiply."""
        return to_mont(self, self.to_raw_array(values))

    def from_mont_array(self, arr) -> list[int]:
        """Decode a Montgomery limb tensor [..., L, N] to canonical ints
        (flattened batch-major: all leading axes then N)."""
        raw = from_mont(self, arr)
        host = np.asarray(jax.device_get(raw), dtype=np.uint16)
        flat = np.moveaxis(host, -2, -1).reshape(-1, self.n_limbs)
        nbytes = 2 * self.n_limbs
        blob = flat.astype("<u2").tobytes()
        return [int.from_bytes(blob[i * nbytes: (i + 1) * nbytes], "little")
                for i in range(flat.shape[0])]

    def to_raw_array(self, values) -> jnp.ndarray:
        """Encode canonical ints WITHOUT the Montgomery factor."""
        nbytes = 2 * self.n_limbs
        buf = b"".join((int(v) % self.modulus).to_bytes(nbytes, "little")
                       for v in values)
        raw = np.frombuffer(buf, dtype="<u2").reshape(len(values),
                                                      self.n_limbs)
        return jnp.asarray(raw.T.astype(np.uint32))

    def to_mont_array_np(self, values) -> np.ndarray:
        """Pure-host Montgomery encoding [L, N] (numpy, no device ops).

        For building constant tables that may be assembled while some other
        program is being traced (a jnp op there would return that trace's
        tracer); the Montgomery factor is folded with host bigints.
        """
        q, r = self.modulus, self.R
        nbytes = 2 * self.n_limbs
        buf = b"".join((int(v) % q * r % q).to_bytes(nbytes, "little")
                       for v in values)
        raw = np.frombuffer(buf, dtype="<u2").reshape(len(values),
                                                      self.n_limbs)
        return np.ascontiguousarray(raw.T.astype(np.uint32))

    def const_mont(self, value: int) -> np.ndarray:
        """[L, 1] Montgomery limb column for a host constant."""
        return int_to_limbs(value % self.modulus * self.R % self.modulus,
                            self.n_limbs)[:, None]


FR = FieldSpec("Fr", params.FR_MODULUS, 16)
FQ = FieldSpec("Fq", params.FP_MODULUS, 24)
JUBJUB_FR = FieldSpec("JubjubFr", params.JUBJUB_FR_MODULUS, 16)


# =============================================================================
# Core kernels.  All take/return uint32 [..., L, B] tensors; `spec` static.
# =============================================================================

def _limb(t: jnp.ndarray, j) -> jnp.ndarray:
    """Select limb j (possibly traced) keeping the axis: [..., 1, B]."""
    return jax.lax.dynamic_slice_in_dim(t, j, 1, axis=t.ndim + _AXIS)




def _carry16(acc: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Propagate carries along the limb axis, producing n_out 16-bit limbs."""
    n_in = acc.shape[_AXIS]
    if n_in < n_out:
        pad = [(0, 0)] * (acc.ndim - 2) + [(0, n_out - n_in), (0, 0)]
        acc = jnp.pad(acc, pad)
    cols = jnp.moveaxis(acc[..., :n_out, :], _AXIS, 0)

    def body(carry, col):
        v = col + carry
        return v >> LIMB_BITS, v & LIMB_MASK

    carry0 = jnp.zeros(cols.shape[1:], jnp.uint32)
    _, outs = jax.lax.scan(body, carry0, cols)
    return jnp.moveaxis(outs, 0, _AXIS)


def _borrow_sub(a: jnp.ndarray, b) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(a - b) limbwise with borrow scan; returns (diff, underflowed?)."""
    if isinstance(b, np.ndarray):
        b = jnp.broadcast_to(jnp.asarray(b)[:, None], a.shape)
    av = jnp.moveaxis(a, _AXIS, 0).astype(jnp.int32)
    bv = jnp.moveaxis(b, _AXIS, 0).astype(jnp.int32)

    def body(borrow, ab):
        x, y = ab
        v = x - y - borrow
        return (v >> LIMB_BITS) & 1, (v & LIMB_MASK).astype(jnp.uint32)

    borrow0 = jnp.zeros(av.shape[1:], jnp.int32)
    borrow, outs = jax.lax.scan(body, borrow0, (av, bv))
    return jnp.moveaxis(outs, 0, _AXIS), borrow > 0


def _cond_sub_p(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Subtract p where a >= p (single reduction step)."""
    diff, under = _borrow_sub(a, spec.p_limbs)
    return jnp.where(under[..., None, :], a, diff)


@functools.partial(jax.jit, static_argnums=0)
def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p, both in the same (Montgomery or raw) domain."""
    s = _carry16(a + b, spec.n_limbs + 1)
    carry_set = s[..., spec.n_limbs, :] > 0
    body = s[..., : spec.n_limbs, :]
    diff, under = _borrow_sub(body, spec.p_limbs)
    # subtract p if the 2^(16L) bit is set or body >= p (at most one needed:
    # a, b < p so a + b < 2p < 2^(16L) + p)
    need = carry_set | ~under
    return jnp.where(need[..., None, :], diff, body)


@functools.partial(jax.jit, static_argnums=0)
def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p."""
    diff, under = _borrow_sub(a, b)
    p_col = jnp.asarray(spec.p_limbs)[:, None]
    padd_ = _carry16(diff + jnp.where(under[..., None, :], p_col,
                                      jnp.uint32(0)),
                     spec.n_limbs)
    return jnp.where(under[..., None, :], padd_, diff)


@functools.partial(jax.jit, static_argnums=0)
def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """(-a) mod p (p - a, with -0 = 0)."""
    p_full = jnp.broadcast_to(jnp.asarray(spec.p_limbs)[:, None], a.shape)
    diff, _ = _borrow_sub(p_full, a)
    return jnp.where(is_zero(spec, a)[..., None, :], jnp.zeros_like(a), diff)


def is_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=_AXIS)


@functools.partial(jax.jit, static_argnums=0)
def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod p, CIOS formulation.

    One lax.scan over b's limbs with an [..., L+1, B] carried accumulator of
    unnormalized u32 columns.  Per step: add the lo/hi pieces of a*b_j, fold
    in m*p with m = (-p^-1 * acc_0) mod 2^16 (kills the low limb), then
    shift down one limb.  Column magnitudes stay < ~L*2^18 < 2^31, so no
    per-step carry propagation is needed; the accumulator is carried through
    the scan with static-slice updates (aliased in place by XLA -- no
    operand-sized copies, unlike an SOS double-width accumulator).
    """
    l = spec.n_limbs
    np0 = int(spec.nprime & LIMB_MASK)  # -p^{-1} mod 2^16
    p_col = jnp.asarray(spec.p_limbs)[:, None]  # [L, 1]
    if isinstance(b, np.ndarray):
        b = jnp.broadcast_to(jnp.asarray(b, dtype=jnp.uint32)[:, None],
                             a.shape)
    acc0 = jnp.zeros(a.shape[:-2] + (l + 1,) + a.shape[-1:], dtype=jnp.uint32)
    zeros1 = jnp.zeros(a.shape[:-2] + (1,) + a.shape[-1:], dtype=jnp.uint32)

    def body(acc, j):
        bj = _limb(b, j)
        pa = a * bj  # exact: both operands < 2^16
        acc = acc.at[..., :l, :].add(pa & LIMB_MASK)
        acc = acc.at[..., 1: l + 1, :].add(pa >> LIMB_BITS)
        m = ((acc[..., 0:1, :] & LIMB_MASK) * np0) & LIMB_MASK
        mp = m * p_col  # [..., L, B], exact
        acc = acc.at[..., :l, :].add(mp & LIMB_MASK)
        acc = acc.at[..., 1: l + 1, :].add(mp >> LIMB_BITS)
        carry0 = acc[..., 0:1, :] >> LIMB_BITS  # low 16 bits are zero now
        acc = jnp.concatenate([acc[..., 1:, :], zeros1], axis=_AXIS)
        acc = acc.at[..., 0:1, :].add(carry0)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, jnp.arange(l))
    # result = acc as integer, < 2p; normalize then single conditional subtract
    s = _carry16(acc, l + 1)
    carry_set = s[..., l, :] > 0
    body_limbs = s[..., :l, :]
    diff, under = _borrow_sub(body_limbs, spec.p_limbs)
    need = carry_set | ~under
    return jnp.where(need[..., None, :], diff, body_limbs)


def mont_square(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


def mont_mul_const(spec: FieldSpec, a: jnp.ndarray, c_mont: np.ndarray) -> jnp.ndarray:
    """Montgomery product with a host-constant operand (same kernel; one jit
    specialization per shape, not per constant)."""
    c = c_mont[:, 0] if c_mont.ndim == 2 else c_mont
    cc = jnp.broadcast_to(jnp.asarray(c, dtype=jnp.uint32)[:, None], a.shape)
    return mont_mul(spec, a, cc)


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
    one_col = jnp.asarray(spec.one_mont)[:, None]
    result = jnp.broadcast_to(one_col, a.shape).astype(jnp.uint32)
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
    """mask ? a : b with mask shaped [..., B] over limb tensors [..., L, B]."""
    return jnp.where(mask[..., None, :], a, b)
