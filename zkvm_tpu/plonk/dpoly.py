"""Device-resident polynomial helpers for the prover hot path.

Round 1 of this port converted host `Polynomial` lists to device tensors and
back inside every prover round; this module holds the round-2 redesign where
wires/z/t/selectors live across rounds as `[16, len]` uint32 Montgomery
tensors (limb-major: limbs on sublanes, coefficients on vector lanes) and
the only host round trips are the transcript scalars and commitment points.

Key primitives (all exact mod-p integer math, jit-cached per shape):

  * `powers_device`:  [1, z, z^2, ...] built with log2(m) doubling steps.
  * `eval_stack`:     batched Horner-free evaluation  p(z) = <coeffs, z^i>
                      via a pointwise multiply + binary reduction tree --
                      replaces the reference's serial Horner
                      (plonk/src/fft/polynomial.rs evaluate) which cannot
                      parallelize on a vector machine.
  * `ruffini_device`: synthetic division by (X - z) re-expressed as
                      q_i = z^-(i+1) * sum_{j>i} c_j z^j  -- a reversed
                      prefix sum instead of the serial recurrence
                      (fft/polynomial.rs:343).
  * `lin_comb`:       sum_i k_i * p_i with host-constant k_i.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import Fr
from ..ops import limb_field as lf
from ..ops.limb_field import FR

_Q = Fr.MODULUS


def to_device(values, size: int) -> jnp.ndarray:
    """Host Fr/int list -> [16, size] Montgomery tensor (zero-padded)."""
    vals = [v.value if isinstance(v, Fr) else int(v) for v in values]
    assert len(vals) <= size
    return FR.to_mont_array(vals + [0] * (size - len(vals)))


def from_device(tensor) -> list[Fr]:
    """[16, m] Montgomery tensor -> host Fr list."""
    return [Fr(v) for v in FR.from_mont_array(tensor)]


def const_col(value: int) -> jnp.ndarray:
    """[16, 1] Montgomery column for a host scalar."""
    return jnp.asarray(FR.const_mont(value % _Q))


@functools.partial(jax.jit, static_argnums=(1,))
def powers_device(z_col: jnp.ndarray, m: int) -> jnp.ndarray:
    """[16, m] table of z^0 .. z^(m-1) (log2 m Montgomery doubling steps)."""
    out = jnp.asarray(FR.const_mont(1))
    p = z_col
    while out.shape[-1] < m:
        nxt = lf.mont_mul(FR, out, jnp.broadcast_to(p, out.shape))
        out = jnp.concatenate([out, nxt], axis=-1)
        p = lf.mont_mul(FR, p, p)
    return out[:, :m]


@jax.jit
def _eval_stack_impl(stack: jnp.ndarray, pw: jnp.ndarray) -> jnp.ndarray:
    """stack [S, 16, m] * pw [16, m] summed over lanes -> [S, 16, 1]."""
    t = lf.mont_mul(FR, stack, jnp.broadcast_to(pw[None], stack.shape))
    m = t.shape[-1]
    while m > 1:
        if m % 2:
            t = jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(0, 1)])
            m += 1
        m //= 2
        t = lf.add(FR, t[..., :m], t[..., m:])
    return t


def eval_stack(stack: jnp.ndarray, z: Fr) -> list[Fr]:
    """Evaluate S stacked polynomials [S, 16, m] at z; returns S host Fr."""
    pw = powers_device(const_col(z.value), stack.shape[-1])
    out = _eval_stack_impl(stack, pw)
    return from_device(jnp.moveaxis(out[..., 0], 1, 0))


@jax.jit
def _ruffini_impl(coeffs: jnp.ndarray, pw: jnp.ndarray,
                  ipw: jnp.ndarray) -> jnp.ndarray:
    t = lf.mont_mul(FR, coeffs, pw)
    suf = jax.lax.associative_scan(
        lambda a, b: lf.add(FR, a, b), t, axis=1, reverse=True)
    # q_i = z^-(i+1) * suffix_{i+1},  i = 0..m-2
    return lf.mont_mul(FR, suf[:, 1:], ipw)


def ruffini_device(coeffs: jnp.ndarray, z: Fr) -> jnp.ndarray:
    """[16, m] coeffs -> [16, m-1] quotient of division by (X - z).

    Requires z != 0 (Fiat-Shamir challenges never are; the reference's
    serial recurrence fft/polynomial.rs:343 is the z == 0 fallback)."""
    m = coeffs.shape[-1]
    if z.is_zero():  # degenerate: q_i = c_{i+1}
        return coeffs[:, 1:]
    pw = powers_device(const_col(z.value), m)
    inv_z = pow(z.value, -1, _Q)
    ipw = lf.mont_mul_const(FR, powers_device(const_col(inv_z), m - 1),
                            FR.const_mont(inv_z))
    return _ruffini_impl(coeffs, pw, ipw)


def lin_comb(tensors_and_scalars, size: int) -> jnp.ndarray:
    """sum_i k_i * p_i over device tensors with host Fr scalars k_i.

    Tensors may have different lengths; all are padded to `size`."""
    acc = None
    for tensor, k in tensors_and_scalars:
        kv = k.value if isinstance(k, Fr) else int(k) % _Q
        if kv == 0:
            continue
        t = jnp.pad(tensor, [(0, 0), (0, size - tensor.shape[-1])])
        term = t if kv == 1 else lf.mont_mul_const(FR, t, FR.const_mont(kv))
        acc = term if acc is None else lf.add(FR, acc, term)
    if acc is None:
        return jnp.zeros((FR.n_limbs, size), jnp.uint32)
    return acc


def apply_blinders_device(rng, coeffs: jnp.ndarray,
                          hiding_degree: int) -> jnp.ndarray:
    """Device analogue of the reference's blind_poly tail
    (compiler/prover.rs:64-83): coeffs[i] -= b_i and append b_i, drawing
    blinders in the exact same rng order as the host path."""
    blinders = [Fr.random(rng) for _ in range(hiding_degree + 1)]
    b_col = to_device(blinders, hiding_degree + 1)
    low = lf.sub(FR, coeffs[:, : hiding_degree + 1], b_col)
    return jnp.concatenate([low, coeffs[:, hiding_degree + 1:], b_col],
                           axis=-1)
