"""Fused device evaluation of the PLONK quotient numerator.

Mirrors the pointwise gate + permutation terms of
plonk/src/proof_system/quotient_poly.rs:102-236 and the per-widget
compute_quotient_i formulas (proof_system/widget/*/proverkey.rs), evaluated
over the whole 8n coset domain as one jitted graph of limb-field ops on
[L, 8n] tensors.  Challenges enter as broadcast [L, 1] Montgomery columns.
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


@functools.lru_cache(maxsize=None)
def _const(v: int) -> np.ndarray:
    """[L, 1] Montgomery column for a small host constant."""
    return FR.const_mont(v % _Q)


def _mulc(a, v: int):
    return lf.mont_mul_const(FR, a, _const(v))


def _mul(a, b):
    return lf.mont_mul(FR, a, b)


def _add(a, b):
    return lf.add(FR, a, b)


def _sub(a, b):
    return lf.sub(FR, a, b)


def _bcast(col, like):
    return jnp.broadcast_to(col, like.shape)


def _delta(f):
    """f(f-1)(f-2)(f-3) (range/logic widget delta)."""
    one = jnp.asarray(_const(1))
    t = _mul(f, _sub(f, _bcast(one, f)))
    t = _mul(t, _sub(f, _bcast(jnp.asarray(_const(2)), f)))
    return _mul(t, _sub(f, _bcast(jnp.asarray(_const(3)), f)))


def _delta_xor_and(a, b, w, c, q_c):
    """Choice polynomial (logic/proverkey.rs delta_xor_and)."""
    sum_ab = _add(a, b)
    inner = _add(_sub(_mulc(w, 4), _mulc(sum_ab, 18)),
                 _bcast(jnp.asarray(_const(81)), w))
    sq = _add(_mul(a, a), _mul(b, b))
    f = _mul(w, _add(_sub(_add(_mul(w, inner), _mulc(sq, 18)),
                          _mulc(sum_ab, 81)),
                     _bcast(jnp.asarray(_const(83)), w)))
    e = _sub(_mulc(_add(sum_ab, c), 3), _mulc(f, 2))
    bb = _mul(q_c, _sub(_mulc(c, 9), _mulc(sum_ab, 3)))
    return _add(bb, e)


@jax.jit
def quotient_numerator(sel, wires, z, z_w, pi, l1_alpha_sq, linear, chals):
    """Numerator of the quotient over the 8n coset.

    sel: dict of selector/sigma eval tensors [L, 8n]
    wires: (a, b, c, d, a_w, b_w, d_w); z/z_w: grand product (+shift)
    pi: public-input evals; l1_alpha_sq: L1*alpha^2 evals
    linear: X evals over the coset; chals: dict of challenge columns [L, 1]
    """
    a, b, c, d, a_w, b_w, d_w = wires
    alpha, beta, gamma = chals["alpha"], chals["beta"], chals["gamma"]

    # -- arithmetic (widget/arithmetic/proverkey.rs:43-66) --------------------
    t_arith = _add(_mul(_mul(a, b), sel["q_m"]), _mul(a, sel["q_l"]))
    t_arith = _add(t_arith, _mul(b, sel["q_r"]))
    t_arith = _add(t_arith, _mul(c, sel["q_o"]))
    t_arith = _add(t_arith, _mul(d, sel["q_f"]))
    t_arith = _add(t_arith, sel["q_c"])
    total = _mul(t_arith, sel["q_arith"])

    # -- range (widget/range/proverkey.rs:31-66) -------------------------------
    r_sep = chals["range_sep"]
    kappa = _mul(r_sep, r_sep)
    k2 = _mul(kappa, kappa)
    k3 = _mul(k2, kappa)
    rng = _delta(_sub(c, _mulc(d, 4)))
    rng = _add(rng, _mul(_delta(_sub(b, _mulc(c, 4))), _bcast(kappa, a)))
    rng = _add(rng, _mul(_delta(_sub(a, _mulc(b, 4))), _bcast(k2, a)))
    rng = _add(rng, _mul(_delta(_sub(d_w, _mulc(a, 4))), _bcast(k3, a)))
    total = _add(total, _mul(_mul(rng, sel["q_range"]), _bcast(r_sep, a)))

    # -- logic (widget/logic/proverkey.rs:34-103) ------------------------------
    l_sep = chals["logic_sep"]
    kappa = _mul(l_sep, l_sep)
    k2 = _mul(kappa, kappa)
    k3 = _mul(k2, kappa)
    k4 = _mul(k3, kappa)
    a_sd = _sub(a_w, _mulc(a, 4))
    b_sd = _sub(b_w, _mulc(b, 4))
    d_sd = _sub(d_w, _mulc(d, 4))
    lg = _delta(a_sd)
    lg = _add(lg, _mul(_delta(b_sd), _bcast(kappa, a)))
    lg = _add(lg, _mul(_delta(d_sd), _bcast(k2, a)))
    lg = _add(lg, _mul(_sub(c, _mul(a_sd, b_sd)), _bcast(k3, a)))
    lg = _add(lg, _mul(_delta_xor_and(a_sd, b_sd, c, d_sd, sel["q_c"]),
                       _bcast(k4, a)))
    total = _add(total, _mul(_mul(sel["q_logic"], lg), _bcast(l_sep, a)))

    # -- fixed-base ECC (widget/ecc/scalar_mul/fixed_base/proverkey.rs:30-110) --
    f_sep = chals["fixed_sep"]
    kappa = _mul(f_sep, f_sep)
    k2 = _mul(kappa, kappa)
    k3 = _mul(k2, kappa)
    x_beta, y_beta = sel["q_l"], sel["q_r"]
    bit = _sub(_sub(d_w, d), d)
    one = _bcast(jnp.asarray(_const(1)), a)
    bit_consistency = _mul(_mul(bit, _sub(bit, one)), _add(bit, one))
    y_alpha = _add(_mul(_mul(bit, bit), _sub(y_beta, one)), one)
    x_alpha = _mul(bit, x_beta)
    xy_consistency = _mul(_sub(_mul(bit, sel["q_c"]), c), _bcast(kappa, a))
    exd = _mulc(_mul(a, b), params.JUBJUB_D)
    x_lhs = _add(a_w, _mul(_mul(a_w, c), exd))
    x_rhs = _add(_mul(a, y_alpha), _mul(b, x_alpha))
    x_acc = _mul(_sub(x_lhs, x_rhs), _bcast(k2, a))
    y_lhs = _sub(b_w, _mul(_mul(b_w, c), exd))
    y_rhs = _add(_mul(b, y_alpha), _mul(a, x_alpha))
    y_acc = _mul(_sub(y_lhs, y_rhs), _bcast(k3, a))
    fixed = _add(_add(bit_consistency, x_acc), _add(y_acc, xy_consistency))
    total = _add(total, _mul(_mul(fixed, sel["q_fixed_group_add"]),
                             _bcast(f_sep, a)))

    # -- variable-base ECC (widget/ecc/curve_addition/proverkey.rs:31-90) ------
    v_sep = chals["var_sep"]
    kappa = _mul(v_sep, v_sep)
    x1, x3, y1, y3 = a, a_w, b, b_w
    x2, y2, x1y2 = c, d, d_w
    xy_consistency = _sub(_mul(x1, y2), x1y2)
    y1x2 = _mul(y1, x2)
    mix = _mulc(_mul(x1y2, y1x2), params.JUBJUB_D)
    x3_lhs = _add(x1y2, y1x2)
    x3_rhs = _add(x3, _mul(x3, mix))
    x3_c = _mul(_sub(x3_lhs, x3_rhs), _bcast(kappa, a))
    y3_lhs = _add(_mul(y1, y2), _mul(x1, x2))
    y3_rhs = _sub(y3, _mul(y3, mix))
    y3_c = _mul(_sub(y3_lhs, y3_rhs), _bcast(_mul(kappa, kappa), a))
    var = _add(xy_consistency, _add(x3_c, y3_c))
    total = _add(total, _mul(_mul(var, sel["q_variable_group_add"]),
                             _bcast(v_sep, a)))

    # -- public inputs ----------------------------------------------------------
    total = _add(total, pi)

    # -- permutation (widget/permutation/proverkey.rs:31-140) -------------------
    bx = _mul(_bcast(beta, a), linear)
    identity = _mul(_add(_add(a, bx), _bcast(gamma, a)),
                    _add(_add(b, _mulc(bx, params.K1)), _bcast(gamma, a)))
    identity = _mul(identity, _add(_add(c, _mulc(bx, params.K2)),
                                   _bcast(gamma, a)))
    identity = _mul(identity, _add(_add(d, _mulc(bx, params.K3)),
                                   _bcast(gamma, a)))
    identity = _mul(_mul(identity, z), _bcast(alpha, a))
    copy = _mul(_add(_add(a, _mul(_bcast(beta, a), sel["s_sigma_1"])),
                     _bcast(gamma, a)),
                _add(_add(b, _mul(_bcast(beta, a), sel["s_sigma_2"])),
                     _bcast(gamma, a)))
    copy = _mul(copy, _add(_add(c, _mul(_bcast(beta, a), sel["s_sigma_3"])),
                           _bcast(gamma, a)))
    copy = _mul(copy, _add(_add(d, _mul(_bcast(beta, a), sel["s_sigma_4"])),
                           _bcast(gamma, a)))
    copy = _mul(_mul(copy, z_w), _bcast(alpha, a))
    one_check = _mul(_sub(z, one), l1_alpha_sq)
    total = _add(total, _add(_sub(identity, copy), one_check))
    return total


@jax.jit
def pointwise_divide(numerator, v_h_inv):
    """quotient = numerator * Z_H^-1 pointwise (quotient_poly.rs:86-95)."""
    return lf.mont_mul(FR, numerator, v_h_inv)
