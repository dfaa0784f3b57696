"""Quotient polynomial builder (plonk/src/proof_system/quotient_poly.rs).

The hot loop: pointwise gate + permutation terms over the 8n coset domain,
divided by the vanishing polynomial, then a coset-iFFT.  The coset FFTs run
on device (zkvm_tpu.ops.ntt); the pointwise combine currently runs host-side
over canonical ints (exact) -- the fused device kernel replaces it on the
perf path.
"""

from __future__ import annotations

from ..fields import Fr
from ..ops.ntt import Domain, _batch_inverse
from .polynomial import Polynomial
from .widgets import ProverKey

_Q = Fr.MODULUS


def build_quotient_polynomial(domain: Domain, prover_key: ProverKey,
                              z_poly: Polynomial, wires, pi_poly: Polynomial,
                              challenges) -> Polynomial:
    (alpha, beta, gamma, range_ch, logic_ch, fixed_ch, var_ch) = challenges
    a_poly, b_poly, c_poly, d_poly = wires
    domain_8n = Domain(8 * domain.size)

    z_eval = [e.value for e in domain_8n.coset_fft(z_poly.coeffs)]
    a_eval = [e.value for e in domain_8n.coset_fft(a_poly.coeffs)]
    b_eval = [e.value for e in domain_8n.coset_fft(b_poly.coeffs)]
    c_eval = [e.value for e in domain_8n.coset_fft(c_poly.coeffs)]
    d_eval = [e.value for e in domain_8n.coset_fft(d_poly.coeffs)]
    # wrap-around of 8 for the shifted (X*omega) accesses (quotient_poly.rs:46)
    for i in range(8):
        z_eval.append(z_eval[i])
        a_eval.append(a_eval[i])
        b_eval.append(b_eval[i])
        d_eval.append(d_eval[i])

    pi_eval = [e.value for e in domain_8n.coset_fft(pi_poly.coeffs)]

    # L1 * alpha^2 over the 8n coset (quotient_poly.rs:195-236)
    l1_alpha = domain.ifft([Fr(alpha.value * alpha.value % _Q)]
                           + [Fr.zero()] * (domain.size - 1))
    l1_alpha_evals = [e.value for e in domain_8n.coset_fft(l1_alpha)]

    pk = prover_key
    al, be, ga = alpha.value, beta.value, gamma.value
    r_ch, l_ch, f_ch, v_ch = (range_ch.value, logic_ch.value,
                              fixed_ch.value, var_ch.value)
    size_8n = domain_8n.size
    numerator = []
    for i in range(size_8n):
        a, b, c, d = a_eval[i], b_eval[i], c_eval[i], d_eval[i]
        a_w, b_w, d_w = a_eval[i + 8], b_eval[i + 8], d_eval[i + 8]
        t = pk.arithmetic.compute_quotient_i(i, a, b, c, d)
        t += pk.range.compute_quotient_i(i, r_ch, a, b, c, d, d_w)
        t += pk.logic.compute_quotient_i(i, l_ch, a, a_w, b, b_w, c, d, d_w)
        t += pk.fixed_base.compute_quotient_i(i, f_ch, a, a_w, b, b_w, c, d, d_w)
        t += pk.variable_base.compute_quotient_i(i, v_ch, a, a_w, b, b_w, c,
                                                 d, d_w)
        t += pi_eval[i]
        t += pk.permutation.compute_quotient_i(
            i, a, b, c, d, z_eval[i], z_eval[i + 8], al, l1_alpha_evals[i],
            be, ga)
        numerator.append(t % _Q)

    denominators = _batch_inverse(
        [pk.v_h_coset_8n[i].value for i in range(size_8n)], _Q)
    quotient = [Fr(n * dinv % _Q) for n, dinv in zip(numerator, denominators)]
    return Polynomial(domain_8n.coset_ifft(quotient))
