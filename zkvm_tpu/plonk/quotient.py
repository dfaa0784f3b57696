"""Quotient polynomial builder (plonk/src/proof_system/quotient_poly.rs).

The hot loop -- pointwise gate + permutation terms over the 8n coset domain,
divided by the vanishing polynomial -- runs fully on device
(zkvm_tpu/ops/quotient_kernel.py) over [L, 8n] limb tensors: coset FFTs in,
one fused numerator graph, pointwise multiply by the precomputed Z_H^-1,
coset-iFFT out.  Selector/sigma coset evaluations are cached device-side on
the ProverKey after the first proof.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields import Fr
from ..ops import quotient_kernel as qk
from ..ops.limb_field import FR
from ..ops.ntt import Domain, _batch_inverse
from .polynomial import Polynomial
from .widgets import ProverKey

_Q = Fr.MODULUS

_SELECTOR_PAIRS = (("arithmetic", "q_m"), ("arithmetic", "q_l"),
                   ("arithmetic", "q_r"), ("arithmetic", "q_o"),
                   ("arithmetic", "q_f"), ("arithmetic", "q_c"),
                   ("arithmetic", "q_arith"), ("range", "q_range"),
                   ("logic", "q_logic"),
                   ("fixed_base", "q_fixed_group_add"),
                   ("variable_base", "q_variable_group_add"),
                   ("permutation", "s_sigma_1"), ("permutation", "s_sigma_2"),
                   ("permutation", "s_sigma_3"), ("permutation", "s_sigma_4"))


def _device_cache(pk: ProverKey):
    """Device-resident selector/sigma/Z_H^-1/linear tensors (built once)."""
    cache = getattr(pk, "_device_cache", None)
    if cache is not None:
        return cache
    sel = {}
    for fam, name in _SELECTOR_PAIRS:
        evals = getattr(getattr(pk, fam), name)[1]
        sel[name] = FR.to_mont_array([e.value for e in evals.evals])
    v_h_inv = FR.to_mont_array(
        _batch_inverse([e.value for e in pk.v_h_coset_8n.evals], _Q))
    linear = FR.to_mont_array(
        [e.value for e in pk.permutation.linear_evaluations.evals])
    cache = (sel, v_h_inv, linear)
    pk._device_cache = cache
    return cache


def _to_device_coeffs(poly: Polynomial, size: int) -> jnp.ndarray:
    vals = [c.value for c in poly.coeffs]
    vals += [0] * (size - len(vals))
    return FR.to_mont_array(vals)


def build_quotient_device(domain: Domain, prover_key: ProverKey,
                          z_dev, wires_dev, pi_dev, challenges,
                          mesh=None, axis: str | None = None):
    """Device-resident quotient: [16, len] Montgomery coefficient tensors in,
    [16, 8n] quotient coefficients out -- no host conversion anywhere.

    With `mesh`, the 8n coset transforms run as distributed 4-step NTTs
    (all_to_all over the mesh) and the pointwise numerator+divide shard over
    the evaluation axis -- the multi-chip replacement for the rayon hot loop
    at quotient_poly.rs:86-95."""
    (alpha, beta, gamma, range_ch, logic_ch, fixed_ch, var_ch) = challenges
    n = domain.size
    domain_8n = Domain(8 * n)
    size_8n = domain_8n.size
    sel, v_h_inv, linear = _device_cache(prover_key)

    from ..ops import limb_field as lf
    from ..ops.ntt_mxu import MXUTransform

    polys = tuple(wires_dev) + (z_dev, pi_dev)
    if mesh is not None:
        from ..ops.ntt_sharded import DistributedDomain

        dd8 = DistributedDomain(size_8n, mesh, axis)
        padded = [jnp.pad(p, [(0, 0), (0, size_8n - p.shape[-1])])
                  for p in polys]
        evals6 = [dd8.coset_fft_device(p) for p in padded]
        a8, b8, c8, d8, z8, pi8 = evals6
    else:
        # ONE batched coset FFT for all six polynomials (a, b, c, d, z, PI)
        stacked = jnp.stack(
            [jnp.pad(p, [(0, 0), (0, size_8n - p.shape[-1])])
             for p in polys], axis=1)  # [L, 6, 8n]
        coset = domain_8n._factor("coset")  # [L, 8n]
        shifted = lf.mont_mul(
            FR, stacked.reshape(FR.n_limbs, -1),
            jnp.tile(coset, (1, 6))).reshape(FR.n_limbs, 6, size_8n)
        fwd = MXUTransform(size_8n, domain_8n.group_gen)
        evals = fwd(shifted)  # [L, 6, 8n]
        a8, b8, c8, d8, z8, pi8 = (evals[:, i, :] for i in range(6))
    # shifted (X*omega) accesses: +8 with wrap-around == roll by -8
    # (quotient_poly.rs:46-59)
    a8w = jnp.roll(a8, -8, axis=-1)
    b8w = jnp.roll(b8, -8, axis=-1)
    d8w = jnp.roll(d8, -8, axis=-1)
    z8w = jnp.roll(z8, -8, axis=-1)

    # L1 * alpha^2 over the 8n coset (quotient_poly.rs:195-236)
    alpha_sq = alpha.value * alpha.value % _Q
    l1_vals = FR.to_mont_array([alpha_sq] + [0] * (n - 1))
    l1_coeffs = domain.ifft_device(l1_vals)
    l1_coeffs = jnp.pad(l1_coeffs, [(0, 0), (0, size_8n - n)])
    l1_8n = domain_8n.coset_fft_device(l1_coeffs)

    chals = {
        "alpha": jnp.asarray(FR.const_mont(alpha.value)),
        "beta": jnp.asarray(FR.const_mont(beta.value)),
        "gamma": jnp.asarray(FR.const_mont(gamma.value)),
        "range_sep": jnp.asarray(FR.const_mont(range_ch.value)),
        "logic_sep": jnp.asarray(FR.const_mont(logic_ch.value)),
        "fixed_sep": jnp.asarray(FR.const_mont(fixed_ch.value)),
        "var_sep": jnp.asarray(FR.const_mont(var_ch.value)),
    }
    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def pointwise(sel_t, wires_t, z_t, zw_t, pi_t, l1_t, lin_t, vh_t,
                      chal_t):
            sel_d = dict(zip(sorted(sel), sel_t))
            chal_d = dict(zip(sorted(chals), chal_t))
            num = qk.quotient_numerator.__wrapped__(
                sel_d, wires_t, z_t, zw_t, pi_t, l1_t, lin_t, chal_d)
            return qk.pointwise_divide.__wrapped__(num, vh_t)

        spec = P(None, axis)
        fn = shard_map(
            pointwise, mesh=mesh,
            in_specs=(tuple([spec] * len(sel)), tuple([spec] * 7), spec,
                      spec, spec, spec, spec, spec,
                      tuple([P(None, None)] * len(chals))),
            out_specs=spec, check_vma=False)
        quotient = fn(tuple(sel[k] for k in sorted(sel)),
                      (a8, b8, c8, d8, a8w, b8w, d8w), z8, z8w, pi8, l1_8n,
                      linear, v_h_inv,
                      tuple(chals[k] for k in sorted(chals)))
        return dd8.coset_ifft_device(quotient)
    numerator = qk.quotient_numerator(
        sel, (a8, b8, c8, d8, a8w, b8w, d8w), z8, z8w, pi8, l1_8n, linear,
        chals)
    quotient = qk.pointwise_divide(numerator, v_h_inv)
    return domain_8n.coset_ifft_device(quotient)  # [L, 8n] coefficients


def build_quotient_polynomial(domain: Domain, prover_key: ProverKey,
                              z_poly: Polynomial, wires, pi_poly: Polynomial,
                              challenges) -> Polynomial:
    """Host-Polynomial wrapper around build_quotient_device."""
    def dev(p):
        vals = [c.value for c in p.coeffs]
        return FR.to_mont_array(vals) if vals else FR.to_mont_array([0])

    coeffs = build_quotient_device(
        domain, prover_key, dev(z_poly), tuple(dev(w) for w in wires),
        dev(pi_poly), challenges)
    return Polynomial([Fr(v) for v in FR.from_mont_array(coeffs)])
