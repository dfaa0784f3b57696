"""Prover: the 5-round PLONK proving flow (plonk/src/compiler/prover.rs).

Round structure (prover.rs:210-509):
  1. wire polynomials a,b,c,d: blind + commit
  2. permutation grand product z: blind + commit
  3. quotient t: build over the 8n coset, split in 4, cross-blind, commit
  4. evaluations at z / z*omega
  5. linearization r, aggregate KZG witnesses W_z and W_zw

Round-2 redesign: every polynomial lives on device as a [16, len] uint32
Montgomery tensor from witness ingestion to the final commitments -- wire
iFFTs, the grand product, the 8n quotient, the 15 round-4 evaluations, the
linearization combination and both ruffini divisions are device programs
(see plonk/dpoly.py).  Host work per round is only the merlin transcript
(inherently serial, bytes-sized) and the rng blinder draws; proof bytes are
identical to the host-Polynomial path (pinned by the determinism test).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields import Fr
from ..ops import limb_field as lf
from ..ops.limb_field import FR
from ..ops.ntt import Domain
from ..ops.ntt_mxu import MXUTransform
from ..utils import metrics
from . import dpoly
from .composer import Composer
from .errors import NotEnoughBytes, PlonkError
from .kzg10 import CommitKey
from .polynomial import Polynomial
from .proof import Proof, compute_barycentric_eval
from .transcript import Transcript
from .widgets import (ProofEvaluations, ProverKey, VerifierKey,
                      _fixed_base_identity, _logic_identity, _range_identity,
                      _var_base_identity)

from .. import params as _params

_Q = Fr.MODULUS
K1, K2, K3 = _params.K1, _params.K2, _params.K3


def base_transcript(label: bytes, verifier_key: VerifierKey,
                    constraints: int) -> Transcript:
    """TranscriptProtocol::base (transcript.rs:51-65)."""
    t = Transcript(label)
    t.circuit_domain_sep(constraints)
    verifier_key.seed_transcript(t)
    return t


def blind_poly(rng, witnesses: list[Fr], hiding_degree: int,
               domain: Domain) -> Polynomial:
    """iFFT + hiding blinders (prover.rs:64-83) -- host-Polynomial helper
    kept for tests and non-hot callers."""
    coeffs = domain.ifft(witnesses)
    for i in range(hiding_degree + 1):
        blinder = Fr.random(rng)
        coeffs[i] = coeffs[i] - blinder
        coeffs.append(blinder)
    return Polynomial(coeffs)


def _pk_device(pk: ProverKey, domain: Domain):
    """Device-resident ProverKey tensors, built once per key:

    coeff: [16, n] coefficient tensors of the 15 selector/sigma polynomials
    sigma_evals: 4x [16, n] Lagrange-basis sigma values (grand product)
    roots: [16, n] domain element table
    """
    cache = getattr(pk, "_device_poly_cache", None)
    if cache is not None:
        return cache
    n = domain.size
    fams = (("q_m", pk.arithmetic.q_m), ("q_l", pk.arithmetic.q_l),
            ("q_r", pk.arithmetic.q_r), ("q_o", pk.arithmetic.q_o),
            ("q_f", pk.arithmetic.q_f), ("q_c", pk.arithmetic.q_c),
            ("q_arith", pk.arithmetic.q_arith),
            ("q_range", pk.range.q_range), ("q_logic", pk.logic.q_logic),
            ("q_fixed_group_add", pk.fixed_base.q_fixed_group_add),
            ("q_variable_group_add",
             pk.variable_base.q_variable_group_add),
            ("s_sigma_1", pk.permutation.s_sigma_1),
            ("s_sigma_2", pk.permutation.s_sigma_2),
            ("s_sigma_3", pk.permutation.s_sigma_3),
            ("s_sigma_4", pk.permutation.s_sigma_4))
    coeff = {name: dpoly.to_device(pair[0].coeffs, n) for name, pair in fams}
    fwd = MXUTransform(n, domain.group_gen)
    sigma_evals = [fwd(coeff[f"s_sigma_{i}"]) for i in range(1, 5)]
    roots = dpoly.powers_device(dpoly.const_col(domain.group_gen), n)
    cache = {"coeff": coeff, "sigma_evals": sigma_evals, "roots": roots}
    pk._device_poly_cache = cache
    return cache


def _round_programs(pk: ProverKey, domain: Domain):
    """Per-key jitted device programs, one per prover round.

    On a remote-attached TPU every eager jnp op pays a ~30ms host<->device
    round trip, so the glue between kernels (pads, stacks, rolls, splits,
    blinder application) must live INSIDE one traced program per round.
    Challenges and blinders enter as [16, k] Montgomery columns -- device
    data, not baked constants -- so one compilation serves every proof.
    """
    import jax

    cache = getattr(pk, "_round_programs_cache", None)
    if cache is not None and cache["n"] == domain.size:
        return cache
    n = domain.size
    dc = _pk_device(pk, domain)
    co = dc["coeff"]
    domain_8n = Domain(8 * n)
    size_8n = domain_8n.size
    inv_t = MXUTransform(n, domain.group_gen_inv)
    fwd8 = MXUTransform(size_8n, domain_8n.group_gen)
    inv8 = MXUTransform(size_8n, domain_8n.group_gen_inv)
    n_inv_c = FR.const_mont(domain.size_inv)
    one_col = jnp.asarray(FR.const_mont(1))

    from ..ops import quotient_kernel as qk
    from .quotient import _SELECTOR_PAIRS, _device_cache

    sel8, v_h_inv, linear8 = _device_cache(pk)
    coset_f = domain_8n._factor("coset")
    coset_if = domain_8n._factor("coset_inv_scaled")

    mul = lambda a, b: lf.mont_mul(FR, a, b)
    add = lambda a, b: lf.add(FR, a, b)
    bc = lambda col, like: jnp.broadcast_to(col, like.shape)

    def ifft(x):
        """[16, ..., n] inverse transform + n^-1 scale."""
        out = inv_t(x)
        flat = out.reshape(FR.n_limbs, -1)
        return lf.mont_mul_const(FR, flat, n_inv_c).reshape(out.shape)

    def blind(coeffs, b_cols):
        k = b_cols.shape[-1]
        low = lf.sub(FR, coeffs[:, :k], b_cols)
        return jnp.concatenate([low, coeffs[:, k:], b_cols], axis=-1)

    @jax.jit
    def p1_wires(wires_flat, blinders):  # blinders [16, 8], 2 per wire
        coeffs4 = ifft(wires_flat.reshape(FR.n_limbs, 4, n))
        return tuple(
            blind(coeffs4[:, k, :], blinders[:, 2 * k: 2 * k + 2])
            for k in range(4))

    roots_k = [lf.mont_mul_const(FR, dc["roots"], FR.const_mont(k))
               for k in (1, K1, K2, K3)]

    @jax.jit
    def p2_scan(cns, wires_flat, beta_col, gamma_col):
        num = den = None
        for k in range(4):
            w = wires_flat[:, k * n:(k + 1) * n]
            num_t = add(add(w, mul(cns["roots_k"][k], bc(beta_col, w))),
                        bc(gamma_col, w))
            den_t = add(add(w, mul(cns["sigma_evals"][k],
                                   bc(beta_col, w))),
                        bc(gamma_col, w))
            num = num_t if num is None else mul(num, num_t)
            den = den_t if den is None else mul(den, den_t)
        pnum = jax.lax.associative_scan(mul, num, axis=1)
        sden = jax.lax.associative_scan(mul, den, axis=1, reverse=True)
        return pnum, sden, sden[:, :1]

    @jax.jit
    def p2_z(pnum, sden, inv_total_col, blinders):
        tail = mul(mul(pnum[:, :-1], sden[:, 1:]),
                   jnp.broadcast_to(inv_total_col,
                                    (FR.n_limbs, n - 1)))
        z_ev = jnp.concatenate([one_col, tail], axis=-1)
        return blind(ifft(z_ev), blinders)

    sel_names = [name for _, name in _SELECTOR_PAIRS]

    @jax.jit
    def p3_quotient(cns, wp, z_poly, pi_dense, chals, blinders):
        # chals: [16, 7] columns (alpha, beta, gamma, range, logic,
        # fixed, var); blinders: [16, 3] (b12, b13, b14)
        pi_coeffs = ifft(pi_dense)
        alpha = chals[:, 0:1]
        alpha_sq = mul(alpha, alpha)
        l1_vals = jnp.concatenate(
            [alpha_sq, jnp.zeros((FR.n_limbs, n - 1), jnp.uint32)], axis=-1)
        l1_coeffs = ifft(l1_vals)
        polys = list(wp) + [z_poly, pi_coeffs, l1_coeffs]
        stacked = jnp.stack(
            [jnp.pad(t, [(0, 0), (0, size_8n - t.shape[-1])])
             for t in polys], axis=1)  # [16, 7, 8n]
        shifted = mul(stacked.reshape(FR.n_limbs, -1),
                      jnp.tile(cns["coset_f"], (1, 7)))
        ev = fwd8(shifted.reshape(FR.n_limbs, 7, size_8n))
        a8, b8, c8, d8, z8, pi8, l18 = (ev[:, i, :] for i in range(7))
        a8w = jnp.roll(a8, -8, axis=-1)
        b8w = jnp.roll(b8, -8, axis=-1)
        d8w = jnp.roll(d8, -8, axis=-1)
        z8w = jnp.roll(z8, -8, axis=-1)
        chal_d = {"alpha": alpha, "beta": chals[:, 1:2],
                  "gamma": chals[:, 2:3], "range_sep": chals[:, 3:4],
                  "logic_sep": chals[:, 4:5], "fixed_sep": chals[:, 5:6],
                  "var_sep": chals[:, 6:7]}
        sel_d = {name: cns["sel8"][name] for name in sel_names}
        numerator = qk.quotient_numerator.__wrapped__(
            sel_d, (a8, b8, c8, d8, a8w, b8w, d8w), z8, z8w, pi8, l18,
            cns["linear8"], chal_d)
        quotient = mul(numerator, cns["v_h_inv"])
        t_coeffs = mul(inv8(quotient), cns["coset_if"])
        bcols = [blinders[:, i:i + 1] for i in range(3)]

        def cross(chunk, head_b, tail_b):
            head = (chunk[:, :1] if head_b is None else
                    lf.sub(FR, chunk[:, :1], head_b))
            parts = [head, chunk[:, 1:]]
            if tail_b is not None:
                parts.append(tail_b)
            return jnp.concatenate(parts, axis=-1)

        return (cross(t_coeffs[:, :n], None, bcols[0]),
                cross(t_coeffs[:, n:2 * n], bcols[0], bcols[1]),
                cross(t_coeffs[:, 2 * n:3 * n], bcols[1], bcols[2]),
                cross(t_coeffs[:, 3 * n:4 * n + 7], bcols[2], None))

    # round-4 evaluation stacks: static selector/sigma part prepared once
    m_z = n + 2
    stat_z = jnp.stack([jnp.pad(co[nm], [(0, 0), (0, m_z - n)])
                        for nm in ("s_sigma_1", "s_sigma_2", "s_sigma_3",
                                   "q_arith", "q_c", "q_l", "q_r")])
    m_w = n + 3

    def powers(col, m):
        out = one_col
        p = col
        while out.shape[-1] < m:
            nxt = mul(out, jnp.broadcast_to(p, out.shape))
            out = jnp.concatenate([out, nxt], axis=-1)
            p = mul(p, p)
        return out[:, :m]

    def eval_at(stack, col):
        pw = powers(col, stack.shape[-1])
        t = lf.mont_mul(FR, stack, jnp.broadcast_to(pw[None], stack.shape))
        m = t.shape[-1]
        while m > 1:
            if m % 2:
                t = jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(0, 1)])
                m += 1
            m //= 2
            t = lf.add(FR, t[..., :m], t[..., m:])
        return t  # [S, 16, 1]

    @jax.jit
    def p4_evals(cns, wp, z_poly, z_col, w_col):
        stack_z = jnp.concatenate([jnp.stack(wp), cns["stat_z"]])
        at_w = [jnp.pad(t, [(0, 0), (0, m_w - t.shape[-1])])
                for t in (wp[0], wp[1], wp[3], z_poly)]
        return eval_at(stack_z, z_col), eval_at(jnp.stack(at_w), w_col)

    lin_size = n + 7  # t_fourth carries the degree-(n+6) tail
    lin_names = ("q_m", "q_l", "q_r", "q_o", "q_f", "q_c", "q_range",
                 "q_logic", "q_fixed_group_add", "q_variable_group_add",
                 "s_sigma_4")
    lin_stat = {nm: co[nm] for nm in lin_names}
    sig_coeffs = [co["s_sigma_1"], co["s_sigma_2"], co["s_sigma_3"]]

    def ruffini(coeffs, z_col, invz_col):
        m = coeffs.shape[-1]
        pw = powers(z_col, m)
        ipw = mul(powers(invz_col, m - 1),
                  jnp.broadcast_to(invz_col, (FR.n_limbs, m - 1)))
        t = mul(coeffs, pw)
        suf = jax.lax.associative_scan(add, t, axis=1, reverse=True)
        return mul(suf[:, 1:], ipw)

    @jax.jit
    def p5_openings(cns, wp, z_poly, t4, sc):
        # sc: [16, 33] scalar columns -- see _prove_fast for the layout
        col = lambda i: sc[:, i:i + 1]
        pad = lambda t: jnp.pad(t, [(0, 0), (0, lin_size - t.shape[-1])])
        lin = None
        for i, nm in enumerate(lin_names[:10]):
            t_ = pad(cns["lin_stat"][nm])
            lin = (mul(t_, bc(col(i), t_)) if lin is None
                   else add(lin, mul(t_, bc(col(i), t_))))
        lin = add(lin, mul(pad(z_poly), bc(col(10), pad(z_poly))))
        s4 = pad(cns["lin_stat"]["s_sigma_4"])
        lin = add(lin, mul(s4, bc(col(11), s4)))
        for j, t in enumerate(t4):
            lin = add(lin, mul(pad(t), bc(col(13 + j), pad(t))))
        lin = jnp.concatenate(
            [add(lin[:, :1], col(12)), lin[:, 1:]], axis=-1)
        agg = lin  # v^0 = 1
        for j, t in enumerate(list(wp) + list(cns["sig_coeffs"])):
            agg = add(agg, mul(pad(t), bc(col(18 + j), pad(t))))
        w_z = ruffini(agg, col(29), col(30))
        sagg = pad(z_poly)
        for j, t in enumerate((wp[0], wp[1], wp[3])):
            sagg = add(sagg, mul(pad(t), bc(col(26 + j), pad(t))))
        w_zw = ruffini(sagg, col(31), col(32))
        return w_z, w_zw

    consts = {
        "roots_k": tuple(roots_k),
        "sigma_evals": tuple(dc["sigma_evals"]),
        "sel8": dict(sel8),
        "v_h_inv": v_h_inv,
        "linear8": linear8,
        "coset_f": coset_f,
        "coset_if": coset_if,
        "stat_z": stat_z,
        "lin_stat": dict(lin_stat),
        "sig_coeffs": tuple(sig_coeffs),
    }
    cache = {"n": n, "p1": p1_wires, "p2a": p2_scan, "p2b": p2_z,
             "p3": p3_quotient, "p4": p4_evals, "p5": p5_openings,
             "consts": consts}
    pk._round_programs_cache = cache
    return cache


def _mesh_round_programs(pk: ProverKey, domain: Domain, mesh, axis: str):
    """Jitted per-round programs for the MESH prover.

    Same one-program-per-round structure as `_round_programs` (eager glue
    between kernels costs a dispatch each -- on real multi-chip hardware
    that is exactly the overhead the mesh path exists to avoid), with the
    heavy transforms swapped for their sharded counterparts: distributed
    4-step (coset) NTTs with an all_to_all transpose, cross-shard
    grand-product scans (one edge all_gather), and a shard_map pointwise
    quotient.  Rounds 4 and 5 (evaluation stacks, linearization, ruffini)
    are mesh-independent device math and are shared with the single-chip
    program set, so proof bytes stay identical by construction.
    """
    import jax

    key = (domain.size, tuple(d.id for d in mesh.devices.flat), axis)
    cache = getattr(pk, "_mesh_programs_cache", None)
    if cache is not None and cache["key"] == key:
        return cache

    rp = _round_programs(pk, domain)  # shared consts + p4/p5
    n = domain.size
    size_8n = 8 * n

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops import quotient_kernel as qk
    from ..ops.collective import sharded_scan_mul
    from ..ops.ntt_sharded import DistributedDomain
    from .quotient import _SELECTOR_PAIRS

    ddom = DistributedDomain(n, mesh, axis)
    dd8 = DistributedDomain(size_8n, mesh, axis)
    one_col = jnp.asarray(FR.const_mont(1))

    mul = lambda a, b: lf.mont_mul(FR, a, b)
    add = lambda a, b: lf.add(FR, a, b)
    bc = lambda col, like: jnp.broadcast_to(col, like.shape)

    def blind(coeffs, b_cols):
        k = b_cols.shape[-1]
        low = lf.sub(FR, coeffs[:, :k], b_cols)
        return jnp.concatenate([low, coeffs[:, k:], b_cols], axis=-1)

    @jax.jit
    def m1_wires(wires_flat, blinders):
        return tuple(
            blind(ddom.ifft_device(wires_flat[:, k * n:(k + 1) * n]),
                  blinders[:, 2 * k: 2 * k + 2])
            for k in range(4))

    @jax.jit
    def m2_scan(cns, wires_flat, beta_col, gamma_col):
        num = den = None
        for k in range(4):
            w = wires_flat[:, k * n:(k + 1) * n]
            num_t = add(add(w, mul(cns["roots_k"][k], bc(beta_col, w))),
                        bc(gamma_col, w))
            den_t = add(add(w, mul(cns["sigma_evals"][k],
                                   bc(beta_col, w))),
                        bc(gamma_col, w))
            num = num_t if num is None else mul(num, num_t)
            den = den_t if den is None else mul(den, den_t)
        pnum = sharded_scan_mul(num, mesh, axis)
        sden = sharded_scan_mul(den, mesh, axis, reverse=True)
        return pnum, sden, sden[:, :1]

    @jax.jit
    def m2_z(pnum, sden, inv_total_col, blinders):
        tail = mul(mul(pnum[:, :-1], sden[:, 1:]),
                   jnp.broadcast_to(inv_total_col, (FR.n_limbs, n - 1)))
        z_ev = jnp.concatenate([one_col, tail], axis=-1)
        return blind(ddom.ifft_device(z_ev), blinders)

    sel_names = [name for _, name in _SELECTOR_PAIRS]

    @jax.jit
    def m3_quotient(cns, wp, z_poly, pi_dense, chals, blinders):
        pi_coeffs = ddom.ifft_device(pi_dense)
        alpha = chals[:, 0:1]
        alpha_sq = mul(alpha, alpha)
        l1_vals = jnp.concatenate(
            [alpha_sq, jnp.zeros((FR.n_limbs, n - 1), jnp.uint32)], axis=-1)
        l1_coeffs = ddom.ifft_device(l1_vals)
        polys = list(wp) + [z_poly, pi_coeffs, l1_coeffs]
        ev = [dd8.coset_fft_device(
                  jnp.pad(t, [(0, 0), (0, size_8n - t.shape[-1])]))
              for t in polys]
        a8, b8, c8, d8, z8, pi8, l18 = ev
        a8w = jnp.roll(a8, -8, axis=-1)
        b8w = jnp.roll(b8, -8, axis=-1)
        d8w = jnp.roll(d8, -8, axis=-1)
        z8w = jnp.roll(z8, -8, axis=-1)

        def pointwise(sel_t, wires_t, z_t, zw_t, pi_t, l1_t, lin_t, vh_t,
                      chal_t):
            sel_d = dict(zip(sel_names, sel_t))
            chal_d = dict(zip(("alpha", "beta", "gamma", "range_sep",
                               "logic_sep", "fixed_sep", "var_sep"), chal_t))
            num = qk.quotient_numerator.__wrapped__(
                sel_d, wires_t, z_t, zw_t, pi_t, l1_t, lin_t, chal_d)
            return mul(num, vh_t)

        spec = P(None, axis)
        fn = shard_map(
            pointwise, mesh=mesh,
            in_specs=(tuple([spec] * len(sel_names)), tuple([spec] * 7),
                      spec, spec, spec, spec, spec, spec,
                      tuple([P(None, None)] * 7)),
            out_specs=spec, check_vma=False)
        quotient = fn(tuple(cns["sel8"][nm] for nm in sel_names),
                      (a8, b8, c8, d8, a8w, b8w, d8w), z8, z8w, pi8, l18,
                      cns["linear8"], cns["v_h_inv"],
                      tuple(chals[:, i:i + 1] for i in range(7)))
        t_coeffs = dd8.coset_ifft_device(quotient)
        bcols = [blinders[:, i:i + 1] for i in range(3)]

        def cross(chunk, head_b, tail_b):
            head = (chunk[:, :1] if head_b is None else
                    lf.sub(FR, chunk[:, :1], head_b))
            parts = [head, chunk[:, 1:]]
            if tail_b is not None:
                parts.append(tail_b)
            return jnp.concatenate(parts, axis=-1)

        return (cross(t_coeffs[:, :n], None, bcols[0]),
                cross(t_coeffs[:, n:2 * n], bcols[0], bcols[1]),
                cross(t_coeffs[:, 2 * n:3 * n], bcols[1], bcols[2]),
                cross(t_coeffs[:, 3 * n:4 * n + 7], bcols[2], None))

    cache = {"key": key, "n": n, "p1": m1_wires, "p2a": m2_scan,
             "p2b": m2_z, "p3": m3_quotient, "p4": rp["p4"],
             "p5": rp["p5"], "consts": rp["consts"]}
    pk._mesh_programs_cache = cache
    return cache


class Prover:
    """Holds the preprocessed keys + base transcript (prover.rs:19-60)."""

    def __init__(self, label: bytes, prover_key: ProverKey,
                 commit_key: CommitKey, verifier_key: VerifierKey,
                 size: int, constraints: int):
        self.label = bytes(label)
        self.prover_key = prover_key
        self.commit_key = commit_key
        self.verifier_key = verifier_key
        self.size = size
        self.constraints = constraints
        self.transcript = base_transcript(self.label, verifier_key,
                                          constraints)

    # -- serialization (prover.rs:85-207) ----------------------------------------
    def to_bytes(self) -> bytes:
        prover_key = self.prover_key.to_var_bytes()
        commit_key = self.commit_key.to_raw_var_bytes()
        verifier_key = self.verifier_key.to_bytes()
        out = (len(self.label).to_bytes(8, "big")
               + len(prover_key).to_bytes(8, "big")
               + len(commit_key).to_bytes(8, "big")
               + len(verifier_key).to_bytes(8, "big")
               + self.size.to_bytes(8, "big")
               + self.constraints.to_bytes(8, "big"))
        return out + self.label + prover_key + commit_key + verifier_key

    @classmethod
    def try_from_bytes(cls, buf: bytes) -> "Prover":
        if len(buf) < 48:
            raise NotEnoughBytes()
        label_len = int.from_bytes(buf[0:8], "big")
        pk_len = int.from_bytes(buf[8:16], "big")
        ck_len = int.from_bytes(buf[16:24], "big")
        vk_len = int.from_bytes(buf[24:32], "big")
        size = int.from_bytes(buf[32:40], "big")
        constraints = int.from_bytes(buf[40:48], "big")
        pos = 48
        label = buf[pos: pos + label_len]
        pos += label_len
        prover_key = ProverKey.from_slice(buf[pos: pos + pk_len])
        pos += pk_len
        commit_key = CommitKey.from_slice_unchecked(buf[pos: pos + ck_len])
        pos += ck_len
        verifier_key = VerifierKey.from_bytes(buf[pos: pos + vk_len])
        return cls(label, prover_key, commit_key, verifier_key, size,
                   constraints)

    # -- proving (prover.rs:210-509) ----------------------------------------------
    def prove(self, rng, circuit, mesh=None,
              shard_axis: str | None = None) -> tuple[Proof, list[Fr]]:
        """Single-device proves run each round as ONE jitted device
        program (eager glue ops cost a full host<->device round trip each
        on remote-attached TPUs).  With `mesh`, the same round structure
        runs with the sharded program set (`_mesh_round_programs`):
        distributed 4-step NTTs, cross-shard grand-product scans, the
        shard_map 8n coset quotient and sharded commit MSMs; proof bytes
        are identical either way (asserted by tests and
        __graft_entry__.dryrun_multichip)."""
        return self._prove_fast(rng, circuit, mesh, shard_axis)

    def _prove_fast(self, rng, circuit, mesh=None,
                    shard_axis: str | None = None) -> tuple[Proof, list[Fr]]:
        # witness re-synthesis (composer.rs:964) is host Python and part of
        # every proof's cost -- measured so the flagship accounting closes.
        # GC is paused for the duration: synthesis allocates ~1.4M small
        # objects against a large live heap (device buffers, keys), and
        # collection passes tripled its wall time at the 2^16 flagship.
        import gc

        gc_was_enabled = gc.isenabled()
        if gc_was_enabled:
            gc.disable()
        try:
            with metrics.GLOBAL.span("prove/witness_synthesis"):
                composer = Composer.prove(self.constraints, circuit)
        finally:
            if gc_was_enabled:
                gc.enable()
        n = self.size
        domain = Domain(n)
        transcript = self.transcript.clone()
        pk = self.prover_key
        axis = shard_axis or (mesh.axis_names[0] if mesh is not None
                              else None)
        rp = (_round_programs(pk, domain) if mesh is None else
              _mesh_round_programs(pk, domain, mesh, axis))

        public_inputs = composer.public_input_values()
        public_input_indexes = composer.public_input_indexes()
        dense_public_inputs = Composer.dense_public_inputs(
            public_input_indexes, public_inputs, n)
        for pi in public_inputs:
            transcript.append_scalar(b"pi", pi)

        with metrics.GLOBAL.span("prove/wire_ingest"):
            # one byte-encode per WITNESS, then vectorized numpy gathers
            # per wire column (the round-2 python loop re-encoded every
            # wire occurrence)
            import numpy as np

            wit = composer.witnesses
            wit_raw = np.frombuffer(
                b"".join(w.value.to_bytes(32, "little") for w in wit),
                dtype="<u2").reshape(len(wit), FR.n_limbs)
            gates = composer.constraints
            n_con = len(gates)
            raw = np.zeros((4 * n, FR.n_limbs), np.uint16)
            for col, sel in enumerate(("a", "b", "c", "d")):
                idx = np.fromiter(
                    (getattr(g, sel).index for g in gates), np.int64, n_con)
                raw[col * n: col * n + n_con] = wit_raw[idx]
            wires_flat = lf.to_mont(
                FR, jnp.asarray(raw.T.astype(np.uint32)))  # [16, 4n]

        def cols(values):
            return dpoly.to_device([v.value if isinstance(v, Fr) else v
                                    for v in values], len(values))

        # ROUND 1
        with metrics.GLOBAL.span("prove/round1_wires"):
            blinders1 = [Fr.random(rng) for _ in range(8)]
            # rng order matches blind_poly per wire: (b0, b1) a, b, c, d
            wire_polys = rp["p1"](wires_flat, cols(blinders1))
            a_comm, b_comm, c_comm, d_comm = \
                self.commit_key.commit_many_mont(list(wire_polys),
                                                 mesh=mesh, axis=axis)
            transcript.append_commitment(b"a_comm", a_comm)
            transcript.append_commitment(b"b_comm", b_comm)
            transcript.append_commitment(b"c_comm", c_comm)
            transcript.append_commitment(b"d_comm", d_comm)
            beta = transcript.challenge_scalar(b"beta")
            transcript.append_scalar(b"beta", beta)
            gamma = transcript.challenge_scalar(b"gamma")

        # ROUND 2
        with metrics.GLOBAL.span("prove/round2_permutation"):
            bg = cols([beta, gamma])
            pnum, sden, total_col = rp["p2a"](rp["consts"], wires_flat,
                                              bg[:, :1], bg[:, 1:2])
            total = FR.from_mont_array(total_col)[0]
            inv_total = cols([Fr(pow(total, -1, _Q))])
            blinders2 = [Fr.random(rng) for _ in range(3)]
            z_poly = rp["p2b"](pnum, sden, inv_total, cols(blinders2))
            z_comm = self.commit_key.commit_many_mont(
                [z_poly], mesh=mesh, axis=axis)[0]
            transcript.append_commitment(b"z_comm", z_comm)
            alpha = transcript.challenge_scalar(b"alpha")
            range_sep = transcript.challenge_scalar(
                b"range separation challenge")
            logic_sep = transcript.challenge_scalar(
                b"logic separation challenge")
            fixed_sep = transcript.challenge_scalar(
                b"fixed base separation challenge")
            var_sep = transcript.challenge_scalar(
                b"variable base separation challenge")

        # ROUND 3
        with metrics.GLOBAL.span("prove/round3_quotient"):
            b_t = [Fr.random(rng) for _ in range(3)]
            t4 = rp["p3"](rp["consts"], wire_polys, z_poly,
                          dpoly.to_device(dense_public_inputs, n),
                          cols([alpha, beta, gamma, range_sep, logic_sep,
                                fixed_sep, var_sep]), cols(b_t))
            (t_low_comm, t_mid_comm, t_high_comm,
             t_fourth_comm) = self.commit_key.commit_many_mont(
                list(t4), mesh=mesh, axis=axis)
            transcript.append_commitment(b"t_low_comm", t_low_comm)
            transcript.append_commitment(b"t_mid_comm", t_mid_comm)
            transcript.append_commitment(b"t_high_comm", t_high_comm)
            transcript.append_commitment(b"t_fourth_comm", t_fourth_comm)
            z_challenge = transcript.challenge_scalar(b"z_challenge")

        # ROUND 4
        with metrics.GLOBAL.span("prove/round4_evaluations"):
            if mesh is not None:
                # rounds 4/5 are latency-bound evaluation stacks shared with
                # the single-chip program set; re-homing their (small) inputs
                # to one device reuses those exact executables instead of
                # compiling mesh-sharded twins
                import jax as _jax

                dev0 = _jax.devices()[0]
                home = lambda t: _jax.device_put(t, dev0)
                wire_polys = tuple(home(t) for t in wire_polys)
                z_poly = home(z_poly)
                t4 = tuple(home(t) for t in t4)
            shifted = z_challenge * Fr(domain.group_gen)
            zw = cols([z_challenge, shifted])
            ev_z, ev_w = rp["p4"](rp["consts"], wire_polys, z_poly,
                                   zw[:, :1], zw[:, 1:2])
            vals_z = dpoly.from_device(jnp.moveaxis(ev_z[..., 0], 1, 0))
            vals_w = dpoly.from_device(jnp.moveaxis(ev_w[..., 0], 1, 0))
            (a_eval, b_eval, c_eval, d_eval, s_sigma_1_eval, s_sigma_2_eval,
             s_sigma_3_eval, q_arith_eval, q_c_eval, q_l_eval,
             q_r_eval) = vals_z
            a_w_eval, b_w_eval, d_w_eval, z_eval = vals_w
            transcript.append_scalar(b"a_eval", a_eval)
            transcript.append_scalar(b"b_eval", b_eval)
            transcript.append_scalar(b"c_eval", c_eval)
            transcript.append_scalar(b"d_eval", d_eval)
            transcript.append_scalar(b"s_sigma_1_eval", s_sigma_1_eval)
            transcript.append_scalar(b"s_sigma_2_eval", s_sigma_2_eval)
            transcript.append_scalar(b"s_sigma_3_eval", s_sigma_3_eval)
            transcript.append_scalar(b"z_eval", z_eval)
            transcript.append_scalar(b"a_w_eval", a_w_eval)
            transcript.append_scalar(b"b_w_eval", b_w_eval)
            transcript.append_scalar(b"d_w_eval", d_w_eval)
            transcript.append_scalar(b"q_arith_eval", q_arith_eval)
            transcript.append_scalar(b"q_c_eval", q_c_eval)
            transcript.append_scalar(b"q_l_eval", q_l_eval)
            transcript.append_scalar(b"q_r_eval", q_r_eval)
            evaluations = ProofEvaluations(
                a_eval=a_eval, b_eval=b_eval, c_eval=c_eval, d_eval=d_eval,
                a_w_eval=a_w_eval, b_w_eval=b_w_eval, d_w_eval=d_w_eval,
                q_arith_eval=q_arith_eval, q_c_eval=q_c_eval,
                q_l_eval=q_l_eval, q_r_eval=q_r_eval,
                s_sigma_1_eval=s_sigma_1_eval,
                s_sigma_2_eval=s_sigma_2_eval,
                s_sigma_3_eval=s_sigma_3_eval, z_eval=z_eval)

        # ROUND 5
        with metrics.GLOBAL.span("prove/round5_openings"):
            v_challenge = transcript.challenge_scalar(b"v_challenge")
            v_w_challenge = transcript.challenge_scalar(b"v_w_challenge")
            qa = q_arith_eval
            beta_z = beta * z_challenge
            acc = ((a_eval + beta_z + gamma)
                   * (b_eval + Fr(K1) * beta_z + gamma)
                   * (c_eval + Fr(K2) * beta_z + gamma)
                   * (d_eval + Fr(K3) * beta_z + gamma) * alpha)
            zn = pow(z_challenge.value, n, _Q)
            l_1_z = (Fr((zn - 1) % _Q)
                     * Fr(pow(n * (z_challenge.value - 1) % _Q, -1, _Q))
                     if z_challenge.value != 1 else Fr.one())
            copy_acc = ((a_eval + beta * s_sigma_1_eval + gamma)
                        * (b_eval + beta * s_sigma_2_eval + gamma)
                        * (c_eval + beta * s_sigma_3_eval + gamma)
                        * (beta * z_eval) * alpha)
            pi_eval = compute_barycentric_eval(public_inputs, z_challenge,
                                               domain)
            z_h = Fr((zn - 1) % _Q)
            neg_zh = -z_h
            z_n = Fr(zn)
            vs = [Fr.one()]
            for _ in range(7):
                vs.append(vs[-1] * v_challenge)
            vws = [Fr.one()]
            for _ in range(3):
                vws.append(vws[-1] * v_w_challenge)
            scalars = [
                a_eval * b_eval * qa, a_eval * qa, b_eval * qa,
                c_eval * qa, d_eval * qa, qa,
                Fr(_range_identity(
                    range_sep.value, a_eval.value, b_eval.value,
                    c_eval.value, d_eval.value, d_w_eval.value)),
                Fr(_logic_identity(
                    logic_sep.value, a_eval.value, a_w_eval.value,
                    b_eval.value, b_w_eval.value, c_eval.value,
                    d_eval.value, d_w_eval.value, q_c_eval.value)),
                Fr(_fixed_base_identity(
                    fixed_sep.value, a_eval.value, a_w_eval.value,
                    b_eval.value, b_w_eval.value, c_eval.value,
                    d_eval.value, d_w_eval.value, q_l_eval.value,
                    q_r_eval.value, q_c_eval.value)),
                Fr(_var_base_identity(
                    var_sep.value, a_eval.value, a_w_eval.value,
                    b_eval.value, b_w_eval.value, c_eval.value,
                    d_eval.value, d_w_eval.value)),
                acc + l_1_z * alpha * alpha,
                -copy_acc,
                pi_eval,
                neg_zh, neg_zh * z_n, neg_zh * z_n * z_n,
                neg_zh * z_n * z_n * z_n,
            ] + vs + vws + [
                z_challenge, Fr(pow(z_challenge.value, -1, _Q)),
                shifted, Fr(pow(shifted.value, -1, _Q)),
            ]
            w_z, w_zw = rp["p5"](rp["consts"], wire_polys, z_poly, t4,
                                  cols(scalars))
            w_z_chall_comm, w_z_chall_w_comm = \
                self.commit_key.commit_many_mont([w_z, w_zw], mesh=mesh,
                                                 axis=axis)

        proof = Proof(a_comm, b_comm, c_comm, d_comm, z_comm, t_low_comm,
                      t_mid_comm, t_high_comm, t_fourth_comm, w_z_chall_comm,
                      w_z_chall_w_comm, evaluations)
        return proof, public_inputs

