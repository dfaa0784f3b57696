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
from .quotient import build_quotient_device
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
        on remote-attached TPUs).  With `mesh`, the heavy device programs
        (wire/z/PI iFFTs, grand product scans, the 8n coset quotient and
        every KZG commit MSM) run sharded over the mesh via shard_map
        collectives; proof bytes are identical either way (asserted by
        tests and __graft_entry__.dryrun_multichip)."""
        if mesh is None:
            return self._prove_fast(rng, circuit)
        return self._prove_mesh(rng, circuit, mesh, shard_axis)

    def _prove_fast(self, rng, circuit) -> tuple[Proof, list[Fr]]:
        composer = Composer.prove(self.constraints, circuit)
        n = self.size
        domain = Domain(n)
        transcript = self.transcript.clone()
        pk = self.prover_key
        rp = _round_programs(pk, domain)

        public_inputs = composer.public_input_values()
        public_input_indexes = composer.public_input_indexes()
        dense_public_inputs = Composer.dense_public_inputs(
            public_input_indexes, public_inputs, n)
        for pi in public_inputs:
            transcript.append_scalar(b"pi", pi)

        wire_vals = [0] * (4 * n)
        for i, gate in enumerate(composer.constraints):
            wire_vals[i] = composer[gate.a].value
            wire_vals[n + i] = composer[gate.b].value
            wire_vals[2 * n + i] = composer[gate.c].value
            wire_vals[3 * n + i] = composer[gate.d].value
        wires_flat = FR.to_mont_array(wire_vals)  # [16, 4n]

        def cols(values):
            return dpoly.to_device([v.value if isinstance(v, Fr) else v
                                    for v in values], len(values))

        # ROUND 1
        with metrics.GLOBAL.span("prove/round1_wires"):
            blinders1 = [Fr.random(rng) for _ in range(8)]
            # rng order matches blind_poly per wire: (b0, b1) a, b, c, d
            wire_polys = rp["p1"](wires_flat, cols(blinders1))
            a_comm, b_comm, c_comm, d_comm = \
                self.commit_key.commit_many_mont(list(wire_polys))
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
            z_comm = self.commit_key.commit_many_mont([z_poly])[0]
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
             t_fourth_comm) = self.commit_key.commit_many_mont(list(t4))
            transcript.append_commitment(b"t_low_comm", t_low_comm)
            transcript.append_commitment(b"t_mid_comm", t_mid_comm)
            transcript.append_commitment(b"t_high_comm", t_high_comm)
            transcript.append_commitment(b"t_fourth_comm", t_fourth_comm)
            z_challenge = transcript.challenge_scalar(b"z_challenge")

        # ROUND 4
        with metrics.GLOBAL.span("prove/round4_evaluations"):
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
                self.commit_key.commit_many_mont([w_z, w_zw])

        proof = Proof(a_comm, b_comm, c_comm, d_comm, z_comm, t_low_comm,
                      t_mid_comm, t_high_comm, t_fourth_comm, w_z_chall_comm,
                      w_z_chall_w_comm, evaluations)
        return proof, public_inputs

    def _prove_mesh(self, rng, circuit, mesh,
                    shard_axis: str | None) -> tuple[Proof, list[Fr]]:
        composer = Composer.prove(self.constraints, circuit)
        size = self.size
        n = size
        domain = Domain(size)
        transcript = self.transcript.clone()
        pk = self.prover_key
        dc = _pk_device(pk, domain)
        axis = shard_axis or (mesh.axis_names[0] if mesh is not None
                              else None)
        ddom = None
        if mesh is not None:
            from ..ops.ntt_sharded import DistributedDomain

            ddom = DistributedDomain(n, mesh, axis)

        public_inputs = composer.public_input_values()
        public_input_indexes = composer.public_input_indexes()
        dense_public_inputs = Composer.dense_public_inputs(
            public_input_indexes, public_inputs, size)
        for pi in public_inputs:
            transcript.append_scalar(b"pi", pi)

        # witness ingestion: host values -> ONE [16, 4n] device transfer
        wire_vals = [0] * (4 * n)
        for i, gate in enumerate(composer.constraints):
            wire_vals[i] = composer[gate.a].value
            wire_vals[n + i] = composer[gate.b].value
            wire_vals[2 * n + i] = composer[gate.c].value
            wire_vals[3 * n + i] = composer[gate.d].value
        wires_flat = FR.to_mont_array(wire_vals)            # [16, 4n]
        wires_ev = [wires_flat[:, k * n:(k + 1) * n] for k in range(4)]

        # ROUND 1: batched iFFT of the 4 wire vectors + blind + commit
        with metrics.GLOBAL.span("prove/round1_wires"):
            if ddom is not None:
                wire_coeffs = [ddom.ifft_device(w) for w in wires_ev]
            else:
                inv_t = MXUTransform(n, domain.group_gen_inv)
                coeffs4 = inv_t(wires_flat.reshape(FR.n_limbs, 4, n))
                coeffs4 = lf.mont_mul_const(
                    FR, coeffs4.reshape(FR.n_limbs, 4 * n),
                    FR.const_mont(domain.size_inv))
                wire_coeffs = [coeffs4[:, k * n:(k + 1) * n]
                               for k in range(4)]
            wire_polys = [
                dpoly.apply_blinders_device(rng, wc, 1)
                for wc in wire_coeffs]                       # [16, n+2] x4
            a_comm, b_comm, c_comm, d_comm = \
                self.commit_key.commit_many_mont(wire_polys, mesh=mesh,
                                                 axis=axis)
            transcript.append_commitment(b"a_comm", a_comm)
            transcript.append_commitment(b"b_comm", b_comm)
            transcript.append_commitment(b"c_comm", c_comm)
            transcript.append_commitment(b"d_comm", d_comm)
            beta = transcript.challenge_scalar(b"beta")
            transcript.append_scalar(b"beta", beta)
            gamma = transcript.challenge_scalar(b"gamma")

        # ROUND 2: grand product z (device scans) + blind + commit
        with metrics.GLOBAL.span("prove/round2_permutation"):
            from .permutation import Permutation

            z_ev = Permutation.compute_permutation_tensor(
                domain, wires_ev, dc["sigma_evals"], dc["roots"],
                beta, gamma, mesh=mesh, axis=axis)
            z_coeffs = (ddom.ifft_device(z_ev) if ddom is not None
                        else domain.ifft_device(z_ev))
            z_poly = dpoly.apply_blinders_device(rng, z_coeffs, 2)  # [16,n+3]
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

        # ROUND 3: quotient over the 8n coset + split + cross-blind + commit
        with metrics.GLOBAL.span("prove/round3_quotient"):
            pi_dense_dev = dpoly.to_device(dense_public_inputs, n)
            pi_dev = (ddom.ifft_device(pi_dense_dev) if ddom is not None
                      else domain.ifft_device(pi_dense_dev))
            t_coeffs = build_quotient_device(
                domain, pk, z_poly, wire_polys, pi_dev,
                (alpha, beta, gamma, range_sep, logic_sep, fixed_sep,
                 var_sep), mesh=mesh, axis=axis)             # [16, 8n]
            # t has degree ~4n+6 (permutation identity: z * four linear-ish
            # wire factors); the fourth chunk keeps the high tail
            b_12, b_13, b_14 = (Fr.random(rng), Fr.random(rng),
                                Fr.random(rng))
            bc = [dpoly.const_col(b.value) for b in (b_12, b_13, b_14)]
            chunk = [t_coeffs[:, :n], t_coeffs[:, n:2 * n],
                     t_coeffs[:, 2 * n:3 * n],
                     t_coeffs[:, 3 * n:min(4 * n + 7, 8 * n)]]

            def cross(chunk_t, head_blinder, tail_blinder):
                head = (chunk_t[:, :1] if head_blinder is None else
                        lf.sub(FR, chunk_t[:, :1], head_blinder))
                parts = [head, chunk_t[:, 1:]]
                if tail_blinder is not None:
                    parts.append(tail_blinder)
                return jnp.concatenate(parts, axis=-1)

            t_low = cross(chunk[0], None, bc[0])
            t_mid = cross(chunk[1], bc[0], bc[1])
            t_high = cross(chunk[2], bc[1], bc[2])
            t_fourth = cross(chunk[3], bc[2], None)
            t_polys = [t_low, t_mid, t_high, t_fourth]
            (t_low_comm, t_mid_comm, t_high_comm,
             t_fourth_comm) = self.commit_key.commit_many_mont(
                t_polys, mesh=mesh, axis=axis)
            transcript.append_commitment(b"t_low_comm", t_low_comm)
            transcript.append_commitment(b"t_mid_comm", t_mid_comm)
            transcript.append_commitment(b"t_high_comm", t_high_comm)
            transcript.append_commitment(b"t_fourth_comm", t_fourth_comm)
            z_challenge = transcript.challenge_scalar(b"z_challenge")

        # ROUND 4: 15 evaluations at z / z*omega (two batched device evals)
        with metrics.GLOBAL.span("prove/round4_evaluations"):
            shifted = z_challenge * Fr(domain.group_gen)
            co = dc["coeff"]
            at_z = [wire_polys[0], wire_polys[1], wire_polys[2],
                    wire_polys[3], co["s_sigma_1"], co["s_sigma_2"],
                    co["s_sigma_3"], co["q_arith"], co["q_c"], co["q_l"],
                    co["q_r"]]
            m_z = max(t.shape[-1] for t in at_z)
            stack_z = jnp.stack(
                [jnp.pad(t, [(0, 0), (0, m_z - t.shape[-1])]) for t in at_z])
            (a_eval, b_eval, c_eval, d_eval, s_sigma_1_eval, s_sigma_2_eval,
             s_sigma_3_eval, q_arith_eval, q_c_eval, q_l_eval,
             q_r_eval) = dpoly.eval_stack(stack_z, z_challenge)

            at_w = [wire_polys[0], wire_polys[1], wire_polys[3], z_poly]
            m_w = max(t.shape[-1] for t in at_w)
            stack_w = jnp.stack(
                [jnp.pad(t, [(0, 0), (0, m_w - t.shape[-1])]) for t in at_w])
            a_w_eval, b_w_eval, d_w_eval, z_eval = dpoly.eval_stack(
                stack_w, shifted)

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

        # ROUND 5: linearization + two aggregate openings (device lin-comb
        # and ruffini; linearization_poly.rs:146-272 scalar factors on host)
        with metrics.GLOBAL.span("prove/round5_openings"):
            v_challenge = transcript.challenge_scalar(b"v_challenge")
            ev = evaluations
            qa = q_arith_eval
            terms = [
                (co["q_m"], a_eval * b_eval * qa),
                (co["q_l"], a_eval * qa),
                (co["q_r"], b_eval * qa),
                (co["q_o"], c_eval * qa),
                (co["q_f"], d_eval * qa),
                (co["q_c"], qa),
                (co["q_range"], Fr(_range_identity(
                    range_sep.value, a_eval.value, b_eval.value,
                    c_eval.value, d_eval.value, d_w_eval.value))),
                (co["q_logic"], Fr(_logic_identity(
                    logic_sep.value, a_eval.value, a_w_eval.value,
                    b_eval.value, b_w_eval.value, c_eval.value,
                    d_eval.value, d_w_eval.value, q_c_eval.value))),
                (co["q_fixed_group_add"], Fr(_fixed_base_identity(
                    fixed_sep.value, a_eval.value, a_w_eval.value,
                    b_eval.value, b_w_eval.value, c_eval.value,
                    d_eval.value, d_w_eval.value, q_l_eval.value,
                    q_r_eval.value, q_c_eval.value))),
                (co["q_variable_group_add"], Fr(_var_base_identity(
                    var_sep.value, a_eval.value, a_w_eval.value,
                    b_eval.value, b_w_eval.value, c_eval.value,
                    d_eval.value, d_w_eval.value))),
            ]
            # permutation linearization (widget/permutation compute_lin.)
            beta_z = beta * z_challenge
            acc = ((a_eval + beta_z + gamma)
                   * (b_eval + Fr(K1) * beta_z + gamma)
                   * (c_eval + Fr(K2) * beta_z + gamma)
                   * (d_eval + Fr(K3) * beta_z + gamma) * alpha)
            zn = pow(z_challenge.value, n, _Q)
            # L1(z) = (z^n - 1) / (n (z - 1))
            l_1_z = Fr((zn - 1) % _Q) * Fr(pow(
                n * (z_challenge.value - 1) % _Q, -1, _Q)) \
                if z_challenge.value != 1 else Fr.one()
            terms.append((z_poly, acc + l_1_z * alpha * alpha))
            copy_acc = ((a_eval + beta * s_sigma_1_eval + gamma)
                        * (b_eval + beta * s_sigma_2_eval + gamma)
                        * (c_eval + beta * s_sigma_3_eval + gamma)
                        * (beta * z_eval) * alpha)
            terms.append((co["s_sigma_4"], -copy_acc))
            # quotient recombination, scaled by -Z_H(z)
            z_h = Fr((pow(z_challenge.value, n, _Q) - 1) % _Q)
            neg_zh = -z_h
            z_n = Fr(zn)
            terms.append((t_low, neg_zh))
            terms.append((t_mid, neg_zh * z_n))
            terms.append((t_high, neg_zh * z_n * z_n))
            terms.append((t_fourth, neg_zh * z_n * z_n * z_n))

            lin_size = max(t.shape[-1] for t, _ in terms)
            r_poly = dpoly.lin_comb(terms, lin_size)
            pi_eval = compute_barycentric_eval(public_inputs, z_challenge,
                                               domain)
            r_poly = jnp.concatenate(
                [lf.add(FR, r_poly[:, :1], dpoly.const_col(pi_eval.value)),
                 r_poly[:, 1:]], axis=-1)

            v = v_challenge
            vs = [Fr.one()]
            for _ in range(7):
                vs.append(vs[-1] * v)
            agg_terms = [(r_poly, vs[0]), (wire_polys[0], vs[1]),
                         (wire_polys[1], vs[2]), (wire_polys[2], vs[3]),
                         (wire_polys[3], vs[4]), (co["s_sigma_1"], vs[5]),
                         (co["s_sigma_2"], vs[6]), (co["s_sigma_3"], vs[7])]
            agg_size = max(t.shape[-1] for t, _ in agg_terms)
            aggregate = dpoly.lin_comb(agg_terms, agg_size)
            w_z = dpoly.ruffini_device(aggregate, z_challenge)

            v_w_challenge = transcript.challenge_scalar(b"v_w_challenge")
            vw = v_w_challenge
            shift_terms = [(z_poly, Fr.one()), (wire_polys[0], vw),
                           (wire_polys[1], vw * vw),
                           (wire_polys[3], vw * vw * vw)]
            shift_size = max(t.shape[-1] for t, _ in shift_terms)
            shifted_agg = dpoly.lin_comb(shift_terms, shift_size)
            w_zw = dpoly.ruffini_device(shifted_agg, shifted)

            w_z_chall_comm, w_z_chall_w_comm = \
                self.commit_key.commit_many_mont([w_z, w_zw], mesh=mesh,
                                                 axis=axis)

        proof = Proof(a_comm, b_comm, c_comm, d_comm, z_comm, t_low_comm,
                      t_mid_comm, t_high_comm, t_fourth_comm, w_z_chall_comm,
                      w_z_chall_w_comm, evaluations)
        return proof, public_inputs
