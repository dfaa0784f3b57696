"""Prover: the 5-round PLONK proving flow (plonk/src/compiler/prover.rs).

Round structure (prover.rs:210-509):
  1. wire polynomials a,b,c,d: blind + commit
  2. permutation grand product z: blind + commit
  3. quotient t: build over the 8n coset, split in 4, cross-blind, commit
  4. evaluations at z / z*omega
  5. linearization r, aggregate KZG witnesses W_z and W_zw

FFTs and large commits run on device; the transcript stays host-side.
"""

from __future__ import annotations

from ..fields import Fr
from ..ops.ntt import Domain
from ..utils import metrics
from .composer import Composer
from .errors import PlonkError
from .kzg10 import CommitKey
from .polynomial import Polynomial
from .proof import Proof, compute_barycentric_eval
from .quotient import build_quotient_polynomial
from .transcript import Transcript
from .widgets import ProofEvaluations, ProverKey, VerifierKey

_Q = Fr.MODULUS


def base_transcript(label: bytes, verifier_key: VerifierKey,
                    constraints: int) -> Transcript:
    """TranscriptProtocol::base (transcript.rs:51-65)."""
    t = Transcript(label)
    t.circuit_domain_sep(constraints)
    verifier_key.seed_transcript(t)
    return t


def blind_poly(rng, witnesses: list[Fr], hiding_degree: int,
               domain: Domain) -> Polynomial:
    """iFFT + hiding blinders (prover.rs:64-83)."""
    coeffs = domain.ifft(witnesses)
    return _apply_blinders(rng, coeffs, hiding_degree)


def _apply_blinders(rng, coeffs: list[Fr], hiding_degree: int) -> Polynomial:
    for i in range(hiding_degree + 1):
        blinder = Fr.random(rng)
        coeffs[i] = coeffs[i] - blinder
        coeffs.append(blinder)
    return Polynomial(coeffs)


def blind_polys_batched(rng, witness_sets: list[list[Fr]],
                        hiding_degree: int, domain: Domain) -> list[Polynomial]:
    """blind_poly over several witness vectors with ONE batched device iFFT.

    Blinders are drawn in the same order as sequential blind_poly calls, so
    the rng stream (and hence the proof bytes) is unchanged."""
    import jax.numpy as jnp

    from ..ops import limb_field as lf
    from ..ops.limb_field import FR
    from ..ops.ntt_sharded import _BatchedNTT

    n = domain.size
    k = len(witness_sets)
    vals = []
    for ws in witness_sets:
        vals.extend([w.value for w in ws] + [0] * (n - len(ws)))
    stacked = FR.to_mont_array(vals)  # [L, k*n] set-major
    x = jnp.transpose(stacked.reshape(FR.n_limbs, k, n), (0, 2, 1))
    out = _BatchedNTT(n, k, inverse=True)(x)  # [L, n, k]
    out = lf.mont_mul_const(FR, out.reshape(FR.n_limbs, -1),
                            FR.const_mont(domain.size_inv))
    # [L, n, k] -> [k, L, n] (from_mont_array expects the limb axis at -2)
    flat = FR.from_mont_array(
        jnp.transpose(out.reshape(FR.n_limbs, n, k), (2, 0, 1)))
    return [_apply_blinders(rng, [Fr(v) for v in flat[i * n:(i + 1) * n]],
                            hiding_degree)
            for i in range(k)]


def build_linearization_polynomial(prover_key: ProverKey, challenges,
                                   z_poly: Polynomial,
                                   evaluations: ProofEvaluations,
                                   domain: Domain,
                                   t_low: Polynomial, t_mid: Polynomial,
                                   t_high: Polynomial, t_fourth: Polynomial,
                                   pub_inputs: list[Fr]) -> Polynomial:
    """linearization_poly.rs:146-272."""
    (alpha, beta, gamma, range_sep, logic_sep, fixed_sep, var_sep,
     z_challenge) = challenges
    ev = evaluations
    circuit_lin = (prover_key.arithmetic.compute_linearization(ev)
                   + prover_key.range.compute_linearization(range_sep, ev)
                   + prover_key.logic.compute_linearization(logic_sep, ev)
                   + prover_key.fixed_base.compute_linearization(fixed_sep, ev)
                   + prover_key.variable_base.compute_linearization(var_sep,
                                                                    ev))
    pi_eval = compute_barycentric_eval(pub_inputs, z_challenge, domain)
    circuit_lin = circuit_lin + Polynomial([pi_eval])

    permutation_lin = prover_key.permutation.compute_linearization(
        z_challenge, (alpha, beta, gamma),
        (ev.a_eval, ev.b_eval, ev.c_eval, ev.d_eval),
        (ev.s_sigma_1_eval, ev.s_sigma_2_eval, ev.s_sigma_3_eval),
        ev.z_eval, z_poly, domain)

    n = domain.size
    z_n = z_challenge.pow(n)
    z_two_n = z_challenge.pow(2 * n)
    z_three_n = z_challenge.pow(3 * n)
    quotient = (t_low + t_mid.scale(z_n) + t_high.scale(z_two_n)
                + t_fourth.scale(z_three_n))
    z_h_eval = -domain.evaluate_vanishing_polynomial(z_challenge)
    quotient = quotient.scale(z_h_eval)
    return circuit_lin + permutation_lin + quotient


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
            raise PlonkError("not enough bytes")
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
    def prove(self, rng, circuit) -> tuple[Proof, list[Fr]]:
        composer = Composer.prove(self.constraints, circuit)
        size = self.size
        domain = Domain(size)
        transcript = self.transcript.clone()

        public_inputs = composer.public_input_values()
        public_input_indexes = composer.public_input_indexes()
        dense_public_inputs = Composer.dense_public_inputs(
            public_input_indexes, public_inputs, size)
        for pi in public_inputs:
            transcript.append_scalar(b"pi", pi)

        a_scalars = [Fr.zero()] * size
        b_scalars = [Fr.zero()] * size
        c_scalars = [Fr.zero()] * size
        d_scalars = [Fr.zero()] * size
        for i, gate in enumerate(composer.constraints):
            a_scalars[i] = composer[gate.a]
            b_scalars[i] = composer[gate.b]
            c_scalars[i] = composer[gate.c]
            d_scalars[i] = composer[gate.d]

        # ROUND 1
        _r1 = metrics.GLOBAL.span("prove/round1_wires")
        _r1.__enter__()
        a_poly, b_poly, c_poly, d_poly = blind_polys_batched(
            rng, [a_scalars, b_scalars, c_scalars, d_scalars], 1, domain)
        a_comm, b_comm, c_comm, d_comm = self.commit_key.commit_many(
            [a_poly, b_poly, c_poly, d_poly])
        transcript.append_commitment(b"a_comm", a_comm)
        transcript.append_commitment(b"b_comm", b_comm)
        transcript.append_commitment(b"c_comm", c_comm)
        transcript.append_commitment(b"d_comm", d_comm)
        beta = transcript.challenge_scalar(b"beta")
        transcript.append_scalar(b"beta", beta)
        gamma = transcript.challenge_scalar(b"gamma")
        _r1.__exit__(None, None, None)

        # ROUND 2
        _r2 = metrics.GLOBAL.span("prove/round2_permutation")
        _r2.__enter__()
        sigma_polys = [self.prover_key.permutation.s_sigma_1[0],
                       self.prover_key.permutation.s_sigma_2[0],
                       self.prover_key.permutation.s_sigma_3[0],
                       self.prover_key.permutation.s_sigma_4[0]]
        permutation = composer.perm.compute_permutation_vec(
            domain, [a_scalars, b_scalars, c_scalars, d_scalars],
            beta, gamma, sigma_polys)
        z_poly = blind_poly(rng, permutation, 2, domain)
        z_comm = self.commit_key.commit(z_poly)
        transcript.append_commitment(b"z_comm", z_comm)
        alpha = transcript.challenge_scalar(b"alpha")
        range_sep = transcript.challenge_scalar(b"range separation challenge")
        logic_sep = transcript.challenge_scalar(b"logic separation challenge")
        fixed_sep = transcript.challenge_scalar(
            b"fixed base separation challenge")
        var_sep = transcript.challenge_scalar(
            b"variable base separation challenge")
        _r2.__exit__(None, None, None)

        # ROUND 3
        _r3 = metrics.GLOBAL.span("prove/round3_quotient")
        _r3.__enter__()
        pi_poly = Polynomial(domain.ifft(dense_public_inputs))
        t_poly = build_quotient_polynomial(
            domain, self.prover_key, z_poly,
            (a_poly, b_poly, c_poly, d_poly), pi_poly,
            (alpha, beta, gamma, range_sep, logic_sep, fixed_sep, var_sep))

        tc = t_poly.coeffs + [Fr.zero()] * max(0, 4 * size - len(t_poly.coeffs))
        t_low_vec = tc[0:size]
        t_mid_vec = tc[size: 2 * size]
        t_high_vec = tc[2 * size: 3 * size]
        t_fourth_vec = tc[3 * size:]
        b_12, b_13, b_14 = (Fr.random(rng), Fr.random(rng), Fr.random(rng))
        t_low_vec = t_low_vec + [b_12]
        t_mid_vec = [t_mid_vec[0] - b_12] + t_mid_vec[1:] + [b_13]
        t_high_vec = [t_high_vec[0] - b_13] + t_high_vec[1:] + [b_14]
        t_fourth_vec = [t_fourth_vec[0] - b_14] + t_fourth_vec[1:]
        t_low_poly = Polynomial(t_low_vec)
        t_mid_poly = Polynomial(t_mid_vec)
        t_high_poly = Polynomial(t_high_vec)
        t_fourth_poly = Polynomial(t_fourth_vec)
        t_low_comm, t_mid_comm, t_high_comm, t_fourth_comm = (
            self.commit_key.commit_many(
                [t_low_poly, t_mid_poly, t_high_poly, t_fourth_poly]))
        transcript.append_commitment(b"t_low_comm", t_low_comm)
        transcript.append_commitment(b"t_mid_comm", t_mid_comm)
        transcript.append_commitment(b"t_high_comm", t_high_comm)
        transcript.append_commitment(b"t_fourth_comm", t_fourth_comm)
        z_challenge = transcript.challenge_scalar(b"z_challenge")
        _r3.__exit__(None, None, None)

        # ROUND 4
        _r4 = metrics.GLOBAL.span("prove/round4_evaluations")
        _r4.__enter__()
        shifted = z_challenge * Fr(domain.group_gen)
        pk = self.prover_key
        a_eval = a_poly.evaluate(z_challenge)
        b_eval = b_poly.evaluate(z_challenge)
        c_eval = c_poly.evaluate(z_challenge)
        d_eval = d_poly.evaluate(z_challenge)
        s_sigma_1_eval = pk.permutation.s_sigma_1[0].evaluate(z_challenge)
        s_sigma_2_eval = pk.permutation.s_sigma_2[0].evaluate(z_challenge)
        s_sigma_3_eval = pk.permutation.s_sigma_3[0].evaluate(z_challenge)
        z_eval = z_poly.evaluate(shifted)
        transcript.append_scalar(b"a_eval", a_eval)
        transcript.append_scalar(b"b_eval", b_eval)
        transcript.append_scalar(b"c_eval", c_eval)
        transcript.append_scalar(b"d_eval", d_eval)
        transcript.append_scalar(b"s_sigma_1_eval", s_sigma_1_eval)
        transcript.append_scalar(b"s_sigma_2_eval", s_sigma_2_eval)
        transcript.append_scalar(b"s_sigma_3_eval", s_sigma_3_eval)
        transcript.append_scalar(b"z_eval", z_eval)
        a_w_eval = a_poly.evaluate(shifted)
        b_w_eval = b_poly.evaluate(shifted)
        d_w_eval = d_poly.evaluate(shifted)
        q_arith_eval = pk.arithmetic.q_arith[0].evaluate(z_challenge)
        q_c_eval = pk.logic.q_c[0].evaluate(z_challenge)
        q_l_eval = pk.fixed_base.q_l[0].evaluate(z_challenge)
        q_r_eval = pk.fixed_base.q_r[0].evaluate(z_challenge)
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
            q_arith_eval=q_arith_eval, q_c_eval=q_c_eval, q_l_eval=q_l_eval,
            q_r_eval=q_r_eval, s_sigma_1_eval=s_sigma_1_eval,
            s_sigma_2_eval=s_sigma_2_eval, s_sigma_3_eval=s_sigma_3_eval,
            z_eval=z_eval)

        _r4.__exit__(None, None, None)

        # ROUND 5
        _r5 = metrics.GLOBAL.span("prove/round5_openings")
        _r5.__enter__()
        v_challenge = transcript.challenge_scalar(b"v_challenge")
        r_poly = build_linearization_polynomial(
            pk, (alpha, beta, gamma, range_sep, logic_sep, fixed_sep,
                 var_sep, z_challenge),
            z_poly, evaluations, domain,
            t_low_poly, t_mid_poly, t_high_poly, t_fourth_poly,
            public_inputs)
        aggregate_witness = CommitKey.compute_aggregate_witness(
            [r_poly, a_poly, b_poly, c_poly, d_poly,
             pk.permutation.s_sigma_1[0], pk.permutation.s_sigma_2[0],
             pk.permutation.s_sigma_3[0]],
            z_challenge, v_challenge)
        w_z_chall_comm = self.commit_key.commit(aggregate_witness)
        v_w_challenge = transcript.challenge_scalar(b"v_w_challenge")
        shifted_aggregate_witness = CommitKey.compute_aggregate_witness(
            [z_poly, a_poly, b_poly, d_poly], shifted, v_w_challenge)
        w_z_chall_w_comm = self.commit_key.commit(shifted_aggregate_witness)

        _r5.__exit__(None, None, None)
        proof = Proof(a_comm, b_comm, c_comm, d_comm, z_comm, t_low_comm,
                      t_mid_comm, t_high_comm, t_fourth_comm, w_z_chall_comm,
                      w_z_chall_w_comm, evaluations)
        return proof, public_inputs
