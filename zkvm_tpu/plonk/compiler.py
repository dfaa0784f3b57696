"""Compiler: circuit -> preprocessed Prover/Verifier (plonk/src/compiler.rs)."""

from __future__ import annotations

from ..fields import Fr
from ..ops.ntt import Domain
from .composer import Composer
from .evaluations import Evaluations
from .kzg10 import Commitment, CommitKey, OpeningKey, PublicParameters
from .polynomial import Polynomial
from .prover import Prover
from .verifier import Verifier
from . import widgets


def _next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


class Compiler:
    @staticmethod
    def compile(pp: PublicParameters, label: bytes,
                circuit_cls) -> tuple[Prover, Verifier]:
        """compile::<C> with C::default() (compiler.rs:23-34)."""
        return Compiler.compile_with_circuit(pp, label, circuit_cls())

    @staticmethod
    def compile_with_circuit(pp: PublicParameters, label: bytes,
                             circuit) -> tuple[Prover, Verifier]:
        composer = Composer.initialized()
        circuit.circuit(composer)
        return Compiler._compile_with_composer(pp, label, composer)

    @staticmethod
    def compile_with_compressed(pp: PublicParameters, label: bytes,
                                compressed: bytes) -> tuple[Prover, Verifier]:
        from .compress import CompressedCircuit

        composer = CompressedCircuit.from_bytes(compressed)
        return Compiler._compile_with_composer(pp, label, composer)

    @staticmethod
    def _compile_with_composer(pp: PublicParameters, label: bytes,
                               composer: Composer) -> tuple[Prover, Verifier]:
        n = _next_pow2(len(composer.constraints) + 6)
        commit, opening = pp.trim(n)
        return Compiler._preprocess(label, commit, opening, composer)

    @staticmethod
    def _preprocess(label: bytes, commit_key: CommitKey,
                    opening_key: OpeningKey,
                    composer: Composer) -> tuple[Prover, Verifier]:
        """compiler.rs:78-390."""
        constraints = len(composer.constraints)
        size = _next_pow2(constraints)
        domain = Domain(size)

        names = ("q_m", "q_l", "q_r", "q_o", "q_f", "q_c", "q_arith",
                 "q_range", "q_logic", "q_fixed_group_add",
                 "q_variable_group_add")
        columns = {name: [Fr.zero()] * size for name in names}
        for i, gate in enumerate(composer.constraints):
            for name in names:
                columns[name][i] = getattr(gate, name)

        polys = {name: Polynomial(domain.ifft(col))
                 for name, col in columns.items()}
        sigma_polys = composer.perm.compute_sigma_polynomials(size, domain)
        for name, p in zip(("s_sigma_1", "s_sigma_2", "s_sigma_3",
                            "s_sigma_4"), sigma_polys):
            polys[name] = p

        def commit(poly: Polynomial) -> Commitment:
            from .kzg10 import KZGError

            try:
                return commit_key.commit(poly)
            except KZGError:
                return Commitment.identity()  # commit().unwrap_or_default()

        # selector commits fall back to identity on degree errors
        # (unwrap_or_default, compiler.rs:152-166); sigma commits propagate
        # (compiler.rs:168-171)
        comms = {name: (commit_key.commit(polys[name])
                        if name.startswith("s_sigma")
                        else commit(polys[name]))
                 for name in polys}

        verifier_key = widgets.VerifierKey.from_polynomial_commitments(
            constraints,
            comms["q_m"], comms["q_l"], comms["q_r"], comms["q_o"],
            comms["q_f"], comms["q_c"], comms["q_arith"], comms["q_logic"],
            comms["q_range"], comms["q_fixed_group_add"],
            comms["q_variable_group_add"],
            comms["s_sigma_1"], comms["s_sigma_2"], comms["s_sigma_3"],
            comms["s_sigma_4"])

        domain_8n = Domain(8 * size)
        evals_8n = {name: Evaluations(domain_8n.coset_fft(polys[name].coeffs),
                                      domain_8n)
                    for name in polys}
        linear_eval_8n = Evaluations(
            domain_8n.coset_fft([Fr.zero(), Fr.one()]), domain_8n)
        v_h_coset_8n = Evaluations(
            domain.compute_vanishing_poly_over_coset(domain_8n.size),
            domain_8n)

        def pair(name):
            return (polys[name], evals_8n[name])

        prover_key = widgets.ProverKey(
            n=size,
            arithmetic=widgets.ArithmeticProverKey(
                pair("q_m"), pair("q_l"), pair("q_r"), pair("q_o"),
                pair("q_f"), pair("q_c"), pair("q_arith")),
            logic=widgets.LogicProverKey(pair("q_c"), pair("q_logic")),
            range=widgets.RangeProverKey(pair("q_range")),
            fixed_base=widgets.FixedBaseProverKey(
                pair("q_l"), pair("q_r"), pair("q_c"),
                pair("q_fixed_group_add")),
            variable_base=widgets.VariableBaseProverKey(
                pair("q_variable_group_add")),
            permutation=widgets.PermutationProverKey(
                pair("s_sigma_1"), pair("s_sigma_2"), pair("s_sigma_3"),
                pair("s_sigma_4"), linear_eval_8n),
            v_h_coset_8n=v_h_coset_8n)

        prover = Prover(label, prover_key, commit_key, verifier_key,
                        size, constraints)
        verifier = Verifier(label, verifier_key, opening_key,
                            composer.public_input_indexes(), size,
                            constraints)
        return prover, verifier
