"""Error-variant parity tests (plonk/src/error.rs: 23 variants).

Every variant exists as a distinct PlonkError subclass; raise sites mirror
the reference's (kzg10 degree bounds key.rs:108-117 / srs trim, WNAF
composer.rs:315+, domain adacity fft/domain.rs:35-43, PI length
verifier.rs:192, pairing batch check key.rs:252)."""

import random

import pytest

from zkvm_tpu.fields import Fr
from zkvm_tpu.plonk import errors
from zkvm_tpu.plonk.kzg10 import CommitKey, PublicParameters
from zkvm_tpu.plonk.polynomial import Polynomial


_ALL_VARIANTS = [
    "InvalidEvalDomainSize", "ProofVerificationError",
    "CircuitInputsNotFound", "UninitializedPIGenerator",
    "InvalidPublicInputBytes", "CircuitAlreadyPreprocessed",
    "InvalidCircuitSize", "MismatchedPolyLen", "DegreeIsZero",
    "TruncatedDegreeTooLarge", "TruncatedDegreeIsZero",
    "PolynomialDegreeTooLarge", "PolynomialDegreeIsZero",
    "PairingCheckFailure", "BytesError", "NotEnoughBytes",
    "PointMalformed", "BlsScalarMalformed", "JubJubScalarMalformed",
    "UnsupportedWNAF2k", "PublicInputNotFound",
    "InconsistentPublicInputsLen", "InvalidCompressedCircuit",
]


def test_all_variants_exist_and_subclass_plonk_error():
    for name in _ALL_VARIANTS:
        cls = getattr(errors, name)
        assert issubclass(cls, errors.PlonkError)
    assert len(_ALL_VARIANTS) == 23


@pytest.fixture(scope="module")
def small_pp():
    return PublicParameters.setup(7, random.Random(7))


def test_setup_degree_is_zero():
    with pytest.raises(errors.DegreeIsZero):
        PublicParameters.setup(0, random.Random(0))


def test_trim_errors(small_pp):
    with pytest.raises(errors.TruncatedDegreeIsZero):
        small_pp.commit_key.truncate(0)
    with pytest.raises(errors.TruncatedDegreeTooLarge):
        small_pp.commit_key.truncate(10_000)


def test_commit_degree_errors(small_pp):
    ck, _ = small_pp.trim(4)
    with pytest.raises(errors.PolynomialDegreeIsZero):
        ck.commit(Polynomial([Fr(3)]))
    too_big = Polynomial([Fr(i + 1) for i in range(ck.max_degree() + 2)])
    with pytest.raises(errors.PolynomialDegreeTooLarge):
        ck.commit(too_big)
    with pytest.raises(errors.PolynomialDegreeTooLarge):
        ck.commit_many([too_big])


def test_commit_key_malformed_point():
    with pytest.raises(errors.PointMalformed):
        CommitKey.from_slice(b"\xff" * 96)


def test_domain_adacity():
    from zkvm_tpu.ops.ntt import Domain

    with pytest.raises(errors.InvalidEvalDomainSize) as exc:
        Domain(1 << 33)
    assert exc.value.adacity == 32


def test_wnaf_unsupported_width(monkeypatch):
    """composer.rs:315+ errors on WNAF digits outside [-1..1]."""
    from zkvm_tpu.curves import jubjub
    from zkvm_tpu.fields import JubjubFr
    from zkvm_tpu.plonk.composer import Composer

    monkeypatch.setattr(JubjubFr, "compute_windowed_naf",
                        lambda self, w: [2] * 256)
    composer = Composer.initialized()
    scalar = composer.append_witness(Fr(3))
    with pytest.raises(errors.UnsupportedWNAF2k):
        composer.component_mul_generator(
            scalar, jubjub.JubjubAffine.generator_nums())


def test_inconsistent_public_inputs_len():
    err = errors.InconsistentPublicInputsLen(3, 1)
    assert err.expected == 3 and err.provided == 1
    assert "doesn't match the processed verifier" in str(err)


def test_pairing_check_failure_raises(small_pp):
    """batch_check returns Err(PairingCheckFailure) on a bad proof
    (key.rs:252)."""
    from zkvm_tpu.plonk.kzg10 import KZGProof, Commitment
    from zkvm_tpu.plonk.transcript import Transcript
    from zkvm_tpu.curves import G1Affine

    ck, ok = small_pp.trim(4)
    poly = Polynomial([Fr(1), Fr(2), Fr(3)])
    comm = ck.commit(poly)
    point = Fr(11)
    bogus = KZGProof(commitment_to_witness=Commitment(G1Affine.generator()),
                     evaluated_point=Fr(999),
                     commitment_to_polynomial=comm)
    with pytest.raises(errors.PairingCheckFailure):
        ok.batch_check([point], [bogus], Transcript(b"t"))
