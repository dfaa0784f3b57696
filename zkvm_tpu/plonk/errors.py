"""Typed error hierarchy (plonk/src/error.rs parity)."""

from __future__ import annotations


class PlonkError(Exception):
    pass


class InvalidEvalDomainSize(PlonkError):
    pass


class ProofVerificationError(PlonkError):
    pass


class InvalidCircuitSize(PlonkError):
    def __init__(self, got: int, expected: int):
        super().__init__(f"circuit size {got} != compiled size {expected}")
        self.got = got
        self.expected = expected


class BlsScalarMalformed(PlonkError):
    pass


class JubJubScalarMalformed(PlonkError):
    pass


class UnsupportedWNAF2k(PlonkError):
    pass


class PublicInputNotFound(PlonkError):
    pass


class InconsistentPublicInputsLen(PlonkError):
    def __init__(self, expected: int, provided: int):
        super().__init__(f"expected {expected} public inputs, got {provided}")
        self.expected = expected
        self.provided = provided


class NotEnoughBytes(PlonkError):
    pass


class InvalidCompressedCircuit(PlonkError):
    pass
