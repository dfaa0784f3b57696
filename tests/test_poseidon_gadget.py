"""Poseidon gadget tests: in-circuit hashing must agree with the native
scalar path (coset-poseidon gadget tests + poseidon-merkle zk tests)."""

import pytest

from zkvm_tpu.fields import Fr
from zkvm_tpu.hashes.gadget import GadgetPermutation, HashGadget
from zkvm_tpu.hashes.hades import ScalarPermutation, hades_permute
from zkvm_tpu.hashes.poseidon import Domain, Hash
from zkvm_tpu.merkle import Item, PoseidonTree, opening_gadget
from zkvm_tpu.plonk import Compiler, Composer, Circuit, Constraint, PublicParameters
from zkvm_tpu.rng import StdRng


def test_gadget_permutation_values_match_native():
    """Witness values produced by the gadget equal the scalar permutation
    (hades/permutation/gadget.rs test)."""
    composer = Composer.initialized()
    inputs = [Fr(i + 17) for i in range(5)]
    witnesses = [composer.append_witness(v) for v in inputs]
    out = GadgetPermutation(composer).permute(witnesses)
    expected = hades_permute([v.value for v in inputs])
    got = [composer[w].value for w in out]
    assert got == expected


def test_hash_gadget_matches_native_digest():
    composer = Composer.initialized()
    inputs = [Fr(i + 1) for i in range(4)]
    ws = [composer.append_witness(v) for v in inputs]
    dw = HashGadget.digest(composer, Domain.Merkle4, ws)[0]
    native = Hash.digest(Domain.Merkle4, inputs)[0]
    assert composer[dw] == native


def test_hash_gadget_truncated_matches_native():
    composer = Composer.initialized()
    inputs = [Fr(i + 1) for i in range(3)]
    ws = [composer.append_witness(v) for v in inputs]
    dw = HashGadget.digest_truncated(composer, Domain.Other, ws)[0]
    native = Hash.digest_truncated(Domain.Other, inputs)[0]
    assert composer[dw].value == native.value


def test_opening_gadget_witness_root():
    height = 2
    tree = PoseidonTree(height=height)
    leaves = [Fr(i + 100) for i in range(7)]
    for i, leaf in enumerate(leaves):
        tree.insert(i, Item(leaf, None))
    opening = tree.opening(4)
    composer = Composer.initialized()
    leaf_w = composer.append_witness(leaves[4])
    root_w = opening_gadget(composer, opening, leaf_w)
    assert composer[root_w] == tree.root().hash


class OpeningCircuit(Circuit):
    """Membership circuit: leaf witness -> opening gadget -> public root
    (merkle-plonk/src/lib.rs:89-131 shape)."""

    def __init__(self, opening, leaf: Fr):
        self.opening = opening
        self.leaf = leaf

    def circuit(self, composer: Composer):
        leaf_w = composer.append_witness(self.leaf)
        root_w = opening_gadget(composer, self.opening, leaf_w)
        composer.append_gate(
            Constraint().left(1).a(root_w)
            .public(-self.opening.root.hash))


@pytest.mark.slow
def test_merkle_opening_prove_verify():
    height = 2
    tree = PoseidonTree(height=height)
    leaves = [Fr(i + 100) for i in range(9)]
    for i, leaf in enumerate(leaves):
        tree.insert(i, Item(leaf, None))
    opening = tree.opening(4)
    circuit = OpeningCircuit(opening, leaves[4])

    pp = PublicParameters.setup(1 << 12, StdRng(0x99))
    prover, verifier = Compiler.compile_with_circuit(pp, b"merkle", circuit)
    proof, public_inputs = prover.prove(StdRng(0xDEA1), circuit)
    verifier.verify(proof, public_inputs)
    # a different (wrong) root must fail
    from zkvm_tpu.plonk import ProofVerificationError

    with pytest.raises(ProofVerificationError):
        verifier.verify(proof, [public_inputs[0] + Fr.one()])
