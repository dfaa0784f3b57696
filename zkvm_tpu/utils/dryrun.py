"""The canonical dryrun circuit + fixture contract, shared by
`__graft_entry__.dryrun_multichip`, tests/test_sharded.py's fixture
tripwire, and tools/gen_dryrun_fixture.py (previously triplicated -- editing
one copy but not the others desynchronized the fixture contract).

The circuit is a height-1 Poseidon-tree membership opening proved under
fixed StdRng seeds (setup 42, prove 7), so the proof bytes are fully
deterministic and can be pinned as a committed fixture
(tests/fixtures/dryrun_proof_v1.bin)."""

from __future__ import annotations

import os

SETUP_SEED = 42
PROVE_SEED = 7
CAPACITY = 1 << 11
LABEL = b"dryrun"

FIXTURE_RELPATH = os.path.join("tests", "fixtures", "dryrun_proof_v1.bin")


def dryrun_circuit():
    """Build the canonical opening circuit (fresh instance each call)."""
    from ..fields import Fr
    from ..merkle.poseidon_tree import Item, PoseidonTree
    from ..service.batch import OpeningCircuit

    tree = PoseidonTree(1)
    for i in range(3):
        tree.insert(i, Item(Fr(1000 + i)))
    leaf = Item(Fr(1002))
    opening = tree.opening(2)
    return OpeningCircuit(opening, leaf)


def dryrun_prover():
    """Setup + compile the dryrun circuit; returns (prover, verifier)."""
    from ..plonk import Compiler, PublicParameters
    from ..rng import StdRng

    pp = PublicParameters.setup(CAPACITY, StdRng(SETUP_SEED))
    return Compiler.compile_with_circuit(pp, LABEL, dryrun_circuit())


def prove_dryrun(prover):
    """Run the canonical deterministic prove; returns (proof, pis)."""
    from ..rng import StdRng

    return prover.prove(StdRng(PROVE_SEED), dryrun_circuit())


def fixture_path(repo_root: str | None = None) -> str:
    if repo_root is None:
        repo_root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 os.pardir, os.pardir)
    return os.path.join(repo_root, FIXTURE_RELPATH)


def load_fixture(path: str | None = None) -> tuple[bytes, list] | None:
    """Read + validate the committed fixture; None when absent.

    Returns (proof_bytes, public_inputs) -- a truncated or corrupt file
    raises instead of yielding short bytes (which would otherwise surface
    as a misleading 'multi-chip proof differs' assertion downstream)."""
    from ..fields import Fr
    from ..plonk.proof import Proof

    path = path or fixture_path()
    if not os.path.exists(path):
        return None
    buf = open(path, "rb").read()
    if len(buf) < 4:
        raise ValueError(f"dryrun fixture truncated ({len(buf)} bytes)")
    plen = int.from_bytes(buf[:4], "little")
    if plen != Proof.SIZE or len(buf) < 4 + plen + 4:
        raise ValueError(
            f"dryrun fixture corrupt: proof len {plen} (expected "
            f"{Proof.SIZE}), file {len(buf)} bytes")
    proof_bytes = buf[4: 4 + plen]
    off = 4 + plen
    n_pis = int.from_bytes(buf[off: off + 4], "little")
    off += 4
    if len(buf) != off + 32 * n_pis:
        raise ValueError("dryrun fixture corrupt: bad public-input tail")
    pis = [Fr.from_bytes(buf[off + 32 * i: off + 32 * (i + 1)])
           for i in range(n_pis)]
    return proof_bytes, pis


def write_fixture(proof, pis, path: str | None = None) -> int:
    path = path or fixture_path()
    pb = proof.to_bytes()
    w = bytearray()
    w += len(pb).to_bytes(4, "little") + pb
    w += len(pis).to_bytes(4, "little")
    for s in pis:
        w += s.to_bytes()
    open(path, "wb").write(bytes(w))
    return len(w)
