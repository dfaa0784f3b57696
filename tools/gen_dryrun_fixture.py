"""Generate tests/fixtures/dryrun_proof_v1.bin: the deterministic
single-chip proof for the dryrun_multichip circuit (StdRng seeds 42/7)."""
import time
t0 = time.time()
from zkvm_tpu.fields import Fr
from zkvm_tpu.merkle.poseidon_tree import Item, PoseidonTree
from zkvm_tpu.plonk import Compiler, PublicParameters
from zkvm_tpu.rng import StdRng
from zkvm_tpu.service.batch import OpeningCircuit
from zkvm_tpu.serialize import Writer

tree = PoseidonTree(1)
for i in range(3):
    tree.insert(i, Item(Fr(1000 + i)))
leaf = Item(Fr(1002))
opening = tree.opening(2)
pp = PublicParameters.setup(1 << 11, StdRng(42))
prover, verifier = Compiler.compile_with_circuit(
    pp, b"dryrun", OpeningCircuit(opening, leaf))
proof, pis = prover.prove(StdRng(7), OpeningCircuit(opening, leaf))
verifier.verify(proof, pis)
pb = proof.to_bytes()
w = bytearray()
w += len(pb).to_bytes(4, "little") + pb
w += len(pis).to_bytes(4, "little")
for s in pis:
    w += s.to_bytes()
open("tests/fixtures/dryrun_proof_v1.bin", "wb").write(bytes(w))
print(f"fixture written ({len(w)} bytes) in {time.time()-t0:.0f}s")
