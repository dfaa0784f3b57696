"""Regenerate tests/fixtures/dryrun_proof_v1.bin: the deterministic
single-chip proof (+ public inputs) for the dryrun circuit defined in
zkvm_tpu/utils/dryrun.py (StdRng seeds 42/7).  Run after any intentional
change that affects proof bytes."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

from zkvm_tpu.utils import dryrun

t0 = time.time()
prover, verifier = dryrun.dryrun_prover()
proof, pis = dryrun.prove_dryrun(prover)
verifier.verify(proof, pis)
repo_root = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)
n = dryrun.write_fixture(proof, pis, dryrun.fixture_path(repo_root))
print(f"fixture written ({n} bytes) in {time.time()-t0:.0f}s")
