"""Flagship e2e bench: the BASELINE 2^16-gate MultiOpeningCircuit.

Measures the one-time path (SRS setup 2^17, compile/preprocess), first and
warm proves, verify, and dumps the per-round span breakdown (including
witness synthesis, which runs on the host and is part of every proof).

    python tools/bench_flagship.py [count=21] [capacity_log2=17] [reps=3]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

from zkvm_tpu.plonk import Compiler, PublicParameters
from zkvm_tpu.rng import StdRng
from zkvm_tpu.service.batch import MultiOpeningCircuit
from zkvm_tpu.utils import metrics

count = int(sys.argv[1]) if len(sys.argv) > 1 else 21
cap = int(sys.argv[2]) if len(sys.argv) > 2 else 17
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

circ = MultiOpeningCircuit.default_for(3, count)

t0 = time.monotonic()
pp = PublicParameters.setup(1 << cap, StdRng(42))
print(f"srs_setup 2^{cap}: {time.monotonic()-t0:.1f}s", flush=True)

t0 = time.monotonic()
prover, verifier = Compiler.compile_with_circuit(pp, b"flagship", circ)
print(f"compile/preprocess: {time.monotonic()-t0:.1f}s "
      f"(gates={prover.constraints} domain={prover.size})", flush=True)

t0 = time.monotonic()
proof, pis = prover.prove(StdRng(7), circ)
print(f"prove_first: {time.monotonic()-t0:.1f}s", flush=True)

metrics.GLOBAL.reset()
t0 = time.monotonic()
for _ in range(reps):
    proof, pis = prover.prove(StdRng(7), circ)
warm = (time.monotonic() - t0) / reps
print(f"prove_warm: {warm:.2f}s", flush=True)
spans = metrics.GLOBAL.as_dict()
print("spans (avg per prove):", flush=True)
for name, v in sorted(spans.items()):
    tot = v["total_s"] if isinstance(v, dict) else v
    print(f"  {name}: {tot/reps:.3f}s", flush=True)

t0 = time.monotonic()
for _ in range(reps):
    verifier.verify(proof, pis)
print(f"verify: {(time.monotonic()-t0)/reps*1e3:.0f} ms", flush=True)

print(json.dumps({"metric": f"prove_warm_2^16_gates", "value": warm,
                  "unit": "s"}), flush=True)
