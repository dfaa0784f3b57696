"""Quick round-3 MSM throughput probe at several sizes on the live chip."""
import random
import sys
import time

from zkvm_tpu.curves.g1 import G1Affine, G1Projective
from zkvm_tpu.fields import Fr
from zkvm_tpu.ops.msm import MSMContext

sizes = [int(s) for s in sys.argv[1:]] or [16]
n_max = 1 << max(sizes)
rng = random.Random(42)

t0 = time.monotonic()
base = G1Affine.generator().to_projective()
acc = base
points = []
for _ in range(n_max):
    points.append(acc)
    acc = acc + acc if len(points) % 2 else acc + base
points = G1Projective.batch_normalize(points)
print(f"point gen: {time.monotonic()-t0:.1f}s", flush=True)

scalars = [Fr(rng.randrange(Fr.MODULUS)) for _ in range(n_max)]
ctx = MSMContext(points)

for lg in sizes:
    n = 1 << lg
    sub = scalars[:n]
    t0 = time.monotonic()
    r = ctx.msm(sub)  # compile + warm
    print(f"2^{lg} first call: {time.monotonic()-t0:.1f}s", flush=True)
    reps = 3
    t0 = time.monotonic()
    for _ in range(reps):
        r = ctx.msm(sub)
    dt = (time.monotonic() - t0) / reps
    print(f"2^{lg}: {dt*1e3:.1f} ms -> {n/dt:,.0f} points/s", flush=True)

# correctness spot check at the smallest size
from zkvm_tpu.curves.msm import msm_variable_base
m = 1 << 10
assert ctx.msm(scalars[:m]) == msm_variable_base(points[:m], scalars[:m])
print("sample assert ok", flush=True)
