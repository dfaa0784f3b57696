# Unsupported dev profiling tool: pokes zkvm_tpu.ops.msm internals; run from the repo root.
import os, sys, time, random
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))
import jax
import jax.numpy as jnp
from zkvm_tpu.curves.g1 import G1Affine
from zkvm_tpu.fields import Fr
from zkvm_tpu.ops.g1_ops import batch_scalar_mul_base
from zkvm_tpu.ops import msm as M
from zkvm_tpu.ops.limb_field import FR

n = 1 << 16
rng = random.Random(42)
points = batch_scalar_mul_base(G1Affine.generator(),
                               [Fr(rng.randrange(Fr.MODULUS)) for _ in range(n)])
scalars = [Fr(rng.randrange(Fr.MODULUS)) for _ in range(n)]
ctx = M.MSMContext(points)

# stage 0: host scalar conversion
t0 = time.monotonic()
vals = [s.value for s in scalars]
limbs = FR.to_raw_array(vals)
limbs = jnp.moveaxis(limbs.reshape(FR.n_limbs, 1, n), 0, 1)
jax.block_until_ready(limbs)
t_conv = time.monotonic() - t0

pts, pinf, pm = ctx._padded(n)
c = M._ptree_window_bits(n)
# warm
sums = M._msm_ptree_pipeline(c, pm, pinf, limbs)
jax.block_until_ready(sums)
t0 = time.monotonic()
for _ in range(3):
    sums = M._msm_ptree_pipeline(c, pm, pinf, limbs)
    jax.block_until_ready(sums)
t_pipe = (time.monotonic() - t0) / 3

r = M._fold_windows(sums, c, 1, [n])
t0 = time.monotonic()
for _ in range(3):
    r = M._fold_windows(sums, c, 1, [n])
t_fold = (time.monotonic() - t0) / 3

e2e0 = time.monotonic()
res = ctx.msm(scalars)
t_e2e = time.monotonic() - e2e0
print(f"conv={t_conv*1e3:.0f}ms pipeline={t_pipe*1e3:.0f}ms fold={t_fold*1e3:.0f}ms e2e={t_e2e*1e3:.0f}ms -> {n/t_e2e:.0f} pts/s (pipeline-only {n/t_pipe:.0f})")
