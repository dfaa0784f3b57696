"""Sweep the ptree window width c on the 2^16 MSM (single set and S=4)."""
import os, sys, time, random
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
import jax.numpy as jnp
import numpy as np
from zkvm_tpu.curves.g1 import G1Affine
from zkvm_tpu.fields import Fr
from zkvm_tpu.ops.g1_ops import batch_scalar_mul_base
from zkvm_tpu.ops import msm as M
from zkvm_tpu.ops.limb_field import FR

n = 1 << 16
rng = random.Random(42)
points = batch_scalar_mul_base(G1Affine.generator(),
                               [Fr(rng.randrange(Fr.MODULUS)) for _ in range(n)])
ctx = M.MSMContext(points)
pts, pinf, pm = ctx._padded(n)

scal = [Fr(rng.randrange(Fr.MODULUS)) for _ in range(n)]
limbs1 = jnp.moveaxis(FR.to_raw_array([s.value for s in scal]).reshape(FR.n_limbs, 1, n), 0, 1)
limbs4 = jnp.concatenate([limbs1] * 4, axis=0)
jax.block_until_ready((limbs1, limbs4))

ref = None
for c in (11, 12, 13):
    for tag, limbs in (("S=1", limbs1), ("S=4", limbs4)):
        out = M._msm_ptree_pipeline(c, pm, pinf, limbs)
        jax.block_until_ready(out)
        t0 = time.monotonic()
        for _ in range(3):
            out = M._msm_ptree_pipeline(c, pm, pinf, limbs)
            jax.block_until_ready(out)
        dt = (time.monotonic() - t0) / 3
        nsets = limbs.shape[0]
        print(f"c={c} {tag}: {dt*1e3:7.1f} ms  {nsets*n/dt/1e3:6.1f}k pts/s", flush=True)
        if tag == "S=1":
            r = M._fold_windows(out, c, 1, [n])[0]
            if ref is None:
                ref = r
            else:
                assert r == ref, f"c={c} result mismatch"
print("all window widths agree")
