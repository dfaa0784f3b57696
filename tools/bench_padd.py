"""Microbench: complete-padd kernel variants over MSM-scale lane counts.

The MSM bucket stages are a sequence of complete G1 additions over
[rows, 24, lanes] batches; this probes the kernel alone (one pallas call,
fast to compile) so variants can be compared without recompiling the whole
MSM pipeline.
"""
import random
import sys
import time

import jax
import numpy as np

from zkvm_tpu.curves.g1 import G1Projective
from zkvm_tpu.ops import g1_ops
from zkvm_tpu.ops import pallas_field as pf

rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20
lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
block = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

rng = random.Random(7)
g = G1Projective.generator()
base_pts = [(g * rng.getrandbits(64)).to_affine() for _ in range(256)]
x, y, z = g1_ops.affine_to_device(base_pts)
idx = np.asarray([rng.randrange(256) for _ in range(rows * lanes)],
                 dtype=np.int32).reshape(rows, lanes)
import jax.numpy as jnp
P = tuple(jnp.moveaxis(jnp.take(t, idx, axis=1), 0, 1) for t in (x, y, z))
idx2 = np.roll(idx, 1, axis=1)
Q = tuple(jnp.moveaxis(jnp.take(t, jnp.asarray(idx2), axis=1), 0, 1)
          for t in (x, y, z))
P = jax.block_until_ready(P)
Q = jax.block_until_ready(Q)

ref = None
variants = (("serial", pf.padd_pallas), ("ilp", pf.padd_pallas_ilp),
            ("2l", pf.padd_pallas_2l), ("ilp2l", pf.padd_pallas_ilp2l))
only = sys.argv[4].split(",") if len(sys.argv) > 4 else None
for name, fn in variants:
    if only and name not in only:
        continue
    f = jax.jit(lambda p, q, fn=fn: fn(p, q, block=block))
    t0 = time.monotonic()
    out = jax.block_until_ready(f(P, Q))
    print(f"{name} first: {time.monotonic()-t0:.1f}s", flush=True)
    if ref is None:
        ref = [np.asarray(jax.device_get(t[:, :, :64])) for t in out]
    else:
        got = [np.asarray(jax.device_get(t[:, :, :64])) for t in out]
        assert all((g == r).all() for g, r in zip(got, ref)), \
            f"{name} mismatch vs serial"
    jax.device_get(out[0][0, 0, 0])
    reps = 5
    t0 = time.monotonic()
    for _ in range(reps):
        out = f(P, Q)
    jax.device_get(out[0][0, 0, 0])
    dt = (time.monotonic() - t0) / reps
    n = rows * lanes
    print(f"{name}: {dt*1e3:.1f} ms -> {dt/n*1e9:.0f} ns/padd-lane "
          f"({n/dt/1e6:.2f} M adds/s)", flush=True)
