"""Round-3 NTT probe: 2^16 fft + the 2^19 coset shapes the quotient uses.

Transforms are measured JITTED (as the prover runs them -- the round
programs trace them into one device program); eager per-op dispatch through
the remote tunnel adds ~seconds of pure host<->device latency and measures
the tunnel, not the kernel.
"""
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import jax

from zkvm_tpu.fields import Fr
from zkvm_tpu.ops.limb_field import FR
from zkvm_tpu.ops.ntt import Domain

rng = random.Random(3)

for lg, kinds in ((16, ("fft", "ifft")), (19, ("coset_fft", "coset_ifft"))):
    n = 1 << lg
    vals = [rng.randrange(Fr.MODULUS) for _ in range(n)]
    x = FR.to_mont_array(vals)
    dom = Domain(n)
    for kind in kinds:
        fn = jax.jit(getattr(dom, kind + "_device"))
        t0 = time.monotonic()
        jax.block_until_ready(fn(x))
        print(f"2^{lg} {kind} first: {time.monotonic()-t0:.1f}s", flush=True)
        reps = 20
        # block_until_ready is not a reliable barrier through the remote
        # tunnel; a scalar device_get is
        jax.device_get(fn(x)[0, 0])
        t0 = time.monotonic()
        out = x
        for _ in range(reps):
            out = fn(out)
        jax.device_get(out[0, 0])
        dt = (time.monotonic() - t0) / reps
        print(f"2^{lg} {kind}: {dt*1e3:.2f} ms -> {n/dt/1e6:.1f} M elems/s",
              flush=True)
