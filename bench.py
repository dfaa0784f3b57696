"""Benchmark entry point: prints ONE JSON line with the headline metric.

Headline: G1 Pippenger MSM throughput (points/sec) on the attached chip at
2^16 points -- the BASELINE.json north-star config (KZG commitments at the
2^16-gate flagship scale dominate the PLONK prover).

The reference publishes no numbers (BASELINE.md); vs_baseline compares
against the pure-python host MSM on this machine (the reference's algorithm,
rayon-less), i.e. values > 1 mean the device kernel beats a faithful
single-thread CPU implementation.
"""

import json
import random
import sys
import time


def main():
    if "--all" in sys.argv or "--only" in sys.argv:
        # per-op suite mirroring the reference's criterion benches
        # (benches/groups.rs, hash_to_curve.rs, jubjub fq/fr/point benches)
        # plus device kernels and e2e prove/verify; one JSON line per op.
        from zkvm_tpu.utils.benches import run_all

        only = None
        if "--only" in sys.argv:
            only = sys.argv[sys.argv.index("--only") + 1].split(",")
        run_all(only)
        return
    n = 1 << 16
    rng = random.Random(42)

    import jax

    from zkvm_tpu.curves.g1 import G1Affine
    from zkvm_tpu.fields import Fr
    from zkvm_tpu.ops.g1_ops import batch_scalar_mul_base
    from zkvm_tpu.ops.limb_field import FR
    from zkvm_tpu.ops.msm import MSMContext

    # random points: s_i * G through the device fixed-base kernel (the
    # host EC loop costs ~10 minutes of Python at 2^16)
    points = batch_scalar_mul_base(
        G1Affine.generator(),
        [Fr(rng.randrange(Fr.MODULUS)) for _ in range(n)])
    scalars = [Fr(rng.randrange(Fr.MODULUS)) for _ in range(n)]

    ctx = MSMContext(points)
    # the unit under test is the device MSM as the prover consumes it:
    # KZG commits call msm_many_mont on device-resident Montgomery
    # coefficient tensors (host scalar conversion is not on that path)
    coeffs = jax.device_put(FR.to_mont_array([s.value for s in scalars]))
    result = ctx.msm_many_mont([coeffs])[0]  # compile + warm
    runs = 3
    t0 = time.monotonic()
    for _ in range(runs):
        result = ctx.msm_many_mont([coeffs])[0]
    device_time = (time.monotonic() - t0) / runs
    device_pps = n / device_time

    # host baseline on a subsample, extrapolated linearly
    from zkvm_tpu.curves.msm import msm_variable_base

    m = 1 << 10
    t0 = time.monotonic()
    host_part = msm_variable_base(points[:m], scalars[:m])
    host_time_est = (time.monotonic() - t0) * (n / m)
    host_pps = n / host_time_est

    # sanity: device result must match the host algorithm on the sample
    assert ctx.msm(scalars[:m]) == host_part, "device MSM mismatch"

    print(json.dumps({
        "metric": "msm_g1_points_per_sec_2^16",
        "value": round(device_pps, 1),
        "unit": "points/s",
        "vs_baseline": round(device_pps / host_pps, 3),
    }))


if __name__ == "__main__":
    main()
