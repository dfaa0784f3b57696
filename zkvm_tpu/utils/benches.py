"""Per-operation benchmark suite (bench.py --all).

Mirrors the reference's criterion harnesses -- groups.rs (pairing phases +
G1/G2 op set), hash_to_curve.rs, and the jubjub fq/fr/point benches -- plus
the TPU-side kernels (Poseidon, NTT, MSM) and the end-to-end prove/verify.
Each benchmark prints ONE JSON line: {"metric", "value", "unit"} so
round-over-round regressions diff cleanly.
"""

from __future__ import annotations

import json
import random
import time


def _emit(metric: str, value: float, unit: str, **extra):
    row = {"metric": metric, "value": round(value, 4), "unit": unit}
    row.update(extra)
    print(json.dumps(row), flush=True)


def _time_op(fn, reps: int, warmup: int = 2) -> float:
    """Median-ish per-op seconds over `reps` calls."""
    for _ in range(warmup):
        fn()
    t0 = time.monotonic()
    for _ in range(reps):
        fn()
    return (time.monotonic() - t0) / reps


def bench_host_fields():
    """fq_bench.rs / fr_bench.rs / scalar field ops (host path)."""
    from ..fields import Fp, Fr, JubjubFr

    rng = random.Random(11)
    for name, cls in (("fr", Fr), ("fp", Fp), ("jubjub_fr", JubjubFr)):
        a = cls(rng.randrange(cls.MODULUS))
        b = cls(rng.randrange(cls.MODULUS))
        for op, fn, reps in (("add", lambda: a + b, 20000),
                             ("sub", lambda: a - b, 20000),
                             ("mul", lambda: a * b, 20000),
                             ("square", lambda: a.square(), 20000),
                             ("invert", lambda: a.invert(), 2000),
                             ("sqrt", lambda: (a * a).sqrt(), 200)):
            _emit(f"host/{name}/{op}", _time_op(fn, reps) * 1e9, "ns/op")


def bench_host_groups():
    """groups.rs:31-173 G1/G2 op set (host path)."""
    from ..curves.g1 import G1Affine, G1Projective
    from ..curves.g2 import G2Affine, G2Projective
    from ..fields import Fr

    rng = random.Random(12)
    s = Fr(rng.randrange(Fr.MODULUS))
    for name, aff, proj in (("g1", G1Affine, G1Projective),
                            ("g2", G2Affine, G2Projective)):
        a = (proj.generator() * Fr(rng.randrange(Fr.MODULUS)))
        b = (proj.generator() * Fr(rng.randrange(Fr.MODULUS)))
        a_aff = a.to_affine()
        enc = a_aff.to_bytes()
        for op, fn, reps in (
                ("add", lambda: a + b, 2000),
                ("double", lambda: a.double(), 2000),
                ("add_mixed",
                 (lambda: a.add_mixed(a_aff)) if hasattr(a, "add_mixed")
                 else (lambda: a + a_aff.to_projective()), 2000),
                ("scalar_mul", lambda: a * s, 20),
                ("is_on_curve", lambda: a_aff.is_on_curve(), 2000),
                ("is_torsion_free", lambda: a_aff.is_torsion_free(), 20),
                ("deserialize", lambda: aff.from_bytes(enc), 20),
                ("batch_normalize",
                 lambda: proj.batch_normalize([a] * 64), 10)):
            _emit(f"host/{name}/{op}", _time_op(fn, reps) * 1e6, "us/op")


def bench_host_jubjub_points():
    """point_bench.rs (jubjub Edwards ops)."""
    from ..curves.jubjub import JubjubExtended
    from ..fields import JubjubFr

    rng = random.Random(13)
    a = JubjubExtended.generator() * JubjubFr(rng.getrandbits(250))
    b = JubjubExtended.generator() * JubjubFr(rng.getrandbits(250))
    s = JubjubFr(rng.getrandbits(250))
    for op, fn, reps in (("add", lambda: a + b, 5000),
                         ("double", lambda: a.double(), 5000),
                         ("scalar_mul", lambda: a * s, 50)):
        _emit(f"host/jubjub_point/{op}", _time_op(fn, reps) * 1e6, "us/op")


def bench_pairing_phases():
    """groups.rs:10-29: full pairing, G2 prep, miller loop, final exp."""
    from ..curves.g1 import G1Projective
    from ..curves.g2 import G2Projective
    from ..curves.pairing import (G2Prepared, final_exponentiation,
                                  multi_miller_loop, pairing)
    from ..fields import Fr

    rng = random.Random(14)
    p = (G1Projective.generator() * Fr(rng.getrandbits(100))).to_affine()
    q = (G2Projective.generator() * Fr(rng.getrandbits(100))).to_affine()
    prep = G2Prepared(q)
    f = multi_miller_loop([(p, prep)])
    for op, fn, reps in (
            ("full_pairing", lambda: pairing(p, q), 5),
            ("g2_preparation", lambda: G2Prepared(q), 10),
            ("miller_loop", lambda: multi_miller_loop([(p, prep)]), 10),
            ("final_exponentiation", lambda: final_exponentiation(f), 10)):
        _emit(f"host/pairing/{op}", _time_op(fn, reps) * 1e3, "ms/op")


def bench_hash_to_curve():
    """hash_to_curve.rs: XMD expansion + SSWU map, G1 and G2."""
    from ..curves.hash_to_curve import hash_to_curve_g1 as h2c_g1
    from ..curves.hash_to_curve import hash_to_curve_g2

    msg = b"benchmark message"
    dst = b"BLS12381G1_XMD:SHA-256_SSWU_RO_BENCH"
    _emit("host/hash_to_curve/g1", _time_op(
        lambda: h2c_g1(msg, dst), 20) * 1e3, "ms/op")
    _emit("host/hash_to_curve/g2", _time_op(
        lambda: hash_to_curve_g2(msg, dst), 5) * 1e3, "ms/op")


def bench_poseidon_device():
    import jax
    import numpy as np

    from ..ops import poseidon
    from ..ops.limb_field import FR

    batch = 1 << 14
    flat = FR.to_mont_array(list(range(1, batch * 5 + 1)))
    state = np.transpose(
        np.asarray(jax.device_get(flat)).reshape(FR.n_limbs, batch, 5),
        (2, 0, 1))
    state = jax.device_put(state)
    fn = jax.jit(poseidon.hades_permute_batch)
    jax.block_until_ready(fn(state))
    per = _time_op(lambda: jax.block_until_ready(fn(state)), 5)
    _emit("device/poseidon/permutation", batch / per, "hashes/s",
          batch=batch)


def bench_ntt_device(sizes=(1 << 12, 1 << 14, 1 << 16)):
    import jax

    from ..ops.limb_field import FR
    from ..ops.ntt import Domain

    rng = random.Random(15)
    from .. import params

    for n in sizes:
        dom = Domain(n)
        x = FR.to_mont_array(
            [rng.randrange(params.FR_MODULUS) for _ in range(n)])
        fn = jax.jit(dom.fft_device)
        jax.block_until_ready(fn(x))
        per = _time_op(lambda: jax.block_until_ready(fn(x)), 5)
        _emit(f"device/ntt/2^{n.bit_length() - 1}", n / per / 1e6,
              "M elems/s", ms_per_call=round(per * 1e3, 2))


def bench_msm_device(sizes=(1 << 12, 1 << 14, 1 << 16)):
    from ..curves.g1 import G1Affine, G1Projective
    from ..fields import Fr
    from ..ops.msm import MSMContext

    rng = random.Random(16)
    nmax = max(sizes)
    base = G1Affine.generator().to_projective()
    acc = base
    points = []
    for i in range(nmax):
        points.append(acc)
        acc = acc + acc if (i + 1) % 2 else acc + base
    points = G1Projective.batch_normalize(points)
    scalars = [Fr(rng.randrange(Fr.MODULUS)) for _ in range(nmax)]
    ctx = MSMContext(points)
    for n in sizes:
        sc = scalars[:n]
        ctx.msm(sc)  # compile+warm
        per = _time_op(lambda: ctx.msm(sc), 3, warmup=0)
        _emit(f"device/msm/2^{n.bit_length() - 1}", n / per, "points/s",
              ms_per_call=round(per * 1e3, 1))


def bench_prove_verify(capacity_log2: int = 12):
    from ..fields import Fr
    from ..merkle.poseidon_tree import Item, PoseidonTree
    from ..plonk import Compiler, PublicParameters
    from ..rng import StdRng
    from ..service.batch import OpeningCircuit

    tree = PoseidonTree(3)
    for i in range(9):
        tree.insert(i, Item(Fr(1000 + i)))
    leaf = Item(Fr(1004))
    opening = tree.opening(4)

    t0 = time.monotonic()
    pp = PublicParameters.setup(1 << capacity_log2, StdRng(42))
    _emit("e2e/srs_setup", time.monotonic() - t0, "s",
          capacity=f"2^{capacity_log2}")
    t0 = time.monotonic()
    prover, verifier = Compiler.compile_with_circuit(
        pp, b"bench", OpeningCircuit(opening, leaf))
    _emit("e2e/compile", time.monotonic() - t0, "s",
          gates=prover.constraints, domain=prover.size)
    circ = OpeningCircuit(opening, leaf)
    t0 = time.monotonic()
    proof, pis = prover.prove(StdRng(7), circ)
    _emit("e2e/prove_first", time.monotonic() - t0, "s")
    per = _time_op(lambda: prover.prove(StdRng(7), circ), 3, warmup=0)
    _emit("e2e/prove_warm", per, "s")
    per = _time_op(lambda: verifier.verify(proof, pis), 3, warmup=1)
    _emit("e2e/verify", per * 1e3, "ms")


ALL = {
    "host-fields": bench_host_fields,
    "host-groups": bench_host_groups,
    "host-jubjub": bench_host_jubjub_points,
    "pairing": bench_pairing_phases,
    "hash-to-curve": bench_hash_to_curve,
    "poseidon": bench_poseidon_device,
    "ntt": bench_ntt_device,
    "msm": bench_msm_device,
    "prove": bench_prove_verify,
}


def run_all(only=None):
    for name, fn in ALL.items():
        if only and name not in only:
            continue
        try:
            fn()
        except Exception as exc:  # keep the suite going; report the gap
            _emit(f"error/{name}", 0, "error", detail=str(exc)[:200])
