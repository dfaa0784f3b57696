"""Host MSM tests (pippenger vs msm_variable_base vs naive), mirroring
coset-bls12_381/src/coset/multiscalar_mul.rs:240-278."""

import random

from zkvm_tpu.fields import Fr
from zkvm_tpu.curves import G1Affine, G1Projective
from zkvm_tpu.curves.msm import msm_variable_base, pippenger


def _setup(n, seed):
    rng = random.Random(seed)
    g = G1Projective.generator()
    points = [(g * rng.getrandbits(64)).to_affine() for _ in range(n)]
    scalars = [Fr(rng.getrandbits(260)) for _ in range(n)]
    return points, scalars


def _naive(points, scalars):
    acc = G1Projective.identity()
    for p, s in zip(points, scalars):
        acc = acc + p * s
    return acc


def test_msm_variable_base_matches_naive():
    for n in (1, 2, 7, 33):
        points, scalars = _setup(n, 100 + n)
        assert msm_variable_base(points, scalars) == _naive(points, scalars)


def test_pippenger_matches_naive_shrinking():
    # multiscalar_mul.rs:240-269 shrinking-sample structure
    points, scalars = _setup(32, 200)
    while points:
        assert pippenger(zip(points, scalars)) == _naive(points, scalars)
        points = points[: len(points) // 2]
        scalars = scalars[: len(scalars) // 2]


def test_msm_empty_and_zero():
    assert msm_variable_base([], []).is_identity()
    points, _ = _setup(4, 300)
    zeros = [Fr.zero()] * 4
    assert msm_variable_base(points, zeros).is_identity()
