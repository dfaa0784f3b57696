"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import random

import jax
import pytest
from jax.sharding import Mesh

from zkvm_tpu.curves.g1 import G1Affine
from zkvm_tpu.curves.msm import msm_variable_base
from zkvm_tpu.fields import Fr
from zkvm_tpu.ops.msm import msm_sharded


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 virtual devices")
    return devs


def test_msm_sharded_matches_host(devices):
    rng = random.Random(11)
    n = 300
    pts = [(G1Affine.generator() * Fr(rng.randrange(Fr.MODULUS))).to_affine()
           for _ in range(n)]
    scs = [Fr(rng.randrange(Fr.MODULUS)) for _ in range(n)]
    scs[0] = Fr.zero()
    expected = msm_variable_base(pts, scs)
    for nd in (4, len(devices)):
        mesh = Mesh(devices[:nd], ("points",))
        assert msm_sharded(pts, scs, mesh) == expected


def test_dryrun_multichip_entrypoint(devices):
    import __graft_entry__ as g

    g.dryrun_multichip(min(8, len(devices)))
