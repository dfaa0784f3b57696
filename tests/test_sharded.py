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


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_dryrun_multichip_entrypoint(devices, n_devices):
    import __graft_entry__ as g

    if len(devices) < n_devices:
        pytest.skip(f"needs >= {n_devices} virtual devices")
    g.dryrun_multichip(n_devices)


def test_distributed_ntt_matches_single_chip(devices):
    from jax.sharding import Mesh

    from zkvm_tpu.ops.limb_field import FR
    from zkvm_tpu.ops.ntt import Domain
    from zkvm_tpu.ops.ntt_sharded import DistributedDomain

    rng = random.Random(17)
    for n, nd in ((256, 4), (1024, min(8, len(devices)))):
        vals = [rng.randrange(Fr.MODULUS) for _ in range(n)]
        x = FR.to_mont_array(vals)
        mesh = Mesh(devices[:nd], ("ntt",))
        dd = DistributedDomain(n, mesh)
        ref = FR.from_mont_array(Domain(n).fft_device(x))
        got = dd.fft_device(x)
        assert FR.from_mont_array(got) == ref
        assert FR.from_mont_array(dd.ifft_device(got)) == vals


def test_distributed_ntt_device_sweep(devices):
    """Shard-count sweep: any pow-2 mesh at any pow-2 domain works (small
    domains and non-pow-2 meshes fall back to a replicated local
    transform); forward/inverse/coset all bit-equal to single chip."""
    from zkvm_tpu.ops.limb_field import FR
    from zkvm_tpu.ops.ntt import Domain
    from zkvm_tpu.ops.ntt_sharded import DistributedDomain

    rng = random.Random(23)
    cases = [(1 << 10, 2), (1 << 10, 8), (1 << 12, 4), (1 << 12, 8),
             (64, 8),     # too small to split over 8: local fallback
             (1 << 10, 3)]  # non-pow-2 mesh: local fallback
    for n, nd in cases:
        if len(devices) < nd:
            continue
        vals = [rng.randrange(Fr.MODULUS) for _ in range(n)]
        x = FR.to_mont_array(vals)
        mesh = Mesh(devices[:nd], ("ntt",))
        dd = DistributedDomain(n, mesh)
        dom = Domain(n)
        got = dd.fft_device(x)
        assert (jax.device_get(got)
                == jax.device_get(dom.fft_device(x))).all(), (n, nd)
        assert FR.from_mont_array(dd.ifft_device(got)) == vals, (n, nd)
        gotc = dd.coset_fft_device(x)
        assert (jax.device_get(gotc)
                == jax.device_get(dom.coset_fft_device(x))).all(), (n, nd)
        assert FR.from_mont_array(dd.coset_ifft_device(gotc)) == vals, (
            n, nd)


def test_dryrun_fixture_matches_single_chip_prove():
    """Pin tests/fixtures/dryrun_proof_v1.bin to a fresh single-chip prove.

    dryrun_multichip compares its mesh proof against this fixture instead
    of re-proving single-chip in-process (halves the cold-compile bill on
    the driver's 1-core box), so the fixture must track any change that
    affects proof bytes -- this test is that tripwire.  Regenerate with
    tools/gen_dryrun_fixture.py if it fails after an intentional change."""
    import os

    from zkvm_tpu.utils import dryrun

    repo_root = os.path.join(os.path.dirname(__file__), os.pardir)
    ref_bytes, ref_pis = dryrun.load_fixture(dryrun.fixture_path(repo_root))

    prover, verifier = dryrun.dryrun_prover()
    proof, pis = dryrun.prove_dryrun(prover)
    assert proof.to_bytes() == ref_bytes, (
        "single-chip proof drifted from the committed dryrun fixture; "
        "rerun tools/gen_dryrun_fixture.py if the change is intended")
    assert pis == ref_pis, (
        "public inputs drifted from the committed dryrun fixture; "
        "rerun tools/gen_dryrun_fixture.py if the change is intended")
    verifier.verify(proof, pis)
