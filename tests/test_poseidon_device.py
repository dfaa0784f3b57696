"""Device Poseidon kernel vs host reference (bit-equality)."""

import random

import numpy as np

from zkvm_tpu.fields import Fr
from zkvm_tpu.hashes import Hash, Domain
from zkvm_tpu.hashes.hades import hades_permute
from zkvm_tpu.ops import poseidon as dp
from zkvm_tpu.ops.limb_field import FR


def test_hades_permute_batch_matches_host():
    rng = random.Random(91)
    batch = 7
    states = [[rng.getrandbits(260) % Fr.MODULUS for _ in range(5)] for _ in range(batch)]
    arr = FR.to_mont_array([v for s in states for v in s]).reshape(batch, 5, FR.n_limbs)
    out = dp.hades_permute_batch(arr)
    got = FR.from_mont_array(out)
    expected = [v for s in states for v in hades_permute(s)]
    assert got == expected


def test_merkle4_digest_batch_matches_hash():
    rng = random.Random(92)
    batch = 5
    groups = [[rng.getrandbits(260) % Fr.MODULUS for _ in range(4)] for _ in range(batch)]
    arr = FR.to_mont_array([v for g in groups for v in g]).reshape(batch, 4, FR.n_limbs)
    got = FR.from_mont_array(dp.merkle4_digest_batch(arr))
    expected = [Hash.digest(Domain.Merkle4, [Fr(v) for v in g])[0].value for g in groups]
    assert got == expected


def test_merkle_tree_levels():
    rng = random.Random(93)
    n = 16
    leaves = [rng.getrandbits(260) % Fr.MODULUS for _ in range(n)]
    arr = FR.to_mont_array(leaves)
    levels = dp.merkle_tree_levels(arr)
    assert [l.shape[0] for l in levels] == [16, 4, 1]
    # root equals host-side recursive digest
    host = [Fr(v) for v in leaves]
    while len(host) > 1:
        host = [Hash.digest(Domain.Merkle4, host[i:i + 4])[0] for i in range(0, len(host), 4)]
    assert FR.from_mont_array(levels[-1])[0] == host[0].value
