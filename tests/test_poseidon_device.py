"""Device Poseidon kernel vs host reference (bit-equality)."""

import random

import jax.numpy as jnp
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
    flat = FR.to_mont_array([v for s in states for v in s])  # [L, batch*5]
    arr = jnp.transpose(flat.reshape(FR.n_limbs, batch, 5), (2, 0, 1))
    out = dp.hades_permute_batch(arr)           # [5, L, batch]
    got = FR.from_mont_array(out)               # row-major: (row, b)
    permuted = [hades_permute(s) for s in states]
    expected = [permuted[b][row] for row in range(5) for b in range(batch)]
    assert got == expected


def test_merkle4_digest_batch_matches_hash():
    rng = random.Random(92)
    batch = 5
    groups = [[rng.getrandbits(260) % Fr.MODULUS for _ in range(4)] for _ in range(batch)]
    flat = FR.to_mont_array([v for g in groups for v in g])
    arr = jnp.transpose(flat.reshape(FR.n_limbs, batch, 4), (2, 0, 1))
    got = FR.from_mont_array(dp.merkle4_digest_batch(arr))
    expected = [Hash.digest(Domain.Merkle4, [Fr(v) for v in g])[0].value for g in groups]
    assert got == expected


def test_merkle_tree_levels():
    rng = random.Random(93)
    n = 16
    leaves = [rng.getrandbits(260) % Fr.MODULUS for _ in range(n)]
    arr = FR.to_mont_array(leaves)
    levels = dp.merkle_tree_levels(arr)
    assert [l.shape[-1] for l in levels] == [16, 4, 1]
    # root equals host-side recursive digest
    host = [Fr(v) for v in leaves]
    while len(host) > 1:
        host = [Hash.digest(Domain.Merkle4, host[i:i + 4])[0] for i in range(0, len(host), 4)]
    assert FR.from_mont_array(levels[-1])[0] == host[0].value
