"""Batched Poseidon/Hades on device: [batch, 5, L] limb tensors.

One uniform masked round body under `lax.fori_loop` (full rounds s-box all 5
lanes, partial rounds only lane 4), MDS as a broadcast Montgomery
multiply-reduce.  Flagship hot kernel of the hashing path -- the host
reference is zkvm_tpu/hashes/hades.py; bit-equality is tested in
tests/test_poseidon_device.py.

Also provides the arity-4 Merkle digest (one permutation per node) and a
level-wise Merkle tree builder used by zkvm_tpu.merkle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from ..fields import Fr
from ..hashes.poseidon_constants import MDS_MATRIX, ROUND_CONSTANTS
from ..hashes.safe import Call, aggregate_io_pattern, tag_input
from ..hashes.poseidon import Domain
from . import limb_field as lf
from .limb_field import FR

_W = params.HADES_WIDTH
_ROUNDS = params.HADES_ROUNDS
_HALF = params.HADES_FULL_ROUNDS // 2


def _const_mont(vals_2d) -> jnp.ndarray:
    flat = [v for row in vals_2d for v in row]
    arr = FR.to_mont_array(flat)
    return arr.reshape(len(vals_2d), len(vals_2d[0]), FR.n_limbs)


_ARC = _const_mont(ROUND_CONSTANTS)          # [68, 5, L]
_MDS = _const_mont(MDS_MATRIX)               # [5, 5, L]
_MASK = np.zeros((_ROUNDS, _W), dtype=np.uint32)
_MASK[:_HALF, :] = 1
_MASK[_HALF + params.HADES_PARTIAL_ROUNDS:, :] = 1
_MASK[_HALF:_HALF + params.HADES_PARTIAL_ROUNDS, _W - 1] = 1
_MASK_J = jnp.asarray(_MASK)


@jax.jit
def hades_permute_batch(state: jnp.ndarray) -> jnp.ndarray:
    """68 Hades rounds over [..., 5, L] Montgomery-form state tensors."""

    def round_body(r, s):
        arc = jnp.broadcast_to(_ARC[r], s.shape)
        s = lf.add(FR, s, arc)
        x2 = lf.mont_mul(FR, s, s)
        x4 = lf.mont_mul(FR, x2, x2)
        x5 = lf.mont_mul(FR, x4, s)
        mask = _MASK_J[r]  # [5]
        s = jnp.where((mask != 0)[:, None], x5, s)
        # MDS: out[row] = sum_col MDS[row, col] * s[col]
        prod = lf.mont_mul(
            FR,
            jnp.broadcast_to(s[..., None, :, :], s.shape[:-2] + (_W, _W, FR.n_limbs)),
            jnp.broadcast_to(_MDS, s.shape[:-2] + (_W, _W, FR.n_limbs)),
        )
        out = prod[..., 0, :]
        for c in range(1, _W):
            out = lf.add(FR, out, prod[..., c, :])
        return out

    return jax.lax.fori_loop(0, _ROUNDS, round_body, state)


@functools.lru_cache(maxsize=None)
def _domain_tag_mont(domain_value: int, n_inputs: int, n_outputs: int) -> np.ndarray:
    """Host-computed SAFE domain tag, Montgomery limbs."""
    io = aggregate_io_pattern([Call.absorb(n_inputs), Call.squeeze(n_outputs)])
    tag = Fr.hash_to_scalar(tag_input(io, domain_value))
    return lf.int_to_limbs(tag.value * FR.R % FR.modulus, FR.n_limbs)


@jax.jit
def _merkle4_impl(children: jnp.ndarray, tag: jnp.ndarray) -> jnp.ndarray:
    batch = children.shape[:-2]
    state = jnp.concatenate(
        [jnp.broadcast_to(tag, batch + (1, FR.n_limbs)), children], axis=-2)
    return hades_permute_batch(state)[..., 1, :]


def merkle4_digest_batch(children: jnp.ndarray) -> jnp.ndarray:
    """Hash.digest(Domain::Merkle4) for [batch, 4, L] children -> [batch, L].

    Rate 4 = one absorb pass + one squeeze permutation: exactly one Hades
    permutation per node (hash.rs:98-120 semantics for 4 inputs/1 output).
    """
    tag = jnp.asarray(_domain_tag_mont(Domain.Merkle4.value, 4, 1))
    return _merkle4_impl(children, tag)


def merkle_tree_levels(leaf_hashes: jnp.ndarray) -> list[jnp.ndarray]:
    """Build all levels of an arity-4 Poseidon Merkle tree, leaves upward.

    leaf_hashes: [n, L] with n a power of 4.  Returns [leaves, ..., root[1, L]].
    """
    levels = [leaf_hashes]
    cur = leaf_hashes
    while cur.shape[0] > 1:
        cur = merkle4_digest_batch(cur.reshape(cur.shape[0] // 4, 4, FR.n_limbs))
        levels.append(cur)
    return levels
