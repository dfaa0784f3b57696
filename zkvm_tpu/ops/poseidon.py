"""Batched Poseidon/Hades on device: [5, L, batch] limb tensors (limb-major,
batch on the 128-wide vector lanes).

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


def _const_mont(vals_2d, extra_row_axis=False) -> jnp.ndarray:
    """[(rows,) cols, L, 1] Montgomery constants from a 2-D int table."""
    rows = len(vals_2d)
    cols = len(vals_2d[0])
    flat = [v for row in vals_2d for v in row]
    arr = np.asarray(FR.to_mont_array(flat))  # [L, rows*cols]
    return jnp.asarray(arr.T.reshape(rows, cols, FR.n_limbs)[..., None])


_ARC = _const_mont(ROUND_CONSTANTS)          # [68, 5, L, 1]
_MDS = _const_mont(MDS_MATRIX)               # [5, 5, L, 1]
_MASK = np.zeros((_ROUNDS, _W), dtype=np.uint32)
_MASK[:_HALF, :] = 1
_MASK[_HALF + params.HADES_PARTIAL_ROUNDS:, :] = 1
_MASK[_HALF:_HALF + params.HADES_PARTIAL_ROUNDS, _W - 1] = 1
_MASK_J = jnp.asarray(_MASK)


def hades_permute_batch(state: jnp.ndarray) -> jnp.ndarray:
    """68 Hades rounds over [5, L, B] Montgomery-form state tensors.

    On TPU this dispatches to the fused pallas kernel (VMEM-resident rounds,
    zkvm_tpu/ops/pallas_field.py); elsewhere to the jnp path below."""
    from . import pallas_field

    if pallas_field._on_tpu():
        return pallas_field.hades_permute_pallas(state)
    return _hades_permute_jnp(state)


@jax.jit
def _hades_permute_jnp(state: jnp.ndarray) -> jnp.ndarray:

    def round_body(r, s):
        arc = jnp.broadcast_to(_ARC[r], s.shape)
        s = lf.add(FR, s, arc)
        x2 = lf.mont_mul(FR, s, s)
        x4 = lf.mont_mul(FR, x2, x2)
        x5 = lf.mont_mul(FR, x4, s)
        mask = _MASK_J[r]  # [5]
        s = jnp.where((mask != 0)[:, None, None], x5, s)
        # MDS: out[row] = sum_col MDS[row, col] * s[col]
        big = s.shape[:-3] + (_W, _W) + s.shape[-2:]
        prod = lf.mont_mul(
            FR,
            jnp.broadcast_to(s[..., None, :, :, :], big),
            jnp.broadcast_to(_MDS, big),
        )
        out = prod[..., 0, :, :]
        for c in range(1, _W):
            out = lf.add(FR, out, prod[..., c, :, :])
        return out

    return jax.lax.fori_loop(0, _ROUNDS, round_body, state)


@functools.lru_cache(maxsize=None)
def _domain_tag_mont(domain_value: int, n_inputs: int, n_outputs: int) -> np.ndarray:
    """Host-computed SAFE domain tag, Montgomery limbs [L]."""
    io = aggregate_io_pattern([Call.absorb(n_inputs), Call.squeeze(n_outputs)])
    tag = Fr.hash_to_scalar(tag_input(io, domain_value))
    return lf.int_to_limbs(tag.value * FR.R % FR.modulus, FR.n_limbs)


@jax.jit
def _merkle4_impl(children: jnp.ndarray, tag: jnp.ndarray) -> jnp.ndarray:
    batch = children.shape[-1]
    tag_row = jnp.broadcast_to(tag[None, :, None],
                               (1, FR.n_limbs, batch))
    state = jnp.concatenate([tag_row, children], axis=0)
    return hades_permute_batch(state)[1]


def merkle4_digest_batch(children: jnp.ndarray) -> jnp.ndarray:
    """Hash.digest(Domain::Merkle4) for [4, L, batch] children -> [L, batch].

    Rate 4 = one absorb pass + one squeeze permutation: exactly one Hades
    permutation per node (hash.rs:98-120 semantics for 4 inputs/1 output).
    """
    tag = jnp.asarray(_domain_tag_mont(Domain.Merkle4.value, 4, 1))
    return _merkle4_impl(children, tag)


def merkle_tree_levels(leaf_hashes: jnp.ndarray) -> list[jnp.ndarray]:
    """Build all levels of an arity-4 Poseidon Merkle tree, leaves upward.

    leaf_hashes: [L, n] with n a power of 4.  Returns [leaves, ..., root[L, 1]].
    """
    levels = [leaf_hashes]
    cur = leaf_hashes
    while cur.shape[-1] > 1:
        n = cur.shape[-1]
        children = jnp.moveaxis(cur.reshape(FR.n_limbs, n // 4, 4), 2, 0)
        cur = merkle4_digest_batch(children)
        levels.append(cur)
    return levels
