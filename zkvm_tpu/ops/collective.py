"""Cross-shard scan collectives for the multi-chip prover.

The grand-product accumulator (plonk/src/composer/permutation.rs:181-245)
is a prefix product over the full domain; sharded, it becomes local
associative scans plus an exchange of one edge element per device:

    prefix_i = local_prefix_i * prod(shard totals left of my shard)

The exchange is one all_gather of [D] field elements -- bytes over ICI --
so the scan work stays fully local and bit-exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import limb_field as lf
from .limb_field import FR


def _segment_combine(gathered, my_idx, n_dev, mul, identity, reverse):
    """Product of other shards' totals on my side (exclusive)."""
    acc = identity
    for d in range(n_dev):
        take = (d > my_idx) if reverse else (d < my_idx)
        term = jnp.where(take, gathered[d], identity)
        acc = mul(acc, term)
    return acc


def sharded_scan_mul(x: jnp.ndarray, mesh, axis: str,
                     reverse: bool = False) -> jnp.ndarray:
    """Inclusive prefix (or suffix) product of [16, N] Montgomery lanes,
    sharded over `axis`.  Bit-identical to the single-device
    jax.lax.associative_scan."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    one = jnp.asarray(FR.const_mont(1))
    mul = lambda a, b: lf.mont_mul(FR, a, b)

    def step(x_loc):
        local = jax.lax.associative_scan(mul, x_loc, axis=1,
                                         reverse=reverse)
        edge = local[:, :1] if reverse else local[:, -1:]
        gathered = jax.lax.all_gather(edge, axis, axis=0)  # [D, 16, 1]
        my_idx = jax.lax.axis_index(axis)
        off = _segment_combine(gathered, my_idx, n_dev, mul,
                               jnp.broadcast_to(one, edge.shape), reverse)
        return mul(local, jnp.broadcast_to(off, local.shape))

    fn = shard_map(step, mesh=mesh, in_specs=P(None, axis),
                   out_specs=P(None, axis), check_vma=False)
    return fn(x)
