"""Device Pippenger MSM: fully device-resident bucket accumulation.

The reference MSM (coset-bls12_381/src/coset/multiscalar_mul.rs:143-220) is a
serial bucket scan parallelized over windows with rayon.  A TPU has no
efficient data-dependent scatter, so the bucket accumulation is re-designed
as sort + segmented prefix sums -- every step fixed-shape and on device (the
round-1 design built a pairing schedule on the host per call, which sat on
the critical path of every KZG commit; this version has zero per-call host
work):

  1. digit extraction: canonical 16-bit limbs -> signed radix-2^c digits
     [W, N] (vectorized shifts + a W-step carry sweep);
  2. one stable device sort per window row by |digit| (dead lanes get a
     sentinel bucket and sort to the end);
  3. gather points by the sort permutation, negate where the digit < 0;
  4. inclusive prefix sums of the sorted points via
     `jax.lax.associative_scan` with the complete RCB15 addition as the
     combiner (~1.5 N point adds, log N depth);
  5. bucket sums by difference of prefix values at bucket boundaries
     (boundaries from a vmapped binary search -- empty buckets cancel to
     the identity automatically);
  6. weighted fold  sum_b b*S_b = sum_j (suffix sums)  via a reversed
     associative scan over the bucket axis plus a binary reduction tree;
  7. host: fold the ~W window sums with c doublings each (one bulk
     transfer per call).

Shapes depend only on (N, S, c), so one jit specialization serves all
inputs of a padded size class.  Correctness is pinned against the host
reference MSM (tests/test_msm.py, bench.py sample assert).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.g1 import G1Affine, G1Projective
from ..fields import Fp, Fr
from . import g1_ops
from . import limb_field as lf
from .limb_field import FQ, FR


def _device_threshold() -> int:
    """Minimum MSM size for the device path.

    On TPU the batched kernel wins early; on CPU (tests, dev boxes) the
    pure-python host MSM beats XLA emulation until sizes get large."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    return 1024 if platform != "cpu" else 8192


DEVICE_MSM_THRESHOLD = 1024  # re-evaluated lazily via _device_threshold()

_GRANULE = 1024  # scalar-count padding granule (bounds jit specializations)


def _window_bits(n: int) -> int:
    """Window width: balances total scan work (~W*N point adds, W ~ 256/c)
    against per-window bucket-fold work (~2.5 * 2^(c-1) point adds)."""
    if n <= (1 << 11):
        return 8
    if n <= (1 << 14):
        return 12
    return 13


def _align128(v: int) -> int:
    """Round up to a full vector-lane tile (also sidesteps Mosaic faults
    observed with odd lane counts on real hardware)."""
    return -(-v // 128) * 128


def _granule(n: int) -> int:
    """Padded size class: 128-lane tiles below 1024, _GRANULE tiles above
    (bounds the number of jit specializations without 2x padding waste)."""
    if n <= _GRANULE:
        return _align128(max(n, 1))
    return -(-n // _GRANULE) * _GRANULE


# -----------------------------------------------------------------------------
# Device pipeline
# -----------------------------------------------------------------------------

def _signed_digit_tensors(limbs: jnp.ndarray, c: int):
    """[S, 16, N] canonical u32 limbs -> signed digits [S, W, N] int32."""
    s, n_limbs, n = limbs.shape
    w_count = -(-260 // c)  # cover 256 bits + headroom for the carry sweep
    half = 1 << (c - 1)
    mask = (1 << c) - 1
    uds = []
    for w in range(w_count):
        bit = w * c
        li, sh = bit // 16, bit % 16
        if li >= n_limbs:
            uds.append(jnp.zeros((s, n), jnp.int32))
            continue
        v = limbs[:, li, :] >> sh
        if sh + c > 16 and li + 1 < n_limbs:
            v = v | (limbs[:, li + 1, :] << (16 - sh))
        uds.append((v & mask).astype(jnp.int32))
    carry = jnp.zeros((s, n), jnp.int32)
    ds = []
    for w in range(w_count):
        d = uds[w] + carry
        wrap = d > half
        ds.append(jnp.where(wrap, d - (1 << c), d))
        carry = wrap.astype(jnp.int32)
    return jnp.stack(ds, axis=1)  # [S, W, N]


@functools.partial(jax.jit, static_argnums=(0,))
def _msm_pipeline(c: int, px, py, pz, limbs):
    """points [24, N] Montgomery Fq limbs; limbs [S, 16, N] canonical
    scalars.  Returns [S*W, 24, 1] x/y/z window sums (set-major)."""
    s, _, n = limbs.shape
    half = 1 << (c - 1)
    d = _signed_digit_tensors(limbs, c)
    w_count = d.shape[1]
    b = s * w_count

    bucket = jnp.where(d == 0, half + 1, jnp.abs(d)).reshape(b, n)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    if n <= (1 << 17) and half + 1 <= (1 << 13):
        # pack (bucket, index) into one i32 key: a single-operand sort
        # moves 3x less data through the sort network, and unpacking
        # preserves exactly the stable order the 3-operand sort gives
        packed = jax.lax.sort((bucket.astype(jnp.int32) << 17) | iota,
                              dimension=-1)
        sb = packed >> 17
        perm = packed & ((1 << 17) - 1)
        dsort = jnp.take_along_axis(d.reshape(b, n), perm, axis=1)
    else:
        sb, perm, dsort = jax.lax.sort(
            (bucket.astype(jnp.int32), iota, d.reshape(b, n)),
            dimension=-1, num_keys=1)
    neg = dsort < 0

    x = jnp.moveaxis(jnp.take(px, perm, axis=1), 0, 1)  # [B, 24, N]
    y = jnp.moveaxis(jnp.take(py, perm, axis=1), 0, 1)
    z = jnp.moveaxis(jnp.take(pz, perm, axis=1), 0, 1)
    y = lf.select(neg, lf.neg(FQ, y), y)

    prefix = jax.lax.associative_scan(g1_ops.padd, (x, y, z), axis=2)
    ident = g1_ops.identity_batch((b, 1))
    pref = tuple(jnp.concatenate([i, t], axis=-1)
                 for i, t in zip(ident, prefix))  # [B, L, N+1]

    targets = jnp.arange(half + 1, dtype=jnp.int32)
    cnt = jax.vmap(
        lambda row: jnp.searchsorted(row, targets, side="right"))(sb)
    take = lambda t, idx: jnp.take_along_axis(t, idx[:, None, :], axis=2)
    hi = tuple(take(t, cnt[:, 1:]) for t in pref)
    lo = tuple(take(t, cnt[:, :-1]) for t in pref)
    buckets = g1_ops.padd(hi, g1_ops.pneg(lo))  # [B, L, half]

    # sum_b b*S_b = sum_j suffix_j: reversed scan + binary reduction tree
    suf = jax.lax.associative_scan(g1_ops.padd, buckets, axis=2,
                                   reverse=True)
    m = half
    while m > 1:
        m //= 2
        suf = g1_ops.padd(tuple(t[..., :m] for t in suf),
                          tuple(t[..., m:] for t in suf))
    return suf  # [B, L, 1]


def _host_window_fold(sums_host, c: int, w_count: int, n_sets: int,
                      set_sizes) -> list[G1Projective]:
    """Fold [S*W] device window sums into one point per set (host)."""
    rinv = pow(FQ.R, -1, FQ.modulus)
    results = []
    for s_i in range(n_sets):
        if not set_sizes[s_i]:
            results.append(G1Projective.identity())
            continue
        total = G1Projective.identity()
        for w in range(w_count - 1, -1, -1):
            for _ in range(c):
                total = total.double()
            row = s_i * w_count + w
            coords = [lf.limbs_to_int(h[row, :, 0]) * rinv % FQ.modulus
                      for h in sums_host]
            total = total + G1Projective(Fp(coords[0]), Fp(coords[1]),
                                         Fp(coords[2]))
        results.append(total)
    return results


def _pad_points(points, n_pad: int):
    """[24, n] device point coords -> [24, n_pad], padded with identities."""
    n = points[0].shape[-1]
    if n == n_pad:
        return points
    if n > n_pad:
        return tuple(t[:, :n_pad] for t in points)
    ident = g1_ops.identity_batch((n_pad - n,))
    return tuple(jnp.concatenate([t, i], axis=-1)
                 for t, i in zip(points, ident))


# -----------------------------------------------------------------------------
# Public API
# -----------------------------------------------------------------------------

class MSMContext:
    """Caches the device-resident point set (e.g. a CommitKey's powers)."""

    def __init__(self, points: list[G1Affine]):
        self.points = g1_ops.affine_to_device(points)  # [24, n] coords
        self.n = len(points)

    def msm(self, scalars: list[Fr]) -> G1Projective:
        """MSM of the first len(scalars) points (see msm_many)."""
        return self.msm_many([scalars])[0]

    def msm_many(self, scalar_sets: list[list[Fr]]) -> list[G1Projective]:
        """Several MSMs over (prefixes of) the same point set in ONE device
        pipeline: per-set digit rows stack along the window axis.  Scalar
        counts are padded to the next _GRANULE multiple (dead lanes sort to
        the end and never enter a bucket), so a handful of jit
        specializations serve every size class."""
        sizes = [len(s) for s in scalar_sets]
        n_pad = _granule(max(sizes))
        assert max(sizes) <= self.n
        vals = []
        for scalars in scalar_sets:
            vals.extend([s.value for s in scalars]
                        + [0] * (n_pad - len(scalars)))
        limbs = FR.to_raw_array(vals)  # [16, S*n_pad]
        limbs = jnp.moveaxis(
            limbs.reshape(FR.n_limbs, len(scalar_sets), n_pad), 0, 1)
        return self._run(limbs, sizes, n_pad)

    def msm_many_mont(self, coeff_tensors, mesh=None,
                      axis: str | None = None) -> list[G1Projective]:
        """MSMs from device-resident Montgomery coefficient tensors
        ([16, len_i] u32 each) -- the device-resident prover's commit path
        (no host scalar conversion).  With `mesh`, points and scalars shard
        across the mesh and per-device window sums combine with an
        all_gather (same partial-sum reduction as msm_sharded)."""
        sizes = [int(t.shape[-1]) for t in coeff_tensors]
        assert max(sizes) <= self.n
        if mesh is None:
            n_pad = _granule(max(sizes))
            padded = [jnp.pad(t, [(0, 0), (0, n_pad - t.shape[-1])])
                      for t in coeff_tensors]
            limbs = _from_mont_batch(jnp.stack(padded))  # [S, 16, n_pad]
            return self._run(limbs, sizes, n_pad)
        return self._run_sharded(coeff_tensors, sizes, mesh,
                                 axis or mesh.axis_names[0])

    def _run_sharded(self, coeff_tensors, sizes, mesh,
                     axis: str) -> list[G1Projective]:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n_dev = mesh.devices.size
        shard = _granule(-(-max(sizes) // n_dev))
        n_pad = shard * n_dev
        c = _window_bits(shard)
        pts = _pad_points(self.points, n_pad)
        stacked_pts = tuple(
            jnp.stack([t[:, d * shard:(d + 1) * shard]
                       for d in range(n_dev)]) for t in pts)
        padded = [jnp.pad(t, [(0, 0), (0, n_pad - t.shape[-1])])
                  for t in coeff_tensors]
        limbs = _from_mont_batch(jnp.stack(padded))  # [S, 16, n_pad]
        limbs = jnp.stack(
            [limbs[:, :, d * shard:(d + 1) * shard] for d in range(n_dev)])

        def local_msm(px, py, pz, lmb):
            sums = _msm_pipeline(c, px[0], py[0], pz[0], lmb[0])
            gathered = [jax.lax.all_gather(t, axis, axis=0) for t in sums]
            total = tuple(t[0] for t in gathered)
            for d in range(1, n_dev):
                total = g1_ops.padd(total, tuple(t[d] for t in gathered))
            return total

        fn = jax.jit(shard_map(
            local_msm, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P(), P()), check_vma=False))
        sums = fn(*stacked_pts, limbs)
        host = [np.asarray(t) for t in jax.device_get(sums)]
        w_count = host[0].shape[0] // len(sizes)
        return _host_window_fold(host, c, w_count, len(sizes), sizes)

    def _padded(self, n_pad):
        """Padded device point tensors + infinity flags, cached per size
        class (the pad/flag ops are eager device calls -- one tunnel round
        trip each on remote TPUs, so they must not run per commit)."""
        cache = getattr(self, "_pad_cache", None)
        if cache is None:
            cache = self._pad_cache = {}
        ent = cache.get(n_pad)
        if ent is None:
            pts = _pad_points(self.points, n_pad)
            pinf = jnp.all(pts[2] == 0, axis=0).astype(jnp.uint32)
            ent = cache[n_pad] = (pts, pinf)
        return ent

    def _run(self, limbs, sizes, n_pad) -> list[G1Projective]:
        from . import msm_tree

        pts, pinf = self._padded(n_pad)
        if n_pad >= msm_tree.TREE_MIN_POINTS:
            c = msm_tree.TREE_WINDOW_BITS
            sums = msm_tree._msm_tree_pipeline(c, pts[0], pts[1], pinf,
                                               limbs)
        else:
            c = _window_bits(n_pad)
            sums = _msm_pipeline(c, *pts, limbs)
        host = [np.asarray(t) for t in jax.device_get(sums)]
        w_count = host[0].shape[0] // len(sizes)
        return _host_window_fold(host, c, w_count, len(sizes), sizes)


@jax.jit
def _from_mont_batch(mont):
    """[S, 16, N] Montgomery -> canonical limbs (limb axis at -2 for lf)."""
    return lf.from_mont(FR, mont)


def msm_device(points: list[G1Affine], scalars: list[Fr]) -> G1Projective:
    """One-shot device MSM (context built per call; cache MSMContext for hot
    paths like CommitKey.commit)."""
    assert len(points) >= len(scalars)
    return MSMContext(points[: len(scalars)]).msm(scalars)


# -----------------------------------------------------------------------------
# Multi-chip MSM: point shards per device, window sums combined across chips
# -----------------------------------------------------------------------------

def msm_sharded(points: list[G1Affine], scalars: list[Fr], mesh,
                axis: str = "points") -> G1Projective:
    """MSM sharded over a device mesh (BASELINE north-star component).

    Points and scalars are split evenly across the mesh's devices; every
    device runs the full bucket pipeline on its slice, then the per-device
    window sums -- one point per window -- are combined with an all_gather
    and a short addition tree.  Communication: D*W points (a few KB), the
    classic Pippenger partial-sum reduction pattern.
    """
    n_dev = mesh.devices.size
    n = len(scalars)
    assert len(points) >= n
    shard = _granule(-(-n // n_dev))
    n_pad = shard * n_dev
    c = _window_bits(shard)

    base = g1_ops.affine_to_device(points[:n])
    base = _pad_points(base, n_pad)
    stacked_pts = tuple(
        jnp.stack([t[:, d * shard:(d + 1) * shard] for d in range(n_dev)])
        for t in base)  # [D, 24, shard]

    vals = [s.value for s in scalars] + [0] * (n_pad - n)
    limbs = FR.to_raw_array(vals)  # [16, n_pad]
    limbs = jnp.stack(
        [limbs[None, :, d * shard:(d + 1) * shard] for d in range(n_dev)])
    # [D, 1, 16, shard]

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local_msm(pts_x, pts_y, pts_z, lmb):
        sums = _msm_pipeline(c, pts_x[0], pts_y[0], pts_z[0], lmb[0])
        gathered = [jax.lax.all_gather(t, axis, axis=0) for t in sums]
        total = tuple(t[0] for t in gathered)
        for d in range(1, n_dev):
            total = g1_ops.padd(total, tuple(t[d] for t in gathered))
        return total

    fn = jax.jit(shard_map(
        local_msm, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False))
    sums = fn(*stacked_pts, limbs)

    host = [np.asarray(t) for t in jax.device_get(sums)]
    return _host_window_fold(host, c, host[0].shape[0], 1, [n])[0]
