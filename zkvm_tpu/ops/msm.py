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
  4. bucket accumulation of the sorted points -- two interchangeable
     strategies sharing the same tail:
       * scan (small N): inclusive prefix sums via
         `jax.lax.associative_scan` with the complete RCB15 addition as
         the combiner (~2.3 N point adds over up+down sweeps);
       * halving tree (N >= PTREE_MIN_POINTS, `_msm_ptree_pipeline`):
         ~1.0 N point adds -- see the block comment above it;
  5. bucket sums by difference of prefix values at bucket boundaries
     (boundaries from a vmapped binary search -- empty buckets cancel to
     the identity automatically);
  6. weighted fold  sum_b b*S_b = sum_j (suffix sums)  via a reversed
     associative scan over the bucket axis plus a binary reduction tree;
  7. fold the ~W window sums with c doublings each -- a device lax.scan on
     TPU (one S-point transfer per call), host bigints elsewhere.

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


def _lean_scan_enabled() -> bool:
    """Compile-lean combiner scans off-TPU (override: ZKVM_LEAN_SCAN=0/1).

    `associative_scan` inlines the complete-padd combiner at every one of
    its ~2*log2(M) levels; on the driver's 1-core CPU dryrun each MSM
    program then takes minutes of XLA compile (round 3 timed out on
    exactly this).  The lean variants trade a log-factor of extra point
    adds -- irrelevant at test/dryrun scale -- for a single compiled padd
    site per scan."""
    import os

    env = os.environ.get("ZKVM_LEAN_SCAN")
    if env is not None:
        return env != "0"
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True


def _lanes_first(t):
    """[..., L, M] triple -> [M, ..., L, 1] (one lane per scan step)."""
    return tuple(jnp.moveaxis(c, -1, 0)[..., None] for c in t)


def _lanes_last(t):
    """Inverse of `_lanes_first`."""
    return tuple(jnp.moveaxis(c[..., 0], 0, -1) for c in t)


def _scan_padd(t, reverse: bool = False):
    """Inclusive prefix (suffix when `reverse`) scan of complete padds over
    the last axis of an [..., L, M] point triple.  TPU: associative_scan
    (log-depth, ~2M point adds, full lane parallelism).  Elsewhere: ONE
    sequential lax.scan over lanes -- M point adds (work-optimal) and a
    single compiled padd site, which is what the 1-core CPU dryrun and the
    CPU test suite are bound by."""
    m = t[0].shape[-1]
    if m <= 1:
        return t
    if not _lean_scan_enabled():
        return jax.lax.associative_scan(g1_ops.padd, t, axis=t[0].ndim - 1,
                                        reverse=reverse)
    xs = _lanes_first(t)
    if reverse:
        xs = tuple(c[::-1] for c in xs)
    carry0 = g1_ops.identity_batch(t[0].shape[:-2] + (1,))

    def body(carry, lane):
        nxt = g1_ops.padd(carry, lane)
        return nxt, nxt

    _, ys = jax.lax.scan(body, carry0, xs)
    if reverse:
        ys = tuple(c[::-1] for c in ys)
    return _lanes_last(ys)


def _reduce_padd_lanes(t):
    """Fold an [..., L, M] point triple to [..., L, 1] (sum of all lanes).

    TPU: unrolled binary halving tree (log2(M) padd dispatches, full lane
    parallelism).  Elsewhere: one sequential lax.scan (M adds, one site)."""
    m = t[0].shape[-1]
    if not _lean_scan_enabled():
        while m > 1:
            m //= 2
            t = g1_ops.padd(tuple(c[..., :m] for c in t),
                            tuple(c[..., m:] for c in t))
        return t
    if m <= 1:
        return t
    carry0 = g1_ops.identity_batch(t[0].shape[:-2] + (1,))

    def body(carry, lane):
        return g1_ops.padd(carry, lane), None

    out, _ = jax.lax.scan(body, carry0, _lanes_first(t))
    return out


def _combine_gathered(gathered):
    """Sum a [D, ...] all_gather of window-sum triples over axis 0 with one
    compiled padd site (a lax.scan; D is small)."""
    head = tuple(t[0] for t in gathered)
    rest = tuple(t[1:] for t in gathered)

    def body(acc, p):
        return g1_ops.padd(acc, p), None

    total, _ = jax.lax.scan(body, head, rest)
    return total


def _sharded_local_msm(c, axis, n_dev, px, py, pz, lmb):
    sums = _msm_pipeline(c, px[0], py[0], pz[0], lmb[0])
    gathered = [jax.lax.all_gather(t, axis, axis=0) for t in sums]
    return _combine_gathered(gathered)


@functools.lru_cache(maxsize=None)
def _sharded_msm_jit(mesh, axis: str, c: int):
    """One jitted shard_map MSM program per (mesh, axis, window) -- rebuilding
    the closure per call would retrace (seconds) on every commit."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    fn = functools.partial(_sharded_local_msm, c, axis, mesh.devices.size)
    return jax.jit(shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()), check_vma=False))


def _bucket_sums_dense(sb, x, y, z, half):
    """Bucket-sorted points -> dense bucket sums [B, L, half].

    sb [B, M] ascending bucket ids (sentinel > half sorts last); x/y/z
    [B, L, M] projective Montgomery points.  Inclusive prefix scan ->
    bucket sums as boundary differences (empty buckets cancel to the
    identity); slot k holds the sum of bucket k+1."""
    b = sb.shape[0]
    prefix = _scan_padd((x, y, z))
    ident = g1_ops.identity_batch((b, 1))
    pref = tuple(jnp.concatenate([i, t], axis=-1)
                 for i, t in zip(ident, prefix))  # [B, L, M+1]

    targets = jnp.arange(half + 1, dtype=jnp.int32)
    cnt = jax.vmap(
        lambda row: jnp.searchsorted(row, targets, side="right"))(sb)
    take = lambda t, idx: jnp.take_along_axis(t, idx[:, None, :], axis=2)
    hi = tuple(take(t, cnt[:, 1:]) for t in pref)
    lo = tuple(take(t, cnt[:, :-1]) for t in pref)
    return g1_ops.padd(hi, g1_ops.pneg(lo))  # [B, L, half]


def _scatter_dense(rs, coords, half):
    """Rows of DISTINCT sorted bucket ids -> dense [B, L, half] slots.

    rs [B, half] ascending ids in [1, half] with sentinel padding; coords
    [B, L, half] points (sentinel lanes parked at the identity).  Each
    real id appears at most once per row, so slot k is a binary-search
    gather of bucket k+1 (identity when absent) -- no scan needed."""
    targets = jnp.arange(1, half + 1, dtype=jnp.int32)
    pos = jax.vmap(lambda row: jnp.searchsorted(row, targets))(rs)
    idx = jnp.minimum(pos, half - 1)
    found = jnp.take_along_axis(rs, idx, axis=1) == targets[None, :]
    out = tuple(jnp.take_along_axis(t, idx[:, None, :], axis=2)
                for t in coords)
    zero = jnp.zeros_like(out[0])
    one = jnp.broadcast_to(
        jnp.asarray(np.asarray(FQ.one_mont, dtype=np.uint32))[:, None],
        out[1].shape)
    return (lf.select(found, out[0], zero), lf.select(found, out[1], one),
            lf.select(found, out[2], zero))


def _weighted_fold(buckets):
    """Dense bucket sums [B, L, half] -> sum_b (b+1)*S_b as [B, L, 1] via
    suffix sums (reversed scan) plus a lane reduction."""
    suf = _scan_padd(buckets, reverse=True)
    return _reduce_padd_lanes(suf)


def _scan_bucket_fold(sb, x, y, z, half):
    """Bucket-sorted points -> weighted per-row window sums [B, L, 1]."""
    return _weighted_fold(_bucket_sums_dense(sb, x, y, z, half))


@functools.partial(jax.jit, static_argnums=(0,))
def _msm_pipeline(c: int, px, py, pz, limbs):
    """points [24, N] Montgomery Fq limbs; limbs [S, 16, N] canonical
    scalars.  Returns [S*W, 24, 1] x/y/z window sums (set-major)."""
    s, _, n = limbs.shape
    half = 1 << (c - 1)
    d = _signed_digit_tensors(limbs, c)
    w_count = d.shape[1]
    b = s * w_count

    dflat = d.reshape(b, n)
    bucket = jnp.where(dflat == 0, half + 1, jnp.abs(dflat))
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    idx_bits = max(n - 1, 1).bit_length()
    if ((half + 1) << (idx_bits + 1)) < (1 << 31):
        # pack (bucket, sign, index) into one i32 key: a single-operand
        # sort moves 3x less data through the sort network, the sign rides
        # along for free, and unpacking preserves exactly the stable order
        # the 3-operand sort gives
        neg_bit = (dflat < 0).astype(jnp.int32) << idx_bits
        packed = jax.lax.sort(
            (bucket.astype(jnp.int32) << (idx_bits + 1)) | neg_bit | iota,
            dimension=-1)
        sb = packed >> (idx_bits + 1)
        neg = ((packed >> idx_bits) & 1) == 1
        perm = packed & ((1 << idx_bits) - 1)
    else:
        sb, perm, dsort = jax.lax.sort(
            (bucket.astype(jnp.int32), iota, dflat),
            dimension=-1, num_keys=1)
        neg = dsort < 0

    x = jnp.moveaxis(jnp.take(px, perm, axis=1), 0, 1)  # [B, 24, N]
    y = jnp.moveaxis(jnp.take(py, perm, axis=1), 0, 1)
    z = jnp.moveaxis(jnp.take(pz, perm, axis=1), 0, 1)
    y = lf.select(neg, lf.neg(FQ, y), y)

    return _scan_bucket_fold(sb, x, y, z, half)


# -----------------------------------------------------------------------------
# Halving-tree pipeline: the large-N replacement for the inclusive scan
# -----------------------------------------------------------------------------
#
# The scan pipeline's prefix `associative_scan` performs ~2.3 complete point
# additions per lane (up+down sweep).  The halving tree performs ~1.0: at
# each level adjacent lanes merge with ONE complete padd where they share a
# bucket id; the lane that cannot merge (the left of a bucket-boundary pair,
# at most one per bucket per level) is compacted into a `half`-sized reject
# slot by a cheap u32 key sort.  After log2(N/half) levels the residual plus
# all rejects (~(levels+1)*half lanes, ~N/8 at the sizes that matter) feed
# the ordinary scan/boundary/fold tail.  An earlier batch-AFFINE variant
# (ops/msm_tree.py) lost to the scan because its per-level shared inversions
# cost two full-length Montgomery scans each; projective pallas adds need no
# inversions.  Reference semantics: multiscalar_mul.rs:143-220.

# MEASURED (round 3, one v5e): the tree loses below ~2^14 -- its per-level
# reject sorts/gathers outweigh the saved scan padds when the level count
# is shallow (37k points/s @2^13 vs the scan's 44k).
PTREE_MIN_POINTS = 1 << 14


def _ptree_window_bits(n: int) -> int:
    """Tree window width: total work ~ ceil(260/c)*N is minimized by large
    c, but 2^(c-1) buckets must stay << N for the halving levels to bite
    (rejects ~ levels * 2^(c-1) feed a scan-based tail)."""
    if n >= (1 << 16):
        return 11
    return 10


@functools.partial(jax.jit, static_argnums=(0,))
def _msm_ptree_pipeline(c: int, pm, pinf, limbs):
    """Same contract as _msm_pipeline, halving-tree bucket accumulation.

    pm: [N, 72] POINT-MAJOR coords (x|y|z limbs per row) -- a row gather
    of contiguous 288-byte records beats three strided column gathers by
    ~17% on v5e; pinf: [N] bool infinity flags (precomputed per size
    class in MSMContext._padded)."""
    s, _, n = limbs.shape
    half = 1 << (c - 1)
    sent = half + 1
    d = _signed_digit_tensors(limbs, c)
    w_count = d.shape[1]
    b = s * w_count
    dflat = d.reshape(b, n)

    bucket = jnp.where(dflat == 0, sent, jnp.abs(dflat))
    bucket = jnp.where(pinf[None, :], sent, bucket)

    # pack (bucket, sign, index) into ONE i32 sort key: the sign rides the
    # sort for free, skipping a separate [B, N] digit gather afterwards
    idx_bits = max(n - 1, 1).bit_length()
    assert (sent << (idx_bits + 1)) < (1 << 31)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    neg_bit = (dflat < 0).astype(jnp.int32) << idx_bits
    packed = jax.lax.sort(
        (bucket.astype(jnp.int32) << (idx_bits + 1)) | neg_bit | iota,
        dimension=-1)
    sid = packed >> (idx_bits + 1)
    neg = ((packed >> idx_bits) & 1) == 1
    perm = packed & ((1 << idx_bits) - 1)

    g = jnp.take(pm, perm.reshape(-1), axis=0)          # [B*N, 72]
    g = g.reshape(b, n, 3 * FQ.n_limbs).transpose(0, 2, 1)
    x = g[:, 0:FQ.n_limbs]                              # [B, 24, N]
    y = g[:, FQ.n_limbs:2 * FQ.n_limbs]
    z = g[:, 2 * FQ.n_limbs:]
    y = lf.select(neg, lf.neg(FQ, y), y)

    one_col = jnp.asarray(np.asarray(FQ.one_mont, dtype=np.uint32))[:, None]

    def park_identity(mask, xs, ys, zs):
        """Sentinel lanes become the identity (0 : 1 : 0) so tree merges of
        dead lanes stay the identity."""
        zero = jnp.zeros_like(xs)
        return (lf.select(mask, zero, xs),
                lf.select(mask, jnp.broadcast_to(one_col, ys.shape), ys),
                lf.select(mask, zero, zs))

    x, y, z = park_identity(sid >= sent, x, y, z)

    two_adic = (n & -n).bit_length() - 1
    levels = min(max(0, (n // half).bit_length() - 1), two_adic)
    parts_sid, parts_x, parts_y, parts_z = [], [], [], []

    for _ in range(levels):
        m = x.shape[-1] // 2
        xl, yl, zl = x[..., 0::2], y[..., 0::2], z[..., 0::2]
        xr, yr, zr = x[..., 1::2], y[..., 1::2], z[..., 1::2]
        sl, sr = sid[:, 0::2], sid[:, 1::2]
        same = sl == sr
        x3, y3, z3 = g1_ops.padd((xl, yl, zl), (xr, yr, zr))
        x = lf.select(same, x3, xr)
        y = lf.select(same, y3, yr)
        z = lf.select(same, z3, zr)
        sid = sr
        # rejects: the left of every bucket-boundary pair.  Within a level
        # their bucket ids are pairwise distinct (the array is sorted and
        # only one pair straddles each bucket boundary), so at most `half`
        # are real: one u32 key sort compacts them into `half` slots.
        rsid = jnp.where(same, sent, sl)
        if m < half:
            rsid = jnp.pad(rsid, [(0, 0), (0, half - m)],
                           constant_values=sent)
            padt = [(0, 0), (0, 0), (0, half - m)]
            xl, yl, zl = (jnp.pad(t, padt) for t in (xl, yl, zl))
            m = half
        # compact AND sort ascending (the dense-scatter tail binary-searches
        # each reject row, so rows must stay sorted)
        pos_bits = max(m - 1, 1).bit_length()
        riota = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (b, m))
        rpacked = jax.lax.sort(
            (rsid.astype(jnp.int32) << pos_bits) | riota,
            dimension=-1)[:, :half]
        rs = rpacked >> pos_bits
        rp = rpacked & ((1 << pos_bits) - 1)
        gidx = rp[:, None, :]
        gx = jnp.take_along_axis(xl, gidx, axis=2)
        gy = jnp.take_along_axis(yl, gidx, axis=2)
        gz = jnp.take_along_axis(zl, gidx, axis=2)
        gx, gy, gz = park_identity(rs >= sent, gx, gy, gz)
        parts_sid.append(rs)
        parts_x.append(gx)
        parts_y.append(gy)
        parts_z.append(gz)

    # tail: the residual array (duplicate ids possible) goes through the
    # scan/boundary path over `half` lanes; each level's rejects have
    # DISTINCT ids per row, so they scatter straight into dense slots (a
    # binary-search gather) and fold in with one padd per level -- no
    # combined re-sort, and the only remaining scan is half-sized.
    buckets = _bucket_sums_dense(sid, x, y, z, half)
    for rs, gx, gy, gz in zip(parts_sid, parts_x, parts_y, parts_z):
        dense = _scatter_dense(rs, (gx, gy, gz), half)
        buckets = g1_ops.padd(buckets, dense)
    return _weighted_fold(buckets)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _window_fold_device(c: int, w_count: int, n_sets: int, x, y, z):
    """Fold [S*W, L, 1] window sums into one point per set ON DEVICE.

    total = sum_w 2^(c*w) * S_w via the classic highest-window-first
    double-and-add, as ONE fused pallas kernel (the round-2 lax.scan
    version dispatched ~W*(c+1) tiny pallas launches per fold, ~30 ms per
    commit batch).  Output is stacked so the host fetch is ONE transfer
    (3 device_gets cost ~25ms each through a remote-TPU tunnel)."""
    from . import pallas_field

    return pallas_field.window_fold_pallas(c, w_count, n_sets, x, y, z)


def _fold_windows(sums, c: int, n_sets: int,
                  set_sizes) -> list[G1Projective]:
    """Window fold + host decode.  TPU: on-device scan (see
    `_window_fold_device`); elsewhere the host bigint chain (identical
    group element either way, and the device scan would dominate the
    1-core CPU dryrun's compile budget)."""
    from . import pallas_field

    w_count = sums[0].shape[0] // n_sets
    if pallas_field._on_tpu():
        acc = np.asarray(jax.device_get(
            _window_fold_device(c, w_count, n_sets, *sums)))
        xs, ys, zs = acc[0], acc[1], acc[2]
        rinv = pow(FQ.R, -1, FQ.modulus)
        out = []
        for s_i in range(n_sets):
            if not set_sizes[s_i]:
                out.append(G1Projective.identity())
                continue
            cx, cy, cz = (lf.limbs_to_int(t[:, s_i]) * rinv % FQ.modulus
                          for t in (xs, ys, zs))
            out.append(G1Projective(Fp(cx), Fp(cy), Fp(cz)))
        return out
    host = [np.asarray(t) for t in jax.device_get(sums)]
    return _host_window_fold(host, c, w_count, n_sets, set_sizes)


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
        # reshape to [S, 16, n_pad] under jit: the eager moveaxis+reshape
        # pair costs two host<->device round trips on remote-attached TPUs
        limbs = _stack_scalar_sets(limbs, len(scalar_sets))
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

        # inputs may be committed to a single device (e.g. the re-homed
        # round-5 witnesses); place them on the mesh explicitly
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P(axis))
        stacked_pts = tuple(jax.device_put(t, sh) for t in stacked_pts)
        limbs = jax.device_put(limbs, sh)

        fn = _sharded_msm_jit(mesh, axis, c)
        sums = fn(*stacked_pts, limbs)
        return _fold_windows(sums, c, len(sizes), sizes)

    def _padded(self, n_pad):
        """Padded device point tensors (limb-major triple + point-major
        [N, 72] matrix) and infinity flags, cached per size class (the
        pad/transpose ops are eager device calls -- one tunnel round trip
        each on remote TPUs, so they must not run per commit)."""
        cache = getattr(self, "_pad_cache", None)
        if cache is None:
            cache = self._pad_cache = {}
        ent = cache.get(n_pad)
        if ent is None:
            pts = _pad_points(self.points, n_pad)
            pinf = jnp.all(pts[2] == 0, axis=0)
            pm = jnp.transpose(jnp.concatenate(pts, axis=0))  # [N, 72]
            ent = cache[n_pad] = (pts, pinf, pm)
        return ent

    def _run(self, limbs, sizes, n_pad) -> list[G1Projective]:
        pts, pinf, pm = self._padded(n_pad)
        if n_pad >= PTREE_MIN_POINTS:
            c = _ptree_window_bits(n_pad)
            sums = _msm_ptree_pipeline(c, pm, pinf, limbs)
        else:
            c = _window_bits(n_pad)
            sums = _msm_pipeline(c, *pts, limbs)
        return _fold_windows(sums, c, len(sizes), sizes)


@functools.partial(jax.jit, static_argnums=1)
def _stack_scalar_sets(limbs, n_sets: int):
    """[16, S*n_pad] raw limbs -> [S, 16, n_pad] (one fused dispatch)."""
    n_pad = limbs.shape[-1] // n_sets
    return jnp.moveaxis(limbs.reshape(FR.n_limbs, n_sets, n_pad), 0, 1)


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

    fn = _sharded_msm_jit(mesh, axis, c)
    sums = fn(*stacked_pts, limbs)

    return _fold_windows(sums, c, 1, [n])[0]
