"""Device Pippenger MSM: host-scheduled bucket reduction, batched group ops.

The reference MSM (coset-bls12_381/src/coset/multiscalar_mul.rs:143-220) is a
serial bucket scan parallelized over windows with rayon.  A TPU has no
efficient data-dependent scatter, so the bucket accumulation is re-designed:

  1. host: signed radix-2^c digit decomposition (numpy, vectorized);
  2. host: per window, stable-sort point indices by |digit| so every bucket
     becomes a contiguous segment, then emit a *static-shape* pairing
     schedule: log2(N) rounds, round r pairing adjacent same-bucket items;
  3. device: execute the schedule -- each round is one batched complete
     point addition over [windows, L_r] lanes (no control flow, no scatter).
     The first few (large) rounds are unrolled; the long tail of small
     rounds runs under one lax.scan so the traced graph stays small;
  4. device: gather per-bucket sums and fold them with the running-sum
     trick (sum_b b*S_b = sum of suffix sums) as a 2-add lax.scan over the
     bucket axis;
  5. host: fold the ~W window sums with c doublings each.

Shapes depend only on (N, c), so one jit specialization serves all inputs of
a given size.  Work is ~3*W*N lane-adds, all data-oblivious.  Correctness is
pinned against the host reference MSM (tests/test_msm.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.g1 import G1Affine, G1Projective
from ..fields import Fr
from . import g1_ops
from . import limb_field as lf
from .limb_field import FQ

def _device_threshold() -> int:
    """Minimum MSM size for the device path.

    On TPU the batched kernel wins early; on CPU (tests, dev boxes) the
    pure-python host MSM beats XLA emulation until sizes get large."""
    import jax

    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    return 1024 if platform != "cpu" else 8192


DEVICE_MSM_THRESHOLD = 1024  # re-evaluated lazily via _device_threshold()

_UNROLLED_ROUNDS = 4  # large early rounds traced individually; rest scanned


def _window_bits(n: int) -> int:
    """Window width: balances bucket count (2^(c-1), serial fold steps and
    schedule padding) against window count (~256/c, total lane work)."""
    if n < (1 << 12):
        return 8
    return 10


# -----------------------------------------------------------------------------
# Host scheduling
# -----------------------------------------------------------------------------

def _signed_digits(scalars: list[Fr], c: int) -> np.ndarray:
    """[W, N] int32 signed radix-2^c digits, |d| <= 2^(c-1)."""
    n = len(scalars)
    w_count = (256 + c - 1) // c
    buf = b"".join(s.to_bytes() for s in scalars)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8).reshape(n, 32),
        axis=1, bitorder="little")  # [N, 256]
    pad = w_count * c - 256
    if pad:
        bits = np.pad(bits, [(0, 0), (0, pad)])
    weights = (1 << np.arange(c, dtype=np.int64))
    ud = bits.reshape(n, w_count, c).astype(np.int64) @ weights  # [N, W]
    ud = ud.T.copy()  # [W, N]
    half = 1 << (c - 1)
    carry = np.zeros(n, dtype=np.int64)
    out = np.zeros_like(ud)
    for j in range(w_count):
        d = ud[j] + carry
        wrap = d > half
        out[j] = np.where(wrap, d - (1 << c), d)
        carry = wrap.astype(np.int64)
    assert not carry.any(), "scalar overflow in signed digit decomposition"
    return out.astype(np.int32)


def _align128(v: int) -> int:
    """Round up to a full vector-lane tile (also sidesteps Mosaic faults
    observed with odd lane counts on real hardware)."""
    return -(-v // 128) * 128


def _round_lengths(n: int, c: int) -> list[int]:
    """Static buffer lengths per pairing round (worst case over all inputs)."""
    n_rounds = max(1, math.ceil(math.log2(n))) if n > 1 else 1
    half = 1 << (c - 1)
    max_segs = half + 1  # buckets 1..half plus the dead segment
    lengths, cur = [], n
    for _ in range(n_rounds):
        cur = min(cur, _align128((cur + max_segs) // 2 + 1))
        lengths.append(cur)
    return lengths


def _build_schedule(digits: np.ndarray, n: int, c: int):
    """Pairing schedule: returns (src0, neg0, unrolled, scanned, final_idx).

    unrolled: list of (left, right) index pairs, one per early round;
    scanned: stacked (left[R,W,Ls], right[R,W,Ls]) for the tail rounds, all
    padded to the buffer length entering the scan.  The identity element
    lives at the LAST slot of each buffer (index = buffer length).
    """
    w_count = digits.shape[0]
    half = 1 << (c - 1)
    lengths = _round_lengths(n, c)
    n_rounds = len(lengths)
    n_unroll = min(_UNROLLED_ROUNDS, n_rounds)

    src0 = np.zeros((w_count, n), dtype=np.int32)
    neg0 = np.zeros((w_count, n), dtype=bool)
    segs = np.zeros((w_count, n), dtype=np.int32)
    for w in range(w_count):
        d = digits[w]
        bucket = np.where(d == 0, -1, np.abs(d)).astype(np.int32)
        order = np.argsort(bucket, kind="stable")
        sb = bucket[order]
        src0[w] = np.where(sb < 0, n, order)  # dead slots gather identity
        neg0[w] = (d[order] < 0) & (sb >= 0)
        segs[w] = sb

    def pair_round(cur_seg, cur_len, l_out):
        left = np.full((w_count, l_out), cur_len, dtype=np.int32)
        right = np.full((w_count, l_out), cur_len, dtype=np.int32)
        new_seg = np.full((w_count, l_out), -1, dtype=np.int32)
        for w in range(w_count):
            seg = cur_seg[w]
            m = seg.shape[0]
            idx = np.arange(m)
            change = np.empty(m, dtype=bool)
            change[0] = True
            change[1:] = seg[1:] != seg[:-1]
            run_start = idx[change][np.cumsum(change) - 1]
            local = idx - run_start
            is_left = (local % 2) == 0
            partner = np.zeros(m, dtype=bool)
            partner[:-1] = is_left[:-1] & (seg[1:] == seg[:-1])
            lefts = idx[is_left]
            k = lefts.shape[0]
            assert k <= l_out, (k, l_out)
            left[w, :k] = lefts
            right[w, :k] = np.where(partner[lefts], lefts + 1, cur_len)
            new_seg[w, :k] = seg[lefts]
        return left, right, new_seg

    unrolled = []
    cur_seg, cur_len = segs, n
    for r in range(n_unroll):
        left, right, cur_seg = pair_round(cur_seg, cur_len, lengths[r])
        unrolled.append((left, right))
        cur_len = lengths[r]

    # tail rounds all run at the fixed scan length
    l_scan = cur_len
    scan_left, scan_right = [], []
    for _ in range(n_unroll, n_rounds):
        left, right, cur_seg = pair_round(cur_seg, cur_len, l_scan)
        scan_left.append(left)
        scan_right.append(right)
        cur_len = l_scan
    scanned = (np.stack(scan_left) if scan_left else
               np.zeros((0, w_count, l_scan), dtype=np.int32),
               np.stack(scan_right) if scan_right else
               np.zeros((0, w_count, l_scan), dtype=np.int32))

    final_idx = np.full((w_count, half), cur_len, dtype=np.int32)
    for w in range(w_count):
        seg = cur_seg[w]
        live = seg > 0
        final_idx[w, seg[live] - 1] = np.nonzero(live)[0]
    return src0, neg0, unrolled, scanned, final_idx


# -----------------------------------------------------------------------------
# Device kernel
# -----------------------------------------------------------------------------

def _with_identity(buf):
    """Append one identity lane at the end of the batch (last) axis."""
    ident = g1_ops.identity_batch((buf[0].shape[0], 1))
    return tuple(jnp.concatenate([t, i], axis=-1) for t, i in zip(buf, ident))


def _gather(buf, idx):
    """Gather lanes: buf [W, L, M], idx [W, K] -> [W, L, K]."""
    return tuple(jnp.take_along_axis(t, idx[:, None, :], axis=2) for t in buf)


def _msm_core(points, src0, neg0, unrolled, scanned, final_idx):
    # round 0: per-window signed gather of the sorted working set
    # points: [L, N+1]; src0: [W, N] -> buffers [W, L, N]
    px, py, pz = points
    x = jnp.moveaxis(jnp.take(px, src0, axis=1), 1, 0)
    y = jnp.moveaxis(jnp.take(py, src0, axis=1), 1, 0)
    z = jnp.moveaxis(jnp.take(pz, src0, axis=1), 1, 0)
    y = lf.select(neg0, lf.neg(FQ, y), y)
    buf = (x, y, z)

    for left, right in unrolled:
        buf = _with_identity(buf)
        buf = g1_ops.padd(_gather(buf, left), _gather(buf, right))

    scan_left, scan_right = scanned
    if scan_left.shape[0]:
        def round_body(b, lr):
            left, right = lr
            b = _with_identity(b)
            return g1_ops.padd(_gather(b, left), _gather(b, right)), None

        buf, _ = jax.lax.scan(round_body, buf, (scan_left, scan_right))

    buf = _with_identity(buf)
    buckets = _gather(buf, final_idx)  # [W, B] bucket sums
    return _weighted_bucket_fold(buckets)


_msm_kernel = jax.jit(_msm_core)


def _weighted_bucket_fold(buckets):
    """sum_b b*S_b over [W, B] buckets in ~2*sqrt(B) serial steps.

    Split b = j*m + i (i in 1..m): the total is
        sum_j weighted_j  +  m * sum_j j*sum_j
    where weighted_j = sum_i i*S_{j,i} and sum_j = sum_i S_{j,i}.  Both inner
    quantities come from one m-step running-sum scan batched over all chunks;
    the outer combination is one k-step scan.  The traced graph stays at a
    handful of point additions regardless of B.
    """
    w, n_limbs, b = buckets[0].shape
    m = 1 << ((b.bit_length() - 1 + 1) // 2)  # ~sqrt(B), power of two
    m = min(m, b)
    assert b % m == 0
    k = b // m
    # [W, L, B] -> [W, L, k, m] -> inner scan over i (highest i first)
    chunked = tuple(t.reshape(w, n_limbs, k, m) for t in buckets)
    inner_xs = tuple(jnp.moveaxis(t[..., ::-1], 3, 0) for t in chunked)

    init = (g1_ops.identity_batch((w, k)), g1_ops.identity_batch((w, k)))

    def inner_body(carry, s_b):
        running, total = carry
        running = g1_ops.padd(running, s_b)
        total = g1_ops.padd(total, running)
        return (running, total), None

    (chunk_sums, chunk_weighted), _ = jax.lax.scan(inner_body, init, inner_xs)

    # outer scan over chunks, highest j first:
    #   tot2 accumulates sum_j j*sum_j, acc_w accumulates sum_j weighted_j
    # chunk tensors are [W, L, k]; scan over k with [W, L, 1] carries
    outer_xs = tuple(jnp.moveaxis(t[..., ::-1], 2, 0)[..., None]
                     for t in (chunk_sums + chunk_weighted))
    o_init = tuple(g1_ops.identity_batch((w, 1)) for _ in range(3))

    def outer_body(carry, xs):
        run2, tot2, acc_w = carry
        s_x, s_y, s_z, w_x, w_y, w_z = xs
        tot2 = g1_ops.padd(tot2, run2)
        run2 = g1_ops.padd(run2, (s_x, s_y, s_z))
        acc_w = g1_ops.padd(acc_w, (w_x, w_y, w_z))
        return (run2, tot2, acc_w), None

    (_, tot2, acc_w), _ = jax.lax.scan(outer_body, o_init, outer_xs)
    for _ in range(m.bit_length() - 1):  # tot2 *= m
        tot2 = g1_ops.pdouble(tot2)
    return g1_ops.padd(acc_w, tot2)  # [W] window sums


# -----------------------------------------------------------------------------
# Public API
# -----------------------------------------------------------------------------

class MSMContext:
    """Caches the device-resident point set (e.g. a CommitKey's powers)."""

    def __init__(self, points: list[G1Affine]):
        base = g1_ops.affine_to_device(points)  # [L, n] coords
        ident = g1_ops.identity_batch((1,))     # [L, 1]
        self.points = tuple(jnp.concatenate([b, i], axis=-1)
                            for b, i in zip(base, ident))
        self.n = len(points)

    def msm(self, scalars: list[Fr]) -> G1Projective:
        """MSM of the first len(scalars) points (see msm_many)."""
        return self.msm_many([scalars])[0]

    def msm_many(self, scalar_sets: list[list[Fr]]) -> list[G1Projective]:
        """Several MSMs over (prefixes of) the same point set in ONE kernel
        launch: per-set schedules stack along the window axis, so the device
        graph is identical to a single MSM with len(sets)*W windows.

        Scalars are zero-padded to the full (lane-aligned) point-set length:
        padded slots decompose to all-zero digits (dead lanes), so
        correctness is unaffected while every call shares one kernel
        specialization."""
        n = _align128(self.n)
        c = _window_bits(n)
        padded = []
        for scalars in scalar_sets:
            assert len(scalars) <= self.n
            padded.append(list(scalars) + [Fr.zero()] * (n - len(scalars)))

        scheds = [_build_schedule(_signed_digits(s, c), n, c) for s in padded]
        cat = lambda i: np.concatenate([sc[i] for sc in scheds], axis=0)
        # dead slots carry index n (the aligned length); the device point set
        # holds self.n + 1 entries with the identity at self.n -- clamp
        src0 = np.minimum(cat(0), self.n)
        neg0 = cat(1)
        n_unroll = len(scheds[0][2])
        unrolled = tuple(
            (jnp.asarray(np.concatenate([sc[2][r][0] for sc in scheds])),
             jnp.asarray(np.concatenate([sc[2][r][1] for sc in scheds])))
            for r in range(n_unroll))
        scanned = (
            jnp.asarray(np.concatenate([sc[3][0] for sc in scheds], axis=1)),
            jnp.asarray(np.concatenate([sc[3][1] for sc in scheds], axis=1)))
        final_idx = jnp.asarray(cat(4))
        sums = _msm_kernel(self.points, jnp.asarray(src0), jnp.asarray(neg0),
                           unrolled, scanned, final_idx)
        # host window fold: total = sum_w 2^(c*w) * T_w
        # (one bulk transfer for all windows -- per-window device_get pays a
        # full device round trip each)
        from ..fields import Fp

        host = [np.asarray(t) for t in jax.device_get(sums)]
        rinv = pow(FQ.R, -1, FQ.modulus)
        w_per_set = host[0].shape[0] // len(scalar_sets)
        results = []
        for s_i in range(len(scalar_sets)):
            if not scalar_sets[s_i]:
                results.append(G1Projective.identity())
                continue
            total = G1Projective.identity()
            window_sums = []
            for w in range(s_i * w_per_set, (s_i + 1) * w_per_set):
                coords = [lf.limbs_to_int(h[w, :, 0]) * rinv % FQ.modulus
                          for h in host]
                window_sums.append(G1Projective(Fp(coords[0]), Fp(coords[1]),
                                                Fp(coords[2])))
            for ws in reversed(window_sums):
                for _ in range(c):
                    total = total.double()
                total = total + ws
            results.append(total)
        return results


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
    device runs the full per-shard bucket reduction on its slice (its own
    host-built schedule, identical shapes), then the per-device window sums
    -- one point per window -- are combined with an all_gather and a short
    unrolled addition tree.  Communication: D*W points (a few KB), the
    classic Pippenger partial-sum reduction pattern.
    """
    n_dev = mesh.devices.size
    n = len(scalars)
    assert len(points) >= n
    shard = _align128(-(-n // n_dev))
    n_pad = shard * n_dev
    scalars = list(scalars) + [Fr.zero()] * (n_pad - n)
    points = list(points[:n])
    c = _window_bits(shard)

    # stack per-shard device points (identity appended per shard) + schedules
    base = g1_ops.affine_to_device(points)  # [L, n]
    pad_cols = n_pad - n
    if pad_cols:
        base = tuple(jnp.pad(t, [(0, 0), (0, pad_cols)]) for t in base)
    ident = g1_ops.identity_batch((1,))  # [L, 1]
    pts = []
    for d in range(n_dev):
        sl = tuple(t[:, d * shard:(d + 1) * shard] for t in base)
        pts.append(tuple(jnp.concatenate([t, i], axis=-1)
                         for t, i in zip(sl, ident)))
    stacked_pts = tuple(jnp.stack([p[k] for p in pts]) for k in range(3))

    scheds = []
    for d in range(n_dev):
        digits = _signed_digits(scalars[d * shard:(d + 1) * shard], c)
        scheds.append(_build_schedule(digits, shard, c))
    src0 = np.stack([np.minimum(sc[0], shard) for sc in scheds])
    neg0 = np.stack([sc[1] for sc in scheds])
    n_unroll = len(scheds[0][2])
    unrolled = tuple(
        (jnp.asarray(np.stack([sc[2][r][0] for sc in scheds])),
         jnp.asarray(np.stack([sc[2][r][1] for sc in scheds])))
        for r in range(n_unroll))
    scanned = (jnp.asarray(np.stack([sc[3][0] for sc in scheds])),
               jnp.asarray(np.stack([sc[3][1] for sc in scheds])))
    final_idx = jnp.asarray(np.stack([sc[4] for sc in scheds]))

    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    dev_spec = P(axis)

    def local_msm(pts_x, pts_y, pts_z, s0, n0, *rest):
        unr_args = rest[:2 * n_unroll]
        scn_l, scn_r, fidx = rest[2 * n_unroll:]
        unr = tuple((unr_args[2 * r][0], unr_args[2 * r + 1][0])
                    for r in range(n_unroll))
        sums = _msm_core((pts_x[0], pts_y[0], pts_z[0]), s0[0], n0[0],
                         unr, (scn_l[0], scn_r[0]), fidx[0])
        gathered = [jax.lax.all_gather(t, axis, axis=0) for t in sums]
        total = tuple(t[0] for t in gathered)
        for d in range(1, n_dev):
            total = g1_ops.padd(total, tuple(t[d] for t in gathered))
        return total

    unr_flat = tuple(t for pair in unrolled for t in pair)
    n_args = 3 + 2 + len(unr_flat) + 2 + 1
    fn = jax.jit(shard_map(
        local_msm, mesh=mesh,
        in_specs=tuple([dev_spec] * n_args),
        out_specs=(P(), P(), P()),
        check_vma=False))
    sums = fn(*stacked_pts, jnp.asarray(src0), jnp.asarray(neg0),
              *unr_flat, scanned[0], scanned[1], final_idx)

    # host window fold (same as MSMContext.msm)
    from ..fields import Fp

    host = [np.asarray(t) for t in jax.device_get(sums)]
    rinv = pow(FQ.R, -1, FQ.modulus)
    total = G1Projective.identity()
    window_sums = []
    for w in range(host[0].shape[0]):
        coords = [lf.limbs_to_int(h[w, :, 0]) * rinv % FQ.modulus
                  for h in host]
        window_sums.append(G1Projective(Fp(coords[0]), Fp(coords[1]),
                                        Fp(coords[2])))
    for ws in reversed(window_sums):
        for _ in range(c):
            total = total.double()
        total = total + ws
    return total
