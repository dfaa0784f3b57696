"""Batched G1 point arithmetic on device (uint32-limb tensors over Fq).

A point batch is a tuple (x, y, z) of [..., 24, B] Montgomery-limb tensors
(homogeneous projective; limb-major layout -- limbs on sublanes, batch on
vector lanes).  The group law is the same complete RCB15 algebra
as the host implementation (zkvm_tpu/curves/weierstrass.py; reference
coset-bls12_381/src/g1.rs:425-530) -- branch-free and identity-safe, so the
whole MSM pipeline is data-oblivious and fixed-shape.
"""

from __future__ import annotations

import numpy as np

from .. import params
from ..curves.g1 import G1Affine, G1Projective
from ..fields import Fp
from . import limb_field as lf
from .limb_field import FQ

# 3*b = 12 in Montgomery form, as a host constant limb vector
_B3_MONT = lf.int_to_limbs(3 * params.G1_B * FQ.R % FQ.modulus, FQ.n_limbs)


def _mul_b3(t):
    return lf.mont_mul_const(FQ, t, _B3_MONT)


def padd(p, q):
    """Complete projective addition (RCB15 algorithm 7, a=0).

    On TPU dispatches to the serial two-limb pallas kernel.  With the
    round-5 Kogge-Stone tensorized add/sub/normalize helpers the serial
    kernel measures 52 ns/lane at block 512 on one v5e -- faster than the
    ILP-grouped variant (67 ns/lane), whose stacked-group layout no longer
    pays off once the row-loop overhead is gone."""
    from . import pallas_field

    if pallas_field._on_tpu():
        return pallas_field.padd_pallas_2l(p, q, block=512)
    return _padd_jnp(p, q)


def _padd_jnp(p, q):
    """RCB15 with its multiply DAG batched: the 12 variable products run as
    THREE stacked mont_mul calls (6+2+6 independent products each over a
    fresh leading axis).  Bit-identical to the sequential form; ~4x fewer
    XLA ops per padd, which bounds both dispatch count and -- critically for
    the 1-core CPU dryrun -- compile time of the scan pipelines that inline
    this combiner at every level."""
    import jax.numpy as jnp

    x1, y1, z1 = p
    x2, y2, z2 = q
    add = lambda a, b: lf.add(FQ, a, b)
    sub = lambda a, b: lf.sub(FQ, a, b)
    sa = add(jnp.stack([x1, y1, x1]), jnp.stack([y1, z1, z1]))
    sb = add(jnp.stack([x2, y2, x2]), jnp.stack([y2, z2, z2]))
    r = lf.mont_mul(
        FQ,
        jnp.concatenate([jnp.stack([x1, y1, z1]), sa]),
        jnp.concatenate([jnp.stack([x2, y2, z2]), sb]))
    t0, t1, t2 = r[0], r[1], r[2]
    u = sub(sub(r[3:6], jnp.stack([t0, t1, t0])), jnp.stack([t1, t2, t2]))
    t3, t4, t5 = u[0], u[1], u[2]
    w = lf.mont_mul_const(FQ, jnp.stack([t2, t5]), _B3_MONT)
    t6, y3 = w[0], w[1]
    z3 = add(t1, t6)
    t1 = sub(t1, t6)
    t0_3 = add(add(t0, t0), t0)
    v = lf.mont_mul(FQ,
                    jnp.stack([t3, t4, t1, y3, z3, t0_3]),
                    jnp.stack([t1, y3, z3, t0_3, t4, t3]))
    x3 = sub(v[0], v[1])
    y3 = add(v[2], v[3])
    z3 = add(v[4], v[5])
    return x3, y3, z3


def pdouble(p):
    """Complete projective doubling (RCB15 algorithm 9, a=0).

    On TPU the complete ADD formula doubles correctly; reuse its kernel."""
    from . import pallas_field

    if pallas_field._on_tpu():
        return pallas_field.padd_pallas_2l(p, p, block=512)
    return _pdouble_jnp(p)


def _pdouble_jnp(p):
    """RCB15 doubling with the same multiply batching as `_padd_jnp`."""
    import jax.numpy as jnp

    x, y, z = p
    add = lambda a, b: lf.add(FQ, a, b)
    sub = lambda a, b: lf.sub(FQ, a, b)
    r = lf.mont_mul(FQ, jnp.stack([y, y, z, x]), jnp.stack([y, z, z, y]))
    t0, t1, zz, xy = r[0], r[1], r[2], r[3]
    z3 = add(t0, t0)
    z3 = add(z3, z3)
    z3 = add(z3, z3)
    t2 = _mul_b3(zz)
    y3 = add(t0, t2)
    t2_3 = add(add(t2, t2), t2)
    t0 = sub(t0, t2_3)
    v = lf.mont_mul(FQ,
                    jnp.stack([t2, t1, t0, xy]),
                    jnp.stack([z3, z3, y3, t0]))
    x3, z3o, y3o, xyt = v[0], v[1], v[2], v[3]
    y3 = add(y3o, x3)
    x3 = add(xyt, xyt)
    return x3, y3, z3o


def pneg(p):
    x, y, z = p
    return x, lf.neg(FQ, y), z


def pselect(mask, p, q):
    """mask ? p : q elementwise over the batch."""
    return tuple(lf.select(mask, a, b) for a, b in zip(p, q))


def identity_batch(shape):
    """Identity points (0 : 1 : 0) with batch dims (*shape[:-1], L, shape[-1])."""
    full = shape[:-1] + (FQ.n_limbs,) + shape[-1:]
    zeros = np.zeros(full, dtype=np.uint32)
    ones = np.broadcast_to(FQ.one_mont[:, None], full).copy()
    import jax.numpy as jnp

    return (jnp.asarray(zeros), jnp.asarray(ones), jnp.asarray(zeros))


# ---- host <-> device conversion ---------------------------------------------

def affine_to_device(points: list[G1Affine]):
    """Encode affine points as projective Montgomery limb tensors [24, n].

    Limb packing is vectorized through the byte encoding and the Montgomery
    factor is applied with ONE device multiply -- the per-point host bigint
    path cost seconds at SRS scale (2^17 points per CommitKey)."""
    import jax.numpy as jnp

    n = len(points)
    if n == 0:
        z = jnp.zeros((FQ.n_limbs, 0), jnp.uint32)
        return (z, z, z)
    nbytes = 2 * FQ.n_limbs
    buf = bytearray(2 * nbytes * n)
    inf = np.zeros(n, dtype=bool)
    for i, p in enumerate(points):
        if p.infinity:
            inf[i] = True
        else:
            o = 2 * nbytes * i
            buf[o: o + nbytes] = p.x.value.to_bytes(nbytes, "little")
            buf[o + nbytes: o + 2 * nbytes] = p.y.value.to_bytes(
                nbytes, "little")
    raw = np.frombuffer(bytes(buf), dtype="<u2").reshape(n, 2, FQ.n_limbs)
    xy_raw = jnp.asarray(np.moveaxis(raw, 2, 0).astype(np.uint32)
                         .reshape(FQ.n_limbs, 2 * n))
    xy = lf.to_mont(FQ, xy_raw).reshape(FQ.n_limbs, n, 2)
    one = np.asarray(FQ.one_mont)
    z_host = np.where(inf[None, :], np.uint32(0),
                      one[:, None].astype(np.uint32))
    y_inf = jnp.asarray(
        np.where(inf[None, :], one[:, None], np.uint32(0)).astype(np.uint32))
    ys = xy[:, :, 1] + y_inf  # infinity lanes have y_raw = 0
    return (xy[:, :, 0], ys, jnp.asarray(z_host))


def device_to_projective(p, index=None) -> G1Projective:
    """Decode one device point (or batch element `index`) to the host type."""
    x, y, z = p
    if index is not None:
        x, y, z = x[..., index], y[..., index], z[..., index]
    xv, yv, zv = (FQ.from_mont_array(t.reshape(FQ.n_limbs, -1)[:, :1])[0]
                  for t in (x, y, z))
    return G1Projective(Fp(xv), Fp(yv), Fp(zv))


def batch_scalar_mul_base(base: G1Affine, scalars) -> list["G1Affine"]:
    """[s_i * base] for many scalars: windowed fixed-base on device.

    The base is shared, so a host-precomputed table of d * (16^w * base)
    (64 nibble windows x 16 digits, ~1k cheap host ops) turns each lane
    into 64 unconditional table-lookup additions -- 8x fewer point adds
    than the round-1 masked double-and-add (512 padds) and no selects
    (digit 0 looks up the identity, which the complete padd absorbs).
    Normalization (one Fermat z-inversion) stays on device; only the final
    byte decode runs on host.  Used by the SRS setup (the srs.rs:50-63
    slow_multiscalar_mul_single_base equivalent, minutes of host time at
    2^16).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..fields import Fp

    n = len(scalars)
    if n == 0:
        return []
    pad = (-n) % 128  # lane alignment
    lanes = n + pad

    buf = b"".join(s.to_bytes() for s in scalars) + bytes(32 * pad)
    byts = np.frombuffer(buf, dtype=np.uint8).reshape(lanes, 32)
    digits = np.empty((lanes, 64), dtype=np.int32)
    digits[:, 0::2] = byts & 0xF
    digits[:, 1::2] = byts >> 4
    digits = np.ascontiguousarray(digits.T)  # [64, lanes]

    # host table: [64, 24, 16] Montgomery coords of d * (16^w * base)
    ident = G1Projective.identity()
    tx = np.zeros((64, FQ.n_limbs, 16), dtype=np.uint32)
    ty = np.zeros((64, FQ.n_limbs, 16), dtype=np.uint32)
    tz = np.zeros((64, FQ.n_limbs, 16), dtype=np.uint32)
    wbase = base.to_projective()
    for w in range(64):
        cur = ident
        for d in range(16):
            for limbs, coord in ((tx, cur.x), (ty, cur.y), (tz, cur.z)):
                limbs[w, :, d] = lf.int_to_limbs(
                    coord.value * FQ.R % FQ.modulus, FQ.n_limbs)
            if d < 15:
                cur = cur + wbase
        for _ in range(4):
            wbase = wbase.double()

    @jax.jit
    def kernel(tx_a, ty_a, tz_a, digit_rows):
        acc = identity_batch((digit_rows.shape[1],))

        def body(acc, row):
            txw, tyw, tzw, dg = row
            p = tuple(jnp.take(t, dg, axis=1) for t in (txw, tyw, tzw))
            return padd(acc, p), None

        acc, _ = jax.lax.scan(body, acc, (tx_a, ty_a, tz_a, digit_rows))
        x, y, z = acc
        zinv = _fermat_inv(z)  # zero (identity) stays zero
        return lf.mont_mul(FQ, x, zinv), lf.mont_mul(FQ, y, zinv), z

    ax, ay, z = kernel(jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(tz),
                       jnp.asarray(digits))
    xs = FQ.from_mont_array(ax)
    ys = FQ.from_mont_array(ay)
    inf = np.asarray(jax.device_get(lf.is_zero(FQ, z)))
    out = []
    for i in range(n):
        out.append(G1Affine.identity() if inf[i]
                   else G1Affine(Fp(xs[i]), Fp(ys[i])))
    return out


def _fermat_inv(t):
    """Device Fermat inversion a^(p-2) over [L, B] (compact fori graph)."""
    from .msm_tree import _mont_inv_fori

    return _mont_inv_fori(t)
