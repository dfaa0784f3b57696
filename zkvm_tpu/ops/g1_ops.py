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

    On TPU dispatches to the fused pallas kernel (12 Montgomery multiplies
    in VMEM, one HBM round trip)."""
    from . import pallas_field

    if pallas_field._on_tpu():
        return pallas_field.padd_pallas(p, q)
    return _padd_jnp(p, q)


def _padd_jnp(p, q):
    x1, y1, z1 = p
    x2, y2, z2 = q
    mul = lambda a, b: lf.mont_mul(FQ, a, b)
    add = lambda a, b: lf.add(FQ, a, b)
    sub = lambda a, b: lf.sub(FQ, a, b)
    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    t3 = sub(sub(mul(add(x1, y1), add(x2, y2)), t0), t1)
    t4 = sub(sub(mul(add(y1, z1), add(y2, z2)), t1), t2)
    t5 = sub(sub(mul(add(x1, z1), add(x2, z2)), t0), t2)
    t6 = _mul_b3(t2)
    z3 = add(t1, t6)
    t1 = sub(t1, t6)
    y3 = _mul_b3(t5)
    x3 = sub(mul(t3, t1), mul(t4, y3))
    t0_3 = add(add(t0, t0), t0)
    y3 = add(mul(t1, z3), mul(y3, t0_3))
    z3 = add(mul(z3, t4), mul(t0_3, t3))
    return x3, y3, z3


def pdouble(p):
    """Complete projective doubling (RCB15 algorithm 9, a=0).

    On TPU the complete ADD formula doubles correctly; reuse its kernel."""
    from . import pallas_field

    if pallas_field._on_tpu():
        return pallas_field.padd_pallas(p, p)
    return _pdouble_jnp(p)


def _pdouble_jnp(p):
    x, y, z = p
    mul = lambda a, b: lf.mont_mul(FQ, a, b)
    add = lambda a, b: lf.add(FQ, a, b)
    sub = lambda a, b: lf.sub(FQ, a, b)
    t0 = mul(y, y)
    z3 = add(t0, t0)
    z3 = add(z3, z3)
    z3 = add(z3, z3)
    t1 = mul(y, z)
    t2 = _mul_b3(mul(z, z))
    x3 = mul(t2, z3)
    y3 = add(t0, t2)
    z3 = mul(t1, z3)
    t1 = add(t2, t2)
    t2 = add(t1, t2)
    t0 = sub(t0, t2)
    y3 = add(mul(t0, y3), x3)
    x3 = mul(mul(x, y), t0)
    x3 = add(x3, x3)
    return x3, y3, z3


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
    """Encode affine points as projective Montgomery limb tensors [24, n]."""
    n = len(points)
    xs = np.zeros((FQ.n_limbs, n), dtype=np.uint32)
    ys = np.zeros((FQ.n_limbs, n), dtype=np.uint32)
    zs = np.zeros((FQ.n_limbs, n), dtype=np.uint32)
    one = np.asarray(FQ.one_mont)
    for i, p in enumerate(points):
        if p.infinity:
            ys[:, i] = one
        else:
            xs[:, i] = lf.int_to_limbs(p.x.value * FQ.R % FQ.modulus, FQ.n_limbs)
            ys[:, i] = lf.int_to_limbs(p.y.value * FQ.R % FQ.modulus, FQ.n_limbs)
            zs[:, i] = one
    import jax.numpy as jnp

    return (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs))


def device_to_projective(p, index=None) -> G1Projective:
    """Decode one device point (or batch element `index`) to the host type."""
    x, y, z = p
    if index is not None:
        x, y, z = x[..., index], y[..., index], z[..., index]
    xv, yv, zv = (FQ.from_mont_array(t.reshape(FQ.n_limbs, -1)[:, :1])[0]
                  for t in (x, y, z))
    return G1Projective(Fp(xv), Fp(yv), Fp(zv))


def batch_scalar_mul_base(base: G1Affine, scalars) -> list["G1Affine"]:
    """[s_i * base] for many scalars: batched double-and-add on device.

    255 masked-add + double steps over all lanes (data-oblivious); used by
    the SRS setup (srs.rs slow_multiscalar_mul_single_base equivalent) where
    the host loop would take minutes at 2^16.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..fields import Fp, Fr

    n = len(scalars)
    if n == 0:
        return []
    pad = (-n) % 128  # lane alignment
    bits_needed = 256

    buf = b"".join(s.to_bytes() for s in scalars) + bytes(32 * pad)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8).reshape(n + pad, 32),
        axis=1, bitorder="little").T.astype(bool)  # [256, n+pad]

    bx = lf.int_to_limbs(base.x.value * FQ.R % FQ.modulus, FQ.n_limbs)
    by = lf.int_to_limbs(base.y.value * FQ.R % FQ.modulus, FQ.n_limbs)
    one = np.asarray(FQ.one_mont)

    @jax.jit
    def kernel(bits_arr):
        lanes = bits_arr.shape[1]
        px = jnp.broadcast_to(jnp.asarray(bx)[:, None],
                              (FQ.n_limbs, lanes)).astype(jnp.uint32)
        py = jnp.broadcast_to(jnp.asarray(by)[:, None],
                              (FQ.n_limbs, lanes)).astype(jnp.uint32)
        pz = jnp.broadcast_to(jnp.asarray(one)[:, None],
                              (FQ.n_limbs, lanes)).astype(jnp.uint32)
        acc = identity_batch((lanes,))

        def body(carry, bit_row):
            acc, p = carry
            added = padd(acc, p)
            acc = pselect(bit_row, added, acc)
            p = padd(p, p)
            return (acc, p), None

        (acc, _), _ = jax.lax.scan(body, (acc, (px, py, pz)), bits_arr)
        return acc

    res = kernel(jnp.asarray(bits[:bits_needed]))
    host = [np.asarray(t) for t in jax.device_get(res)]
    rinv = pow(FQ.R, -1, FQ.modulus)
    out = []
    for i in range(n):
        coords = [lf.limbs_to_int(h[:, i]) * rinv % FQ.modulus for h in host]
        out.append(G1Projective(Fp(coords[0]), Fp(coords[1]), Fp(coords[2])))
    return G1Projective.batch_normalize(out)
