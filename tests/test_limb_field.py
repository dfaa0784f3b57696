"""Device limb-field kernels vs the Python-int reference (oracle tests)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkvm_tpu.ops import limb_field as lf
from zkvm_tpu.ops.limb_field import FR, FQ


def rand_elems(spec, n, seed):
    rng = random.Random(seed)
    return [rng.getrandbits(spec.modulus.bit_length() + 10) % spec.modulus for _ in range(n)]


@pytest.mark.parametrize("spec", [FR, FQ], ids=["Fr", "Fq"])
def test_roundtrip(spec):
    vals = rand_elems(spec, 32, 11)
    arr = spec.to_mont_array(vals)
    assert arr.shape == (spec.n_limbs, 32)
    assert spec.from_mont_array(arr) == vals


@pytest.mark.parametrize("spec", [FR, FQ], ids=["Fr", "Fq"])
def test_add_sub_neg(spec):
    a_vals = rand_elems(spec, 64, 21)
    b_vals = rand_elems(spec, 64, 22)
    a, b = spec.to_mont_array(a_vals), spec.to_mont_array(b_vals)
    p = spec.modulus
    assert spec.from_mont_array(lf.add(spec, a, b)) == [(x + y) % p for x, y in zip(a_vals, b_vals)]
    assert spec.from_mont_array(lf.sub(spec, a, b)) == [(x - y) % p for x, y in zip(a_vals, b_vals)]
    assert spec.from_mont_array(lf.neg(spec, a)) == [(-x) % p for x in a_vals]
    # edge cases: zero, p-1
    e_vals = [0, p - 1, 1, p - 1]
    f_vals = [0, p - 1, p - 1, 1]
    e, f = spec.to_mont_array(e_vals), spec.to_mont_array(f_vals)
    assert spec.from_mont_array(lf.add(spec, e, f)) == [(x + y) % p for x, y in zip(e_vals, f_vals)]
    assert spec.from_mont_array(lf.neg(spec, e)) == [(-x) % p for x in e_vals]


@pytest.mark.parametrize("spec", [FR, FQ], ids=["Fr", "Fq"])
def test_mont_mul(spec):
    a_vals = rand_elems(spec, 64, 31)
    b_vals = rand_elems(spec, 64, 32)
    a, b = spec.to_mont_array(a_vals), spec.to_mont_array(b_vals)
    p = spec.modulus
    got = spec.from_mont_array(lf.mont_mul(spec, a, b))
    assert got == [(x * y) % p for x, y in zip(a_vals, b_vals)]
    # squares
    assert spec.from_mont_array(lf.mont_square(spec, a)) == [x * x % p for x in a_vals]
    # worst-case operands
    w_vals = [p - 1, p - 1, 0, 1]
    w = spec.to_mont_array(w_vals)
    assert spec.from_mont_array(lf.mont_mul(spec, w, w)) == [x * x % p for x in w_vals]


def test_mont_mul_jit_and_batch_shapes():
    spec = FR
    a_vals = rand_elems(spec, 24, 41)
    # [L, 24] -> [2, 3, L, 4]: extra batch dims lead, limbs stay second-minor
    a = jnp.moveaxis(spec.to_mont_array(a_vals).reshape(spec.n_limbs, 2, 3, 4),
                     0, 2)
    f = jax.jit(lambda x, y: lf.mont_mul(spec, x, y))
    out = f(a, a)
    assert out.shape == a.shape
    flat = spec.from_mont_array(out)
    assert flat == [x * x % spec.modulus for x in a_vals]


def test_to_from_mont_and_const_mul():
    spec = FR
    vals = rand_elems(spec, 16, 51)
    raw = spec.to_raw_array(vals)
    m = lf.to_mont(spec, raw)
    assert spec.from_mont_array(m) == vals
    back = lf.from_mont(spec, m)
    assert [lf.limbs_to_int(r) for r in np.asarray(back).T] == vals
    # multiply by the constant 7 (Montgomery-encoded host constant)
    c = lf.int_to_limbs(7 * spec.R % spec.modulus, spec.n_limbs)
    got = spec.from_mont_array(lf.mont_mul_const(spec, m, c))
    assert got == [v * 7 % spec.modulus for v in vals]


def test_mont_pow_small():
    spec = FR
    vals = rand_elems(spec, 8, 61)
    a = spec.to_mont_array(vals)
    got = spec.from_mont_array(lf.mont_pow(spec, a, 5))
    assert got == [pow(v, 5, spec.modulus) for v in vals]


def test_is_zero_and_select():
    spec = FR
    arr = spec.to_mont_array([0, 5, 0, 7])
    z = lf.is_zero(spec, arr)
    assert z.tolist() == [True, False, True, False]
    sel = lf.select(z, spec.to_mont_array([1] * 4), arr)
    assert spec.from_mont_array(sel) == [1, 5, 1, 7]
