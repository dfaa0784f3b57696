"""Field-layer tests: algebraic laws + bit-exactness anchors vs the reference.

The limb tables appearing here are *test vectors* transcribed from the
reference test suite / constant tables, used to pin our derived constants.
"""

import random

import pytest

from zkvm_tpu import params
from zkvm_tpu.fields import Fr, Fp, Fp2, Fp6, Fp12, JubjubFr


def _from_u64_limbs(limbs):
    v = 0
    for i, l in enumerate(limbs):
        v |= l << (64 * i)
    return v


# --- constants pinned against coset-bls12_381/src/scalar.rs ------------------

def test_fr_modulus_limbs():
    # scalar.rs:80 MODULUS limbs (canonical)
    assert params.FR_MODULUS == _from_u64_limbs(
        [0xFFFF_FFFF_0000_0001, 0x53BD_A402_FFFE_5BFE,
         0x3339_D808_09A1_D805, 0x73ED_A753_299D_7D48])


def test_fr_generator_montgomery_form():
    # scalar.rs:101 GENERATOR is stored in Montgomery form (7 * R mod q)
    assert Fr(7).mont_value() == _from_u64_limbs(
        [0x0000_000E_FFFF_FFF1, 0x17E3_63D3_0018_9C0F,
         0xFF9C_5787_6F84_57B0, 0x3513_3220_8FC5_A8C4])


def test_fr_root_of_unity():
    # scalar.rs:191 ROOT_OF_UNITY (Montgomery form)
    assert Fr(params.FR_ROOT_OF_UNITY).mont_value() == _from_u64_limbs(
        [0xB9B5_8D8C_5F0E_466A, 0x5B1B_4C80_1819_D7EC,
         0x0AF5_3AE3_52A3_1E64, 0x5BF3_ADDA_19E9_B27B])
    # root of unity really has order 2^32
    w = Fr(params.FR_ROOT_OF_UNITY)
    assert w.pow(1 << 32).is_one()
    assert not w.pow(1 << 31).is_one()


def test_fr_r_constants():
    assert params.FR_R == (1 << 256) % params.FR_MODULUS
    # scalar/coset.rs:436 test_to_be_bytes: the Rust constant `R2` holds raw
    # limbs R2, i.e. it *represents* R; its to_be_bytes() is R's BE encoding.
    r_be = bytes([24, 36, 177, 89, 172, 197, 5, 111, 153, 140, 79, 239, 236,
                  188, 79, 245, 88, 132, 183, 250, 0, 3, 72, 2, 0, 0, 0, 1,
                  255, 255, 255, 254])
    assert Fr(params.FR_R).to_be_bytes() == r_be


def test_fr_serialization_round_trip():
    rng = random.Random(1)
    for _ in range(50):
        x = Fr(rng.getrandbits(300))
        assert Fr.from_bytes(x.to_bytes()) == x
        assert Fr.from_hex_str(x.to_bytes().hex()) == x
    assert Fr.from_bytes(Fr(-1).to_bytes()) == Fr(params.FR_MODULUS - 1)
    # values >= q are rejected
    assert Fr.from_bytes(params.FR_MODULUS.to_bytes(32, "little")) is None


def test_fr_neg_one_be_bytes():
    assert Fr(-1).to_be_bytes() == bytes(
        [115, 237, 167, 83, 41, 157, 125, 72, 51, 57, 216, 8, 9, 161, 216, 5,
         83, 189, 164, 2, 255, 254, 91, 254, 255, 255, 255, 255, 0, 0, 0, 0])


def test_fr_field_laws():
    rng = random.Random(2)
    for _ in range(30):
        a, b, c = (Fr(rng.getrandbits(260)) for _ in range(3))
        assert (a + b) + c == a + (b + c)
        assert a * (b + c) == a * b + a * c
        assert a - a == Fr.zero()
        assert a + (-a) == Fr.zero()
        if not a.is_zero():
            assert a * a.invert() == Fr.one()
        assert a.square() == a * a
        assert a.pow(5) == a * a * a * a * a


def test_fr_sqrt():
    rng = random.Random(3)
    found_qr = found_nqr = 0
    for _ in range(40):
        a = Fr(rng.getrandbits(260))
        s = a.sqrt()
        if s is not None:
            assert s.square() == a
            found_qr += 1
        else:
            found_nqr += 1
    assert found_qr > 0 and found_nqr > 0
    assert Fr.zero().sqrt() == Fr.zero()


def test_fr_ord_is_montgomery_order():
    # scalar/coset.rs:309 test_partial_ord: one < -one under the reference Ord
    assert Fr.one() < -Fr.one()


def test_fr_bitops():
    # scalar/coset.rs test_xor / test_and
    assert (Fr(500) ^ Fr(499)) == Fr(7)
    assert (Fr.one() & Fr.one()) == Fr.one()
    assert (Fr.one() & (-Fr.one())) == Fr.zero()


def test_fr_hash_to_scalar_in_range():
    for i in range(20):
        x = Fr.hash_to_scalar(bytes([i] * (i + 1)))
        assert 0 <= x.value < params.FR_MODULUS


def test_fr_pow_of_2_and_divn():
    for i in [0, 1, 5, 63, 64, 120, 255]:
        assert Fr.pow_of_2(i) == Fr(2).pow(i)
    x = Fr(0xDEADBEEF_12345678)
    assert x.divn(8) == Fr(0xDEADBEEF_123456)
    assert x.divn(256) == Fr.zero()


def test_fr_debug_repr_matches_rust():
    # Rust Debug prints 0x + big-endian canonical hex
    assert repr(Fr.one()) == "0x" + "0" * 63 + "1"


# --- Fp --------------------------------------------------------------------

def test_fp_constants_and_laws():
    assert params.FP_MODULUS % 4 == 3
    rng = random.Random(4)
    for _ in range(20):
        a, b = Fp(rng.getrandbits(400)), Fp(rng.getrandbits(400))
        assert (a * b) * a == a * (b * a)
        if not a.is_zero():
            assert a * a.invert() == Fp.one()
        s = (a.square()).sqrt()
        assert s is not None and s.square() == a.square()


def test_fp_bytes_big_endian():
    one = Fp.one().to_bytes()
    assert len(one) == 48 and one[-1] == 1 and one[0] == 0
    assert Fp.from_bytes(one) == Fp.one()


# --- towers ------------------------------------------------------------------

def test_fp2_laws():
    rng = random.Random(5)
    for _ in range(15):
        a = Fp2(rng.getrandbits(380), rng.getrandbits(380))
        b = Fp2(rng.getrandbits(380), rng.getrandbits(380))
        assert a * b == b * a
        assert a.square() == a * a
        if not a.is_zero():
            assert a * a.invert() == Fp2.one()
        s = a.square().sqrt()
        assert s is not None and s.square() == a.square()
        # frobenius = p-power map
        assert a.frobenius_map() == a.pow(params.FP_MODULUS)


def test_fp6_fp12_laws():
    rng = random.Random(6)

    def rfp2():
        return Fp2(rng.getrandbits(380), rng.getrandbits(380))

    for _ in range(5):
        a = Fp6(rfp2(), rfp2(), rfp2())
        b = Fp6(rfp2(), rfp2(), rfp2())
        assert a * b == b * a
        assert (a * b) * a == a * (b * a)
        inv = a.invert()
        assert inv is not None and a * inv == Fp6.one()
        # mul_by_01 consistency
        c0, c1 = rfp2(), rfp2()
        assert a.mul_by_01(c0, c1) == a * Fp6(c0, c1, Fp2.zero())

        x = Fp12(a, b)
        assert x.square() == x * x
        xinv = x.invert()
        assert xinv is not None and x * xinv == Fp12.one()
        # sparse mul consistency
        c4 = rfp2()
        assert x.mul_by_014(c0, c1, c4) == x * Fp12(
            Fp6(c0, c1, Fp2.zero()), Fp6(Fp2.zero(), c4, Fp2.zero()))
        # frobenius
        f = x
        for _ in range(12):
            f = f.frobenius_map()
        assert f == x


# --- Jubjub scalar field -------------------------------------------------------

def test_jubjub_fr_windowed_naf():
    rng = random.Random(7)
    for width in (2, 3, 4):
        for _ in range(20):
            k = JubjubFr(rng.getrandbits(251))
            naf = k.compute_windowed_naf(width)
            # reconstruction (fr/coset.rs:272 test)
            acc = 0
            for i in reversed(range(256)):
                acc = 2 * acc + naf[i]
            assert acc % JubjubFr.MODULUS == k.value
            for d in naf:
                assert -(1 << (width - 1)) <= d < (1 << (width - 1))
                assert d == 0 or d % 2 == 1


def test_jubjub_edwards_d():
    # coset-jubjub/src/lib.rs:368 EDWARDS_D = -(10240/10241)
    assert params.JUBJUB_D == _from_u64_limbs(
        [0x0106_5FD6_D634_3EB1, 0x292D_7F6D_3757_9D26,
         0xF5FD_9207_E6BD_7FD4, 0x2A93_18E7_4BFA_2B48])
