"""Golden-vector tests anchored on the reference's committed fixtures.

* g1/g2_compressed_valid_test_vectors.dat: 1000 compressed encodings of
  i*G (coset-bls12_381/src/tests/mod.rs:32-44) -- pins the full encode/
  decode path and curve arithmetic.
* relic pairing constants (tests/mod.rs:47+): e(G1, G2) cross-checked
  against an independent C library's output -- pins the pairing stack.

Fixtures are read from the read-only reference checkout; tests skip if it
is not mounted.
"""

import os
import re

import pytest

REF = "/root/reference/coset-bls12_381/src/tests"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference fixtures not mounted")


def test_g1_compressed_vectors():
    from zkvm_tpu.curves.g1 import G1Affine, G1Projective

    data = open(os.path.join(REF, "g1_compressed_valid_test_vectors.dat"),
                "rb").read()
    assert len(data) == 48000
    e = G1Projective.identity()
    gen = G1Projective.generator()
    for i in range(1000):
        expected = data[i * 48: (i + 1) * 48]
        affine = e.to_affine()
        assert affine.to_compressed() == expected, f"point {i}"
        decoded = G1Affine.from_compressed(expected)
        assert decoded == affine, f"point {i}"
        e = e + gen


def test_g2_compressed_vectors():
    from zkvm_tpu.curves.g2 import G2Affine, G2Projective

    data = open(os.path.join(REF, "g2_compressed_valid_test_vectors.dat"),
                "rb").read()
    assert len(data) == 96000
    e = G2Projective.identity()
    gen = G2Projective.generator()
    for i in range(1000):
        expected = data[i * 96: (i + 1) * 96]
        affine = e.to_affine()
        assert affine.to_compressed() == expected, f"point {i}"
        decoded = G2Affine.from_compressed(expected)
        assert decoded == affine, f"point {i}"
        e = e + gen


def test_pairing_against_relic_constants():
    """Parse the relic-generated Fp12 limbs from the reference test module
    and compare with our pairing of the generators."""
    from zkvm_tpu.curves.g1 import G1Affine
    from zkvm_tpu.curves.g2 import G2Affine
    from zkvm_tpu.curves.pairing import pairing
    from zkvm_tpu.fields import Fp

    src = open(os.path.join(REF, "mod.rs")).read()
    # the 12 from_raw_unchecked limb arrays, in c0.c0.c0 .. c1.c2.c1 order
    arrays = re.findall(
        r"from_raw_unchecked\(\[(.*?)\]\)", src, flags=re.S)
    assert len(arrays) >= 12
    values = []
    for arr in arrays[:12]:
        limbs = [int(x.strip().replace("_", ""), 16)
                 for x in arr.split(",") if x.strip()]
        assert len(limbs) == 6
        mont = 0
        for k, limb in enumerate(limbs):
            mont |= limb << (64 * k)
        # from_raw_unchecked stores Montgomery-form limbs directly
        rinv = pow(Fp.R, -1, Fp.MODULUS)
        values.append(mont * rinv % Fp.MODULUS)

    result = pairing(G1Affine.generator(), G2Affine.generator()).value
    got = [result.c0.c0.c0, result.c0.c0.c1,
           result.c0.c1.c0, result.c0.c1.c1,
           result.c0.c2.c0, result.c0.c2.c1,
           result.c1.c0.c0, result.c1.c0.c1,
           result.c1.c1.c0, result.c1.c1.c1,
           result.c1.c2.c0, result.c1.c2.c1]
    assert [g.value for g in got] == values
