"""NTT tests: oracle vs naive DFT / Horner evaluation, coset variants, laws."""

import random

from zkvm_tpu import params
from zkvm_tpu.fields import Fr
from zkvm_tpu.ops.ntt import Domain, _batch_inverse

Q = params.FR_MODULUS


def horner(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % Q
    return acc


def test_fft_matches_horner():
    n = 64
    rng = random.Random(71)
    coeffs = [Fr(rng.getrandbits(260)) for _ in range(n)]
    dom = Domain(n)
    evals = dom.fft(coeffs)
    els = dom.elements()
    vals = [c.value for c in coeffs]
    for i in range(0, n, 7):
        assert evals[i].value == horner(vals, els[i].value)


def test_ifft_round_trip():
    n = 128
    rng = random.Random(72)
    coeffs = [Fr(rng.getrandbits(260)) for _ in range(n)]
    dom = Domain(n)
    assert dom.ifft(dom.fft(coeffs)) == coeffs
    assert dom.fft(dom.ifft(coeffs)) == coeffs


def test_coset_fft():
    n = 32
    rng = random.Random(73)
    coeffs = [Fr(rng.getrandbits(260)) for _ in range(n)]
    dom = Domain(n)
    evals = dom.coset_fft(coeffs)
    vals = [c.value for c in coeffs]
    g = params.FR_GENERATOR
    for i in range(n):
        x = g * dom.elements()[i].value % Q
        assert evals[i].value == horner(vals, x)
    assert dom.coset_ifft(evals) == coeffs


def test_degree_extension():
    # evaluating on a 4x domain then interpolating back preserves the poly
    n = 16
    rng = random.Random(74)
    coeffs = [Fr(rng.getrandbits(260)) for _ in range(n)]
    big = Domain(4 * n)
    evals = big.coset_fft(coeffs)
    back = big.coset_ifft(evals)
    assert back[:n] == coeffs and all(c.is_zero() for c in back[n:])


def test_convolution_property():
    # fft(a) * fft(b) == fft(a conv b mod X^n - 1)
    n = 32
    rng = random.Random(75)
    a = [rng.getrandbits(200) % Q for _ in range(n)]
    b = [rng.getrandbits(200) % Q for _ in range(n)]
    conv = [0] * n
    for i in range(n):
        for j in range(n):
            conv[(i + j) % n] = (conv[(i + j) % n] + a[i] * b[j]) % Q
    dom = Domain(n)
    fa = dom.fft([Fr(x) for x in a])
    fb = dom.fft([Fr(x) for x in b])
    fc = dom.fft([Fr(x) for x in conv])
    assert [x * y for x, y in zip(fa, fb)] == fc


def test_lagrange_coefficients():
    n = 16
    dom = Domain(n)
    tau = Fr(0xDEADBEEF)
    ls = dom.evaluate_all_lagrange_coefficients(tau)
    # sum L_i(tau) == 1 and sum L_i(tau) w^i == tau
    assert sum(ls, Fr.zero()) == Fr.one()
    acc = Fr.zero()
    for l, e in zip(ls, dom.elements()):
        acc = acc + l * e
    assert acc == tau
    # at a domain point: indicator
    ls2 = dom.evaluate_all_lagrange_coefficients(dom.elements()[3])
    assert ls2[3] == Fr.one() and sum(ls2, Fr.zero()) == Fr.one()


def test_vanishing_over_coset():
    n, big = 8, 32
    dom = Domain(n)
    vh = dom.compute_vanishing_poly_over_coset(big)
    bigd = Domain(big)
    g = params.FR_GENERATOR
    for i in range(big):
        x = g * bigd.elements()[i].value % Q
        assert vh[i].value == (pow(x, n, Q) - 1) % Q
        assert vh[i].value != 0  # coset avoids the vanishing set


def test_batch_inverse():
    vals = [3, 0, 7, 1, 0, Q - 1]
    out = _batch_inverse(vals, Q)
    for v, o in zip(vals, out):
        assert o == (pow(v, -1, Q) if v else 0)
