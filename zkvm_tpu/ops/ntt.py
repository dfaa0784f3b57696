"""Radix-2 (i)NTT over the BLS12-381 scalar field, batched on device.

The reference evaluates polynomials with a *serial* Cooley-Tukey butterfly
(plonk/src/fft/domain.rs:286-340).  Here each butterfly stage is one batched
Montgomery multiply + add/sub over the whole domain -- data-oblivious, fixed
shape, VPU-friendly.  Results are exact integers, hence bit-identical to the
reference for the same domain.

`Domain` mirrors plonk/src/fft/domain.rs:23-284 (fft/ifft/coset variants with
GENERATOR=7 cosets, vanishing-polynomial helpers, Lagrange coefficients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from ..fields import Fr
from . import limb_field as lf
from .limb_field import FR


def bit_reverse_indices(n: int) -> np.ndarray:
    log_n = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


def _ntt_impl(x, brev, even_idx, odd_idx, out_idx, tw_idx, tw_table):
    """Dispatch: fused pallas butterfly on TPU, jnp elsewhere."""
    from . import pallas_field

    if pallas_field._on_tpu():
        return _ntt_impl_tpu(x, brev, even_idx, odd_idx, out_idx, tw_idx,
                             tw_table)
    return _ntt_impl_jnp(x, brev, even_idx, odd_idx, out_idx, tw_idx,
                         tw_table)


@jax.jit
def _ntt_impl_tpu(x, brev, even_idx, odd_idx, out_idx, tw_idx, tw_table):
    from . import pallas_field

    x = jnp.take(x, brev, axis=1)

    def stage(state, inputs):
        e_idx, o_idx, g_idx, t_idx = inputs
        even = jnp.take(state, e_idx, axis=1)
        odd = jnp.take(state, o_idx, axis=1)
        tw = jnp.take(tw_table, t_idx, axis=1)
        plus, minus = pallas_field.butterfly_pallas(even, odd, tw)
        cat = jnp.concatenate([plus, minus], axis=1)
        return jnp.take(cat, g_idx, axis=1), None

    x, _ = jax.lax.scan(stage, x, (even_idx, odd_idx, out_idx, tw_idx))
    return x


@jax.jit
def _ntt_impl_jnp(x: jnp.ndarray, brev: jnp.ndarray, even_idx: jnp.ndarray,
              odd_idx: jnp.ndarray, out_idx: jnp.ndarray,
              tw_idx: jnp.ndarray, tw_table: jnp.ndarray) -> jnp.ndarray:
    """Iterative CT NTT; x: [L, n] Montgomery; output natural order evals.

    Every butterfly stage runs over the same flat [L, n] array shape (gather
    indices and twiddle-table lookups precomputed per stage on the host), so
    the whole transform is ONE lax.scan over log2(n) stages -- the traced
    graph holds a single Montgomery multiply regardless of n, and each stage
    is a batched [L, n/2] butterfly with the domain on the vector lanes.
    """
    x = jnp.take(x, brev, axis=1)

    def stage(state, inputs):
        e_idx, o_idx, g_idx, t_idx = inputs
        even = jnp.take(state, e_idx, axis=1)
        odd = jnp.take(state, o_idx, axis=1)
        tw = jnp.take(tw_table, t_idx, axis=1)
        t = lf.mont_mul(FR, odd, tw)
        cat = jnp.concatenate([lf.add(FR, even, t), lf.sub(FR, even, t)],
                              axis=1)
        return jnp.take(cat, g_idx, axis=1), None

    x, _ = jax.lax.scan(stage, x, (even_idx, odd_idx, out_idx, tw_idx))
    return x


@functools.partial(jax.jit, static_argnums=0)
def _scale(spec, x: jnp.ndarray, factors: jnp.ndarray) -> jnp.ndarray:
    """Pointwise Montgomery multiply by a per-index factor array."""
    return lf.mont_mul(spec, x, factors)


class Domain:
    """Multiplicative subgroup domain of power-of-two order over Fr."""

    _cache: dict[int, "Domain"] = {}

    def __new__(cls, size: int):
        if size in cls._cache:
            return cls._cache[size]
        inst = super().__new__(cls)
        cls._cache[size] = inst
        return inst

    def __init__(self, size: int):
        if getattr(self, "size", None) == size:
            return  # cached
        if size > (1 << params.FR_TWO_ADICITY):
            # fft/domain.rs:35-43 InvalidEvalDomainSize
            from ..plonk.errors import InvalidEvalDomainSize

            raise InvalidEvalDomainSize(size.bit_length() - 1,
                                        params.FR_TWO_ADICITY)
        if size & (size - 1) or size == 0:
            raise ValueError(f"invalid domain size {size}")
        self.size = size
        self.log_size = size.bit_length() - 1
        q = params.FR_MODULUS
        self.group_gen = pow(params.FR_ROOT_OF_UNITY,
                             1 << (params.FR_TWO_ADICITY - self.log_size), q)
        self.group_gen_inv = pow(self.group_gen, -1, q)
        self.size_inv = pow(size, -1, q)
        self.generator = params.FR_GENERATOR  # coset shift g = 7
        self.generator_inv = pow(self.generator, -1, q)
        # lazy per-use factor tables / butterfly tables (the MXU matmul path
        # is the default transform; the scanned butterfly stays available
        # via ZKVM_NTT_IMPL=butterfly for cross-checks)
        self._factors: dict[str, jnp.ndarray] = {}
        self._factors_np: dict[str, "np.ndarray"] = {}
        self._butterfly: tuple | None = None

    def _butterfly_tables(self):
        if self._butterfly is None:
            self._butterfly = (jnp.asarray(bit_reverse_indices(self.size)),
                               self._build_stage_indexes(),
                               self._twiddle_tables(self.group_gen),
                               self._twiddle_tables(self.group_gen_inv))
        return self._butterfly

    @property
    def _brev(self):
        return self._butterfly_tables()[0]

    @property
    def _stage_indexes(self):
        return self._butterfly_tables()[1]

    @property
    def _fwd_tw(self):
        return self._butterfly_tables()[2]

    @property
    def _inv_tw(self):
        return self._butterfly_tables()[3]

    def _build_stage_indexes(self):
        """Per-stage flat gather indexes for the scanned butterfly.

        Stage s pairs (b*2h + t, b*2h + h + t) for h = 2^s; outputs land at
        the same positions, gathered from concat([plus, minus]).
        """
        n = self.size
        log_n = self.log_size
        if log_n == 0:
            z = np.zeros((0, 0), dtype=np.int32)
            return (jnp.asarray(z), jnp.asarray(z), jnp.asarray(z),
                    jnp.asarray(z))
        even = np.zeros((log_n, n // 2), dtype=np.int32)
        odd = np.zeros((log_n, n // 2), dtype=np.int32)
        out = np.zeros((log_n, n), dtype=np.int32)
        twi = np.zeros((log_n, n // 2), dtype=np.int32)
        k = np.arange(n // 2)
        j = np.arange(n)
        for s in range(log_n):
            h = 1 << s
            b = k // h
            t = k % h
            even[s] = b * 2 * h + t
            odd[s] = b * 2 * h + h + t
            jb = j // (2 * h)
            jr = j % (2 * h)
            out[s] = np.where(jr < h, jb * h + jr, n // 2 + jb * h + jr - h)
            # stage twiddle for pair k is root^((n >> (s+1)) * (k % h))
            twi[s] = (n >> (s + 1)) * t
        return (jnp.asarray(even), jnp.asarray(odd), jnp.asarray(out),
                jnp.asarray(twi))

    def _twiddle_tables(self, root: int) -> jnp.ndarray:
        """[L, max(n/2, 1)] Montgomery table of root powers."""
        q = params.FR_MODULUS
        powers, cur = [], 1
        for _ in range(max(self.size // 2, 1)):
            powers.append(cur)
            cur = cur * root % q
        return FR.to_mont_array(powers)

    def _factor(self, key: str) -> jnp.ndarray:
        """Precomputed pointwise factor arrays (Montgomery form, [L, n]).

        Built host-side (may run under an active jit trace) and lifted to
        device once; under a trace the lift is a baked constant and is NOT
        cached (caching it would leak that trace's tracer)."""
        dev = self._factors.get(key)
        if dev is None:
            if key not in self._factors_np:
                q = params.FR_MODULUS
                n = self.size
                if key == "coset":          # g^i
                    vals = self._powers(self.generator)
                elif key == "coset_inv_scaled":  # g^{-i} * n^{-1}
                    vals = [v * self.size_inv % q
                            for v in self._powers(self.generator_inv)]
                elif key == "size_inv":     # n^{-1} broadcast
                    vals = [self.size_inv] * n
                else:
                    raise KeyError(key)
                self._factors_np[key] = FR.to_mont_array_np(vals)
            import jax

            dev = jnp.asarray(self._factors_np[key])
            if not isinstance(dev, jax.core.Tracer):
                self._factors[key] = dev
        return dev

    def _powers(self, base: int) -> list[int]:
        q = params.FR_MODULUS
        out, cur = [], 1
        for _ in range(self.size):
            out.append(cur)
            cur = cur * base % q
        return out

    # ---- device transforms (Montgomery [L, n] tensors) ----------------------
    def _run(self, x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        if self.size == 1:
            return x
        import os

        if os.environ.get("ZKVM_NTT_IMPL") == "butterfly":
            brev, (even, odd, out, twi), fwd, inv = self._butterfly_tables()
            return _ntt_impl(x, brev, even, odd, out, twi,
                             inv if inverse else fwd)
        from .ntt_mxu import MXUTransform

        root = self.group_gen_inv if inverse else self.group_gen
        return MXUTransform(self.size, root)(x)

    def fft_device(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        assert coeffs.shape[-1] == self.size
        return self._run(coeffs, inverse=False)

    def ifft_device(self, evals: jnp.ndarray) -> jnp.ndarray:
        out = self._run(evals, inverse=True)
        return _scale(FR, out, self._factor("size_inv"))

    def coset_fft_device(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Evaluate over the coset g*H (distribute powers of g, then FFT)."""
        shifted = _scale(FR, coeffs, self._factor("coset"))
        return self._run(shifted, inverse=False)

    def coset_ifft_device(self, evals: jnp.ndarray) -> jnp.ndarray:
        out = self._run(evals, inverse=True)
        return _scale(FR, out, self._factor("coset_inv_scaled"))

    # ---- host conveniences (lists of Fr) -------------------------------------
    def fft(self, coeffs: list[Fr]) -> list[Fr]:
        arr = FR.to_mont_array([c.value for c in self._pad(coeffs)])
        return [Fr(v) for v in FR.from_mont_array(self.fft_device(arr))]

    def ifft(self, evals: list[Fr]) -> list[Fr]:
        arr = FR.to_mont_array([c.value for c in self._pad(evals)])
        return [Fr(v) for v in FR.from_mont_array(self.ifft_device(arr))]

    def coset_fft(self, coeffs: list[Fr]) -> list[Fr]:
        arr = FR.to_mont_array([c.value for c in self._pad(coeffs)])
        return [Fr(v) for v in FR.from_mont_array(self.coset_fft_device(arr))]

    def coset_ifft(self, evals: list[Fr]) -> list[Fr]:
        arr = FR.to_mont_array([c.value for c in self._pad(evals)])
        return [Fr(v) for v in FR.from_mont_array(self.coset_ifft_device(arr))]

    def _pad(self, xs: list[Fr]) -> list[Fr]:
        if len(xs) > self.size:
            raise ValueError("input larger than domain")
        return list(xs) + [Fr.zero()] * (self.size - len(xs))

    # ---- host-side domain analytics (domain.rs:106-284) ----------------------
    def elements(self) -> list[Fr]:
        return [Fr(v) for v in self._powers(self.group_gen)]

    def evaluate_vanishing_polynomial(self, tau: Fr) -> Fr:
        """Z_H(tau) = tau^n - 1."""
        return tau.pow(self.size) - Fr.one()

    def evaluate_all_lagrange_coefficients(self, tau: Fr) -> list[Fr]:
        """L_i(tau) for all i, batch-inverted barycentric (domain.rs:200-250)."""
        q = params.FR_MODULUS
        n = self.size
        t = tau.value
        z = (pow(t, n, q) - 1) % q
        if z == 0:
            # tau is in the domain: indicator vector
            els = self._powers(self.group_gen)
            return [Fr.one() if e == t else Fr.zero() for e in els]
        z_over_n = z * self.size_inv % q
        els = self._powers(self.group_gen)
        denoms = [(t - e) % q for e in els]
        invs = _batch_inverse(denoms, q)
        return [Fr(z_over_n * e % q * inv % q) for e, inv in zip(els, invs)]

    def compute_vanishing_poly_over_coset(self, coset_size: int) -> list[Fr]:
        """Evals of Z_H(X)=X^n - 1 over the coset g*H' of size coset_size."""
        q = params.FR_MODULUS
        big = Domain(coset_size)
        g_pow_n = pow(self.generator, self.size, q)
        w_pow_n = pow(big.group_gen, self.size, q)
        out, cur = [], g_pow_n
        for _ in range(coset_size):
            out.append(Fr((cur - 1) % q))
            cur = cur * w_pow_n % q
        return out


def _batch_inverse(vals: list[int], q: int) -> list[int]:
    """Montgomery's trick; zeros map to zero (plonk/src/util.rs batch_inversion)."""
    prefix, acc = [], 1
    for v in vals:
        prefix.append(acc)
        if v:
            acc = acc * v % q
    inv = pow(acc, -1, q)
    out = [0] * len(vals)
    for i in range(len(vals) - 1, -1, -1):
        if vals[i]:
            out[i] = prefix[i] * inv % q
            inv = inv * vals[i] % q
    return out
