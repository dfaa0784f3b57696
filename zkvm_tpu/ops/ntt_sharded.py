"""Distributed NTT: 4-step (Bailey) decomposition over a device mesh.

The reference's FFT is strictly serial (plonk/src/fft/domain.rs:286).  Here a
size-N transform factors as N = N1 * N2 (SURVEY.md section 2.9 north star):

  1. each device runs N1-point column FFTs over its shard of the N2 axis,
  2. multiplies by the w^(b*c) "twiddle glue" factors (local),
  3. an `all_to_all` re-shards from columns (b) to rows (c) -- the only
     communication, one matrix transpose over ICI,
  4. each device runs N2-point row FFTs over its shard of the N1 axis.

Derivation: with n = N2*a + b, k = N1*d + c,
  X[N1*d + c] = sum_b w2^(b*d) * w^(b*c) * [ sum_a x[a, b] * w1^(a*c) ]
(w1 = w^N2 has order N1, w2 = w^N1 has order N2), so the output matrix
Z[c, d] read out d-major is exactly X.

Local FFTs reuse the single-chip scanned butterfly (`_ntt_impl`) on a
flattened [L, n*B] layout: batched gather indexes are the single-FFT indexes
scaled by the batch stride, so the same kernel serves any batch count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import params
from . import limb_field as lf
from .limb_field import FR
from .ntt import Domain, _ntt_impl, bit_reverse_indices

_Q = params.FR_MODULUS


class _BatchedNTT:
    """n-point FFT batched over B lanes of an [L, n, B] tensor (MXU path)."""

    def __init__(self, n: int, batch: int, inverse: bool):
        """`inverse` selects the inverse root; the overall N^-1 scaling
        happens once at the end of the (distributed) transform."""
        from .ntt_mxu import MXUTransform

        dom = Domain(n)
        self.n, self.batch = n, batch
        root = dom.group_gen_inv if inverse else dom.group_gen
        self.transform = MXUTransform(n, root)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [L, n, B] -> [L, n, B] transformed along the n axis."""
        if self.n == 1:
            return x
        return self.transform.apply_axis(x, 1)


@functools.lru_cache(maxsize=None)
def _glue_twiddles(n: int, n1: int, n2_local: int, dev: int, n_dev: int,
                   inverse: bool) -> np.ndarray:
    """w^(b*c) factors for device `dev`'s b-slice, Montgomery [L, N1, n2loc]."""
    root = pow(params.FR_ROOT_OF_UNITY,
               1 << (params.FR_TWO_ADICITY - n.bit_length() + 1), _Q)
    if inverse:
        root = pow(root, -1, _Q)
    vals = []
    for c in range(n1):
        for off in range(n2_local):
            b = dev * n2_local + off
            vals.append(pow(root, b * c, _Q))
    # host-only encoding: this can run under an active jit trace (the
    # mesh round programs build DistributedDomain plans on first trace)
    return FR.to_mont_array_np(vals).reshape(FR.n_limbs, n1, n2_local)


class DistributedDomain:
    """Size-N NTT sharded over `mesh` (one axis)."""

    def __init__(self, size: int, mesh, axis: str | None = None):
        self.size = size
        self.mesh = mesh
        self.axis = axis or mesh.axis_names[0]
        self.n_dev = mesh.devices.size
        # N1 = local FFT length of step 1; shard the N2 axis across devices.
        # Both factors must divide the device count, so lift N1 to a
        # multiple of it when the square split falls short (any pow-2 mesh
        # works once size >= n_dev^2).  Non-pow-2 meshes and domains too
        # small to split fall back to a replicated single-chip transform --
        # at those sizes the transform is a few microseconds of MXU work
        # and communication would dominate anyway.
        lb = size.bit_length() - 1
        d = self.n_dev.bit_length() - 1
        pow2_mesh = self.n_dev == (1 << d)
        self.local = not (pow2_mesh and size == (1 << lb) and lb >= 2 * d)
        if self.local:
            self._domain = Domain(size)
            return
        l1 = max(d, lb // 2)
        self.n1 = 1 << l1
        self.n2 = size >> l1
        self.n2_loc = self.n2 // self.n_dev
        self.n1_loc = self.n1 // self.n_dev

    @functools.lru_cache(maxsize=None)
    def _coset_tables_np(self, inverse: bool) -> np.ndarray:
        """Per-device coset scaling tables (GENERATOR=7 power distribution,
        fft/domain.rs:168-196 semantics), laid out to match the sharded
        tensor at the point where the scale is applied:

          forward: input x[a, b] sharded over b -> [D, L, n1, n2loc] of g^i,
                   i = N2*a + b.
          inverse: output z[c, d] sharded over c -> [D, L, n1loc, n2] of
                   g^-k * N^-1, k = N1*d + c.

        NUMPY out (host-only encoding): first use may happen under a jit
        trace (the mesh round programs), where a device table would be
        that trace's tracer.
        """
        g = params.FR_GENERATOR
        if not inverse:
            tabs = []
            for dev in range(self.n_dev):
                vals = [pow(g, self.n2 * a + (dev * self.n2_loc + off), _Q)
                        for a in range(self.n1)
                        for off in range(self.n2_loc)]
                tabs.append(FR.to_mont_array_np(vals).reshape(
                    FR.n_limbs, self.n1, self.n2_loc))
            return np.stack(tabs)
        g_inv = pow(g, -1, _Q)
        n_inv = pow(self.size, -1, _Q)
        tabs = []
        for dev in range(self.n_dev):
            vals = [pow(g_inv, self.n1 * d + (dev * self.n1_loc + c), _Q)
                    * n_inv % _Q
                    for c in range(self.n1_loc)
                    for d in range(self.n2)]
            tabs.append(FR.to_mont_array_np(vals).reshape(
                FR.n_limbs, self.n1_loc, self.n2))
        return np.stack(tabs)

    def _lift(self, key: str, np_builder) -> jnp.ndarray:
        """Device lift of a numpy table; cached ONLY when concrete (under
        a trace the lift is a baked constant and must not be cached)."""
        cache = getattr(self, "_dev_tables", None)
        if cache is None:
            cache = self._dev_tables = {}
        dev = cache.get(key)
        if dev is None:
            dev = jnp.asarray(np_builder())
            if not isinstance(dev, jax.core.Tracer):
                cache[key] = dev
        return dev

    @functools.lru_cache(maxsize=None)
    def _glue_np(self, inverse: bool) -> np.ndarray:
        return np.stack([
            _glue_twiddles(self.size, self.n1, self.n2_loc, d, self.n_dev,
                           inverse)
            for d in range(self.n_dev)])  # [D, L, n1, n2loc]

    @functools.lru_cache(maxsize=None)
    def _build(self, inverse: bool, coset: bool):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n1, n2, n2_loc, n1_loc = self.n1, self.n2, self.n2_loc, self.n1_loc
        fft1 = _BatchedNTT(n1, n2_loc, inverse)
        fft2 = _BatchedNTT(n2, n1_loc, inverse)
        axis = self.axis

        def mul_tbl(t, tbl):
            l = t.shape[0]
            return lf.mont_mul(FR, t.reshape(l, -1),
                               tbl.reshape(l, -1)).reshape(t.shape)

        def step(x_loc, tw_loc, pre_loc, post_loc):
            # x_loc: [L, n1, n2loc] (this device's b-slice)
            if coset and not inverse:
                x_loc = mul_tbl(x_loc, pre_loc[0])
            y = fft1(x_loc)                         # FFT over a -> index c
            y = mul_tbl(y, tw_loc[0])
            # reshard: split the c axis, gather the full b axis
            y = jax.lax.all_to_all(y, axis, split_axis=1, concat_axis=2,
                                   tiled=True)      # [L, n1loc, n2]
            y = jnp.swapaxes(y, 1, 2)               # [L, n2(b), n1loc]
            z = fft2(y)                             # FFT over b -> index d
            z = jnp.swapaxes(z, 1, 2)               # [L, n1loc(c), n2(d)]
            if inverse:
                z = mul_tbl(z, post_loc[0])
            return z

        fn = shard_map(step, mesh=self.mesh,
                       in_specs=(P(None, None, axis), P(axis), P(axis),
                                 P(axis)),
                       out_specs=P(None, axis, None),
                       check_vma=False)
        return jax.jit(fn)

    def _run(self, x: jnp.ndarray, inverse: bool,
             coset: bool = False) -> jnp.ndarray:
        """x: [L, N] coefficients -> [L, N] evaluations (natural order)."""
        if self.local:
            dom = self._domain
            fn = ((dom.coset_ifft_device if coset else dom.ifft_device)
                  if inverse else
                  (dom.coset_fft_device if coset else dom.fft_device))
            return fn(x)
        l = FR.n_limbs
        fn = self._build(inverse, coset)
        glue = self._lift(f"glue{inverse}", lambda: self._glue_np(inverse))
        if coset and not inverse:
            pre = self._lift("coset_f", lambda: self._coset_tables_np(False))
        else:
            pre = jnp.zeros((self.n_dev, l, self.n1, self.n2_loc), jnp.uint32)
        if inverse:
            # n^-1 (plain ifft) or g^-k * n^-1 (coset ifft), applied sharded
            post = (self._lift("coset_i",
                               lambda: self._coset_tables_np(True))
                    if coset else
                    jnp.broadcast_to(
                        jnp.asarray(FR.const_mont(pow(self.size, -1, _Q)))
                        [None, :, :, None],
                        (self.n_dev, l, self.n1_loc, self.n2)))
        else:
            post = jnp.zeros((self.n_dev, l, self.n1_loc, self.n2),
                             jnp.uint32)
        xm = x.reshape(l, self.n1, self.n2)  # x[a, b] with n = N2*a + b
        z = fn(xm, glue, pre, post)          # [L, N1(c), N2(d)]
        return jnp.swapaxes(z, 1, 2).reshape(l, self.size)  # k = N1*d + c

    def fft_device(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        return self._run(coeffs, inverse=False)

    def ifft_device(self, evals: jnp.ndarray) -> jnp.ndarray:
        return self._run(evals, inverse=True)

    def coset_fft_device(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Evaluate over the coset g*H, sharded (domain.rs:168 semantics)."""
        return self._run(coeffs, inverse=False, coset=True)

    def coset_ifft_device(self, evals: jnp.ndarray) -> jnp.ndarray:
        """Interpolate from coset evaluations, sharded."""
        return self._run(evals, inverse=True, coset=True)
