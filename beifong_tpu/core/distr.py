"""Discrete/continuous 1-D and hierarchical 2-D distributions.

TPU-native replacement for reference `include/mitsuba/core/distr_1d.h` (850 LoC)
and `distr_2d.h` (1441 LoC): CDF tables as arrays, sampling via
`jnp.searchsorted` (vectorized binary search, no data-dependent loops).

Like the reference (which disabled its negativity check for radar,
`distr_1d.h:73-80` + `change_notes:2-4`), sampling weights may come from Wigner
distributions that go negative; we build CDFs over |pmf| and carry the sign in
the returned weight.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiscreteDistribution:
    """Normalized discrete distribution over n entries."""

    pmf: jax.Array        # (n,) possibly-signed weights
    cdf: jax.Array        # (n,) inclusive cumulative of |pmf|, unnormalized
    total: jax.Array      # () sum |pmf|

    @staticmethod
    def build(weights) -> "DiscreteDistribution":
        w = jnp.asarray(weights, jnp.float32)
        aw = jnp.abs(w)
        cdf = jnp.cumsum(aw)
        return DiscreteDistribution(pmf=w, cdf=cdf, total=cdf[-1])

    def prob(self, idx):
        return jnp.abs(self.pmf[idx]) / jnp.maximum(self.total, 1e-30)

    def sample(self, u):
        """u in [0,1) -> index. Broadcasts over u's shape."""
        target = u * self.total
        idx = jnp.searchsorted(self.cdf, target, side='right')
        return jnp.clip(idx, 0, self.pmf.shape[0] - 1)

    def sample_reuse(self, u):
        """Sample an index and rescale u for reuse (reference
        `distr_1d.h` sample_reuse)."""
        idx = self.sample(u)
        lo = jnp.where(idx > 0, self.cdf[idx - 1], 0.0)
        w = jnp.maximum(self.cdf[idx] - lo, 1e-30)
        u2 = (u * self.total - lo) / w
        return idx, jnp.clip(u2, 0.0, 1.0 - 1e-7)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ContinuousDistribution:
    """Piecewise-linear continuous distribution on [x0, x1]
    (reference `distr_1d.h` ContinuousDistribution)."""

    x0: jax.Array
    x1: jax.Array
    pdf_vals: jax.Array   # (n,) density at nodes (possibly signed)
    cdf: jax.Array        # (n-1,) integral up to each cell end, over |pdf|
    total: jax.Array

    @staticmethod
    def build(x0, x1, values) -> "ContinuousDistribution":
        v = jnp.abs(jnp.asarray(values, jnp.float32))
        n = v.shape[0]
        dx = (x1 - x0) / (n - 1)
        cell = 0.5 * (v[:-1] + v[1:]) * dx
        cdf = jnp.cumsum(cell)
        return ContinuousDistribution(
            x0=jnp.asarray(x0, jnp.float32), x1=jnp.asarray(x1, jnp.float32),
            pdf_vals=jnp.asarray(values, jnp.float32), cdf=cdf, total=cdf[-1])

    def sample(self, u):
        """u in [0,1) -> x in [x0, x1] with density ~ |pdf_vals| (lin-interp)."""
        n = self.pdf_vals.shape[0]
        dx = (self.x1 - self.x0) / (n - 1)
        target = u * self.total
        idx = jnp.clip(jnp.searchsorted(self.cdf, target, side='right'), 0, n - 2)
        lo = jnp.where(idx > 0, self.cdf[idx - 1], 0.0)
        rem = target - lo
        v0 = jnp.abs(self.pdf_vals[idx])
        v1 = jnp.abs(self.pdf_vals[idx + 1])
        # Solve rem = v0*t + 0.5*(v1-v0)*t^2/dx for t in [0, dx].
        a = 0.5 * (v1 - v0) / dx
        disc = v0 * v0 + 4.0 * a * rem
        t_lin = rem / jnp.maximum(v0, 1e-30)
        t_quad = (jnp.sqrt(jnp.maximum(disc, 0.0)) - v0) / jnp.maximum(2.0 * a, 1e-30)
        t = jnp.where(jnp.abs(a) > 1e-20, t_quad, t_lin)
        return self.x0 + idx * dx + jnp.clip(t, 0.0, dx)

    def eval_pdf(self, x):
        n = self.pdf_vals.shape[0]
        dx = (self.x1 - self.x0) / (n - 1)
        f = jnp.clip((x - self.x0) / dx, 0.0, n - 1 - 1e-6)
        idx = jnp.floor(f).astype(jnp.int32)
        t = f - idx
        v = self.pdf_vals[idx] * (1 - t) + self.pdf_vals[idx + 1] * t
        return v / jnp.maximum(self.total, 1e-30)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Marginal2D:
    """Row-marginal 2-D distribution over an (h, w) grid (replaces the
    reference's Hierarchical2D/Marginal2D in `distr_2d.h` for envmap/texture
    importance sampling)."""

    data: jax.Array       # (h, w)
    row_cdf: jax.Array    # (h,)
    col_cdf: jax.Array    # (h, w)
    total: jax.Array

    @staticmethod
    def build(data) -> "Marginal2D":
        d = jnp.abs(jnp.asarray(data, jnp.float32))
        col_cdf = jnp.cumsum(d, axis=1)
        row_w = col_cdf[:, -1]
        row_cdf = jnp.cumsum(row_w)
        return Marginal2D(data=jnp.asarray(data, jnp.float32), row_cdf=row_cdf,
                          col_cdf=col_cdf, total=row_cdf[-1])

    def sample(self, u):
        """u (..., 2) in [0,1)^2 -> (row, col) integer cell + pdf."""
        h, w = self.data.shape
        tr = u[..., 0] * self.total
        r = jnp.clip(jnp.searchsorted(self.row_cdf, tr, side='right'), 0, h - 1)
        row_total = jnp.maximum(self.col_cdf[r, -1], 1e-30)
        tc = u[..., 1] * row_total
        c = jnp.clip(jax.vmap(lambda cdf, t: jnp.searchsorted(cdf, t, side='right'))(
            self.col_cdf[r.reshape(-1)], tc.reshape(-1)).reshape(r.shape), 0, w - 1)
        pdf = jnp.abs(self.data[r, c]) / jnp.maximum(self.total, 1e-30)
        return r, c, pdf

    def pdf(self, r, c):
        return jnp.abs(self.data[r, c]) / jnp.maximum(self.total, 1e-30)
