"""Cubic (Catmull-Rom) spline evaluation on regular grids (reference
`include/mitsuba/core/spline.h`: `eval_spline`, `eval_1d`, `integrate_1d`,
`eval_2d`).

jnp implementations, vectorized over query batches — used for tabulated
spectra/BRDF interpolation where linear interpolation visibly kinks.
"""

from __future__ import annotations

import jax.numpy as jnp


def eval_spline(f0, f1, d0, d1, t):
    """Cubic Hermite segment: values f0,f1 and derivatives d0,d1 at the
    endpoints, t in [0, 1] (reference `spline.h::eval_spline`)."""
    t2 = t * t
    t3 = t2 * t
    return ((2.0 * t3 - 3.0 * t2 + 1.0) * f0 + (-2.0 * t3 + 3.0 * t2) * f1
            + (t3 - 2.0 * t2 + t) * d0 + (t3 - t2) * d1)


def _derivs(values):
    """Catmull-Rom endpoint derivatives per segment (one-sided at ends)."""
    v = values
    n = v.shape[-1]
    d = 0.5 * (jnp.roll(v, -1, -1) - jnp.roll(v, 1, -1))
    d = d.at[..., 0].set(v[..., 1] - v[..., 0])
    d = d.at[..., n - 1].set(v[..., n - 1] - v[..., n - 2])
    return d


def eval_1d(x0: float, x1: float, values, x):
    """Catmull-Rom interpolation of regularly-spaced `values` over
    [x0, x1] at query points `x` (clamped; reference `spline.h::eval_1d`,
    uniform variant).  `values`: (..., N); `x`: any batch shape."""
    v = jnp.asarray(values)
    n = v.shape[-1]
    t = jnp.clip((x - x0) / (x1 - x0), 0.0, 1.0) * (n - 1)
    k = jnp.clip(t.astype(jnp.int32), 0, n - 2)
    u = t - k
    d = _derivs(v)
    return eval_spline(v[..., k], v[..., k + 1], d[..., k], d[..., k + 1], u)


def integrate_1d(x0: float, x1: float, values):
    """Antiderivative table of the Catmull-Rom interpolant at the knots
    (reference `spline.h::integrate_1d`): out[i] = integral from x0 to
    knot i.  Each segment integrates exactly:
    int_0^1 h(t) dt = (f0 + f1)/2 + (d0 - d1)/12."""
    v = jnp.asarray(values)
    n = v.shape[-1]
    h = (x1 - x0) / (n - 1)
    d = _derivs(v)
    seg = (0.5 * (v[..., :-1] + v[..., 1:])
           + (d[..., :-1] - d[..., 1:]) / 12.0) * h
    zero = jnp.zeros(v.shape[:-1] + (1,), v.dtype)
    return jnp.concatenate([zero, jnp.cumsum(seg, -1)], -1)


def eval_2d(x0, x1, y0, y1, values, x, y):
    """Separable bicubic interpolation of a regular (Ny, Nx) grid at a
    batch of (x, y) query points (reference `spline.h::eval_2d`):
    Catmull-Rom along x for every grid row, then along y per lane."""
    v = jnp.asarray(values)                       # (Ny, Nx)
    ny = v.shape[0]
    rows = eval_1d(x0, x1, v, x)                  # (Ny, B): x-interp per row
    rows = jnp.moveaxis(rows, 0, -1)              # (B, Ny)
    t = jnp.clip((y - y0) / (y1 - y0), 0.0, 1.0) * (ny - 1)
    k = jnp.clip(t.astype(jnp.int32), 0, ny - 2)
    u = t - k
    d = _derivs(rows)

    def take(a, i):
        return jnp.take_along_axis(a, i[..., None], -1)[..., 0]

    return eval_spline(take(rows, k), take(rows, k + 1),
                       take(d, k), take(d, k + 1), u)
