"""CA-CFAR detection on range-Doppler maps (all-XLA, convolution-based)."""

from __future__ import annotations

import jax.numpy as jnp


def ca_cfar_2d(power, guard: tuple = (2, 2), train: tuple = (8, 8),
               pfa: float = 1e-4):
    """Cell-averaging CFAR over a 2-D power map.

    power: (D, R) non-negative.  Returns (detections bool, threshold map).
    The local noise estimate is the mean over the training ring (box minus
    guard box), computed with two box filters (cumsum trick).
    """
    gd, gr = guard
    td, tr = train

    def box_sum(x, hd, hr):
        # inclusive box of half-sizes (hd, hr) via padded cumsum
        xp = jnp.pad(x, ((hd + 1, hd), (hr + 1, hr)))
        c = jnp.cumsum(jnp.cumsum(xp, axis=0), axis=1)
        D, R = x.shape
        i = jnp.arange(D)
        j = jnp.arange(R)
        a = c[2 * hd + 1:, 2 * hr + 1:][:D, :R]
        b = c[:D, 2 * hr + 1:][:, :R]
        d = c[2 * hd + 1:, :R][:D, :]
        e = c[:D, :R]
        del i, j
        return a - b - d + e

    ones = jnp.ones_like(power)
    outer = box_sum(power, gd + td, gr + tr)
    inner = box_sum(power, gd, gr)
    # Count actual in-bounds training cells (edges have fewer)
    n_outer = box_sum(ones, gd + td, gr + tr)
    n_inner = box_sum(ones, gd, gr)
    n_train = jnp.maximum(n_outer - n_inner, 1.0)
    noise = (outer - inner) / n_train
    # CA-CFAR scale for exponential noise: alpha = N (Pfa^{-1/N} - 1)
    alpha = n_train * (pfa ** (-1.0 / n_train) - 1.0)
    thresh = alpha * noise
    return power > thresh, thresh
