"""Film accumulation with reconstruction-filter splatting.

Replaces reference `ImageBlock`/`hdrfilm` (`src/librender/imageblock.cpp`,
`src/films/hdrfilm.cpp`) and `SignalBlock` (`signalblock.cpp:80-190`): the
thread-local block + mutex merge becomes a race-free scatter-add over the
whole wavefront.  Splatting uses a separable filter footprint of static
radius; values may be negative (radar WDFs — reference disables the
negative-value warnings, `signalblock.h:59-65`).

Accumulation layout: (H, W, C+2) — C value channels + weight channel + count,
matching the reference's XYZAW / YAW conventions.
"""

from __future__ import annotations

import jax.numpy as jnp

# Filter codes
BOX = 0
TENT = 1
GAUSSIAN = 2
MITCHELL = 3
CATMULLROM = 4
LANCZOS = 5

_RADIUS = {BOX: 1, TENT: 1, GAUSSIAN: 2, MITCHELL: 2, CATMULLROM: 2, LANCZOS: 3}


def filter_eval(kind: int, x):
    """1-D filter kernel value at offset x (static kind)."""
    ax = jnp.abs(x)
    if kind == BOX:
        return jnp.where(ax <= 0.5, 1.0, 0.0)
    if kind == TENT:
        return jnp.maximum(1.0 - ax, 0.0)
    if kind == GAUSSIAN:
        s = 0.5
        v = jnp.exp(-0.5 * (x / s) ** 2) - jnp.exp(-0.5 * (2.0 / s) ** 2)
        return jnp.maximum(v, 0.0)
    if kind in (MITCHELL, CATMULLROM):
        b, c = (1 / 3, 1 / 3) if kind == MITCHELL else (0.0, 0.5)
        x2, x3 = ax * ax, ax * ax * ax
        v1 = ((12 - 9 * b - 6 * c) * x3 + (-18 + 12 * b + 6 * c) * x2
              + (6 - 2 * b)) / 6
        v2 = ((-b - 6 * c) * x3 + (6 * b + 30 * c) * x2
              + (-12 * b - 48 * c) * ax + (8 * b + 24 * c)) / 6
        return jnp.where(ax < 1.0, v1, jnp.where(ax < 2.0, v2, 0.0))
    if kind == LANCZOS:
        a = 3.0
        pix = jnp.pi * ax

        def sinc(t):
            ts = jnp.where(jnp.abs(t) > 1e-6, t, 1.0)
            return jnp.where(jnp.abs(t) > 1e-6, jnp.sin(ts) / ts, 1.0)

        return jnp.where(ax < a, sinc(pix) * sinc(pix / a), 0.0)
    raise ValueError(kind)


def film_new(h: int, w: int, n_channels: int = 3):
    return jnp.zeros((h, w, n_channels + 2), jnp.float32)


MATMUL_CELLS = 256      # dense-weight matmul path for grids up to this size
SEGSUM_CELLS = 1 << 16  # flat segment-sum path up to this size


def splat(film, pos, values, active, rfilter: int = BOX):
    """Scatter-add filtered samples into the film.

    film: (H,W,C+2); pos: (n,2) continuous (x,y) in pixel units
    (x = column, y = row — reference ImageBlock convention);
    values: (n,C); active: (n,) bool.

    Three lowering strategies by grid size (TPU scatter with massive index
    collisions is slow — the wavefront funnels ~10^6 lanes into tens of
    bins, so small grids go through a dense filter-weight matmul on the MXU
    instead; this is the TPU analogue of the reference's per-thread
    SignalBlock + merge):
      cells <= MATMUL_CELLS : dense (lanes, cells) weights x einsum
      cells <= SEGSUM_CELLS : flat per-tap scatter-add
      larger                : flat per-tap scatter-add
    """
    h, w, ctot = film.shape
    if h * w <= MATMUL_CELLS:
        return _splat_matmul(film, pos, values, active, rfilter)
    return _splat_scatter(film, pos, values, active, rfilter)


def _splat_matmul(film, pos, values, active, rfilter: int):
    h, w, ctot = film.shape
    x = pos[:, 0] - 0.5
    y = pos[:, 1] - 0.5
    cy = jnp.arange(h, dtype=jnp.float32)
    cx = jnp.arange(w, dtype=jnp.float32)
    fy = filter_eval(rfilter, cy[None, :] - y[:, None])      # (n, h)
    fx = filter_eval(rfilter, cx[None, :] - x[:, None])      # (n, w)
    wgt = (fy[:, :, None] * fx[:, None, :]).reshape(x.shape[0], h * w)
    wgt = jnp.where(active[:, None], wgt, 0.0)
    vals = jnp.concatenate(
        [values, jnp.ones((values.shape[0], 1), values.dtype)], -1)
    acc = jnp.einsum('nk,nc->kc', wgt, vals,
                     preferred_element_type=jnp.float32)
    cnt = jnp.einsum('nk,n->k', (wgt != 0.0).astype(jnp.float32),
                     active.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    add = jnp.concatenate([acc, cnt[:, None]], -1).reshape(h, w, ctot)
    return film + add


def _splat_scatter(film, pos, values, active, rfilter: int):
    h, w, ctot = film.shape
    c = ctot - 2
    r = _RADIUS[rfilter]
    # Sample position relative to pixel centers: pixel (i,j) center at (j+.5, i+.5)
    x = pos[:, 0] - 0.5
    y = pos[:, 1] - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    vals = jnp.concatenate([values, jnp.ones((values.shape[0], 2), values.dtype)], -1)
    vals = jnp.where(active[:, None], vals, 0.0)

    # Flat 1-D scatter indices: 2-D scatters are pathologically slow on TPU.
    flat = film.reshape(h * w, ctot)
    for dy in range(-r + 1, r + 1):
        fy = filter_eval(rfilter, (y0 + dy).astype(jnp.float32) - y)
        py = y0 + dy
        oky = (py >= 0) & (py < h)
        for dx in range(-r + 1, r + 1):
            fx = filter_eval(rfilter, (x0 + dx).astype(jnp.float32) - x)
            px = x0 + dx
            okx = (px >= 0) & (px < w)
            wgt = fx * fy
            ok = oky & okx & active & (wgt != 0.0)
            contrib = vals * jnp.where(ok, wgt, 0.0)[:, None]
            # weight channel gets filter weight; count channel gets raw count
            contrib = contrib.at[:, c].set(jnp.where(ok, wgt, 0.0))
            contrib = contrib.at[:, c + 1].set(jnp.where(ok, 1.0, 0.0))
            idx = jnp.clip(py, 0, h - 1) * w + jnp.clip(px, 0, w - 1)
            flat = flat.at[idx].add(contrib)
    return flat.reshape(h, w, ctot)


def develop(film, normalize_by='weight'):
    """Weight-normalized image (reference `Film::develop` / ADC `bitmap()`,
    `hdradc.cpp:219-274`)."""
    c = film.shape[-1] - 2
    if normalize_by == 'weight':
        d = film[..., c]
    elif normalize_by == 'count':
        d = film[..., c + 1]
    else:
        return film[..., :c]
    return film[..., :c] / jnp.maximum(d, 1e-20)[..., None]
