"""Texture tables (constant / checkerboard / bitmap atlas).

Replaces reference `src/textures/*.cpp`.  Bitmaps share one fixed-size atlas
array (power-of-two padded) so lookups stay gather-friendly under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

CONSTANT = 0
CHECKERBOARD = 1
BITMAP = 2
MESH_ATTRIBUTE = 3
SPECTRUM_CURVE = 4

MAX_C = 3
CURVE_K = 64     # all spectral curves are resampled onto this regular grid


@dataclasses.dataclass
class TextureSpec:
    id: str
    type: int
    color0: np.ndarray
    color1: np.ndarray = None
    scale_uv: tuple = (1.0, 1.0)
    data: Optional[np.ndarray] = None   # (H,W,3) for bitmaps
    curve_lo: float = 0.0               # SPECTRUM_CURVE grid extent [m]
    curve_hi: float = 0.0
    curve: Optional[np.ndarray] = None  # (CURVE_K,) regular samples


def constant(id, value=1.0) -> TextureSpec:
    return TextureSpec(id=id, type=CONSTANT, color0=_c(value))


def checkerboard(id, color0=0.4, color1=0.2, scale_uv=(1.0, 1.0)) -> TextureSpec:
    return TextureSpec(id=id, type=CHECKERBOARD, color0=_c(color0),
                       color1=_c(color1), scale_uv=scale_uv)


def bitmap(id, data, scale_uv=(1.0, 1.0)) -> TextureSpec:
    d = np.asarray(data, np.float32)
    if d.ndim == 2:
        d = np.repeat(d[..., None], MAX_C, -1)
    return TextureSpec(id=id, type=BITMAP, color0=_c(1.0), data=d,
                       scale_uv=scale_uv)


def spectrum_curve(id, wavelengths=None, values=None, lambda_min=None,
                   lambda_max=None, band=None) -> TextureSpec:
    """Wavelength-dependent spectrum texture (reference
    `src/spectra/regular.cpp` / `irregular.cpp` / `d65.cpp`).

    Two forms: `regular` — `values` sampled uniformly on
    [lambda_min, lambda_max]; `irregular` — (`wavelengths`, `values`) pairs,
    linearly interpolated.  All wavelengths in metres (SI).  Either form is
    resampled onto a fixed CURVE_K regular grid so lookups are one gather
    under jit; evaluation outside the grid extent returns 0 (reference
    semantics: the interpolant's support IS the given range).

    `band` (a `core.config.Band`) sets the wavelength-free fallback value
    `color0`: the curve's mean over the band if it overlaps the visible
    range is not special-cased — optical RGB projection is applied by the
    caller when wanted (see `core.spectrum.curve_to_rgb`).
    """
    if wavelengths is not None:
        wl = np.asarray(wavelengths, np.float64)
        v = np.asarray(values, np.float64)
        order = np.argsort(wl)
        wl, v = wl[order], v[order]
        lo, hi = float(wl[0]), float(wl[-1])
    else:
        v = np.asarray(values, np.float64)
        lo, hi = float(lambda_min), float(lambda_max)
        wl = np.linspace(lo, hi, v.size)
    if hi <= lo:                       # single point -> tiny flat segment
        hi = lo + max(abs(lo), 1.0) * 1e-6
    grid = np.linspace(lo, hi, CURVE_K)
    cv = np.interp(grid, wl, v).astype(np.float32)
    if band is not None:
        blo, bhi = band.wavelength_min, band.wavelength_max
        glo, ghi = max(lo, blo), min(hi, bhi)
        if ghi > glo:
            xs = np.linspace(glo, ghi, 257)
            ys = np.interp(xs, wl, v)
            mean = float(((ys[1:] + ys[:-1]) * 0.5 * np.diff(xs)).sum()
                         / (ghi - glo))
            # partial overlap dilutes by the uncovered fraction
            mean *= (ghi - glo) / (bhi - blo)
        else:
            mean = 0.0
    else:
        mean = float(cv.mean())
    return TextureSpec(id=id, type=SPECTRUM_CURVE, color0=_c(mean),
                       curve_lo=lo, curve_hi=hi, curve=cv)


def mesh_attribute(id, values) -> TextureSpec:
    """Per-face attribute texture (reference `src/textures/mesh_attribute.cpp`):
    `values` is (n_faces, C) in the scene's concatenated triangle order;
    lookups gather by the hit's primitive index."""
    v = np.asarray(values, np.float32)
    if v.ndim == 1:
        v = np.repeat(v[:, None], MAX_C, 1)
    spec = TextureSpec(id=id, type=MESH_ATTRIBUTE, color0=_c(1.0))
    spec.face_values = v
    return spec


def _c(v):
    a = np.asarray(v, np.float32).reshape(-1)
    if a.size == 1:
        a = np.repeat(a, MAX_C)
    return a


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TextureTable:
    type: jax.Array       # (T,) int32
    color0: jax.Array     # (T,MAX_C)
    color1: jax.Array     # (T,MAX_C)
    scale_uv: jax.Array   # (T,2)
    atlas: jax.Array      # (T,H,W,MAX_C) — zero-size H,W when no bitmaps
    atlas_hw: jax.Array   # (T,2) int32 actual (h,w) per texture
    curve_ext: jax.Array  # (T,2) spectral-curve [lo,hi] wavelength extent [m]
    curve_vals: jax.Array  # (T,CURVE_K) regular curve samples
    face_attr: object = None   # (F,MAX_C) per-face values (one attr texture)
    face_attr_row: int = None  # which texture row uses face_attr

    @staticmethod
    def build(specs: list[TextureSpec]) -> "TextureTable":
        n = max(len(specs), 1)
        typ = np.zeros(n, np.int32)
        c0 = np.ones((n, MAX_C), np.float32)
        c1 = np.zeros((n, MAX_C), np.float32)
        suv = np.ones((n, 2), np.float32)
        hs = [s.data.shape[0] for s in specs if s.data is not None]
        ws = [s.data.shape[1] for s in specs if s.data is not None]
        H, W = (max(hs), max(ws)) if hs else (1, 1)
        atlas = np.zeros((n, H, W, MAX_C), np.float32)
        hw = np.ones((n, 2), np.int32)
        cext = np.zeros((n, 2), np.float32)
        cvals = np.zeros((n, CURVE_K), np.float32)
        face_attr = None
        face_row = None
        for i, s in enumerate(specs):
            typ[i] = s.type
            c0[i] = s.color0
            c1[i] = s.color1 if s.color1 is not None else 0.0
            suv[i] = s.scale_uv
            if s.data is not None:
                h, w = s.data.shape[:2]
                atlas[i, :h, :w] = s.data
                hw[i] = (h, w)
            if s.curve is not None:
                cext[i] = (s.curve_lo, s.curve_hi)
                cvals[i] = s.curve
            if getattr(s, 'face_values', None) is not None:
                face_attr = jnp.asarray(s.face_values)
                face_row = i
        return TextureTable(type=jnp.asarray(typ), color0=jnp.asarray(c0),
                            color1=jnp.asarray(c1), scale_uv=jnp.asarray(suv),
                            atlas=jnp.asarray(atlas), atlas_hw=jnp.asarray(hw),
                            curve_ext=jnp.asarray(cext),
                            curve_vals=jnp.asarray(cvals),
                            face_attr=face_attr, face_attr_row=face_row)


def texture_eval(table: TextureTable, idx, uv, prim_idx=None, wl=None):
    """Evaluate textures for lanes; idx=-1 yields 1.0 (no texture).
    `prim_idx` (triangle index) feeds MESH_ATTRIBUTE lookups; `wl` (per-lane
    wavelength [m]) feeds SPECTRUM_CURVE interpolation — without it a curve
    texture falls back to its precomputed band-mean `color0`."""
    i = jnp.maximum(idx, 0)
    typ = table.type[i]
    suv = table.scale_uv[i]
    u = uv * suv
    # checkerboard
    cell = (jnp.floor(u[..., 0]).astype(jnp.int32)
            + jnp.floor(u[..., 1]).astype(jnp.int32)) % 2
    chk = jnp.where((cell == 0)[..., None], table.color0[i], table.color1[i])
    # bitmap: nearest (bilinear later)
    hw = table.atlas_hw[i]
    px = jnp.clip((u[..., 0] % 1.0 * hw[..., 1]).astype(jnp.int32), 0, hw[..., 1] - 1)
    py = jnp.clip((u[..., 1] % 1.0 * hw[..., 0]).astype(jnp.int32), 0, hw[..., 0] - 1)
    bmp = table.atlas[i, py, px]
    out = jnp.where((typ == CHECKERBOARD)[..., None], chk,
                    jnp.where((typ == BITMAP)[..., None], bmp, table.color0[i]))
    if table.face_attr is not None and prim_idx is not None:
        f = table.face_attr[jnp.clip(jnp.maximum(prim_idx, 0), 0,
                                     table.face_attr.shape[0] - 1)]
        out = jnp.where(((typ == MESH_ATTRIBUTE) & (prim_idx >= 0))[..., None],
                        f, out)
    if wl is not None:
        lo, hi = table.curve_ext[i, 0], table.curve_ext[i, 1]
        x = (wl - lo) / jnp.maximum(hi - lo, 1e-30) * (CURVE_K - 1)
        inb = (x >= 0.0) & (x <= CURVE_K - 1) & (hi > lo)
        xc = jnp.clip(x, 0.0, CURVE_K - 1)
        x0 = jnp.clip(xc.astype(jnp.int32), 0, CURVE_K - 2)
        fr = xc - x0
        v = (table.curve_vals[i, x0] * (1.0 - fr)
             + table.curve_vals[i, x0 + 1] * fr)
        v = jnp.where(inb, v, 0.0)
        out = jnp.where((typ == SPECTRUM_CURVE)[..., None], v[..., None], out)
    return jnp.where((idx >= 0)[..., None], out, 1.0)
