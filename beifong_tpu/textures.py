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

MAX_C = 3


@dataclasses.dataclass
class TextureSpec:
    id: str
    type: int
    color0: np.ndarray
    color1: np.ndarray = None
    scale_uv: tuple = (1.0, 1.0)
    data: Optional[np.ndarray] = None   # (H,W,3) for bitmaps


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
            if getattr(s, 'face_values', None) is not None:
                face_attr = jnp.asarray(s.face_values)
                face_row = i
        return TextureTable(type=jnp.asarray(typ), color0=jnp.asarray(c0),
                            color1=jnp.asarray(c1), scale_uv=jnp.asarray(suv),
                            atlas=jnp.asarray(atlas), atlas_hw=jnp.asarray(hw),
                            face_attr=face_attr, face_attr_row=face_row)


def texture_eval(table: TextureTable, idx, uv, prim_idx=None):
    """Evaluate textures for lanes; idx=-1 yields 1.0 (no texture).
    `prim_idx` (triangle index) feeds MESH_ATTRIBUTE lookups."""
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
    return jnp.where((idx >= 0)[..., None], out, 1.0)
