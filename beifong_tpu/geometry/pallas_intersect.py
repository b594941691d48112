"""Pallas TPU kernel: tiled brute-force ray-triangle closest hit.

The TPU-native answer to embree/OptiX for moderate triangle counts
(SURVEY.md §7 hard part #1): instead of divergent BVH traversal, stream
triangle tiles through VMEM against a resident ray tile and min-reduce.
Rays ride the sublane axis, triangles the lane axis, so every op is a dense
(RAY_TILE, TRI_TILE) VPU op; the grid's triangle dimension iterates
sequentially per ray tile, accumulating the running (t, index) minimum in
the output block.

For large meshes this composes with the host-built BVH in `bvh.py`
(top-level culling -> leaf tiles through this kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 256
TRI_TILE = 512

_INF = 3.4e38  # plain float: jnp constants can't be captured by the kernel


def _kernel(ox, oy, oz, dx, dy, dz,
            v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
            out_t, out_idx, out_u, out_v):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_t[:] = jnp.full_like(out_t, _INF)
        out_idx[:] = jnp.full_like(out_idx, -1)
        out_u[:] = jnp.zeros_like(out_u)
        out_v[:] = jnp.zeros_like(out_v)

    # Möller-Trumbore, components as (R,1) x (1,T) -> (R,T)
    px = dy[:] * e2z[:] - dz[:] * e2y[:]
    py = dz[:] * e2x[:] - dx[:] * e2z[:]
    pz = dx[:] * e2y[:] - dy[:] * e2x[:]
    det = e1x[:] * px + e1y[:] * py + e1z[:] * pz
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = ox[:] - v0x[:]
    ty = oy[:] - v0y[:]
    tz = oz[:] - v0z[:]
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z[:] - tz * e1y[:]
    qy = tz * e1x[:] - tx * e1z[:]
    qz = tx * e1y[:] - ty * e1x[:]
    v = (dx[:] * qx + dy[:] * qy + dz[:] * qz) * inv
    t = (e2x[:] * qx + e2y[:] * qy + e2z[:] * qz) * inv
    hit = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
           & (u + v <= 1.0) & (t > 1e-4))
    t = jnp.where(hit, t, _INF)

    # reduce over the triangle (lane) axis (one-hot select: Mosaic has no
    # take_along_axis)
    tj = jnp.min(t, axis=1, keepdims=True)                     # (R,1)
    aj = jnp.argmin(t, axis=1).astype(jnp.int32)[:, None]      # (R,1)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    sel = lane_ids == aj
    uj = jnp.sum(jnp.where(sel, u, 0.0), axis=1, keepdims=True)
    vj = jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)
    better = tj < out_t[:]
    out_t[:] = jnp.where(better, tj, out_t[:])
    out_idx[:] = jnp.where(better, aj + j * TRI_TILE, out_idx[:])
    out_u[:] = jnp.where(better, uj, out_u[:])
    out_v[:] = jnp.where(better, vj, out_v[:])


@functools.partial(jax.jit, static_argnames=('interpret',))
def ray_triangle_closest(o, d, v0, e1, e2, interpret: bool = False):
    """Closest-hit over all (ray, triangle) pairs.

    o, d: (R,3); v0, e1, e2: (T,3) triangle soup (world space).
    Returns (t (R,), idx (R,) int32 [-1 = miss], u (R,), v (R,)).
    """
    R = o.shape[0]
    T = v0.shape[0]
    Rp = (R + RAY_TILE - 1) // RAY_TILE * RAY_TILE
    Tp = (T + TRI_TILE - 1) // TRI_TILE * TRI_TILE

    def pad_r(x):
        return jnp.pad(x, ((0, Rp - R),))[:, None]

    def pad_t(x, fill=0.0):
        return jnp.pad(x, ((0, Tp - T),), constant_values=fill)[None, :]

    rays = [pad_r(o[:, 0]), pad_r(o[:, 1]), pad_r(o[:, 2]),
            pad_r(d[:, 0]), pad_r(d[:, 1]), pad_r(d[:, 2])]
    # padded triangles get degenerate (zero) edges -> det==0 -> miss
    tris = [pad_t(v0[:, 0]), pad_t(v0[:, 1]), pad_t(v0[:, 2]),
            pad_t(e1[:, 0]), pad_t(e1[:, 1]), pad_t(e1[:, 2]),
            pad_t(e2[:, 0]), pad_t(e2[:, 1]), pad_t(e2[:, 2])]

    grid = (Rp // RAY_TILE, Tp // TRI_TILE)
    ray_spec = pl.BlockSpec((RAY_TILE, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, TRI_TILE), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((RAY_TILE, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    out_t, out_idx, out_u, out_v = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[ray_spec] * 6 + [tri_spec] * 9,
        out_specs=[out_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*rays, *tris)

    t = out_t[:R, 0]
    idx = out_idx[:R, 0]
    miss = (t >= _INF) | (idx >= T)
    return (jnp.where(miss, jnp.inf, t), jnp.where(miss, -1, idx),
            out_u[:R, 0], out_v[:R, 0])


def ray_triangle_any(o, d, v0, e1, e2, maxt, interpret: bool = False):
    """Shadow-ray variant: True where any triangle blocks before maxt."""
    t, idx, _, _ = ray_triangle_closest(o, d, v0, e1, e2, interpret=interpret)
    return jnp.isfinite(t) & (t < maxt * (1.0 - 1e-3))
