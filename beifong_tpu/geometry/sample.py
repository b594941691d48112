"""Surface position sampling on analytic shapes (for NEE / area endpoints).

Replaces per-shape `sample_position/pdf_position` (reference
`src/shapes/rectangle.cpp:100-130`, `sphere.cpp`, `disk.cpp`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import warp
from ..core.math import normalize, TwoPi
from .shapes import RECTANGLE, SPHERE, DISK, CYLINDER, ShapeTable


def sample_position(table: ShapeTable, idx, u):
    """Uniform-area position sample on shape rows `idx` (n,) given u (n,2).

    Returns (p_world (n,3), n_world (n,3), pdf_area (n,) = 1/area, uv (n,2)).
    """
    tw = table.to_world[idx]
    to = table.to_object[idx]
    kind = table.kind[idx]
    flip = table.flip[idx]

    # rectangle: uniform on [-1,1]^2
    p_rect = jnp.stack([2 * u[..., 0] - 1, 2 * u[..., 1] - 1,
                        jnp.zeros_like(u[..., 0])], -1)
    n_rect = jnp.broadcast_to(jnp.array([0., 0., 1.], jnp.float32), p_rect.shape)

    # sphere: uniform on unit sphere
    d_sph = warp.square_to_uniform_sphere(u)
    p_sph, n_sph = d_sph, d_sph

    # disk: uniform on unit disk
    pd = warp.square_to_uniform_disk_concentric(u)
    p_disk = jnp.concatenate([pd, jnp.zeros_like(pd[..., :1])], -1)
    n_disk = n_rect

    # cylinder: phi x z
    phi = TwoPi * u[..., 0]
    p_cyl = jnp.stack([jnp.cos(phi), jnp.sin(phi), u[..., 1]], -1)
    n_cyl = jnp.stack([jnp.cos(phi), jnp.sin(phi), jnp.zeros_like(phi)], -1)

    sel = lambda a, b, c, d: jnp.where((kind == SPHERE)[..., None], b,
                             jnp.where((kind == DISK)[..., None], c,
                             jnp.where((kind == CYLINDER)[..., None], d, a)))
    p_o = sel(p_rect, p_sph, p_disk, p_cyl)
    n_o = sel(n_rect, n_sph, n_disk, n_cyl)

    p_w = jnp.einsum('nij,nj->ni', tw[:, :3, :3], p_o) + tw[:, :3, 3]
    n_w = normalize(jnp.einsum('nji,nj->ni', to[:, :3, :3], n_o)) * flip[..., None]
    pdf = 1.0 / jnp.maximum(table.surface_area[idx], 1e-20)
    uv = u
    return p_w, n_w, pdf, uv
