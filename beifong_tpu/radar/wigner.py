"""Wigner distribution functions of antenna apertures.

Replaces `Shape::sample_wigner` for rectangles (reference
`src/shapes/rectangle.cpp:132-220`) and the phased-array cross-WDF
(`src/emitters/phased.cpp:64-155`, `src/transmitters/phasedtransmitter.cpp`).

The WDF gives the directional gain [1/sr] as a function of position on the
aperture and direction; for a rectangular aperture of physical half-widths
(wx, wy) (norms of the to_world x/y columns — the unit rectangle spans
[-1,1]^2):

    r_hat  = to_object @ p / 2                (in [-1/2, 1/2] on the aperture)
    nu_hat = R_frame^T d / wavelength         (local wavevector, cycles/m)
    W = 4 tri(rx) tri(ry) sinc(2 pi nux wx tri(rx)) sinc(2 pi nuy wy tri(ry))

For an N-element linear phased array the gain is a sum over virtual element
pairs (midpoint r_bar, baseline r_dash) of rect-aperture WDFs times the
interference term cos(2 pi nu . r_dash + psi_steer).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math import tri, sinc, TwoPi, normalize
from ..geometry.shapes import ShapeTable


def rect_aperture_gain(shapes: ShapeTable, idx, p_world, d_world, wavelength):
    """WDF directional gain of rectangle-shape apertures.

    idx: (n,) shape rows; p_world: (n,3) point on the aperture;
    d_world: (n,3) unit direction (world); wavelength: (n,) [m].
    Mirrors `rectangle.cpp:132-220` (the active `gain =` branch).
    """
    to_obj = shapes.to_object[idx]
    tw = shapes.to_world[idx]
    # local position normalized: object space spans [-1,1] -> /2
    r = (jnp.einsum('nij,nj->ni', to_obj[:, :3, :3], p_world)
         + to_obj[:, :3, 3]) * 0.5
    # orthonormalized frame rotation (frame.s/t/n normalized)
    s = tw[:, :3, 0]
    t = tw[:, :3, 1]
    nrm = tw[:, :3, 2]
    wx = jnp.linalg.norm(s, axis=-1)
    wy = jnp.linalg.norm(t, axis=-1)
    sn = s / jnp.maximum(wx, 1e-20)[:, None]
    tn = t / jnp.maximum(wy, 1e-20)[:, None]
    nn = normalize(nrm)
    nu_x = jnp.sum(sn * d_world, axis=-1) / wavelength
    nu_y = jnp.sum(tn * d_world, axis=-1) / wavelength
    del nn
    tx, ty = tri(r[:, 0]), tri(r[:, 1])
    return (4.0 * tx * ty
            * sinc(TwoPi * nu_x * wx * tx)
            * sinc(TwoPi * nu_y * wy * ty))


def phased_aperture_gain(elem_mid, elem_baseline, psi, n_pairs_mask,
                         frame_s, frame_t, elem_wid, array_origin,
                         p_world, d_world, wavelength):
    """Cross-WDF gain of a phased array (sum over virtual element pairs).

    elem_mid: (K,3) virtual-element midpoints (world); elem_baseline: (K,3)
    pair baselines r_dash (world); psi: (K,) steering phase of each pair;
    n_pairs_mask: (K,) bool valid-pair mask; frame_s/t: (3,) normalized
    aperture in-plane axes; elem_wid: (2,) element half-widths;
    array_origin: (3,) array centre (world).

    p_world: (n,3), d_world: (n,3), wavelength: (n,).
    Mirrors `phased.cpp:127-155` `W_rect_2D` + `sample_wigner`.
    """
    # local coords of p relative to each virtual element midpoint
    rel = p_world[:, None, :] - (array_origin[None, None, :] + elem_mid[None])
    rx = jnp.einsum('nkj,j->nk', rel, frame_s) / jnp.maximum(2 * elem_wid[0], 1e-20)
    ry = jnp.einsum('nkj,j->nk', rel, frame_t) / jnp.maximum(2 * elem_wid[1], 1e-20)
    inside = (jnp.abs(rx) <= 0.5) & (jnp.abs(ry) <= 0.5)

    nu_x = jnp.einsum('nj,j->n', d_world, frame_s) / wavelength
    nu_y = jnp.einsum('nj,j->n', d_world, frame_t) / wavelength

    tx, ty = tri(rx), tri(ry)
    w_rect = (4.0 * elem_wid[0] * elem_wid[1] * tx * ty
              * sinc(TwoPi * nu_x[:, None] * elem_wid[0] * tx)
              * sinc(TwoPi * nu_y[:, None] * elem_wid[1] * ty))

    # interference: cos(2 pi nu . r_dash + psi)
    nu_dot = (nu_x[:, None] * jnp.einsum('kj,j->k', elem_baseline, frame_s)[None]
              + nu_y[:, None] * jnp.einsum('kj,j->k', elem_baseline, frame_t)[None])
    phase = TwoPi * nu_dot + psi[None]
    contrib = jnp.where(inside & n_pairs_mask[None], w_rect * jnp.cos(phase), 0.0)
    return jnp.sum(contrib, axis=1)
