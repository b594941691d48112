"""Sample warping functions: unit square -> distributions on disk/sphere/etc.

TPU-native equivalent of reference `include/mitsuba/core/warp.h` (706 LoC).
All functions map u in [0,1)^2 (shape (..., 2)) to directions/points and have a
matching `*_pdf`.  Validated by the chi^2 harness in tests (reference tests via
`mitsuba.python.chi2`).
"""

from __future__ import annotations

import jax.numpy as jnp

from .math import Pi, TwoPi, InvPi, InvTwoPi, InvFourPi, safe_sqrt


def square_to_uniform_disk_concentric(u):
    """Shirley-Chiu concentric disk mapping (low distortion)."""
    x = 2.0 * u[..., 0] - 1.0
    y = 2.0 * u[..., 1] - 1.0
    zero = (x == 0.0) & (y == 0.0)
    quad_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(quad_x, x, y)
    sx = jnp.where(jnp.abs(x) > 1e-20, x, 1e-20)
    sy = jnp.where(jnp.abs(y) > 1e-20, y, 1e-20)
    phi = jnp.where(quad_x, (Pi / 4.0) * (y / sx), (Pi / 2.0) - (Pi / 4.0) * (x / sy))
    r = jnp.where(zero, 0.0, r)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk_concentric_pdf(p):
    inside = jnp.sum(p * p, axis=-1) <= 1.0
    return jnp.where(inside, InvPi, 0.0)


def square_to_cosine_hemisphere(u):
    """Cosine-weighted hemisphere via concentric disk + projection
    (reference `warp.h` square_to_cosine_hemisphere)."""
    p = square_to_uniform_disk_concentric(u)
    z = safe_sqrt(1.0 - jnp.sum(p * p, axis=-1))
    return jnp.concatenate([p, z[..., None]], axis=-1)


def square_to_cosine_hemisphere_pdf(d):
    return jnp.maximum(d[..., 2], 0.0) * InvPi


def square_to_uniform_hemisphere(u):
    z = u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = TwoPi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_hemisphere_pdf(d):
    return jnp.where(d[..., 2] >= 0.0, InvTwoPi, 0.0)


def square_to_uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = TwoPi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf(d):
    return jnp.full(d.shape[:-1], InvFourPi)


def square_to_uniform_cone(u, cos_cutoff):
    """Uniform direction within a cone of half-angle acos(cos_cutoff) about +Z."""
    ct = (1.0 - u[..., 0]) + u[..., 0] * cos_cutoff
    st = safe_sqrt(1.0 - ct * ct)
    phi = TwoPi * u[..., 1]
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def square_to_uniform_cone_pdf(d, cos_cutoff):
    return jnp.where(d[..., 2] >= cos_cutoff,
                     InvTwoPi / jnp.maximum(1.0 - cos_cutoff, 1e-12), 0.0)


def square_to_uniform_triangle(u):
    t = safe_sqrt(1.0 - u[..., 0])
    return jnp.stack([1.0 - t, t * u[..., 1]], axis=-1)


def square_to_beckmann(u, alpha):
    """Beckmann microfacet NDF sampling (visible-normal-free classic form)."""
    phi = TwoPi * u[..., 1]
    tan2 = -alpha * alpha * jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-20))
    ct = 1.0 / jnp.sqrt(1.0 + tan2)
    st = safe_sqrt(1.0 - ct * ct)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def square_to_beckmann_pdf(d, alpha):
    ct = d[..., 2]
    ct2 = ct * ct
    tan2 = (1.0 - ct2) / jnp.maximum(ct2, 1e-20)
    a2 = alpha * alpha
    p = jnp.exp(-tan2 / a2) / (Pi * a2 * jnp.maximum(ct2 * ct, 1e-20))
    return jnp.where(ct > 1e-6, p, 0.0)


def square_to_ggx(u, alpha):
    """GGX/Trowbridge-Reitz NDF sampling."""
    phi = TwoPi * u[..., 1]
    tan2 = alpha * alpha * u[..., 0] / jnp.maximum(1.0 - u[..., 0], 1e-20)
    ct = 1.0 / jnp.sqrt(1.0 + tan2)
    st = safe_sqrt(1.0 - ct * ct)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def square_to_ggx_pdf(d, alpha):
    ct = d[..., 2]
    a2 = alpha * alpha
    denom = ct * ct * (a2 - 1.0) + 1.0
    p = a2 * ct / jnp.maximum(Pi * denom * denom, 1e-20)
    return jnp.where(ct > 1e-6, p, 0.0)


def interval_to_tent(u):
    """[0,1) -> tent on [-1, 1]."""
    u = 2.0 * u
    return jnp.where(u < 1.0, jnp.sqrt(jnp.maximum(u, 0.0)) - 1.0,
                     1.0 - jnp.sqrt(jnp.maximum(2.0 - u, 0.0)))


def square_to_tent(u):
    return jnp.stack([interval_to_tent(u[..., 0]), interval_to_tent(u[..., 1])], axis=-1)


def square_to_tent_pdf(p):
    inside = (jnp.abs(p[..., 0]) <= 1.0) & (jnp.abs(p[..., 1]) <= 1.0)
    return jnp.where(inside, (1.0 - jnp.abs(p[..., 0])) * (1.0 - jnp.abs(p[..., 1])), 0.0)
