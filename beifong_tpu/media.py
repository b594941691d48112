"""Participating media and phase functions.

Replaces reference `src/media/{homogeneous,heterogeneous}.cpp` and
`src/phase/{isotropic,hg}.cpp` + the medium interfaces in
`include/mitsuba/render/medium.h`, `phase.h`.

For radar, a global homogeneous medium models atmospheric / water-column
absorption: every path segment is attenuated by exp(-sigma_t * d) — this is
applied inside the radar tracer when the scene carries a medium.  For optical
volumetric rendering, `volpath`-style distance sampling utilities live here.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .core.math import InvFourPi, TwoPi, safe_sqrt


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HomogeneousMedium:
    """sigma_t = extinction [1/m], albedo = sigma_s / sigma_t, g = HG mean
    cosine (reference `homogeneous.cpp` props sigma_t/albedo)."""

    sigma_t: jax.Array
    albedo: jax.Array
    g: jax.Array

    @staticmethod
    def make(sigma_t=0.0, albedo=0.0, g=0.0) -> "HomogeneousMedium":
        return HomogeneousMedium(sigma_t=jnp.float32(sigma_t),
                                 albedo=jnp.float32(albedo),
                                 g=jnp.float32(g))

    def transmittance(self, dist):
        return jnp.exp(-self.sigma_t * dist)

    def sample_distance(self, u, max_dist):
        """Sample free-flight distance ~ sigma_t e^{-sigma_t d}; returns
        (d, is_medium_event, weight).  Events beyond max_dist are surface
        interactions with weight 1 (analog of reference medium sampling)."""
        d = -jnp.log(jnp.maximum(1.0 - u, 1e-20)) / jnp.maximum(self.sigma_t, 1e-20)
        hit_medium = (d < max_dist) & (self.sigma_t > 0.0)
        d = jnp.where(hit_medium, d, max_dist)
        # pdf cancellation leaves albedo at scatter events, 1 at surfaces
        weight = jnp.where(hit_medium, self.albedo, 1.0)
        return d, hit_medium, weight


# ---------------------------------------------------------------------------
# Phase functions (reference src/phase/{isotropic,hg}.cpp)
# ---------------------------------------------------------------------------


def hg_eval(cos_theta, g):
    """Henyey-Greenstein phase function value [1/sr]."""
    g2 = g * g
    denom = 1.0 + g2 + 2.0 * g * cos_theta
    return InvFourPi * (1.0 - g2) / jnp.maximum(denom * safe_sqrt(denom), 1e-12)


def hg_sample(u, g, wi):
    """Sample a direction from HG around -wi (forward scattering for g>0).
    Returns (wo (n,3), pdf)."""
    from .core.transform import frame_from_normal, to_world
    g_safe = jnp.where(jnp.abs(g) > 1e-4, g, 1e-4)
    sqr_term = (1.0 - g_safe * g_safe) / (1.0 + g_safe * (2.0 * u[..., 0] - 1.0))
    cos_theta_hg = (1.0 + g_safe * g_safe - sqr_term * sqr_term) / (2.0 * g_safe)
    cos_theta = jnp.where(jnp.abs(g) > 1e-4, cos_theta_hg, 1.0 - 2.0 * u[..., 0])
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = TwoPi * u[..., 1]
    local = jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi),
                       cos_theta], -1)
    frame = frame_from_normal(-wi)
    wo = to_world(frame, local)
    return wo, hg_eval(cos_theta, g)


def isotropic_sample(u):
    from .core import warp
    return warp.square_to_uniform_sphere(u), jnp.full(u.shape[:-1], InvFourPi)


def atmospheric_attenuation_db_per_km(freq_hz):
    """Rough clear-air absorption for MMW radar bands [dB/km] (ITU-like
    lookup: 35/77/94 GHz windows and the 60 GHz O2 peak)."""
    f = freq_hz / 1e9
    pts_f = jnp.array([1., 10., 24., 35., 50., 60., 70., 77., 94., 140., 220.])
    pts_a = jnp.array([0.01, 0.02, 0.15, 0.1, 0.4, 15.0, 1.0, 0.35, 0.45,
                       1.5, 4.0])
    return jnp.interp(f, pts_f, pts_a)
