"""Mueller calculus for polarized light/EM transport.

Replaces reference `include/mitsuba/render/mueller.h` (Mueller matrix
utilities behind the `*_polarized` variants) and the `polarizer` / `retarder`
BSDFs + `stokes` integrator: Stokes vectors are (..., 4) arrays
[S0=intensity, S1=H/V, S2=+45/-45, S3=circular], Mueller matrices (..., 4, 4).

Convention: Stokes frames propagate with the beam; `rotate_stokes` aligns
reference frames between interactions (reference `mueller.h` rotator).
"""

from __future__ import annotations

import jax.numpy as jnp

from .core.math import safe_sqrt


def identity():
    return jnp.eye(4, dtype=jnp.float32)


def depolarizer(value=1.0):
    """Ideal depolarizer scaled by `value` (diffuse scattering)."""
    m = jnp.zeros((4, 4), jnp.float32).at[0, 0].set(1.0)
    return m * value


def absorber(value):
    return jnp.eye(4, dtype=jnp.float32) * value


def rotator(theta):
    """Rotate the Stokes reference frame by theta (right-handed around the
    propagation direction)."""
    c = jnp.cos(2 * theta)
    s = jnp.sin(2 * theta)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    rows = [[o, z, z, z],
            [z, c, s, z],
            [z, -s, c, z],
            [z, z, z, o]]
    return jnp.stack([jnp.stack(r, -1) for r in rows], -2)


def linear_polarizer(transmission=1.0, angle=0.0):
    """Ideal linear polarizer at `angle` from the reference axis
    (reference `src/bsdfs/polarizer.cpp`)."""
    m = 0.5 * jnp.asarray(transmission) * jnp.array([
        [1.0, 1.0, 0.0, 0.0],
        [1.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0]], jnp.float32)
    r = rotator(jnp.asarray(angle))
    return rotate_element(m, r)


def retarder(phase, angle=0.0):
    """Linear retarder with retardance `phase` (pi/2 = quarter-wave)
    (reference `src/bsdfs/retarder.cpp`)."""
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    m = jnp.array([
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0]], jnp.float32)
    m = m.at[2, 2].set(c).at[2, 3].set(-s).at[3, 2].set(s).at[3, 3].set(c)
    return rotate_element(m, rotator(jnp.asarray(angle)))


def rotate_element(m, r):
    """Element rotated into a frame: R(-a) M R(a) — here r = rotator(a)."""
    r_inv = jnp.swapaxes(r, -1, -2)   # rotator is orthogonal in S1,S2 block
    return r_inv @ m @ r


def specular_reflection(cos_i, eta, k=None):
    """Mueller matrix of specular reflection (conductor when k given,
    dielectric otherwise) — reference `mueller.h specular_reflection`."""
    ci = jnp.abs(cos_i)
    if k is not None:
        c2 = ci * ci
        s2 = 1.0 - c2
        e2 = eta * eta
        k2 = k * k
        t0 = e2 - k2 - s2
        a2b2 = safe_sqrt(t0 * t0 + 4 * e2 * k2)
        a = safe_sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
        t1 = a2b2 + c2
        t2 = 2 * a * ci
        rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
        t3 = c2 * a2b2 + s2 * s2
        t4 = t2 * s2
        rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
        # relative phase (approximation adequate away from grazing)
        delta = jnp.arctan2(2 * ci * safe_sqrt(a2b2 - a * a),
                            c2 - a2b2)
    else:
        st2 = 1.0 - ci * ci
        c2t = 1.0 - st2 / (eta * eta)
        ct = safe_sqrt(c2t)
        rs_amp = (ci - eta * ct) / jnp.maximum(ci + eta * ct, 1e-20)
        rp_amp = (eta * ci - ct) / jnp.maximum(eta * ci + ct, 1e-20)
        rs = rs_amp * rs_amp
        rp = rp_amp * rp_amp
        delta = jnp.where(c2t > 0,
                          jnp.where(rs_amp * rp_amp < 0, jnp.pi, 0.0), 0.0)
    A = 0.5 * (rs + rp)
    B = 0.5 * (rs - rp)
    C = safe_sqrt(rs * rp) * jnp.cos(delta)
    S = safe_sqrt(rs * rp) * jnp.sin(delta)
    z = jnp.zeros_like(A)
    rows = [[A, B, z, z],
            [B, A, z, z],
            [z, z, C, S],
            [z, z, -S, C]]
    return jnp.stack([jnp.stack(r, -1) for r in rows], -2)


def apply(m, stokes):
    return jnp.einsum('...ij,...j->...i', m, stokes)


def unpolarized(intensity=1.0):
    s = jnp.zeros(jnp.shape(intensity) + (4,), jnp.float32)
    return s.at[..., 0].set(intensity)


def degree_of_polarization(stokes):
    s0 = jnp.maximum(stokes[..., 0], 1e-20)
    return safe_sqrt(stokes[..., 1] ** 2 + stokes[..., 2] ** 2
                     + stokes[..., 3] ** 2) / s0
