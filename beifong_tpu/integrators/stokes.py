"""Stokes-vector integrator: polarimetric direct illumination.

Replaces reference `src/integrators/stokes.cpp` (Stokes AOV wrapper over the
`*_polarized` variants): traces camera rays, connects directly to emitters,
and composes Mueller matrices with proper s/p reference-frame rotations.
Diffuse surfaces depolarize; conductor/dielectric surfaces polarize by their
Fresnel Mueller matrices.  Output is (n, 4) Stokes per lane — S0 matches the
scalar `direct` integrator.

Polarimetric radar note: the same machinery gives HH/VV/HV channels for EM
bands (boundary Mueller per bounce); the radar tracer consumes `mueller.py`
directly for that.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math import normalize, InvPi
from ..bsdf.tables import (DIFFUSE, CONDUCTOR, ROUGH_CONDUCTOR, DIELECTRIC,
                           PLASTIC, ROUGH_PLASTIC)
from .. import emitters as em_mod
from .. import mueller as mu
from ..scene import SceneData


def _frame_angle(d, x_from, x_to):
    """Rotation angle around d taking frame axis x_from to x_to."""
    c = jnp.sum(x_from * x_to, axis=-1)
    s = jnp.sum(jnp.cross(x_from, x_to) * d, axis=-1)
    return jnp.arctan2(s, jnp.clip(c, -1.0, 1.0))


def stokes_sample(scene: SceneData, stream, o, d, **_):
    """Returns (stokes (n,4), valid, stream): polarimetric direct light."""
    n = o.shape[0]
    em = scene.emitters

    si = scene.ray_intersect(o, d)
    bsdf_idx = scene.bsdf_of(si.shape_idx)
    i = jnp.maximum(bsdf_idx, 0)
    btype = scene.bsdfs.type[i]
    refl = scene.bsdfs.reflectance[i, 0]
    eta = scene.bsdfs.eta[i, 0]
    kk = scene.bsdfs.k[i, 0]

    # NEE: one emitter sample
    u_sel, stream = stream.next_1d()
    u_pos, stream = stream.next_2d()
    ds, w_em, _ = em_mod.sample_direction(em, scene.shapes, si.p, u_sel, u_pos)
    occluded = scene.ray_test(si.spawn_origin(ds.d), ds.d, ds.dist)

    # light arrives along -ds.d at the surface, leaves along -d to the camera
    wi_l = -ds.d           # propagation toward surface
    wo_c = -d              # propagation toward camera

    cos_i = jnp.sum(-wi_l * si.n, axis=-1)
    cos_o = jnp.sum(wo_c * si.n, axis=-1)

    # source Stokes: unpolarized emitter radiance (channel 0)
    s_src = mu.unpolarized(w_em[:, 0])

    # --- diffuse: depolarizing lambertian ---
    f_diff = refl * InvPi * jnp.maximum(cos_i, 0.0)
    s_diff = jnp.einsum('ij,nj->ni', mu.depolarizer(1.0),
                        s_src) * f_diff[:, None]

    # --- specular-ish (conductor/dielectric): Fresnel Mueller at the
    #     half-vector, with s/p frame rotations in and out ---
    h = normalize(-wi_l + wo_c)
    cos_h = jnp.abs(jnp.sum(-wi_l * h, axis=-1))
    is_cond = (btype == CONDUCTOR) | (btype == ROUGH_CONDUCTOR)
    # per-lane Fresnel Mueller matrices (conductor vs dielectric)
    m_cond = mu.specular_reflection(cos_h, eta, kk)
    m_diel = mu.specular_reflection(cos_h, eta)
    m_f = jnp.where(is_cond[:, None, None], m_cond, m_diel)

    # s-axis of the scattering plane
    s_axis = jnp.cross(wi_l, si.n)
    s_norm = jnp.linalg.norm(s_axis, axis=-1, keepdims=True)
    s_axis = jnp.where(s_norm > 1e-6, s_axis / jnp.maximum(s_norm, 1e-9),
                       jnp.cross(wi_l, jnp.array([1.0, 0, 0])))
    # incoming frame x: any perpendicular to wi_l (use world-up projection)
    up = jnp.array([0.0, 0.0, 1.0])
    x_in = normalize(jnp.cross(wi_l, jnp.broadcast_to(up, wi_l.shape)))
    th_in = _frame_angle(wi_l, x_in, s_axis)
    # outgoing frame: rotate from scattering plane back to canonical
    x_out_ref = normalize(jnp.cross(wo_c, jnp.broadcast_to(up, wo_c.shape)))
    s_axis_out = jnp.cross(wo_c, si.n)
    so_norm = jnp.linalg.norm(s_axis_out, axis=-1, keepdims=True)
    s_axis_out = jnp.where(so_norm > 1e-6,
                           s_axis_out / jnp.maximum(so_norm, 1e-9), x_out_ref)
    th_out = _frame_angle(wo_c, s_axis_out, x_out_ref)

    m_chain = (mu.rotator(th_out) @ m_f @ mu.rotator(th_in))
    s_spec = jnp.einsum('nij,nj->ni', m_chain, s_src)

    is_specular = is_cond | (btype == DIELECTRIC)
    stokes = jnp.where(is_specular[:, None], s_spec, s_diff)
    ok = si.valid & ~occluded & (ds.pdf > 0.0) & (cos_i > 0) & (cos_o > 0)
    stokes = jnp.where(ok[:, None], stokes, 0.0)

    # environment seen directly (unpolarized)
    env = em_mod.eval_env(em, d)[:, 0]
    stokes = stokes.at[:, 0].add(jnp.where(si.valid, 0.0, env))
    return stokes, si.valid, stream
