"""Volumetric path tracer: global homogeneous medium with HG phase.

Replaces reference `src/integrators/volpath.cpp` / `volpathmis.cpp` for the
ambient-medium case: exponential free-flight distance sampling between
surface events, phase-function scattering, NEE with transmittance along
shadow rays, masked-lane medium/surface branching.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math import mis_weight
from ..bsdf.eval import bsdf_eval_pdf, bsdf_sample
from .radar_path import _side_sign, _flip_z
from ..textures import texture_eval
from ..media import hg_sample, hg_eval
from .. import emitters as em_mod
from ..scene import SceneData

MAX_C = 3


def volpath_sample(scene: SceneData, stream, o, d, max_depth: int = 16,
                   env_dist: float = 1e3):
    """Returns (L (n,C), valid (n,), stream).

    `env_dist` bounds the ambient medium: rays that fly past it without a
    medium event reach the environment (free-flight survival is stochastic,
    so no extra transmittance factor is applied on escape)."""
    n = o.shape[0]
    em = scene.emitters
    med = scene.medium
    assert med is not None, "volpath needs scene.medium"

    throughput = jnp.ones((n, MAX_C), jnp.float32)
    result = jnp.zeros((n, MAX_C), jnp.float32)
    active = jnp.ones((n,), bool)
    o_cur, d_cur = o, d
    last_pdf = jnp.full((n,), jnp.inf, jnp.float32)   # camera: MIS weight 1
    last_delta = jnp.ones((n,), bool)
    valid0 = None

    for depth in range(max_depth):
        si = scene.ray_intersect(o_cur, d_cur)
        if valid0 is None:
            valid0 = si.valid
        max_dist = jnp.where(si.valid, si.t, env_dist)

        u_d, stream = stream.next_1d()
        t_med, medium_event, w_med = med.sample_distance(u_d, max_dist)
        medium_event &= active
        surface_event = active & si.valid & ~medium_event
        throughput = jnp.where(medium_event[:, None],
                               throughput * w_med[:, None], throughput)

        # escaped without scattering: environment (survival is stochastic —
        # the free-flight sampling already paid the absorption probability);
        # MIS against the NEE that could have sampled the same env direction
        escaped = active & ~si.valid & ~medium_event
        pdf_env = em_mod.pdf_direction_env(em, d_cur)
        w_env = jnp.where(last_delta, 1.0, mis_weight(last_pdf, pdf_env))
        result += jnp.where(escaped[:, None],
                            throughput * w_env[:, None]
                            * em_mod.eval_env(em, d_cur), 0.0)

        # surface emitter hit (MIS against area NEE)
        em_idx = scene.emitter_of(si.shape_idx)
        cos_at = jnp.sum(-d_cur * si.n, axis=-1)
        pdf_area = em_mod.pdf_direction_area(em, scene.shapes, em_idx, d_cur,
                                             si.t, cos_at)
        w_hit = jnp.where(last_delta, 1.0, mis_weight(last_pdf, pdf_area))
        result += jnp.where(surface_event[:, None],
                            throughput * w_hit[:, None]
                            * em_mod.eval_hit(em, em_idx, cos_at), 0.0)

        # ---------- NEE (from medium point or surface point) ----------
        p_evt = jnp.where(medium_event[:, None],
                          o_cur + t_med[:, None] * d_cur, si.p)
        u_sel, stream = stream.next_1d()
        u_pos, stream = stream.next_2d()
        ds, w_em, _ = em_mod.sample_direction(em, scene.shapes, p_evt,
                                              u_sel, u_pos)
        spawn = jnp.where(medium_event[:, None], p_evt, si.spawn_origin(ds.d))
        occluded = scene.ray_test(spawn, ds.d, ds.dist)
        tr = med.transmittance(jnp.minimum(ds.dist, env_dist))

        # medium: phase function value toward the light
        cos_ph = jnp.sum(ds.d * d_cur, axis=-1)
        ph_val = hg_eval(cos_ph, med.g)
        # surface: bsdf value
        bsdf_idx = scene.bsdf_of(si.shape_idx)
        tex_idx = scene.bsdfs.texture_idx[jnp.maximum(bsdf_idx, 0)]
        refl = texture_eval(scene.textures, tex_idx, si.uv, si.prim_idx)
        wo_nee = si.to_local(ds.d)
        sgn_geo = _side_sign(si)
        f_s, pdf_b = bsdf_eval_pdf(scene.bsdfs, bsdf_idx,
                                   _flip_z(si.wi, sgn_geo),
                                   _flip_z(wo_nee, sgn_geo), refl)
        mis_s = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_b))
        mis_m = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, ph_val))

        contrib_m = throughput * (ph_val * mis_m)[:, None] * w_em * tr[:, None]
        contrib_s = throughput * f_s * mis_s[:, None] * w_em * tr[:, None]
        ok = ~occluded & (ds.pdf > 0.0)
        result += jnp.where((medium_event & ok)[:, None], contrib_m, 0.0)
        result += jnp.where((surface_event & ok)[:, None], contrib_s, 0.0)

        # ---------- continuation ----------
        u_lobe, stream = stream.next_1d()
        u_dir, stream = stream.next_2d()
        # medium: HG direction
        wo_med, ph_pdf = hg_sample(u_dir, med.g, -d_cur)
        # surface: bsdf
        wo_s, w_b, pdf_bs, is_delta, _ = bsdf_sample(
            scene.bsdfs, bsdf_idx, _flip_z(si.wi, sgn_geo), u_lobe, u_dir,
            refl)
        d_new_s = si.to_world(_flip_z(wo_s, sgn_geo))
        d_new = jnp.where(medium_event[:, None], wo_med, d_new_s)
        o_new = jnp.where(medium_event[:, None], p_evt,
                          si.spawn_origin(d_new_s))
        throughput = jnp.where(surface_event[:, None], throughput * w_b,
                               throughput)
        last_pdf = jnp.where(medium_event, ph_pdf, pdf_bs)
        last_delta = jnp.where(medium_event, False, is_delta)

        active = (medium_event | (surface_event & (pdf_bs > 0.0))) \
            & jnp.any(throughput != 0.0, axis=-1)
        o_cur, d_cur = o_new, d_new

        # Russian roulette after a few bounces (media paths are long)
        if depth >= 6:
            q = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 0.95)
            u_rr, stream = stream.next_1d()
            keep = u_rr < q
            throughput = jnp.where((active & keep)[:, None],
                                   throughput / q[:, None], throughput)
            active &= keep

    return result, valid0 | jnp.ones((n,), bool), stream
