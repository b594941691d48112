"""Optical path tracer with MIS (wavefront, masked lanes).

TPU-native re-expression of the reference `path` plugin
(`src/integrators/path.cpp:` sample loop): the per-ray bounce loop becomes a
statically-unrolled depth loop over a whole wavefront of lanes with boolean
masks (the reference's enoki masked-lane semantics map 1:1 onto `jnp.where`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math import mis_weight
from ..core.rng import SampleStream
from ..bsdf.eval import bsdf_eval_pdf, bsdf_sample
from .radar_path import _side_sign, _flip_z
from ..textures import texture_eval
from .. import emitters as em_mod
from ..scene import SceneData

MAX_C = 3


def path_sample(scene: SceneData, stream: SampleStream, o, d,
                max_depth: int = 8, rr_depth: int = 1000):
    """Trace one wavefront of camera rays; returns (L (n,C), valid (n,), stream).

    Mirrors `path.cpp`: direct hit on emitters, NEE with MIS at each bounce,
    BSDF-sampled continuation with MIS on the next emitter hit.
    """
    n = o.shape[0]
    em = scene.emitters

    throughput = jnp.ones((n, MAX_C), jnp.float32)
    result = jnp.zeros((n, MAX_C), jnp.float32)

    si = scene.ray_intersect(o, d)
    valid_ray = si.valid
    active = jnp.ones((n,), bool)

    # Direct emitter/environment hit from the camera
    em_idx = scene.emitter_of(si.shape_idx)
    cos_at = jnp.sum(-d * si.n, axis=-1)
    result += jnp.where(si.valid[:, None],
                        em_mod.eval_hit(em, em_idx, cos_at, scene.shapes,
                                        si.uv, d), 0.0)
    result += jnp.where((~si.valid)[:, None], em_mod.eval_env(em, d), 0.0)
    active &= si.valid

    d_cur = d

    for depth in range(1, max_depth):
        bsdf_idx = scene.bsdf_of(si.shape_idx)
        tex_idx = scene.bsdfs.texture_idx[jnp.maximum(bsdf_idx, 0)]
        refl_scale = texture_eval(scene.textures, tex_idx, si.uv, si.prim_idx)

        # ---------------- NEE ----------------
        u_sel, stream = stream.next_1d()
        u_pos, stream = stream.next_2d()
        ds, w_em, _ = em_mod.sample_direction(em, scene.shapes, si.p, u_sel, u_pos)
        spawn_o = si.spawn_origin(ds.d)
        occluded = scene.ray_test(spawn_o, ds.d, ds.dist)
        wo_nee = si.to_local(ds.d)
        sgn_geo = _side_sign(si)
        f_nee, pdf_bsdf_nee = bsdf_eval_pdf(scene.bsdfs, bsdf_idx,
                                            _flip_z(si.wi, sgn_geo),
                                            _flip_z(wo_nee, sgn_geo),
                                            refl_scale)
        mis = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_bsdf_nee))
        contrib_ok = active & ~occluded & (ds.pdf > 0.0)
        result += jnp.where(contrib_ok[:, None],
                            throughput * f_nee * w_em * mis[:, None], 0.0)

        # ---------------- BSDF sampling ----------------
        u_lobe, stream = stream.next_1d()
        u_dir, stream = stream.next_2d()
        wo, w_b, pdf_b, is_delta, _ = bsdf_sample(scene.bsdfs, bsdf_idx,
                                                  _flip_z(si.wi, sgn_geo),
                                                  u_lobe, u_dir, refl_scale)
        throughput = jnp.where(active[:, None], throughput * w_b, throughput)
        alive = active & (pdf_b > 0.0) & jnp.any(throughput != 0.0, axis=-1)

        d_new = si.to_world(_flip_z(wo, sgn_geo))
        o_new = si.spawn_origin(d_new)
        si2 = scene.ray_intersect(o_new, d_new)

        # Emitter hit with MIS
        em_idx2 = scene.emitter_of(si2.shape_idx)
        cos2 = jnp.sum(-d_new * si2.n, axis=-1)
        pdf_em = em_mod.pdf_direction_area(em, scene.shapes, em_idx2, d_new,
                                           si2.t, cos2)
        w_mis = jnp.where(is_delta, 1.0, mis_weight(pdf_b, pdf_em))
        result += jnp.where((alive & si2.valid)[:, None],
                            throughput * w_mis[:, None]
                            * em_mod.eval_hit(em, em_idx2, cos2,
                                              scene.shapes, si2.uv, d_new),
                            0.0)
        # Environment on escape, MIS against env NEE pdf
        pdf_env = em_mod.pdf_direction_env(em, d_new)
        w_mis_env = jnp.where(is_delta, 1.0, mis_weight(pdf_b, pdf_env))
        result += jnp.where((alive & ~si2.valid)[:, None],
                            throughput * w_mis_env[:, None]
                            * em_mod.eval_env(em, d_new), 0.0)

        active = alive & si2.valid
        si = si2
        d_cur = d_new

        if depth >= rr_depth:
            # Russian roulette on max throughput channel
            q = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 0.95)
            u_rr, stream = stream.next_1d()
            keep = u_rr < q
            throughput = jnp.where((active & keep)[:, None], throughput / q[:, None],
                                   throughput)
            active &= keep

    del d_cur
    return result, valid_ray, stream
