"""Utility integrators: depth, direct illumination, AOV, moment.

Replaces reference `src/integrators/{depth,direct,aov,moment}.cpp`.
All share the wavefront convention of `path.py`: take (scene, stream, o, d),
return per-lane values.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math import mis_weight
from ..bsdf.eval import bsdf_eval_pdf, bsdf_sample
from .radar_path import _side_sign, _flip_z
from ..textures import texture_eval
from .. import emitters as em_mod
from ..scene import SceneData


def depth_sample(scene: SceneData, stream, o, d, **_):
    """Distance to first intersection (reference `depth.cpp`)."""
    si = scene.ray_intersect(o, d)
    t = jnp.where(si.valid, si.t, 0.0)
    return t[:, None] * jnp.ones((1, 3)), si.valid, stream


def aov_sample(scene: SceneData, stream, o, d, aovs=('depth', 'normal', 'uv'),
               **_):
    """Arbitrary output variables (reference `aov.cpp`): returns dict of
    per-lane geometric quantities."""
    si = scene.ray_intersect(o, d)
    out = {}
    for a in aovs:
        if a == 'depth':
            out['depth'] = jnp.where(si.valid, si.t, 0.0)
        elif a == 'normal':
            out['normal'] = jnp.where(si.valid[:, None], si.n, 0.0)
        elif a == 'position':
            out['position'] = jnp.where(si.valid[:, None], si.p, 0.0)
        elif a == 'uv':
            out['uv'] = jnp.where(si.valid[:, None], si.uv, 0.0)
        elif a == 'shape_idx':
            out['shape_idx'] = si.shape_idx
        else:
            raise ValueError(f"unknown AOV {a}")
    return out, si.valid, stream


def direct_sample(scene: SceneData, stream, o, d, n_emitter_samples: int = 1,
                  n_bsdf_samples: int = 1, **_):
    """Direct illumination with emitter+BSDF MIS (reference `direct.cpp`)."""
    n = o.shape[0]
    em = scene.emitters
    result = jnp.zeros((n, 3), jnp.float32)

    si = scene.ray_intersect(o, d)
    em_idx = scene.emitter_of(si.shape_idx)
    cos_at = jnp.sum(-d * si.n, axis=-1)
    result += jnp.where(si.valid[:, None],
                        em_mod.eval_hit(em, em_idx, cos_at), 0.0)
    result += jnp.where((~si.valid)[:, None], em_mod.eval_env(em, d), 0.0)

    bsdf_idx = scene.bsdf_of(si.shape_idx)
    tex_idx = scene.bsdfs.texture_idx[jnp.maximum(bsdf_idx, 0)]
    refl = texture_eval(scene.textures, tex_idx, si.uv, si.prim_idx)

    for _i in range(n_emitter_samples):
        u_sel, stream = stream.next_1d()
        u_pos, stream = stream.next_2d()
        ds, w_em, _ = em_mod.sample_direction(em, scene.shapes, si.p, u_sel, u_pos)
        occ = scene.ray_test(si.spawn_origin(ds.d), ds.d, ds.dist)
        wo = si.to_local(ds.d)
        sgn_geo = _side_sign(si)
        f, pdf_b = bsdf_eval_pdf(scene.bsdfs, bsdf_idx,
                                 _flip_z(si.wi, sgn_geo),
                                 _flip_z(wo, sgn_geo), refl)
        mis = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_b))
        ok = si.valid & ~occ & (ds.pdf > 0.0)
        result += jnp.where(ok[:, None], f * w_em * mis[:, None], 0.0) \
            / n_emitter_samples

    for _i in range(n_bsdf_samples):
        u_lobe, stream = stream.next_1d()
        u_dir, stream = stream.next_2d()
        wo, w_b, pdf_b, delta, _ = bsdf_sample(
            scene.bsdfs, bsdf_idx, _flip_z(si.wi, _side_sign(si)),
            u_lobe, u_dir, refl)
        d2 = si.to_world(_flip_z(wo, _side_sign(si)))
        si2 = scene.ray_intersect(si.spawn_origin(d2), d2)
        em2 = scene.emitter_of(si2.shape_idx)
        cos2 = jnp.sum(-d2 * si2.n, axis=-1)
        pdf_em = em_mod.pdf_direction_area(em, scene.shapes, em2, d2, si2.t, cos2)
        mis = jnp.where(delta, 1.0, mis_weight(pdf_b, pdf_em))
        ok = si.valid & si2.valid & (pdf_b > 0.0)
        result += jnp.where(ok[:, None],
                            w_b * mis[:, None]
                            * em_mod.eval_hit(em, em2, cos2), 0.0) \
            / n_bsdf_samples

    return result, si.valid, stream


def moment_wrap(sample_fn):
    """Second-moment wrapper (reference `moment.cpp`): returns
    (value, value^2) so callers can assemble variance images — the basis of
    the reference's variance-weighted golden-image comparisons
    (`test_renders.py:34-62`)."""

    def wrapped(scene, stream, o, d, **kw):
        v, valid, stream = sample_fn(scene, stream, o, d, **kw)
        return (v, v * v), valid, stream

    return wrapped
