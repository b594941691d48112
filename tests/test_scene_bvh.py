"""Scene-level BVH parity: compiling with the BVH must render identically to
the dense intersector."""

import numpy as np
import pytest
import jax.numpy as jnp

import beifong_tpu as bt
from beifong_tpu import scene as sc, emitters as em, sensors as sn, film as fm
from beifong_tpu.bsdf import diffuse
from beifong_tpu.geometry.mesh import MeshSpec, make_grid
from beifong_tpu.core import transform as tf
from beifong_tpu.render import render


def _mesh_scene():
    v, f = make_grid(12, 12)
    s = sc.Scene(band=bt.band_preset("optical"))
    s.add(diffuse("d", reflectance=0.6))
    s.add(MeshSpec(v, f, to_world=np.asarray(tf.scale(30.0)), bsdf="d"))
    s.add(em.point("pt", intensity=4.0, position=(0, 0, 2.0)))
    look = np.asarray(tf.look_at([0.5, 0, 1.0], [0.5, 0, 0.0], up=(0, 1, 0)))
    s.add(sn.radiancemeter(to_world=look, film_size=(1, 1), spp=256))
    return s


def test_bvh_render_parity():
    s = _mesh_scene()
    sd_dense = s.compile(use_bvh=False)
    sd_bvh = s.compile(use_bvh=True)
    assert sd_bvh.bvh is not None and sd_dense.bvh is None
    f1, _ = render(s, sd_dense, spp=256, max_depth=2, seed=7)
    f2, _ = render(s, sd_bvh, spp=256, max_depth=2, seed=7)
    np.testing.assert_allclose(np.asarray(fm.develop(f1)),
                               np.asarray(fm.develop(f2)), rtol=1e-5, atol=1e-7)


def test_bvh_auto_threshold():
    s = _mesh_scene()   # 288 tris < 1024 -> no bvh
    assert s.compile(use_bvh='auto').bvh is None
    assert s.compile(use_bvh='auto', bvh_threshold=100).bvh is not None
