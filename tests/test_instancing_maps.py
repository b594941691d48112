"""Instancing + normal/bump map tests."""

import numpy as np
import pytest
import jax.numpy as jnp

import beifong_tpu as bt
from beifong_tpu import scene as sc, emitters as em, sensors as sn, film as fm
from beifong_tpu import textures as tx
from beifong_tpu.bsdf import diffuse, normalmap
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.core import transform as tf
from beifong_tpu.render import render


def test_instances_replicate_geometry():
    s = sc.Scene(band=bt.band_preset("optical"))
    s.add(diffuse("d", reflectance=0.5))
    grp = sh.shapegroup("twin", [
        sh.sphere(to_world=np.asarray(tf.translate([0, 0, 0])), bsdf="d")])
    s.add(grp)
    s.add(sh.instance("twin", to_world=np.asarray(tf.translate([-3, 0, 0]))))
    s.add(sh.instance("twin", to_world=np.asarray(tf.translate([3, 0, 0]))))
    sd = s.compile()
    assert sd.shapes.n == 2
    # both instances hittable at their translated positions
    o = jnp.array([[-3.0, -5, 0], [3.0, -5, 0], [0.0, -5, 0]])
    d = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (3, 1))
    si = sd.ray_intersect(o, d)
    v = np.asarray(si.valid)
    assert v[0] and v[1] and not v[2]
    np.testing.assert_allclose(np.asarray(si.t)[:2], 4.0, rtol=1e-5)


def test_normalmap_tilts_shading():
    """A constant normal map tilting the normal changes the cosine falloff
    of a point light exactly as cos(theta_light . n_shading)."""
    I, rho, hgt = 4.0, 0.6, 2.0

    def render_with(nmap_value):
        s = sc.Scene(band=bt.band_preset("optical"))
        if nmap_value is not None:
            s.add(tx.constant("nm", value=np.asarray(nmap_value)))
            s.add(diffuse("base", reflectance=rho))
            spec = normalmap("d", "base", "nm")
            s.add(spec)
            s.bsdfs = [b for b in s.bsdfs]
        else:
            s.add(diffuse("d", reflectance=rho))
        s.add(sh.rectangle(to_world=np.asarray(tf.scale(50.0)), bsdf="d"))
        s.add(em.point("pt", intensity=I, position=(0, 0, hgt)))
        look = np.asarray(tf.look_at([0, 0, 1.0], [0, 0, 0.0], up=(0, 1, 0)))
        s.add(sn.radiancemeter(to_world=look, film_size=(1, 1), spp=512))
        film, _ = render(s, spp=512, max_depth=2, seed=3)
        return float(np.asarray(fm.develop(film))[0, 0, 0])

    flat = render_with(None)
    ident = render_with([0.5, 0.5, 1.0])       # identity normal map
    assert ident == pytest.approx(flat, rel=1e-3)

    # tilt the normal: n_t = normalize([0.4, 0, 0.8]) in tangent space
    tilted = render_with([0.7, 0.5, 0.9])
    n_t = np.array([0.4, 0.0, 0.8])
    n_t /= np.linalg.norm(n_t)
    # light is straight above the sampled point (0,0,0): wi = +z in tangent
    # frame of the flat rectangle (s,t = world x,y)
    expect_ratio = n_t[2]        # cos against wi=(0,0,1)
    assert tilted / flat == pytest.approx(expect_ratio, rel=0.02)
