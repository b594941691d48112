"""End-to-end optical rendering tests against analytic solutions.

Replaces the reference's golden-EXR regression strategy
(`src/librender/tests/test_renders.py`) with analytic radiometric checks —
no binary golden assets needed.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import beifong_tpu as bt
from beifong_tpu import scene as sc, emitters as em, sensors as sn, film as fm
from beifong_tpu.bsdf import diffuse, rough_conductor, conductor
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.core import transform as tf
from beifong_tpu.render import render


def test_furnace_sphere():
    """Convex diffuse sphere in a constant environment: L = albedo * E."""
    s = sc.Scene(band=bt.band_preset("optical"))
    s.add(diffuse("white", reflectance=0.5))
    s.add(sh.sphere(to_world=np.asarray(tf.translate([0, 0, 0])), bsdf="white"))
    s.add(em.constant("env", radiance=1.0))
    s.add(sn.perspective(fov=30.0, film_size=(32, 32), spp=256,
                         to_world=np.asarray(tf.look_at([0, -5, 0], [0, 0, 0]))))
    film, spp = render(s, spp=256, max_depth=6, seed=1)
    img = np.asarray(fm.develop(film))
    # Center pixels see the sphere: expect 0.5 (+ tiny depth truncation error)
    c = img[14:18, 14:18, 0]
    np.testing.assert_allclose(c, 0.5, atol=0.02)
    # Corner pixels see the environment: exactly 1
    np.testing.assert_allclose(img[0, 0], 1.0, atol=0.02)


def test_point_light_direct():
    """Point light above a diffuse plane: L = rho/pi * I cos(theta) / r^2."""
    I = 4.0
    rho = 0.6
    hgt = 2.0
    s = sc.Scene(band=bt.band_preset("optical"))
    s.add(diffuse("d", reflectance=rho))
    s.add(sh.rectangle(to_world=np.asarray(tf.scale(50.0)), bsdf="d"))  # z=0 plane
    s.add(em.point("pt", intensity=I, position=(0, 0, hgt)))
    # Radiancemeter at (0.5, 0, 1) looking straight down at p=(0.5, 0, 0)
    look = np.asarray(tf.look_at([0.5, 0, 1.0], [0.5, 0, 0.0], up=(0, 1, 0)))
    s.add(sn.radiancemeter(to_world=look, film_size=(1, 1), spp=512))
    film, spp = render(s, spp=512, max_depth=2, seed=2)
    img = np.asarray(fm.develop(film))
    r2 = 0.5 ** 2 + hgt ** 2
    cos = hgt / np.sqrt(r2)
    expect = rho / np.pi * I * cos / r2
    assert img[0, 0, 0] == pytest.approx(expect, rel=1e-3)


def _quad_direct_irradiance(p, emitter_center, half, radiance, n_emitter):
    """Numerical quadrature of direct irradiance from a rectangular emitter."""
    n = 400
    xs = np.linspace(-half, half, n)
    ys = np.linspace(-half, half, n)
    X, Y = np.meshgrid(xs, ys)
    q = np.stack([X.ravel() + emitter_center[0], Y.ravel() + emitter_center[1],
                  np.full(X.size, emitter_center[2])], -1)
    dvec = q - p
    d2 = (dvec ** 2).sum(-1)
    dn = dvec / np.sqrt(d2)[:, None]
    cos_p = dn[:, 2]                      # surface normal +z at p
    cos_q = np.maximum(-(dn @ n_emitter), 0.0)
    dA = (2 * half / n) ** 2
    E = radiance * (np.maximum(cos_p, 0) * cos_q / d2).sum() * dA
    return E


def test_area_light_direct_matches_quadrature():
    """Diffuse ground lit by a square area emitter; path-traced direct
    lighting must match numerical quadrature of the emitter integral."""
    Le = 5.0
    rho = 0.4
    half = 0.5
    s = sc.Scene(band=bt.band_preset("optical"))
    s.add(diffuse("g", reflectance=rho))
    s.add(em.area("lamp", radiance=Le))
    s.add(sh.rectangle(to_world=np.asarray(tf.scale(20.0)), bsdf="g"))
    # emitter rectangle at z=3 facing down
    m = tf.compose(tf.translate([0, 0, 3.0]),
                   tf.rotate([1, 0, 0], 180.0), tf.scale(half))
    s.add(sh.rectangle(to_world=np.asarray(m), emitter="lamp"))
    look = np.asarray(tf.look_at([0.3, 0, 1.2], [0.3, 0, 0.0], up=(0, 1, 0)))
    s.add(sn.radiancemeter(to_world=look, film_size=(1, 1), spp=4096))
    film, spp = render(s, spp=4096, max_depth=2, seed=3)
    img = np.asarray(fm.develop(film))
    E = _quad_direct_irradiance(np.array([0.3, 0, 0.0]), [0, 0, 3.0], half, Le,
                                np.array([0.0, 0.0, -1.0]))
    expect = rho / np.pi * E
    assert img[0, 0, 0] == pytest.approx(expect, rel=0.03)


def test_mirror_reflection():
    """Smooth conductor: camera sees env through one mirror bounce scaled by
    Fresnel reflectance."""
    s = sc.Scene(band=bt.band_preset("optical"))
    s.add(conductor("m", eta=0.0, k=1e6))   # near-perfect mirror (F -> 1)
    s.add(sh.rectangle(to_world=np.asarray(tf.scale(5.0)), bsdf="m"))
    s.add(em.constant("env", radiance=2.0))
    look = np.asarray(tf.look_at([0, 0, 3.0], [0, 0, 0.0], up=(0, 1, 0)))
    s.add(sn.radiancemeter(to_world=look, film_size=(1, 1), spp=64))
    film, _ = render(s, spp=64, max_depth=3, seed=4)
    img = np.asarray(fm.develop(film))
    assert img[0, 0, 0] == pytest.approx(2.0, rel=5e-3)


def test_mesh_triangle_hit():
    """Triangle-mesh ground behaves like the analytic rectangle."""
    from beifong_tpu.geometry.mesh import MeshSpec, make_grid
    rho, I, hgt = 0.6, 4.0, 2.0
    v, f = make_grid(4, 4)
    s = sc.Scene(band=bt.band_preset("optical"))
    s.add(diffuse("d", reflectance=rho))
    s.add(MeshSpec(v, f, to_world=np.asarray(tf.scale(50.0)), bsdf="d"))
    s.add(em.point("pt", intensity=I, position=(0, 0, hgt)))
    look = np.asarray(tf.look_at([0.5, 0, 1.0], [0.5, 0, 0.0], up=(0, 1, 0)))
    s.add(sn.radiancemeter(to_world=look, film_size=(1, 1), spp=256))
    film, _ = render(s, spp=256, max_depth=2, seed=5)
    img = np.asarray(fm.develop(film))
    r2 = 0.5 ** 2 + hgt ** 2
    cos = hgt / np.sqrt(r2)
    expect = rho / np.pi * I * cos / r2
    assert img[0, 0, 0] == pytest.approx(expect, rel=1e-3)
