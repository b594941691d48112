"""Stokes integrator tests: diffuse depolarization, Brewster polarization."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import beifong_tpu as bt
from beifong_tpu import scene as sc, emitters as em
from beifong_tpu.bsdf import diffuse, conductor
from beifong_tpu.bsdf.tables import dielectric
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.core import transform as tf
from beifong_tpu.core.rng import SampleStream
from beifong_tpu.integrators.stokes import stokes_sample
from beifong_tpu import mueller as mu


def _trace(scene, o, d, n=4096, seed=0):
    sd = scene.compile()
    o = jnp.tile(jnp.asarray(o, jnp.float32)[None], (n, 1))
    d = jnp.tile(jnp.asarray(d, jnp.float32)[None], (n, 1))
    stream = SampleStream.make(jax.random.key(seed), n, 0)
    s, valid, _ = stokes_sample(sd, stream, o, d)
    return np.asarray(s).mean(axis=0)


def test_diffuse_depolarizes():
    s = sc.Scene(band=bt.band_preset("optical"))
    s.add(diffuse("d", reflectance=0.8))
    s.add(sh.rectangle(to_world=np.asarray(tf.scale(20.0)), bsdf="d"))
    s.add(em.point("pt", intensity=5.0, position=(0, 0, 3)))
    stokes = _trace(s, [0.3, 0, 1.0], [0, 0, -1.0])
    assert stokes[0] > 0
    dop = np.linalg.norm(stokes[1:]) / stokes[0]
    assert dop < 1e-5


def test_dielectric_brewster_polarizes():
    """Light reflecting off glass near Brewster's angle is strongly
    polarized in the rendered Stokes output."""
    eta = 1.5046
    brewster = np.arctan(eta)
    s = sc.Scene(band=bt.band_preset("optical"))
    s.add(dielectric("g"))
    s.add(sh.rectangle(to_world=np.asarray(tf.scale(20.0)), bsdf="g"))
    # place a point light so its mirror image is seen at Brewster incidence
    h = 2.0
    x = h * np.tan(brewster)
    s.add(em.point("pt", intensity=5.0, position=(-x, 0, h)))
    # camera above, looking at the origin at the specular angle
    cam = np.array([x, 0, h])
    d = -cam / np.linalg.norm(cam)
    stokes = _trace(s, cam, d)
    assert stokes[0] > 0
    dop = np.linalg.norm(stokes[1:]) / stokes[0]
    assert dop > 0.95, f"DOP {dop} at Brewster should be ~1"


def test_conductor_partial_polarization():
    s = sc.Scene(band=bt.band_preset("optical"))
    s.add(conductor("m", eta=0.2, k=3.0))
    s.add(sh.rectangle(to_world=np.asarray(tf.scale(20.0)), bsdf="m"))
    h = 2.0
    x = 2.0
    s.add(em.point("pt", intensity=5.0, position=(-x, 0, h)))
    cam = np.array([x, 0, h])
    stokes = _trace(s, cam, -cam / np.linalg.norm(cam))
    assert stokes[0] > 0
    dop = np.linalg.norm(stokes[1:]) / stokes[0]
    assert 0.01 < dop < 0.9
