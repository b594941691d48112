"""Participating-media tests: transmittance law, HG phase normalization,
volumetric path tracer energy behavior, radar medium attenuation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import beifong_tpu as bt
from beifong_tpu import scene as sc, emitters as em
from beifong_tpu.media import HomogeneousMedium, hg_eval, hg_sample
from beifong_tpu.core.rng import SampleStream
from beifong_tpu.integrators.volpath import volpath_sample


def test_beer_lambert():
    m = HomogeneousMedium.make(sigma_t=0.5)
    assert float(m.transmittance(2.0)) == pytest.approx(np.exp(-1.0), rel=1e-5)


def test_distance_sampling_distribution():
    m = HomogeneousMedium.make(sigma_t=2.0, albedo=1.0)
    u = jax.random.uniform(jax.random.key(0), (100_000,))
    d, evt, w = m.sample_distance(u, jnp.full((100_000,), 1e9))
    d = np.asarray(d)
    # exponential with rate 2 -> mean 0.5
    assert d.mean() == pytest.approx(0.5, rel=0.02)
    assert np.asarray(evt).all()


def test_hg_normalization_and_mean_cosine():
    g = 0.6
    # integral over sphere of hg = 1
    n = 200_000
    u = jax.random.uniform(jax.random.key(1), (n, 2))
    from beifong_tpu.core import warp
    d = warp.square_to_uniform_sphere(u)
    vals = np.asarray(hg_eval(d[:, 2], g))   # cos relative to +z axis
    integral = vals.mean() * 4 * np.pi
    assert integral == pytest.approx(1.0, rel=0.01)
    # sampling: mean cosine of scattered dirs (relative to propagation
    # direction -wi) equals g
    wi = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))  # propagating +z
    wo, pdf = hg_sample(u, g, wi)
    mean_cos = float(np.asarray(wo[:, 2]).mean())
    assert mean_cos == pytest.approx(g, abs=0.01)


def test_volpath_pure_absorption_matches_beer():
    """Absorbing-only medium: probability of reaching the env at env_dist is
    e^{-sigma D}, so mean radiance = e^{-sigma D} * Le."""
    s = sc.Scene(band=bt.band_preset("optical"))
    from beifong_tpu.bsdf import diffuse
    s.add(diffuse("d"))
    s.add(em.constant("env", radiance=1.0))
    s.medium = HomogeneousMedium.make(sigma_t=0.01, albedo=0.0)
    sd = s.compile()
    n = 1 << 15
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    stream = SampleStream.make(jax.random.key(0), n, 0)
    L, valid, _ = volpath_sample(sd, stream, o, d, max_depth=4, env_dist=100.0)
    got = float(np.asarray(L[:, 0]).mean())
    assert got == pytest.approx(np.exp(-1.0), rel=0.05)


def test_volpath_scattering_conserves_energy():
    """Purely scattering medium (albedo 1) of optical depth 1 inside a
    constant-radiance environment furnace: radiance must stay ~1."""
    s = sc.Scene(band=bt.band_preset("optical"))
    from beifong_tpu.bsdf import diffuse
    s.add(diffuse("d"))
    s.add(em.constant("env", radiance=1.0))
    s.medium = HomogeneousMedium.make(sigma_t=0.5, albedo=1.0, g=0.3)
    sd = s.compile()
    n = 8192
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    stream = SampleStream.make(jax.random.key(1), n, 0)
    L, valid, _ = volpath_sample(sd, stream, o, d, max_depth=32, env_dist=2.0)
    got = float(np.asarray(L[:, 0]).mean())
    # small loss from depth truncation + NEE/env double-count guard
    assert got == pytest.approx(1.0, rel=0.15)


def test_radar_medium_attenuation():
    """Ambient absorption reduces the received radar energy by the two-way
    Beer-Lambert factor."""
    import __graft_entry__ as g
    from beifong_tpu.receive import receive
    s, rx = g._build_scene(ground=False, rx_kind="omni")
    sd0 = s.compile()
    sigma = 0.05    # 1/m
    s.medium = HomogeneousMedium.make(sigma_t=sigma, albedo=0.0)
    sd1 = s.compile()
    tot = {}
    for name, sd in (("vac", sd0), ("atm", sd1)):
        acc = 0.0
        for seed in range(3):
            a, n = receive(s, sd, rx, seed=seed, spp=8192, max_depth=2,
                           time_sampling='gate')
            acc += np.asarray(a)[:, 0, 0].sum() / n
        tot[name] = acc / 3
    # two-way path ~ 2*4 m -> e^{-0.05*8} = 0.67
    ratio = tot["atm"] / tot["vac"]
    assert ratio == pytest.approx(np.exp(-sigma * 8.0), rel=0.25)
