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


@pytest.mark.slow
def test_polarized_radar_conductor_reflection():
    """Polarized radar receive (Stokes through `radar_receive_trace`,
    reference `*_polarized` variants `mitsuba.conf:120-123`): an unpolarized
    transmitter seen via a 45-degree conductor plate must arrive partially
    polarized along the s axis of the plane of incidence, with the degree of
    polarization |B|/A predicted by `mueller.specular_reflection`; a diffuse
    plate depolarizes; S0 equals the unpolarized run exactly."""
    import numpy as np
    import jax.numpy as jnp
    import beifong_tpu as bt
    from beifong_tpu import scene as sc, mueller as mu
    from beifong_tpu.bsdf import diffuse, conductor
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tf
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, wigner_receiver,
                                   ADCConfig)
    from beifong_tpu.receive import receive

    C = 340.0
    band = Band.from_freq(C, 40e3, 10e3)
    eta, kk = 2.0, 1.0

    def build(mat):
        s = sc.Scene(band=band)
        s.add(conductor("cond", eta=eta, k=kk, twosided=True))
        s.add(diffuse("diff", reflectance=1.0, twosided=True))
        wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
                   is_delta=True)
        s.add(wigner_transmitter("tx", wf, resample_freq=True))
        # tx at (0,0,-5) radiating toward the plate at the origin
        aim_tx = np.asarray(tf.compose(
            tf.look_at([0, 0, -5], [0, 0, 0], up=(0, 1, 0)),
            tf.scale([1.0, 1.0, 1.0])))
        s.add(sh.rectangle(to_world=aim_tx, transmitter="tx"))
        adc = ADCConfig(n_time=32, n_freq=1, sampling_start=0.0,
                        sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
        rx = wigner_receiver("rx", adc, receive_type='raw')
        s.add(rx)
        aim_rx = np.asarray(tf.compose(tf.look_at([0, -5, 0], [0, 0, 0]),
                                       tf.scale([0.05, 0.05, 1.0])))
        s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
        # plate normal along (0,-1,-1)/sqrt(2): specular tx->plate->rx at
        # 45-degree incidence, scattering plane = global y-z plane
        aim_p = np.asarray(tf.compose(tf.look_at([0, 0, 0], [0, -1, -1]),
                                      tf.scale(1.0)))
        s.add(sh.rectangle(to_world=aim_p, bsdf=mat))
        return s, rx

    s, rx = build("cond")
    a, n = receive(s, receiver=rx, spp=1 << 15, max_depth=2, seed=9,
                   time_sampling='gate', polarized=True)
    stokes = np.asarray(a).sum(axis=(0, 1))[:4]
    assert stokes[0] > 0

    m = np.asarray(mu.specular_reflection(
        jnp.asarray(np.cos(np.pi / 4)), jnp.asarray(eta), jnp.asarray(kk)))
    expected_s1 = m[1, 0] / m[0, 0]     # = B/A, s-axis excess
    assert expected_s1 > 0.05           # geometry gives real polarization
    got_s1 = stokes[1] / stokes[0]
    assert abs(got_s1 - expected_s1) < 0.1, (got_s1, expected_s1)
    # s axis of the y-z scattering plane is +-x == the rx transverse basis:
    # no S2 rotation leakage, and unpolarized input excites no S3
    assert abs(stokes[2] / stokes[0]) < 0.05
    assert abs(stokes[3] / stokes[0]) < 0.05

    # S0 of the polarized run == the unpolarized run (same stream)
    a0, n0 = receive(s, receiver=rx, spp=1 << 15, max_depth=2, seed=9,
                     time_sampling='gate')
    np.testing.assert_allclose(np.asarray(a).sum(axis=(0, 1))[0],
                               np.asarray(a0).sum(axis=(0, 1))[0],
                               rtol=1e-5)

    # diffuse plate depolarizes
    sd_, rxd = build("diff")
    ad, _ = receive(sd_, receiver=rxd, spp=1 << 14, max_depth=2, seed=9,
                    time_sampling='gate', polarized=True)
    st_d = np.asarray(ad).sum(axis=(0, 1))[:4]
    assert st_d[0] > 0
    dop = np.sqrt(st_d[1] ** 2 + st_d[2] ** 2 + st_d[3] ** 2) / st_d[0]
    assert dop < 0.05, dop
