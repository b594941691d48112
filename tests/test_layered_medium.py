"""LayeredMedium (z-stratified ambient absorption): closed-form optical
depth, radar-chain parity with the homogeneous medium in the uniform limit,
and in-kernel (megakernel) support."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

from beifong_tpu.media import HomogeneousMedium, LayeredMedium


def test_layered_tau_closed_form():
    """optical_depth (two-gather closed form) == dense midpoint quadrature
    of sigma_at for oblique, vertical and near-horizontal segments,
    including segments extending past the layered span (constant tails)."""
    rng = np.random.default_rng(0)
    sigma = rng.uniform(0.0, 2.0, 7).astype(np.float32)
    med = LayeredMedium.make(sigma, z_min=-1.5, z_max=2.0)
    o = rng.uniform(-3, 3, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d[0] = [0.0, 0.0, 1.0]            # vertical
    d[1] = [1.0, 0.0, 1e-7]           # near-horizontal
    dist = rng.uniform(0.1, 8.0, 64).astype(np.float32)
    tau = np.asarray(med.optical_depth(jnp.asarray(o), jnp.asarray(d),
                                       jnp.asarray(dist)))
    K = 4096
    ref = np.zeros(64)
    for i in range(K):
        t = (i + 0.5) / K * dist
        ref += np.asarray(med.sigma_at(jnp.asarray(o + t[:, None] * d)))
    ref *= dist / K
    np.testing.assert_allclose(tau, ref, rtol=2e-3, atol=1e-4)


def test_layered_sigma_at_constant_extension():
    med = LayeredMedium.make([1.0, 3.0], z_min=0.0, z_max=2.0)
    p = jnp.array([[0., 0., -5.], [0., 0., 0.5], [0., 0., 1.5],
                   [0., 0., 9.]])
    s = np.asarray(med.sigma_at(p))
    np.testing.assert_allclose(s, [1.0, 1.0, 3.0, 3.0], rtol=1e-6)


def test_layered_uniform_matches_homogeneous_radar_chain():
    """A uniform layered profile must reproduce the homogeneous medium in
    the jnp radar chain (same seed, same estimator)."""
    import test_radar as TR
    from beifong_tpu.receive import receive, develop_signal

    def run(med):
        s, rx = TR._point_target_scene()
        s.medium = med
        sd = s.compile()
        a, n = receive(s, sd, rx, seed=2, spp=1 << 12, max_depth=1,
                       time_sampling='gate')
        return np.asarray(develop_signal(a, n, rx.adc))[:, 0, 0]

    sigma = 0.05
    hom = run(HomogeneousMedium.make(sigma_t=sigma))
    lay = run(LayeredMedium.make(np.full(8, sigma, np.float32),
                                 z_min=-20.0, z_max=20.0))
    assert lay.sum() > 0
    np.testing.assert_allclose(lay, hom, rtol=5e-3)


@pytest.mark.slow
def test_megakernel_layered_medium():
    """In-kernel layered absorption: (a) a uniform profile matches the
    kernel's homogeneous path bit-for-bit (same seed / draws); (b) a
    stratified profile matches the independent jnp formulation."""
    import dataclasses as dc
    import __graft_entry__ as g
    from beifong_tpu.receive import receive, develop_signal
    from beifong_tpu.integrators.pallas_receive import (receive_pallas,
                                                        supported)

    def kern(med, seed=3):
        s, rx = g._build_scene(ground=False, rx_kind="omni")
        s.medium = med
        sd = s.compile()
        why = []
        assert supported(sd, rx, why), why
        out, n = receive_pallas(s, sd, rx, spp=1 << 13, seed=seed,
                                max_depth=2, time_sampling='gate',
                                interpret=True)
        return np.asarray(out)[:, 0], n

    sigma = 0.08
    hom, _ = kern(HomogeneousMedium.make(sigma_t=sigma))
    uni, _ = kern(LayeredMedium.make(np.full(6, sigma, np.float32),
                                     z_min=-11.0, z_max=7.0))
    assert hom.sum() > 0
    # f32 cancellation in Tau(z_a + d_z*ln) - Tau(z_a) for shallow rays
    # bounds the agreement at ~0.5% per bin
    np.testing.assert_allclose(uni, hom, rtol=5e-3, atol=1e-30)

    # stratified: absorbing slab only ABOVE the scene plane — compare the
    # ATTENUATION FACTOR (medium / vacuum, common seed per path) between
    # the kernel and the jnp chain's independent tau_z formulation;
    # ratioing out the estimator kills the heavy-tailed MC variance
    # stratified slab BETWEEN sensors and target: sensors at z = 3, target
    # at z ~ 0, absorbing layer z in [1, 2] — every rx->hit and hit->tx leg
    # crosses the slab exactly once, so the per-path attenuation is bounded
    # in a narrow band and the medium/vacuum ratio estimator is
    # low-variance (unlike a half-space profile, which is bimodal)
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, omni_receiver,
                                   ADCConfig)

    def slab_scene(med):
        band = Band.from_freq(340.0, 40e3, 10e3)
        s = sc.Scene(band=band)
        s.add(diffuse("mat", reflectance=1.0, twosided=True))
        wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
                   is_delta=True)
        s.add(wigner_transmitter("tx", wf, resample_freq=True))
        aim = np.asarray(tfm.compose(tfm.look_at([0.3, 0, 3], [0, -4, 0]),
                                     tfm.scale([0.05, 0.05, 1.0])))
        s.add(sh.rectangle(to_world=aim, transmitter="tx"))
        adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                        sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
        rx = omni_receiver("rx", adc, position=(-0.3, 0, 3),
                           receive_type='raw')
        s.add(rx)
        tgt = np.asarray(tfm.compose(tfm.look_at([0, -4, 0], [0, 0, 3]),
                                     tfm.scale(0.5)))
        s.add(sh.rectangle(to_world=tgt, bsdf="mat"))
        s.medium = med
        return s, rx

    prof = LayeredMedium.make([0.0, 0.4, 0.0, 0.0], z_min=0.0, z_max=4.0)

    def kern_slab(med):
        s, rx = slab_scene(med)
        sd = s.compile()
        why = []
        assert supported(sd, rx, why), why
        out, _ = receive_pallas(s, sd, rx, spp=1 << 13, seed=3, max_depth=2,
                                time_sampling='gate', interpret=True)
        return np.asarray(out)[:, 0]

    def jnp_slab(med):
        s, rx = slab_scene(med)
        sd = s.compile()
        a, n2 = receive(s, sd, rx, seed=9, spp=1 << 13, max_depth=2,
                        time_sampling='gate')
        return np.asarray(develop_signal(a, n2, rx.adc))[:, 0, 0]

    lay, vac = kern_slab(prof), kern_slab(None)
    jl, jv = jnp_slab(prof), jnp_slab(None)
    # skip the direct tx->rx blast (bin ~2, horizontal at z=3, never
    # crosses the slab): the target return sits at ~2*5.0 m -> bin ~31
    pk = 10 + int(jv[10:].argmax())
    assert 28 <= pk <= 36, pk
    lo, hi = pk - 3, pk + 4
    att_k = lay[lo:hi].sum() / vac[lo:hi].sum()
    att_j = jl[lo:hi].sum() / jv[lo:hi].sum()
    # analytic band: two slab crossings, tau ~= 2 * 0.4 * L/|z_h - 3|
    # with L ~= 5.1, |dz| ~= 3 +- 0.5 -> att in roughly [0.2, 0.45]
    assert 0.1 < att_k < 0.55, att_k
    assert att_k == pytest.approx(att_j, rel=0.12), (att_k, att_j)


def test_supported_layered_gate():
    import __graft_entry__ as g
    from beifong_tpu.integrators.pallas_receive import supported
    from beifong_tpu.media import HeterogeneousMedium

    s, rx = g._build_scene(ground=False)
    s.medium = LayeredMedium.make(np.ones(32, np.float32) * 0.01)
    assert supported(s.compile(), rx)
    s2, rx2 = g._build_scene(ground=False)
    s2.medium = LayeredMedium.make(np.ones(40, np.float32) * 0.01)
    why = []
    assert not supported(s2.compile(), rx2, why)
    assert any('layers' in w for w in why)
    # round 5: SMALL 3-D grids are in-kernel (16-pt quadrature tau);
    # grids past the D*H row cap still gate to the jnp wavefront
    s3, rx3 = g._build_scene(ground=False)
    s3.medium = HeterogeneousMedium.make(np.ones((4, 4, 4), np.float32))
    assert supported(s3.compile(), rx3)
    s4, rx4 = g._build_scene(ground=False)
    s4.medium = HeterogeneousMedium.make(np.ones((16, 16, 16), np.float32))
    why4 = []
    assert not supported(s4.compile(), rx4, why4)
    assert any('grid' in w for w in why4)
