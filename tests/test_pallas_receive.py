"""Megakernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest
import jax

import __graft_entry__ as g
from beifong_tpu.receive import receive, develop_signal
from beifong_tpu.integrators.pallas_receive import (receive_pallas, supported,
                                                    TILE)


@pytest.mark.parametrize("kind", ["omni", "wigner"])
def test_megakernel_matches_jnp(kind):
    s, rx = g._build_scene(ground=False, rx_kind=kind)
    sd = s.compile()
    assert supported(sd, rx)
    tp = 0.0
    tj = 0.0
    seeds = 3
    for seed in range(seeds):
        out, n = receive_pallas(s, sd, rx, spp=1 << 14, seed=seed,
                                max_depth=2, time_sampling='gate',
                                interpret=True)
        tp = tp + np.asarray(out)[:, 0] / n * rx.adc.n_time / seeds
        a, n2 = receive(s, sd, rx, seed=100 + seed, spp=1 << 14, max_depth=2,
                        time_sampling='gate')
        tj = tj + np.asarray(develop_signal(a, n2, rx.adc))[:, 0, 0] / seeds
    assert abs(int(tp.argmax()) - int(tj.argmax())) <= 1
    # signed aperture weights make totals heavy-tailed; compare energy in
    # the peak window with a loose statistical bound
    pk = int(tj.argmax())
    lo, hi = max(pk - 3, 0), pk + 4
    assert tp[lo:hi].sum() == pytest.approx(tj[lo:hi].sum(), rel=0.6)


def test_megakernel_deterministic_and_scales():
    s, rx = g._build_scene(ground=False, rx_kind="omni")
    sd = s.compile()
    out1, n1 = receive_pallas(s, sd, rx, spp=TILE * 4, seed=7, max_depth=2,
                              time_sampling='gate', interpret=True)
    out1b, _ = receive_pallas(s, sd, rx, spp=TILE * 4, seed=7, max_depth=2,
                              time_sampling='gate', interpret=True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out1b))
    # more samples -> proportionally more accumulated signal
    out2, n2 = receive_pallas(s, sd, rx, spp=TILE * 8, seed=7, max_depth=2,
                              time_sampling='gate', interpret=True)
    r = np.asarray(out2).sum() / max(np.asarray(out1).sum(), 1e-30)
    assert r == pytest.approx(2.0, rel=0.5)


def test_supported_gates():
    from beifong_tpu.radar import linfmcw, wigner_transmitter
    s, rx = g._build_scene(ground=False)
    sd = s.compile()
    assert supported(sd, rx)
    # mesh scenes ARE in scope now (in-kernel BVH) — but only with one
    # shared mesh reflectance; mixed-material meshes fall back
    import beifong_tpu as bt
    from beifong_tpu import scene as sc
    from beifong_tpu.geometry.mesh import MeshSpec, make_grid
    from beifong_tpu.bsdf import diffuse
    s2 = sc.Scene(band=bt.band_preset("ultrasound_40k"))
    s2.add(diffuse("d"))
    v, f = make_grid(2, 2)
    s2.add(MeshSpec(v, f, bsdf="d"))
    s2.add(wigner_transmitter("tx", linfmcw(40e3, 10.0, 0.05, 2e3),
                              resample_freq=True))
    from beifong_tpu.geometry import shapes as sh
    s2.add(sh.rectangle(transmitter="tx"))
    assert supported(s2.compile(), rx)
    s2.add(diffuse("d2", reflectance=0.9))
    v2, f2 = make_grid(2, 2)
    s2.add(MeshSpec(v2, f2, bsdf="d2"))
    why2 = []
    assert not supported(s2.compile(), rx, why2)
    assert any('reflectance' in w for w in why2)
    # moving shapes fall back: the kernel models no Doppler
    s3, rx3 = g._build_scene(ground=False)
    s3.shapes[-1].velocity = np.asarray([1.0, 0.0, 0.0], np.float32)
    why3 = []
    assert not supported(s3.compile(), rx3, why3)
    assert any('Doppler' in w for w in why3)
    # oversized ADC grids must be rejected with a reason (the in-kernel
    # splat is unrolled over cells: a 256x128 grid would compile-bomb)
    import dataclasses as dc
    big = dc.replace(rx, adc=dc.replace(rx.adc, n_time=256, n_freq=128))
    why = []
    assert not supported(sd, big, why)
    assert any('cells' in w for w in why)


def test_receive_use_pallas_auto():
    """use_pallas='auto' routes supported scenes through the megakernel
    (forced into interpret mode here — no real TPU in CI)."""
    from beifong_tpu.integrators import pallas_receive as pr
    import unittest.mock as mock
    s, rx = g._build_scene(ground=False)
    sd = s.compile()
    orig = pr.receive_pallas

    def fake(*a, **k):
        k['interpret'] = True
        return orig(*a, **k)

    with mock.patch.object(pr, 'receive_pallas', fake):
        adc, n = receive(s, sd, rx, spp=TILE, max_depth=2,
                         time_sampling='gate', use_pallas='auto')
    assert adc.shape == (64, 1, 3)
    assert n == TILE


def test_megakernel_coherent_phase_physics():
    """Coherent I/Q in the megakernel: quarter-wavelength target shift flips
    the echo phase by ~pi (same physics test as the jnp coherent path)."""
    import numpy as np
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tf
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import cw, wigner_transmitter, omni_receiver, ADCConfig
    C, fc = 340.0, 40e3
    lam = C / fc

    def build(R):
        band = Band.from_freq(C, fc, 10e3)
        s = sc.Scene(band=band)
        s.add(diffuse("mat", reflectance=1.0, twosided=True))
        s.add(wigner_transmitter("tx", cw(f_centre=fc), resample_freq=True))
        aim = np.asarray(tf.compose(tf.look_at([0.0, 0, 0], [0.0, -1, 0]),
                                    tf.scale([0.05, 0.05, 1.0])))
        s.add(sh.rectangle(to_world=aim, transmitter="tx"))
        adcc = ADCConfig(n_time=4, n_freq=1, sampling_start=0.0,
                         sampling_time=0.05, freq_lo=35e3, freq_hi=45e3)
        rx = omni_receiver("rx", adcc, position=(0.0, 0.0, 0.0),
                           receive_type='raw')
        s.add(rx)
        tgt = np.asarray(tf.compose(tf.look_at([0, -R, 0], [0, 0, 0]),
                                    tf.scale(0.3)))
        s.add(sh.rectangle(to_world=tgt, bsdf="mat"))
        return s, rx

    phases = []
    for R in (4.0, 4.0 + lam / 4):
        s, rx = build(R)
        sd = s.compile()
        out, n = receive_pallas(s, sd, rx, spp=1 << 14, seed=3, max_depth=2,
                                time_sampling='gate', interpret=True,
                                coherent=True)
        a = np.asarray(out)
        iq = complex(a[..., 0].sum(), a[..., 1].sum())
        assert abs(iq) > 0
        phases.append(np.angle(iq))
    dphi = (phases[1] - phases[0]) % (2 * np.pi)
    assert dphi == pytest.approx(np.pi, abs=0.5), f"dphi={dphi}"


def test_sharded_megakernel_psum_merge():
    """Megakernel under shard_map: per-device kernels + full-mesh psum give
    the merged profile (2-device CPU mesh, interpret mode)."""
    from beifong_tpu.parallel.shard import make_mesh, receive_sharded_pallas
    s, rx = g._build_scene(ground=False)
    sd = s.compile()
    mesh = make_mesh(pulse=1, ray=2, devices=jax.devices()[:2])
    sig, n = receive_sharded_pallas(s, sd, rx, mesh, spp_per_device=8192,
                                    seed=0, max_depth=1, interpret=True)
    a = np.asarray(sig)[:, 0] / n * 64
    assert n == 16384
    assert int(a.argmax()) in (25, 26, 27)
    assert a.sum() > 0


def _mesh_scene(R=4.0, n_side=9):
    """Point-target scene with a crumpled-grid mesh target."""
    import beifong_tpu as bt
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.geometry.mesh import MeshSpec, make_grid
    from beifong_tpu.core import transform as tf
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, wigner_receiver,
                                   ADCConfig)
    band = Band.from_freq(340.0, 40e3, 10e3)
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
               is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    from beifong_tpu.core import transform as tfm
    aim = np.asarray(tfm.compose(tfm.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                 tfm.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
    rx = wigner_receiver("rx", adc, receive_type='raw')
    s.add(rx)
    aim_rx = np.asarray(tfm.compose(tfm.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                                    tfm.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
    v, f = make_grid(n_side, n_side)
    v = np.asarray(v, np.float32)
    v[:, 2] = 0.05 * np.sin(4 * v[:, 0]) * np.cos(3 * v[:, 1])
    m = np.asarray(tfm.compose(tfm.look_at([0, -R, 0], [0, 0, 0]),
                               tfm.scale(0.6)))
    s.add(MeshSpec(v, np.asarray(f), bsdf="mat", to_world=m))
    return s, rx


def test_megakernel_mesh_matches_jnp():
    """Mesh scenes in the megakernel (in-kernel speculative BVH walk,
    geometry/pallas_bvh.py): round-trip peak bin must match the jnp
    wavefront's on the same scene.  (Analogue of the reference's OptiX
    wavefront covering mesh shapes, scene_optix.inl.)"""
    from beifong_tpu.receive import develop_signal
    s, rx = _mesh_scene()
    sd = s.compile(use_bvh=False)
    why = []
    assert supported(sd, rx, why), why
    out, n = receive_pallas(s, sd, rx, spp=1 << 12, seed=0, max_depth=1,
                            time_sampling='gate', interpret=True)
    tp = np.asarray(out)[:, 0] / n * rx.adc.n_time
    a, n2 = receive(s, sd, rx, seed=11, spp=1 << 13, max_depth=1,
                    time_sampling='gate')
    tj = np.asarray(develop_signal(a, n2, rx.adc))[:, 0, 0]
    assert tp.sum() > 0
    assert abs(int(tp.argmax()) - int(tj.argmax())) <= 1
