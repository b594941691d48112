"""MIMO multi-channel receive + digital beamforming + channel sharding
(BASELINE config 5: per-channel signal chains, digital beamforming,
channels sharded across devices).

The reference's phased receiver folds the array ANALOGUELY into one ADC
(`src/receivers/phasedreceiver.cpp:118-145,293`); these tests pin the
per-element digital chain: azimuth recovery from the beamformed cube,
bit-exact channel-sharding parity, and the sharded beamform collective.
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from beifong_tpu import scene as sc
from beifong_tpu.bsdf import diffuse
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.core import transform as tfm
from beifong_tpu.core.config import Band
from beifong_tpu.radar import (pulse, wigner_transmitter, phased_receiver,
                               ADCConfig)
from beifong_tpu.radar.endpoints import rx_elem_offsets
from beifong_tpu.receive import receive_mimo, develop_mimo
from beifong_tpu.dsp import beamform as bf

C = 340.0
E = 8


def _mimo_scene(az_deg: float, r: float = 4.0):
    """Wide-beam tx at the origin + E-element lambda/2 ULA facing -y +
    one small target at azimuth `az_deg` (from broadside toward +x)."""
    band = Band.from_freq(C, 40e3, 1e3)
    wl = band.wavelength_centre
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=1e3,
               is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    aim = np.asarray(tfm.compose(tfm.look_at([0.1, 0, 0], [0.1, -1, 0]),
                                 tfm.scale([0.004, 0.004, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=39.5e3, freq_hi=40.5e3)
    rx = phased_receiver("rx", adc, n_elems=E, elem_spacing=wl / 2,
                         elem_wid=(wl / 4, wl / 4), receive_type='raw')
    s.add(rx)
    aim_rx = np.asarray(tfm.compose(tfm.look_at([0.0, 0, 0], [0.0, -1, 0]),
                                    tfm.scale([1e-4, 1e-4, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
    tx_ = r * np.sin(np.radians(az_deg))
    ty_ = -r * np.cos(np.radians(az_deg))
    tgt = np.asarray(tfm.compose(tfm.look_at([tx_, ty_, 0], [0, 0, 0]),
                                 tfm.scale(0.2)))
    s.add(sh.rectangle(to_world=tgt, bsdf="mat"))
    return s, rx


def _az_scan():
    az_grid = np.radians(np.linspace(-40.0, 40.0, 81))
    dirs = bf.ula_directions(az_grid, axis=(1, 0, 0), normal=(0, -1, 0))
    return az_grid, dirs


def test_mimo_beamform_recovers_azimuth():
    """Delay-and-sum AND MVDR over the per-element cube peak at the true
    target azimuth (the 'steering test recovering target azimuth' of
    VERDICT r2 next-1)."""
    az_true = 15.0
    s, rx = _mimo_scene(az_true)
    sd = s.compile()
    adc, n = receive_mimo(s, sd, rx, spp=1 << 13, max_depth=2, seed=3,
                          time_sampling='gate')
    cube = develop_mimo(adc, n, rx.adc)
    assert cube.shape == (E, rx.adc.n_time, rx.adc.n_freq)
    sidx = s.shape_index_of_endpoint('receiver', rx.id)
    offs = np.asarray(rx_elem_offsets(sd, rx, sidx))
    assert offs.shape == (E, 3)
    az_grid, dirs = _az_scan()

    B = bf.delay_and_sum(cube, offs, dirs, 40e3, C)
    p = np.asarray(jnp.sum(jnp.abs(B) ** 2, axis=(1, 2)))
    pk = np.degrees(az_grid[p.argmax()])
    assert abs(pk - az_true) <= 2.0, pk
    assert p.max() / np.median(p) > 5.0      # real mainlobe, not noise

    spec = np.asarray(bf.mvdr_spectrum(cube, offs, dirs, 40e3, C))
    pk_m = np.degrees(az_grid[spec.argmax()])
    assert abs(pk_m - az_true) <= 2.0, pk_m
    # adaptive beamformer resolves sharper than conventional
    assert spec.max() / np.median(spec) > p.max() / np.median(p)

    # beamformed time profile: target return lands at the expected delay
    y = np.asarray(jnp.abs(B[p.argmax()][:, 0]) ** 2)
    t_pk = (y.argmax() + 0.5) / rx.adc.n_time * rx.adc.sampling_time
    assert t_pk == pytest.approx(2 * 4.0 / C, abs=2 * 0.06 / 64)


def test_mimo_mixer_dechirp_cube():
    """mixer receive type + per-element channels coexist (dechirped MIMO
    front-end, the digital-array form of config 4's chain): the target
    echo's beat frequency slope*tau lands in the right freq bin of every
    element channel."""
    from beifong_tpu.radar import linfmcw
    r = 3.0
    s, rx = _mimo_scene(0.0, r=r)
    import dataclasses as dc
    lo = linfmcw(40e3, 10.0, 0.05, 1e3)       # 20 Hz/ms up-chirp
    rx2 = dc.replace(rx, receive_type='mixer', lo_waveform=lo,
                     adc=dc.replace(rx.adc, freq_lo=0.0, freq_hi=500.0,
                                    n_freq=8))
    s.receivers[0] = rx2
    # matched tx chirp (the LO is the tx waveform: classic FMCW dechirp)
    s.transmitters[0] = dc.replace(s.transmitters[0], waveform=lo)
    sd = s.compile()
    adc, n = receive_mimo(s, sd, rx2, spp=1 << 13, max_depth=2, seed=5)
    cube = np.asarray(develop_mimo(adc, n, rx2.adc))
    assert cube.shape == (E, 64, 8)
    assert np.isfinite(cube).all()
    prof = (np.abs(cube) ** 2).sum(axis=(0, 1))   # beat-frequency profile
    assert prof.sum() > 0
    slope = 1e3 / 0.05
    beat = slope * (2 * r / C)                    # ~353 Hz
    bin_expect = int(beat / 500.0 * 8)
    assert abs(int(prof.argmax()) - bin_expect) <= 1


def test_mimo_sharded_channel_parity():
    """Channel-sharded receive (chan=8, ray=1) is BIT-IDENTICAL to the
    dense cube; a ('chan','ray') mesh merges ray shards by psum; the
    sharded delay-and-sum matches the dense beamformer."""
    from beifong_tpu.parallel.shard import (make_mimo_mesh,
                                            receive_mimo_sharded,
                                            develop_mimo_iq,
                                            beamform_das_sharded)
    az_true = 15.0
    s, rx = _mimo_scene(az_true)
    sd = s.compile()
    spp = 1 << 12

    adc_d, n_d = receive_mimo(s, sd, rx, spp=spp, max_depth=2, seed=3,
                              time_sampling='gate')
    cube_d = np.asarray(develop_mimo(adc_d, n_d, rx.adc))

    mesh = make_mimo_mesh(chan=8, ray=1)
    iq, n_s = receive_mimo_sharded(s, sd, rx, mesh, spp=spp, seed=3,
                                   max_depth=2, time_sampling='gate')
    cube_s = np.asarray(develop_mimo_iq(iq, n_s, rx.adc))
    assert n_s == n_d
    np.testing.assert_array_equal(cube_d, cube_s)

    # chan x ray mesh: 2x the samples, ~2x the accumulated energy
    mesh2 = make_mimo_mesh(chan=4, ray=2)
    iq2, n_s2 = receive_mimo_sharded(s, sd, rx, mesh2, spp=2 * spp, seed=3,
                                     max_depth=2, time_sampling='gate')
    assert n_s2 == 2 * spp
    cube2 = np.asarray(develop_mimo_iq(iq2, n_s2, rx.adc))
    e1, e2 = np.abs(cube_s).sum(), np.abs(cube2).sum()
    assert e2 == pytest.approx(e1, rel=0.5)

    # sharded beamform: per-device partial element sums + one psum
    sidx = s.shape_index_of_endpoint('receiver', rx.id)
    offs = np.asarray(rx_elem_offsets(sd, rx, sidx))
    az_grid, dirs = _az_scan()

    @functools.partial(shard_map, mesh=mesh2, in_specs=(P('chan'), P('chan')),
                       out_specs=P(), check_vma=False)
    def bf_run(iq_l, offs_l):
        return beamform_das_sharded(iq_l, offs_l, jnp.asarray(dirs), 40e3, C)

    scale = rx.adc.n_time / n_s2
    B_sh = np.asarray(bf_run(iq2 * scale, jnp.asarray(offs, jnp.float32)))
    B_dense = np.asarray(bf.delay_and_sum(cube2, offs, dirs, 40e3, C))
    np.testing.assert_allclose(B_sh, B_dense, atol=1e-6 * np.abs(B_dense).max())
    p = (np.abs(B_sh) ** 2).sum(axis=(1, 2))
    assert abs(np.degrees(az_grid[p.argmax()]) - az_true) <= 2.0


def test_steering_matrix_matches_trace_phases():
    """The far-field steering model used by the beamformer agrees with the
    exact spherical per-element phases the trace splats (same sign
    convention, <2% of a cycle at 4 m for a lambda/2 8-element ULA)."""
    wl = C / 40e3
    offs = np.zeros((E, 3), np.float32)
    offs[:, 0] = (np.arange(E) - (E - 1) / 2) * wl / 2
    az = np.radians(25.0)
    d = np.array([np.sin(az), -np.cos(az), 0.0], np.float32)
    x1 = 4.0 * d                      # first path vertex, 4 m out
    # trace phase: -k (|x1 - r_e| - |x1|)
    dd = np.linalg.norm(x1[None] - offs, axis=-1) - np.linalg.norm(x1)
    ph_trace = np.exp(-1j * 2 * np.pi * 40e3 / C * dd)
    a = np.asarray(bf.steering_matrix(offs, d[None], 40e3, C))[0]
    err = np.abs(np.angle(a * np.conj(ph_trace))) / (2 * np.pi)
    assert err.max() < 0.02


@pytest.mark.slow
def test_mimo_megakernel_azimuth_and_jnp_agreement():
    """The megakernel's per-element MIMO mode (interpret): DAS over the
    kernel cube recovers the target azimuth and the beamformed time
    profile peaks at the 2R/c delay; the azimuth spectrum agrees with the
    jnp `_receive_mimo_pass` estimator (different sampling, so statistical
    agreement on the beamformed observables, the quantities config 5 is
    for)."""
    from beifong_tpu.integrators.pallas_receive import (receive_pallas,
                                                        supported)
    az_true = 15.0
    s, rx = _mimo_scene(az_true)
    sd = s.compile()
    why = []
    assert supported(sd, rx, why, mimo=True), why
    spp = 1 << 12
    sig, n = receive_pallas(s, sd, rx, spp=spp, seed=3, max_depth=2,
                            time_sampling='gate', interpret=True, mimo=True)
    sig = np.asarray(sig)
    assert sig.shape == (rx.adc.n_time, 1, 2 * E)
    cube_k = np.moveaxis((sig[..., 0::2] + 1j * sig[..., 1::2])
                         * (rx.adc.n_time / n), -1, 0)
    sidx = s.shape_index_of_endpoint('receiver', rx.id)
    offs = np.asarray(rx_elem_offsets(sd, rx, sidx))
    az_grid, dirs = _az_scan()
    B = bf.delay_and_sum(jnp.asarray(cube_k), offs, dirs, 40e3, C)
    p = np.asarray(jnp.sum(jnp.abs(B) ** 2, axis=(1, 2)))
    assert abs(np.degrees(az_grid[p.argmax()]) - az_true) <= 2.0
    assert p.max() / np.median(p) > 5.0
    y = np.asarray(jnp.abs(B[p.argmax()][:, 0]) ** 2)
    t_pk = (y.argmax() + 0.5) / rx.adc.n_time * rx.adc.sampling_time
    assert t_pk == pytest.approx(2 * 4.0 / C, abs=2 * 0.06 / 64)

    adc_j, nj = receive_mimo(s, sd, rx, spp=spp, max_depth=2, seed=3,
                             time_sampling='gate')
    cube_j = develop_mimo(adc_j, nj, rx.adc)
    Bj = bf.delay_and_sum(cube_j, offs, dirs, 40e3, C)
    pj = np.asarray(jnp.sum(jnp.abs(Bj) ** 2, axis=(1, 2)))
    # same mainlobe: normalized azimuth spectra strongly correlated
    cn = np.corrcoef(p / p.max(), pj / pj.max())[0, 1]
    assert cn > 0.9, cn


@pytest.mark.slow
def test_mimo_megakernel_sharded_channel_parity():
    """Channel-sharded megakernel MIMO (chan=2, ray=1) is BIT-IDENTICAL to
    the dense kernel cube; a ('chan','ray') mesh psum-merges ray shards to
    a statistically consistent cube (the kernel-rate form of
    `test_mimo_sharded_channel_parity`).  Meshes stay at 2-4 devices:
    interpret-mode pallas under shard_map scales poorly past that on a
    4-core host (the jnp-path sharding tests cover the full 8-device
    mesh)."""
    from beifong_tpu.integrators.pallas_receive import receive_pallas
    from beifong_tpu.parallel.shard import (make_mimo_mesh,
                                            receive_mimo_sharded_pallas)
    s, rx = _mimo_scene(15.0)
    sd = s.compile()
    spp = 1 << 12
    sig_d, n_d = receive_pallas(s, sd, rx, spp=spp, seed=3, max_depth=2,
                                time_sampling='gate', interpret=True,
                                mimo=True)
    sig_d = np.asarray(sig_d)
    cube_d = np.moveaxis(np.stack([sig_d[..., 0::2], sig_d[..., 1::2]], -1),
                         2, 0)                 # (E, n_time, n_freq, 2)

    mesh = make_mimo_mesh(chan=2, ray=1, devices=jax.devices()[:2])
    iq_s, n_s = receive_mimo_sharded_pallas(s, sd, rx, mesh,
                                            spp_per_device=spp, seed=3,
                                            max_depth=2, interpret=True)
    assert n_s == n_d
    np.testing.assert_array_equal(cube_d, np.asarray(iq_s))

    mesh2 = make_mimo_mesh(chan=2, ray=2, devices=jax.devices()[:4])
    iq_2, n_2 = receive_mimo_sharded_pallas(s, sd, rx, mesh2,
                                            spp_per_device=spp, seed=3,
                                            max_depth=2, interpret=True)
    assert n_2 == 2 * spp
    e1 = np.abs(cube_d).sum() / n_d
    e2 = np.abs(np.asarray(iq_2)).sum() / n_2
    assert e2 == pytest.approx(e1, rel=0.5)
