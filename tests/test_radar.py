"""Radar end-to-end physics tests.

Fixes the reference's biggest testing gap (SURVEY.md §4: "radar components
are effectively untested"): analytic point-target returns, waveform WDF
properties, FMCW beat-frequency law, and film-mode range profiles.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import beifong_tpu as bt
from beifong_tpu import scene as sc, emitters as em, sensors as sn
from beifong_tpu.bsdf import diffuse
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.core import transform as tf
from beifong_tpu.core.config import Band
from beifong_tpu.radar import (linfmcw, pulse, cw, wigner_transmitter,
                               wigner_receiver, ADCConfig)
from beifong_tpu.receive import receive, develop_signal, render_binned

C = 340.0  # sonar in air


def _sonar_band(fc=40e3, bw=10e3):
    return Band.from_freq(C, fc, bw)


def test_waveform_wdf_properties():
    wf = linfmcw(f_centre=40e3, crf=10.0, chirp_len=0.05, freq_sweep=2e3)
    # On-ridge value at chirp centre = 2 a^2 w
    t = jnp.float32(0.025)  # centre of chirp (ti = t_ext/2)
    f = wf.inst_freq(t)
    assert float(f) == pytest.approx(40e3, rel=1e-6)
    assert float(wf.eval_wdf(t, f)) == pytest.approx(2 * 0.05, rel=1e-4)
    # Instantaneous frequency sweeps linearly: at chirp start f = fc - sweep/2
    assert float(wf.inst_freq(jnp.float32(0.0))) == pytest.approx(39e3, rel=1e-4)
    assert float(wf.inst_freq(jnp.float32(0.05))) == pytest.approx(41e3, rel=1e-4)
    # Periodic in the CRF
    assert float(wf.inst_freq(jnp.float32(0.1 + 0.02))) == pytest.approx(
        float(wf.inst_freq(jnp.float32(0.02))), rel=1e-4)


def test_pulse_wdf_time_gating():
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=1e-3, f_ext=2e3)
    f = jnp.float32(40e3)
    assert float(wf.eval_wdf(jnp.float32(0.5e-3), f)) > 0
    assert float(wf.eval_wdf(jnp.float32(5e-3), f)) == 0.0


def _point_target_scene(R=4.0, pulse_len=2e-3, target_size=0.5):
    """Small Tx/Rx apertures at origin facing -y; diffuse square target at
    distance R."""
    band = _sonar_band()
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=pulse_len, f_ext=2e3,
               is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    aim = np.asarray(tf.compose(tf.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))

    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
    rx = wigner_receiver("rx", adc, receive_type='raw')
    s.add(rx)
    aim_rx = np.asarray(tf.compose(tf.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                                   tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))

    tgt = np.asarray(tf.compose(tf.look_at([0, -R, 0], [0, 0, 0]),
                                tf.scale(target_size)))
    s.add(sh.rectangle(to_world=tgt, bsdf="mat"))
    return s, rx


def test_point_target_round_trip_delay():
    """Received power must peak at fast time 2R/c + pulse centre."""
    R = 4.0
    pulse_len = 2e-3
    s, rx = _point_target_scene(R=R, pulse_len=pulse_len)
    adc, n = receive(s, receiver=rx, spp=1 << 15, max_depth=2, seed=0)
    sig = np.asarray(develop_signal(adc, n, rx.adc))[:, 0, 0]
    assert sig.sum() > 0, "no signal received"
    t_axis = (np.arange(64) + 0.5) / 64 * rx.adc.sampling_time
    t_expect = 2 * R / C + pulse_len / 2
    t_peak = t_axis[np.argmax(sig)]
    bin_w = rx.adc.sampling_time / 64
    assert abs(t_peak - t_expect) < 2.5 * bin_w, (
        f"peak at {t_peak*1e3:.2f} ms, expected {t_expect*1e3:.2f} ms")
    # Received energy should be concentrated around the return
    window = (np.abs(t_axis - t_expect) < pulse_len)
    assert sig[window].sum() > 0.8 * sig.sum()


def test_fmcw_beat_frequency():
    """FMCW dechirp: beat frequency = sweep-slope * 2R/c."""
    R = 6.0
    band = Band.from_freq(C, 40e3, 4e3)
    chirp_len, sweep = 0.09, 2e3
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    wf = linfmcw(f_centre=40e3, crf=1.0 / chirp_len, chirp_len=chirp_len,
                 freq_sweep=sweep, is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    aim = np.asarray(tf.compose(tf.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))

    f_beat_expect = sweep / chirp_len * 2 * R / C
    adc = ADCConfig(n_time=8, n_freq=128, sampling_start=0.03,
                    sampling_time=0.05, freq_lo=0.0, freq_hi=4 * f_beat_expect)
    rx = wigner_receiver("rx", adc, receive_type='mix_resample', lo_waveform=wf)
    s.add(rx)
    aim_rx = np.asarray(tf.compose(tf.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                                   tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
    tgt = np.asarray(tf.compose(tf.look_at([0, -R, 0], [0, 0, 0]),
                                tf.scale(0.5)))
    s.add(sh.rectangle(to_world=tgt, bsdf="mat"))

    adc_g, n = receive(s, receiver=rx, spp=1 << 15, max_depth=2, seed=1)
    spectrum = np.asarray(develop_signal(adc_g, n, rx.adc)).sum(axis=0)[:, 0]
    f_axis = (np.arange(128) + 0.5) / 128 * (4 * f_beat_expect)
    f_peak = f_axis[np.argmax(spectrum)]
    bin_w = 4 * f_beat_expect / 128
    assert spectrum.sum() > 0
    assert abs(f_peak - f_beat_expect) < 3 * bin_w, (
        f"beat at {f_peak:.1f} Hz, expected {f_beat_expect:.1f} Hz")


def test_film_mode_range_profile():
    """trans_rad.xml-equivalent: spot emitter + fluxmeter antenna + target;
    the binned path-length histogram must peak at the round-trip range
    (reference `python_scripts/trans_rad.py:51-75` semantics)."""
    R = 4.0
    s = sc.Scene(band=_sonar_band())
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    s.add(em.spot("txspot", intensity=1.0, cutoff_angle=25.0, beam_width=20.0,
                  to_world=np.asarray(tf.look_at([0, 0, 0], [0, -1, 0]))))
    s.add(sn.fluxmeter("ant", film_size=(1, 1), spp=4096))
    ant = np.asarray(tf.compose(tf.look_at([0, 0, 0], [0, -1, 0]),
                                tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=ant, sensor="ant"))
    tgt = np.asarray(tf.compose(tf.look_at([0, -R, 0], [0, 0, 0]),
                                tf.scale(1.0)))
    s.add(sh.rectangle(to_world=tgt, bsdf="mat"))

    grid, n = render_binned(s, n_bins=50, bin_width=0.2, quantity='length',
                            spp=1 << 14, max_depth=3, seed=2)
    prof = np.asarray(grid)[0, :, 0]
    assert prof.sum() > 0
    r_axis = (np.arange(50) + 0.5) * 0.2
    # Round trip spot->target->antenna = 2R = 8 m
    peak_r = r_axis[np.argmax(prof)]
    assert abs(peak_r - 2 * R) < 0.45, f"peak at {peak_r} m, expected {2*R} m"


@pytest.mark.slow
def test_time_gate_importance_sampling():
    """Deferred time-gate sampling must reproduce the fixed-time estimator
    (same peak, consistent energy) at a fraction of the samples.

    Scene choices are variance-motivated, not physics-motivated: the target
    fits inside the rx WDF mainlobe (half-angle 3.6 deg < first null at
    4.9 deg) so the signed-sinc cancellation that dominates larger targets
    is absent, and fixed mode uses the stratified sampler so the number of
    in-gate time draws per batch is near-deterministic.  Measured over 8
    seeds: fixed rel-std 0.17 (multijitter, 32k spp), gate rel-std ~0.14
    (independent, 8k spp) -> the rel=0.2 bound is ~2.5 sigma (was rel=0.7
    before the WDF-mainlobe mixture direction sampler in rx_sample_ray)."""
    R = 4.0
    pulse_len = 6e-3
    s, rx = _point_target_scene(R=R, pulse_len=pulse_len, target_size=0.25)
    sd = s.compile()
    f_tot, g_tot = [], []
    f_prof = g_prof = 0
    for seed in range(8):
        a, n = receive(s, sd, rx, seed=seed, spp=1 << 15, max_depth=2,
                       time_sampling='fixed', sampler='multijitter')
        sig = np.asarray(develop_signal(a, n, rx.adc))[:, 0, 0]
        f_prof = f_prof + sig
        f_tot.append(sig.sum())
        a, n = receive(s, sd, rx, seed=seed, spp=1 << 13, max_depth=2,
                       time_sampling='gate')
        sig = np.asarray(develop_signal(a, n, rx.adc))[:, 0, 0]
        g_prof = g_prof + sig
        g_tot.append(sig.sum())
    # same round-trip peak bin, consistent total energy (gate uses 4x fewer
    # samples and still has comparable spread)
    assert abs(int(np.argmax(f_prof)) - int(np.argmax(g_prof))) <= 1
    assert np.mean(g_tot) == pytest.approx(np.mean(f_tot), rel=0.2)


def test_rx_aperture_mixture_variance():
    """The WDF-mainlobe mixture direction sampler (rx_sample_ray with a
    wavelength) must estimate the same first-bounce flux as plain cosine
    sampling (wavelength=None) with materially lower variance for a
    directive aperture (w/lambda ~ 5.9 here).  This pins the measured
    variance ratio the round-1 review asked for."""
    import jax
    from beifong_tpu.radar.endpoints import rx_sample_ray, rx_aperture_weight

    s, rx = _point_target_scene(R=4.0, pulse_len=2e-3)
    sd = s.compile()
    shape_idx = s.shape_index_of_endpoint('receiver', rx.id)
    lam = C / 40e3

    # target rect: unit square at y=-4 facing +y (world x/z in [-0.5, 0.5])
    def batch_means(wavelength, n_batch=48, n=4096):
        vals = []
        for b in range(n_batch):
            key = jax.random.key(b)
            u_pos = jax.random.uniform(key, (n, 2))
            u_dir = jax.random.uniform(jax.random.fold_in(key, 1), (n, 2))
            t = jnp.zeros((n,))
            o, d, w = rx_sample_ray(sd, rx, shape_idx, t, u_pos, u_dir,
                                    wavelength=wavelength)
            w = w * rx_aperture_weight(sd, rx, shape_idx, o, d, lam)
            o, d, w = np.asarray(o), np.asarray(d), np.asarray(w)
            tt = (-4.0 - o[:, 1]) / np.where(np.abs(d[:, 1]) > 1e-9,
                                             d[:, 1], 1e-9)
            hx = o[:, 0] + tt * d[:, 0]
            hz = o[:, 2] + tt * d[:, 2]
            hit = (tt > 0) & (np.abs(hx) <= 0.5) & (np.abs(hz) <= 0.5)
            vals.append(float(np.mean(w * hit)))
        return np.array(vals)

    mix = batch_means(lam)
    cos = batch_means(None)
    # unbiasedness: means agree within combined standard error
    se = np.hypot(mix.std() / np.sqrt(mix.size), cos.std() / np.sqrt(cos.size))
    assert abs(mix.mean() - cos.mean()) < 4 * se, (
        f"mixture {mix.mean():.4g} vs cosine {cos.mean():.4g}, se {se:.2g}")
    # measured variance ratio (>= 2x was observed; assert a safe floor)
    ratio = cos.var() / max(mix.var(), 1e-300)
    assert ratio > 1.5, f"variance ratio {ratio:.2f}"


def test_doppler_shift_moving_target():
    """A closing target shifts the received frequency up by 2 v f / c."""
    R = 4.0
    v = 10.0       # closing speed toward the radar (+y direction)
    band = Band.from_freq(C, 40e3, 10e3)
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    wf = cw(f_centre=40e3, is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    aim = np.asarray(tf.compose(tf.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    f_shift = 2 * v * 40e3 / C   # ~2353 Hz
    adc = ADCConfig(n_time=4, n_freq=256, sampling_start=0.0,
                    sampling_time=0.05, freq_lo=39.5e3, freq_hi=44.5e3)
    rx = wigner_receiver("rx", adc, receive_type='raw')
    s.add(rx)
    aim_rx = np.asarray(tf.compose(tf.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                                   tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
    tgt = np.asarray(tf.compose(tf.look_at([0, -R, 0], [0, 0, 0]),
                                tf.scale(0.5)))
    s.add(sh.rectangle(to_world=tgt, bsdf="mat",
                       velocity=np.array([0, v, 0], np.float32)))

    adc_g, n = receive(s, receiver=rx, spp=1 << 14, max_depth=2, seed=3)
    spec = np.asarray(develop_signal(adc_g, n, rx.adc)).sum(axis=0)[:, 0]
    f_axis = 39.5e3 + (np.arange(256) + 0.5) / 256 * 5e3
    f_peak = f_axis[np.argmax(spec)]
    assert spec.sum() > 0
    bin_w = 5e3 / 256
    assert abs(f_peak - (40e3 + f_shift)) < 3 * bin_w, (
        f"peak {f_peak:.0f} Hz, expected {40e3 + f_shift:.0f} Hz")


def _fmcw_scene(receive_type, resample_tx=True, dR=0.0):
    """Shared FMCW point-target scene for receive-type tests.
    `dR` nudges the target range (sub-wavelength coherent-phase tests)."""
    R = 6.0 + dR
    band = Band.from_freq(C, 40e3, 4e3)
    chirp_len, sweep = 0.09, 2e3
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    wf = linfmcw(f_centre=40e3, crf=1.0 / chirp_len, chirp_len=chirp_len,
                 freq_sweep=sweep, is_delta=resample_tx)
    s.add(wigner_transmitter("tx", wf, resample_freq=resample_tx))
    aim = np.asarray(tf.compose(tf.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    f_beat_expect = sweep / chirp_len * 2 * R / C
    adc = ADCConfig(n_time=8, n_freq=128, sampling_start=0.03,
                    sampling_time=0.05, freq_lo=0.0, freq_hi=4 * f_beat_expect)
    rx = wigner_receiver("rx", adc, receive_type=receive_type, lo_waveform=wf)
    s.add(rx)
    aim_rx = np.asarray(tf.compose(tf.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                                   tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
    tgt = np.asarray(tf.compose(tf.look_at([0, -R, 0], [0, 0, 0]),
                                tf.scale(0.5)))
    s.add(sh.rectangle(to_world=tgt, bsdf="mat"))
    return s, rx, f_beat_expect


def test_mixer_beat_frequency():
    """`mixer` receive type (reference design comment,
    `integrator.cpp:1626-1636`): the beat axis is importance-sampled, yet
    the binned spectrum must still peak at beat = slope * 2R/c."""
    s, rx, f_beat_expect = _fmcw_scene('mixer')
    adc_g, n = receive(s, receiver=rx, spp=1 << 15, max_depth=2, seed=3)
    spectrum = np.asarray(develop_signal(adc_g, n, rx.adc)).sum(axis=0)[:, 0]
    f_axis = (np.arange(128) + 0.5) / 128 * (4 * f_beat_expect)
    f_peak = f_axis[np.argmax(spectrum)]
    bin_w = 4 * f_beat_expect / 128
    assert spectrum.sum() > 0
    assert abs(f_peak - f_beat_expect) < 3 * bin_w, (
        f"mixer beat at {f_peak:.1f} Hz, expected {f_beat_expect:.1f} Hz")


def test_raw_resample_follows_lo_delta():
    """`raw_resample` draws the rx frequency from the LO instantaneous-
    frequency delta (`wignerreceiver.cpp::sample_delta_frequency:152-167`)
    rather than uniformly over the band; without an LO it degrades to raw
    (the reference's raw/raw_resample branches are literally identical)."""
    from beifong_tpu.radar.endpoints import rx_sample_frequency
    band = Band.from_freq(C, 40e3, 4e3)
    wf = linfmcw(f_centre=40e3, crf=10.0, chirp_len=0.09, freq_sweep=2e3)
    t = jnp.full((256,), 0.02)
    u = jnp.linspace(0.0, 1.0, 256)
    f_rs, _ = rx_sample_frequency('raw_resample', wf, band, t, u)
    np.testing.assert_allclose(np.asarray(f_rs),
                               np.asarray(wf.inst_freq(t)), rtol=1e-6)
    f_raw, _ = rx_sample_frequency('raw', wf, band, t, u)
    assert np.asarray(f_raw).std() > 100.0          # spread over the band
    f_deg, _ = rx_sample_frequency('raw_resample', None, band, t, u)
    np.testing.assert_allclose(np.asarray(f_deg), np.asarray(f_raw))


def test_raw_resample_end_to_end():
    """raw_resample end-to-end: all received energy lands at the (static-
    target) received frequency = the chirp band on the raw frequency axis."""
    R = 6.0
    band = Band.from_freq(C, 40e3, 4e3)
    chirp_len, sweep = 0.09, 2e3
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    wf = linfmcw(f_centre=40e3, crf=1.0 / chirp_len, chirp_len=chirp_len,
                 freq_sweep=sweep, is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    aim = np.asarray(tf.compose(tf.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    adc = ADCConfig(n_time=8, n_freq=64, sampling_start=0.03,
                    sampling_time=0.05, freq_lo=38e3, freq_hi=42e3)
    rx = wigner_receiver("rx", adc, receive_type='raw_resample',
                         lo_waveform=wf)
    s.add(rx)
    aim_rx = np.asarray(tf.compose(tf.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                                   tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
    tgt = np.asarray(tf.compose(tf.look_at([0, -R, 0], [0, 0, 0]),
                                tf.scale(0.5)))
    s.add(sh.rectangle(to_world=tgt, bsdf="mat"))
    adc_g, n = receive(s, receiver=rx, spp=1 << 14, max_depth=2, seed=5)
    spectrum = np.asarray(develop_signal(adc_g, n, rx.adc)).sum(axis=0)[:, 0]
    f_axis = 38e3 + (np.arange(64) + 0.5) / 64 * 4e3
    assert spectrum.sum() > 0
    # static target: all energy inside the swept band [39, 41] kHz
    inband = (f_axis >= 39e3 - 100) & (f_axis <= 41e3 + 100)
    assert spectrum[inband].sum() > 0.99 * spectrum.sum()


def _array_factor(u, locs_x, wl, steer_deg):
    """Closed-form power array factor |sum_e exp(i k x_e (u - u0))|^2."""
    u0 = np.sin(np.deg2rad(steer_deg))
    ph = 2.0 * np.pi * locs_x[None, :] * (u[:, None] - u0) / wl
    s = np.exp(1j * ph).sum(axis=1)
    return np.abs(s) ** 2


def test_phased_rx_steering_pattern():
    """Phased receiver steered off-boresight: Monte-Carlo aperture
    integration of the cross-WDF (positions sampled across the ARRAY extent
    by rx_sample_ray, reference `phasedreceiver.cpp:314-341`) must
    reproduce the closed-form array factor: main lobe at the steer angle,
    deep first null at u0 + lambda/(E d)."""
    from beifong_tpu.radar import phased_receiver, ADCConfig
    from beifong_tpu.radar.endpoints import (rx_sample_ray,
                                             rx_aperture_weight, _elem_locs)
    import jax

    band = bt.band_preset("sonar_40k_narrow")
    wl = band.wavelength_centre
    E, steer = 8, 15.0
    spacing = wl / 2.0
    adc = ADCConfig(n_time=16, n_freq=1, sampling_start=0.0,
                    sampling_time=0.05, freq_lo=39e3, freq_hi=41e3)
    rx = phased_receiver("rx", adc, n_elems=E, elem_spacing=spacing,
                         elem_wid=(wl / 4, wl / 4), steer_deg=steer)
    s = sc.Scene(band=band)
    s.add(rx)
    # attached rect much SMALLER than the array: position sampling must
    # still cover the array extent (the old code sampled only the rect)
    s.add(sh.rectangle(to_world=np.asarray(tf.scale(1e-4)), receiver="rx"))
    sd = s.compile()
    sidx = s.shape_index_of_endpoint('receiver', rx.id)

    n = 1 << 14
    k = jax.random.split(jax.random.key(0), 2)
    u_pos = jax.random.uniform(k[0], (n, 2))
    u_dir = jax.random.uniform(k[1], (n, 2))
    o, _, w0 = rx_sample_ray(sd, rx, sidx, jnp.zeros((n,)), u_pos, u_dir)
    # sampled positions must span the array, not the 1e-4 rect
    locs = _elem_locs(rx)
    span = np.abs(locs[:, 0]).max() + wl / 4
    xs = np.asarray(o)[:, 0]
    assert xs.max() > 0.8 * span and xs.min() < -0.8 * span

    thetas = np.deg2rad(np.linspace(-60, 60, 241))
    u_grid = np.sin(thetas)
    P = []
    for th in thetas:
        d = jnp.broadcast_to(
            jnp.asarray([np.sin(th), 0.0, np.cos(th)], jnp.float32), (n, 3))
        W = rx_aperture_weight(sd, rx, sidx, o, d,
                               jnp.full((n,), wl, jnp.float32))
        P.append(float(jnp.mean(w0 * W)))
    P = np.asarray(P)
    af = _array_factor(u_grid, locs[:, 0], wl, steer)

    # main lobe at the steer angle
    th_peak = np.rad2deg(thetas[P.argmax()])
    assert abs(th_peak - steer) < 2.0, th_peak
    # first-null depth: AF null at u0 + lambda/(E*spacing)
    u_null = np.sin(np.deg2rad(steer)) + wl / (E * spacing)
    i_null = np.argmin(np.abs(u_grid - u_null))
    assert P[i_null] < 0.05 * P.max(), (P[i_null], P.max())
    # pattern matches the closed form across the sweep
    corr = np.corrcoef(P, af)[0, 1]
    assert corr > 0.95, corr


@pytest.mark.slow
def test_phased_tx_steering_pattern():
    """Phased transmitter steering: aperture-integrated tx gain peaks at
    the steer angle (steering phases baked at the band-centre wavelength
    via Scene.compile — regression for the lambda=1m bake bug)."""
    from beifong_tpu.radar import phased_transmitter, cw
    from beifong_tpu.radar.endpoints import tx_aperture_gain, _elem_locs
    import jax

    band = bt.band_preset("sonar_40k_narrow")
    wl = band.wavelength_centre
    E, steer = 8, -20.0
    spacing = wl / 2.0
    txs = phased_transmitter("tx", cw(40e3), n_elems=E, elem_spacing=spacing,
                             elem_wid=(wl / 4, wl / 4), steer_deg=steer,
                             resample_freq=True)
    s = sc.Scene(band=band)
    s.add(txs)
    s.add(sh.rectangle(to_world=np.asarray(tf.scale(1.0)), transmitter="tx"))
    sd = s.compile()

    locs = _elem_locs(txs)
    n = 1 << 13
    key = jax.random.key(1)
    hx = np.abs(locs[:, 0]).max() + wl / 4
    px = (jax.random.uniform(key, (n,)) * 2 - 1) * hx
    p = jnp.stack([px, jnp.zeros_like(px), jnp.zeros_like(px)], -1)

    thetas = np.deg2rad(np.linspace(-60, 60, 121))
    P = []
    for th in thetas:
        d = jnp.broadcast_to(
            jnp.asarray([np.sin(th), 0.0, np.cos(th)], jnp.float32), (n, 3))
        g = tx_aperture_gain(sd, jnp.zeros((n,), jnp.int32), p, d,
                             jnp.full((n,), wl, jnp.float32))
        P.append(float(jnp.mean(g)))
    P = np.asarray(P)
    th_peak = np.rad2deg(thetas[P.argmax()])
    assert abs(th_peak - steer) < 2.5, th_peak
    af = _array_factor(np.sin(thetas), locs[:, 0], wl, steer)
    corr = np.corrcoef(P, af)[0, 1]
    assert corr > 0.9, corr
