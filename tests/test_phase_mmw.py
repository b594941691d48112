"""MMW-scale coherent phase accuracy (round-1 VERDICT weak #7).

The baseband connection phase used to be computed as
`wf.phase(t_emit) - ref_phase(t_recv)` from absolute f32 times; at 94 GHz
f * ulp(t) exceeds whole cycles, silently decohering the I/Q accumulation.
`_echo_phase` (integrators/radar_path.py) recomputes it from the
double-single propagation delay.  These tests pin the numerics against a
float64 mirror of the same definition:

    phase = wf.phase64(t_emit) - ref.phase64(t_emit + tau + k*PRI)
            + n_boundary * boundary_phase        (mod 2 pi)

at MMW parameters (94 GHz carrier, ~100 m paths), and check the sonar
band is unchanged.
"""

import dataclasses
import types

import numpy as np
import pytest
import jax.numpy as jnp

from beifong_tpu.core.config import Band
from beifong_tpu.core import math as m
from beifong_tpu.integrators.radar_path import _echo_phase
from beifong_tpu.radar.waveform import cw, pulse, linfmcw, stack

C = 299792458.0


def _scene_stub(band, wf):
    return types.SimpleNamespace(band=band,
                                 transmitters=types.SimpleNamespace(wf=wf))


def _phase64(wf_row, t):
    """float64 mirror of Waveform.phase (waveform.py:72-80)."""
    kind = int(wf_row.kind)
    fc = np.float64(np.float32(wf_row.f_centre))
    prf = np.float64(np.float32(wf_row.rep_freq))
    text = np.float64(np.float32(wf_row.t_ext))
    fext = np.float64(np.float32(wf_row.f_ext))
    phi0 = np.float64(np.float32(wf_row.phi0))
    pri = 1.0 / prf
    tm = np.mod(t, pri)
    ti = 0.5 * text
    if kind == 2:  # LINFMCW
        s = fext / text
        dtc = tm - ti
        return phi0 + 2 * np.pi * dtc * (fc + 0.5 * s * dtc)
    return phi0 + 2 * np.pi * tm * fc


def _ref_phase64(band, lo_wf, t):
    if lo_wf is not None:
        return _phase64(lo_wf, t)
    fc = 0.5 * (band.freq_min + band.freq_max)
    return 2 * np.pi * np.float64(fc) * t


def _expected(band, wf_row, lo_wf, plen_hi, plen_lo, extra, t_emit, k,
              n_boundary):
    tau = (np.float64(plen_hi) + np.float64(plen_lo)
           + np.float64(extra)) / band.c
    prf = np.float64(np.float32(wf_row.rep_freq))
    pri_f32 = np.float64(np.float32(1.0 / np.float32(max(prf, 1e-12))))
    t_recv = np.float64(t_emit) + tau + np.float64(k) * pri_f32
    ph = (_phase64(wf_row, np.float64(t_emit))
          - _ref_phase64(band, lo_wf, t_recv)
          + n_boundary * band.boundary_phase)
    return np.mod(ph, 2 * np.pi)


def _run_case(band, wf, lo_wf, plen_val, extra, t_emit, k, n_boundary,
              tol_rad):
    scene = _scene_stub(band, stack([wf]))
    n = len(plen_val)
    hi = jnp.asarray(plen_val, jnp.float32)
    lo_res = jnp.asarray(np.asarray(plen_val, np.float64)
                         - np.asarray(np.asarray(plen_val, np.float32),
                                      np.float64), jnp.float32)
    plen_ds = (hi, lo_res)
    t_recv = (jnp.asarray(t_emit, jnp.float32)
              + (hi + jnp.asarray(extra, jnp.float32)) / jnp.float32(band.c)
              + jnp.asarray(k, jnp.float32) / jnp.float32(wf.rep_freq))
    got = np.asarray(_echo_phase(
        scene, jnp.zeros((n,), jnp.int32), lo_wf, plen_ds,
        jnp.asarray(extra, jnp.float32), jnp.asarray(t_emit, jnp.float32),
        jnp.asarray(k, jnp.float32), t_recv,
        n_boundary, band.boundary_phase))
    for i in range(n):
        want = _expected(band, wf, lo_wf,
                         np.float32(plen_val[i]), float(lo_res[i]),
                         np.float32(extra[i]), np.float32(t_emit[i]),
                         k[i], n_boundary)
        d = np.mod(got[i] - want + np.pi, 2 * np.pi) - np.pi
        assert abs(d) < tol_rad, (
            f"lane {i}: got {got[i]:.6f} want {want:.6f} (err {d:.2e} rad)")


def test_mmw_tone_phase_matches_f64():
    """94 GHz pulse train, 30-300 m paths, fixed + gated (k>0) times."""
    band = Band.from_freq(C, 94e9, 2e9, boundary_phase=np.pi)
    wf = pulse(f_centre=94e9, prf=1e4, pulse_len=1e-6, f_ext=2e8,
               is_delta=True)
    rng = np.random.default_rng(0)
    n = 64
    plen = rng.uniform(30.0, 300.0, n)
    extra = rng.uniform(0.0, 50.0, n).astype(np.float32)
    t_emit = rng.uniform(0.0, 1e-6, n).astype(np.float32)
    k = rng.integers(0, 4, n).astype(np.float32)
    _run_case(band, wf, None, plen, extra, t_emit, k, 1, 2e-3)


def test_mmw_cw_phase_matches_f64():
    band = Band.from_freq(C, 94e9, 1e6, boundary_phase=0.0)
    wf = cw(f_centre=94e9)
    rng = np.random.default_rng(1)
    n = 64
    plen = rng.uniform(10.0, 500.0, n)
    extra = np.zeros(n, np.float32)
    t_emit = rng.uniform(0.0, 5e-4, n).astype(np.float32)
    k = np.zeros(n, np.float32)
    _run_case(band, wf, None, plen, extra, t_emit, k, 0, 2e-3)


def test_mmw_fmcw_dechirp_phase_matches_f64():
    """Matched dechirp (LO = tx chirp): the beat phase must be accurate to
    milliradians at 77 GHz with a 1 GHz sweep — this is the term FMCW
    imaging relies on."""
    band = Band.from_freq(C, 77e9, 1e9, boundary_phase=np.pi)
    wf = linfmcw(f_centre=77e9, crf=1e3, chirp_len=9e-4, freq_sweep=1e9,
                 is_delta=True)
    rng = np.random.default_rng(2)
    n = 64
    plen = rng.uniform(5.0, 150.0, n)
    extra = rng.uniform(0.0, 20.0, n).astype(np.float32)
    t_emit = rng.uniform(1e-5, 8e-4, n).astype(np.float32)
    k = np.zeros(n, np.float32)
    _run_case(band, wf, wf, plen, extra, t_emit, k, 1, 5e-3)


def test_sonar_phase_agrees_with_direct_difference():
    """At 40 kHz both formulations are accurate; the new delay-based one
    must reproduce the old direct difference (regression guard for every
    existing coherent test)."""
    band = Band.from_freq(340.0, 40e3, 10e3)
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
               is_delta=True)
    rng = np.random.default_rng(3)
    n = 64
    plen = rng.uniform(1.0, 30.0, n)
    extra = rng.uniform(0.0, 10.0, n).astype(np.float32)
    t_emit = rng.uniform(0.0, 2e-3, n).astype(np.float32)
    k = rng.integers(0, 2, n).astype(np.float32)
    _run_case(band, wf, None, plen, extra, t_emit, k, 1, 1e-3)


def _mmw_cpi_scene(R):
    """94 GHz monostatic CW scene: rect tx aperture + omni rx at origin,
    diffuse plate at range R (megakernel-supported shape set)."""
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tf
    from beifong_tpu.radar import (cw as cw_mk, wigner_transmitter,
                                   omni_receiver, ADCConfig)

    fc = 94e9
    band = Band.from_freq(C, fc, 2e9, boundary_phase=np.pi)
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    s.add(wigner_transmitter("tx", cw_mk(f_centre=fc), resample_freq=True))
    aim = np.asarray(tf.compose(tf.look_at([0.0, 0, 0], [0.0, -1, 0]),
                                tf.scale([0.02, 0.02, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    adcc = ADCConfig(n_time=2, n_freq=1, sampling_start=0.0,
                     sampling_time=1e-6, freq_lo=fc - 1e9, freq_hi=fc + 1e9)
    rx = omni_receiver("rx", adcc, position=(0.0, 0.0, 0.0),
                       receive_type='raw')
    s.add(rx)
    tgt = np.asarray(tf.compose(tf.look_at([0, -R, 0], [0, 0, 0]),
                                tf.scale(0.5)))
    s.add(sh.rectangle(to_world=tgt, bsdf="mat"))
    return s, rx


def _cpi_doppler(receive_one, n_pulses=8, dR=0.4e-3, R0=20.0):
    """Frozen-speckle CPI: same seed per pulse, target retreats... closes by
    dR each pulse; returns (|FFT|^2, expected bin, phase-step cycles)."""
    fc = 94e9
    iq = []
    for p in range(n_pulses):
        iq.append(receive_one(R0 - dR * p))
    iq = np.asarray(iq)
    dop = np.abs(np.fft.fft(iq)) ** 2
    step_cycles = 2 * dR * fc / C
    exp_bin = int(round((step_cycles % 1.0) * n_pulses)) % n_pulses
    return dop, exp_bin, step_cycles


def test_mmw_doppler_line_jnp():
    """94 GHz frozen-speckle CPI through the jnp wavefront: the slow-time
    line only survives if the per-connection phase tracks the 0.125-lambda
    per-pulse range step — the old absolute-time phase difference aliased
    by whole cycles at MMW and destroyed it."""
    from beifong_tpu.receive import receive

    def one(R):
        s, rx = _mmw_cpi_scene(R)
        a, n = receive(s, receiver=rx, seed=11, spp=1 << 12, max_depth=2,
                       coherent=True, time_sampling='gate')
        g = np.asarray(a)
        return complex(g[..., 0].sum(), g[..., 1].sum())

    dop, exp_bin, _ = _cpi_doppler(one)
    assert int(dop.argmax()) == exp_bin
    peak = np.sort(dop)[-1]
    assert peak / max(np.sort(dop)[-2], 1e-300) > 5.0


def test_mmw_doppler_line_megakernel():
    """Same CPI through the Pallas megakernel (interpret mode): its
    delay-based echo_phase must hold the line too."""
    from beifong_tpu.integrators.pallas_receive import receive_pallas

    def one(R):
        s, rx = _mmw_cpi_scene(R)
        sd = s.compile()
        out, n = receive_pallas(s, sd, rx, spp=1 << 12, seed=3, max_depth=2,
                                time_sampling='gate', interpret=True,
                                coherent=True)
        a = np.asarray(out)
        return complex(a[..., 0].sum(), a[..., 1].sum())

    dop, exp_bin, _ = _cpi_doppler(one)
    assert int(dop.argmax()) == exp_bin
    peak = np.sort(dop)[-1]
    assert peak / max(np.sort(dop)[-2], 1e-300) > 5.0


def test_double_single_helpers():
    """ds_mul / ds_const / cyc_frac_prod against float64."""
    v = 94e9 / C
    hi, lo = m.ds_const(v)
    assert float(hi) + float(lo) == pytest.approx(v, rel=1e-14)
    a = m.ds_const(313.5551)
    b = m.ds_inv(jnp.float32(9.7))
    prod = m.ds_mul(a, b)
    want = 313.5551 / np.float64(np.float32(9.7))
    assert float(prod[0]) + float(prod[1]) == pytest.approx(want, rel=1e-11)
    t = jnp.asarray([1.0e-3, 2.5e-4, 7.7e-2], jnp.float32)
    got = np.asarray(m.cyc_frac_prod(m.ds_const(94e9), t))
    want = np.mod(94e9 * np.asarray(t, np.float64), 1.0)
    err = np.abs(np.mod(got - want + 0.5, 1.0) - 0.5)
    assert err.max() < 1e-4
