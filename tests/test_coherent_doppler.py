"""Capstone: coherent pulse-train slow-time processing.

Simulates a coherent CPI (coherent processing interval): per-pulse coherent
I/Q receive of a moving target, slow-time FFT across pulses -> the Doppler
line appears at 2 v f / (c PRF) of the Doppler axis.  This exercises the
full chain the reference only sketches: coherent phase accumulation +
quasistatic inter-pulse motion + DSP (BASELINE.json config 3).
"""

import numpy as np
import pytest
import jax.numpy as jnp

import beifong_tpu as bt
from beifong_tpu import scene as sc
from beifong_tpu.bsdf import diffuse
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.core import transform as tf
from beifong_tpu.core.config import Band
from beifong_tpu.radar import cw, wigner_transmitter, omni_receiver, ADCConfig
from beifong_tpu.receive import receive
from beifong_tpu.dsp import rangedoppler as rd, windows

C, FC = 340.0, 40e3


def _scene(R):
    band = Band.from_freq(C, FC, 10e3)
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    s.add(wigner_transmitter("tx", cw(f_centre=FC), resample_freq=True))
    aim = np.asarray(tf.compose(tf.look_at([0.0, 0, 0], [0.0, -1, 0]),
                                tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    adcc = ADCConfig(n_time=2, n_freq=1, sampling_start=0.0,
                     sampling_time=0.04, freq_lo=35e3, freq_hi=45e3)
    rx = omni_receiver("rx", adcc, position=(0.0, 0.0, 0.0),
                       receive_type='raw')
    s.add(rx)
    tgt = np.asarray(tf.compose(tf.look_at([0, -R, 0], [0, 0, 0]),
                                tf.scale(0.3)))
    s.add(sh.rectangle(to_world=tgt, bsdf="mat"))
    return s, rx


def test_coherent_pulse_train_doppler():
    v = 1.0                      # closing speed [m/s]
    prf = 400.0                  # slow-time sample rate
    n_pulses = 16
    fd_true = 2 * v * FC / C     # 235.3 Hz Doppler

    iq = []
    for p in range(n_pulses):
        R = 4.0 - v * p / prf    # quasistatic inter-pulse motion
        s, rx = _scene(R)
        sd = s.compile()
        adc, n = receive(s, sd, rx, seed=11, spp=1 << 13, max_depth=2,
                         coherent=True, time_sampling='gate')
        a = np.asarray(adc)
        iq.append(complex(a[..., 0].sum(), a[..., 1].sum()))
    iq = np.asarray(iq)
    assert np.abs(iq).min() > 0

    spec = np.abs(np.asarray(rd.doppler_fft(
        jnp.asarray(iq[:, None]), window=windows.hann(n_pulses))))[:, 0]
    d_axis = np.asarray(rd.doppler_axis(n_pulses, prf))
    fd_est = abs(d_axis[spec.argmax()])
    # 235 Hz exceeds Nyquist (prf/2): expect the aliased line
    fd_folded = abs(((fd_true + prf / 2) % prf) - prf / 2)
    bin_w = prf / n_pulses       # 25 Hz bins
    assert fd_est == pytest.approx(fd_folded, abs=1.5 * bin_w), (
        f"Doppler {fd_est:.1f} Hz, expected folded {fd_folded:.1f} Hz")


def test_receive_cpi_animated_doppler():
    """receive_cpi + AnimatedTransform: the same Doppler line as the manual
    per-pulse rebuild loop above, but driven by a keyframed target motion
    (reference AnimatedTransform endpoint velocity, endpoint.h:165, made a
    framework feature instead of a script pattern)."""
    from beifong_tpu.core.transform import AnimatedTransform
    from beifong_tpu.receive import receive_cpi

    v = 1.0
    prf = 400.0
    n_pulses = 16
    fd_true = 2 * v * FC / C
    t_end = n_pulses / prf

    s, rx = _scene(4.0)
    # animate the target: R(t) = 4 - v t via two keyframes
    tgt = s.shapes[-1]
    m0 = np.asarray(tf.compose(tf.look_at([0, -4.0, 0], [0, 0, 0]),
                               tf.scale(0.3)))
    m1 = np.asarray(tf.compose(
        tf.look_at([0, -(4.0 - v * t_end), 0], [0, 0, 0]), tf.scale(0.3)))
    tgt.to_world = AnimatedTransform.from_keyframes([(0.0, m0),
                                                     (t_end, m1)])
    cube, n = receive_cpi(s, n_pulses=n_pulses, prf=prf, seed=11,
                          coherent=True, spp=1 << 13, max_depth=2,
                          time_sampling='gate')
    a = np.asarray(cube)
    iq = (a[..., 0] + 1j * a[..., 1]).sum(axis=(1, 2))
    assert np.abs(iq).min() > 0

    spec = np.abs(np.asarray(rd.doppler_fft(
        jnp.asarray(iq[:, None]), window=windows.hann(n_pulses))))[:, 0]
    d_axis = np.asarray(rd.doppler_axis(n_pulses, prf))
    fd_est = abs(d_axis[spec.argmax()])
    fd_folded = abs(((fd_true + prf / 2) % prf) - prf / 2)
    bin_w = prf / n_pulses
    assert fd_est == pytest.approx(fd_folded, abs=1.5 * bin_w), (
        f"Doppler {fd_est:.1f} Hz, expected folded {fd_folded:.1f} Hz")
