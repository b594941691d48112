"""Range-Doppler processing: dechirp, slow-time FFT, map assembly.

The reference produces range-Doppler implicitly through ADC (fast-time, freq)
binning plus outer Python frame loops (`python_scripts/animated_trans_rad.py`);
here the full coherent chain runs in XLA over a (pulses, samples) cube.
"""

from __future__ import annotations

import jax.numpy as jnp

from .pulse import correlate_full


def dechirp(rx, ref):
    """FMCW stretch processing: multiply by the conjugate reference chirp.
    rx, ref: (..., N) complex baseband at ADC rate."""
    return rx * jnp.conj(ref)


def range_fft(cube, window=None, n_fft: int | None = None):
    """Fast-time FFT of a dechirped FMCW cube -> beat-frequency (range) bins."""
    n = cube.shape[-1]
    if window is not None:
        cube = cube * window
    return jnp.fft.fft(cube, n_fft or n, axis=-1)


def doppler_fft(cube, window=None, n_fft: int | None = None):
    """Slow-time FFT across pulses (axis -2), fftshifted to centre zero
    Doppler."""
    n = cube.shape[-2]
    if window is not None:
        cube = cube * window[..., None]
    return jnp.fft.fftshift(jnp.fft.fft(cube, n_fft or n, axis=-2), axes=-2)


def range_doppler_map(cube, replica=None, range_window=None,
                      doppler_window=None, mode: str = 'pulse'):
    """Full map from a (pulses, samples) complex cube.

    mode 'pulse': matched-filter pulse compression along fast time, then
    slow-time FFT; mode 'fmcw': cube is already dechirped — range FFT then
    slow-time FFT.  Returns complex (doppler_bins, range_bins).
    """
    if mode == 'pulse':
        assert replica is not None
        rc = correlate_full(cube, replica)
        if range_window is not None:
            rc = rc * range_window
    else:
        rc = range_fft(cube, range_window)
    rd = doppler_fft(rc, doppler_window)
    return rd


def doppler_axis(n_pulses: int, prf: float):
    """Doppler frequency of each (fftshifted) slow-time bin [Hz]."""
    return (jnp.arange(n_pulses) - n_pulses // 2) * (prf / n_pulses)


def range_axis_pulse(n_samples: int, fs: float, c: float):
    """Range of each fast-time sample after pulse compression [m]
    (two-way: r = c t / 2)."""
    return jnp.arange(n_samples) / fs * c / 2.0


def range_axis_fmcw(n_fft: int, fs: float, chirp_slope: float, c: float):
    """Range of each beat-frequency bin for dechirped FMCW [m]."""
    f_beat = jnp.arange(n_fft) * (fs / n_fft)
    return f_beat * c / (2.0 * chirp_slope)
