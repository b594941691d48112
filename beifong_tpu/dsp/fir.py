"""FIR design + reference waveform synthesis (host/numpy + XLA eval)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def design_lowpass(n_taps: int, cutoff: float, window: str = 'hamming'):
    """Windowed-sinc lowpass; cutoff as fraction of Nyquist (0..1).
    Pure jnp so callers can sit under jit (the taps are constant-folded
    at trace time — n_taps/cutoff are static)."""
    from . import windows
    m = n_taps - 1
    k = jnp.arange(n_taps, dtype=jnp.float32) - m / 2.0
    h = jnp.sinc(cutoff * k) * windows.get(window, n_taps)
    return (h / h.sum()).astype(jnp.float32)


def lfm_chirp(n: int, fs: float, f0: float, bandwidth: float, duration: float,
              complex_baseband: bool = True):
    """Sampled linear-FM chirp replica for matched filtering.

    Returns a length-n array (zero-padded past `duration`); baseband complex
    or real passband at start frequency f0.
    """
    t = jnp.arange(n, dtype=jnp.float32) / fs
    k = bandwidth / duration
    active = t < duration
    if complex_baseband:
        ph = 2 * jnp.pi * (0.5 * k * t * t + (f0) * t)
        sig = jnp.exp(1j * ph.astype(jnp.float32))
    else:
        ph = 2 * jnp.pi * (f0 * t + 0.5 * k * t * t)
        sig = jnp.cos(ph)
    return jnp.where(active, sig, 0.0)
