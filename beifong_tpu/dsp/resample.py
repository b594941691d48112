"""Polyphase resampling to ADC rate (all-XLA).

The reference's intended chain resamples the simulated signal to the ADC
sample rate (design comments, `integrator.cpp:1011-1109`); here: windowed-sinc
anti-alias FIR + polyphase up/down implemented as a strided gather + matmul
(MXU-friendly: taps x phases as a dense (P, K) bank).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .fir import design_lowpass


def resample_poly(x, up: int, down: int, taps_per_phase: int = 16):
    """Rational-rate resampling by up/down with a polyphase FIR.

    x: (..., N) real or complex.  Returns (..., ceil(N*up/down)).
    """
    g = math.gcd(up, down)
    up //= g
    down //= g
    if up == 1 and down == 1:
        return x
    n_taps = taps_per_phase * up
    cutoff = 1.0 / max(up, down)
    h = design_lowpass(n_taps, cutoff) * up
    # polyphase decomposition: bank[p, k] = h[k*up + p] (pure jnp — this
    # function is jit-safe; up/down/taps are static)
    bank = h.reshape(taps_per_phase, up).T

    n = x.shape[-1]
    n_out = int(np.ceil(n * up / down))
    # output m uses input window ending at floor(m*down/up), phase (m*down) % up
    m = jnp.arange(n_out)
    in_pos = (m * down) // up
    phase = (m * down) % up
    # gather input windows: taps_per_phase history samples per output
    k = jnp.arange(taps_per_phase)
    idx = in_pos[:, None] - k[None, :]
    valid = idx >= 0
    idx = jnp.clip(idx, 0, n - 1)
    windows = jnp.where(valid, x[..., idx], 0.0)    # (..., n_out, K)
    coeff = bank[phase]                             # (n_out, K)
    return jnp.sum(windows * coeff, axis=-1)


def decimate(x, q: int, taps_per_phase: int = 16):
    return resample_poly(x, 1, q, taps_per_phase)


def interpolate(x, q: int, taps_per_phase: int = 16):
    return resample_poly(x, q, 1, taps_per_phase)
