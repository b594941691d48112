"""Matched-filter pulse compression via overlap-save block convolution.

All-XLA (jnp.fft) implementation of the chain the reference only sketches in
comments (`src/librender/integrator.cpp:919-945`).  The overlap-save block
structure is exactly what shards across chips: each fast-time shard convolves
its blocks locally and exchanges only the filter-tail halo with its neighbor
(`parallel/shard.py`).
"""

from __future__ import annotations

import jax.numpy as jnp


def matched_filter_freq(replica, n_fft: int):
    """Frequency response of the matched filter h[k] = conj(s[-k])."""
    return jnp.conj(jnp.fft.fft(replica, n_fft))


def correlate_full(x, replica):
    """Direct full matched-filter correlation y[n] = sum_k x[n+k] conj(s[k]).

    x: (..., N); replica: (M,).  Output (..., N) ("same"-aligned: y[n] is the
    correlation with the replica starting at n).
    """
    n = x.shape[-1]
    m = replica.shape[-1]
    n_fft = 1
    while n_fft < n + m - 1:
        n_fft *= 2
    X = jnp.fft.fft(x, n_fft)
    H = jnp.conj(jnp.fft.fft(replica, n_fft))
    y = jnp.fft.ifft(X * H, n_fft)
    return y[..., :n]


def overlap_save(x, h_freq, n_fft: int, n_taps: int, history=None):
    """Blocked overlap-save convolution/correlation.

    x: (..., N); h_freq: (n_fft,) filter frequency response.
    Returns (..., N) same-aligned output.  Each block reads `n_taps - 1`
    samples of left-history; `history` (..., n_taps-1) supplies it (zeros if
    None) — on a sharded fast-time axis that history is the halo exchanged
    via ppermute (`parallel/shard.py::overlap_save_sharded`).
    """
    L = n_fft - n_taps + 1
    n = x.shape[-1]
    n_pad = (-n) % L
    if n_pad:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (n_pad,), x.dtype)], axis=-1)
    n_padded = n + n_pad
    n_blocks = n_padded // L
    # Prepend n_taps-1 samples of history, then gather overlapping blocks
    if history is None:
        history = jnp.zeros(x.shape[:-1] + (n_taps - 1,), x.dtype)
    xp = jnp.concatenate([history.astype(x.dtype), x], axis=-1)
    idx = (jnp.arange(n_blocks)[:, None] * L + jnp.arange(n_fft)[None, :])
    blocks = xp[..., idx]                         # (..., n_blocks, n_fft)
    Y = jnp.fft.fft(blocks, n_fft) * h_freq
    y = jnp.fft.ifft(Y, n_fft)[..., n_taps - 1:]  # valid part (..., nb, L)
    return y.reshape(x.shape[:-1] + (n_padded,))[..., :n]


def pulse_compress(cube, replica, window=None):
    """Matched-filter a (pulses, samples) data cube along fast time.

    Correlation alignment: output peak at the target's delay sample.
    """
    if window is not None:
        w = window
        rep = replica * w[: replica.shape[0]] if w.shape[0] >= replica.shape[0] else replica
    else:
        rep = replica
    return correlate_full(cube, rep)


def compression_gain(replica):
    """Theoretical matched-filter SNR gain = sum |s|^2 (time-bandwidth
    product for an LFM chirp of unit amplitude)."""
    return jnp.sum(jnp.abs(replica) ** 2)
