"""Window functions for the radar DSP chain (all-XLA).

The reference has no DSP library — its design comments describe the intended
chain (`src/librender/integrator.cpp:920-945, 1216-1243`: per-chirp FFT
blocks, slow-time x range cube).  These windows feed pulse compression and
range-Doppler processing.
"""

from __future__ import annotations

import jax.numpy as jnp


def rect(n: int):
    return jnp.ones((n,), jnp.float32)


def hann(n: int):
    k = jnp.arange(n, dtype=jnp.float32)
    return 0.5 - 0.5 * jnp.cos(2 * jnp.pi * k / n)


def hamming(n: int):
    k = jnp.arange(n, dtype=jnp.float32)
    return 0.54 - 0.46 * jnp.cos(2 * jnp.pi * k / n)


def blackman(n: int):
    k = jnp.arange(n, dtype=jnp.float32)
    x = 2 * jnp.pi * k / n
    return 0.42 - 0.5 * jnp.cos(x) + 0.08 * jnp.cos(2 * x)


def blackman_harris(n: int):
    k = jnp.arange(n, dtype=jnp.float32)
    x = 2 * jnp.pi * k / n
    return (0.35875 - 0.48829 * jnp.cos(x) + 0.14128 * jnp.cos(2 * x)
            - 0.01168 * jnp.cos(3 * x))


def taylor(n: int, nbar: int = 4, sll_db: float = -30.0):
    """Taylor window (classic radar sidelobe control)."""
    import numpy as np
    a = np.arccosh(10 ** (-sll_db / 20.0)) / np.pi
    a2 = a * a
    sigma2 = nbar ** 2 / (a2 + (nbar - 0.5) ** 2)
    ms = np.arange(1, nbar)
    fm = np.empty(nbar - 1)
    for mi, m in enumerate(ms):
        num = np.prod(1 - (m ** 2 / sigma2) / (a2 + (ms - 0.5) ** 2))
        den = np.prod([1 - m ** 2 / k ** 2 for k in ms if k != m])
        fm[mi] = ((-1) ** (m + 1)) * num / (2 * den)
    k = np.arange(n)
    w = np.ones(n)
    for mi, m in enumerate(ms):
        w = w + 2 * fm[mi] * np.cos(2 * np.pi * m * (k - (n - 1) / 2) / n)
    return jnp.asarray(w / w.max(), jnp.float32)


def get(name: str, n: int, **kw):
    return {'rect': rect, 'hann': hann, 'hamming': hamming,
            'blackman': blackman, 'blackman_harris': blackman_harris,
            'taylor': taylor}[name](n, **kw)
