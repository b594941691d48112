"""Digital beamforming over MIMO channel cubes (BASELINE config 5).

The reference has no digital beamformer — its phased receiver sums the
array ANALOGUELY through a cross-WDF gain into one ADC
(`src/receivers/phasedreceiver.cpp:118-145,293`).  Here the per-element
complex channels from `receive_mimo` (cube (E, n_time, n_freq)) are
combined digitally: conventional delay-and-sum plus an adaptive MVDR
(Capon) beamformer.  All-XLA: steering matrices are one einsum away from
the MXU, and the channel axis is the sharding axis
(`parallel/shard.py::receive_mimo_sharded` — partial element sums psum
across the 'chan' mesh axis).

Phase convention: `radar_receive_trace` gives element e the phase
-k*(|x1-(o+r_e)| - |x1-o|), which for a far-field source in unit direction
d (array -> source) is +k d.r_e; the steering vector mirrors that.
"""

from __future__ import annotations

import jax.numpy as jnp


def ula_directions(az_rad, elevation_rad=0.0, axis=(1.0, 0.0, 0.0),
                   normal=(0.0, 0.0, 1.0)):
    """Unit direction grid (A,3) for azimuth angles measured from the array
    broadside (`normal`) toward the array `axis` (positive az toward +axis).
    """
    import numpy as np
    ax = np.asarray(axis, np.float32)
    ax = ax / max(np.linalg.norm(ax), 1e-20)
    nn = np.asarray(normal, np.float32)
    nn = nn / max(np.linalg.norm(nn), 1e-20)
    up = np.cross(nn, ax)
    az = jnp.atleast_1d(jnp.asarray(az_rad, jnp.float32))
    el = jnp.broadcast_to(jnp.asarray(elevation_rad, jnp.float32), az.shape)
    return (jnp.sin(az)[:, None] * jnp.cos(el)[:, None] * ax[None]
            + jnp.sin(el)[:, None] * up[None]
            + jnp.cos(az)[:, None] * jnp.cos(el)[:, None] * nn[None])


def steering_matrix(elem_offsets, directions, freq, c):
    """a[A, E] = exp(+j k d_a . r_e) — the per-element phase a far-field
    plane wave from direction d_a imprints on the MIMO channels."""
    k = 2.0 * jnp.pi * freq / c
    proj = jnp.einsum('aj,ej->ae', jnp.asarray(directions, jnp.float32),
                      jnp.asarray(elem_offsets, jnp.float32))
    return jnp.exp(1j * k * proj)


def delay_and_sum(cube, elem_offsets, directions, freq, c, weights=None):
    """Conventional (Bartlett) beamformer: coherent channel sum per look
    direction.

    cube: (E, n_time, n_freq) complex; directions: (A,3) unit;
    weights: optional (E,) taper (e.g. Hann across the aperture).
    Returns (A, n_time, n_freq).
    """
    a = steering_matrix(elem_offsets, directions, freq, c)     # (A, E)
    w = jnp.conj(a)
    if weights is not None:
        w = w * jnp.asarray(weights)[None, :]
        w = w / jnp.sum(jnp.abs(w), axis=1, keepdims=True) * a.shape[1]
    return jnp.einsum('ae,etf->atf', w, cube) / a.shape[1]


def sample_covariance(cube, diag_load: float = 1e-3):
    """Spatial covariance R (E,E) from all (time, freq) snapshots, with
    relative diagonal loading for invertibility at low snapshot counts."""
    x = cube.reshape(cube.shape[0], -1)                        # (E, N)
    n = x.shape[1]
    r = (x @ jnp.conj(x).T) / n
    tr = jnp.real(jnp.trace(r)) / r.shape[0]
    return r + diag_load * jnp.maximum(tr, 1e-30) * jnp.eye(
        r.shape[0], dtype=r.dtype)


def mvdr_weights(R, a):
    """MVDR (Capon) weights w = R^-1 a / (a^H R^-1 a) for steering rows
    a (A,E); returns (A,E)."""
    ri_a = jnp.linalg.solve(R, a.T).T                          # (A, E)
    denom = jnp.einsum('ae,ae->a', jnp.conj(a), ri_a)
    return ri_a / jnp.maximum(jnp.real(denom), 1e-30)[:, None]


def mvdr_spectrum(cube, elem_offsets, directions, freq, c,
                  diag_load: float = 1e-3):
    """Capon spatial spectrum P(d) = 1 / (a^H R^-1 a) — sharper peaks than
    delay-and-sum; the 'one adaptive beamformer' of BASELINE config 5."""
    a = steering_matrix(elem_offsets, directions, freq, c)
    R = sample_covariance(cube, diag_load)
    ri_a = jnp.linalg.solve(R, a.T).T
    denom = jnp.real(jnp.einsum('ae,ae->a', jnp.conj(a), ri_a))
    return 1.0 / jnp.maximum(denom, 1e-30)


def mvdr_beamform(cube, elem_offsets, directions, freq, c,
                  diag_load: float = 1e-3):
    """Adaptive beamformed cube: MVDR weights applied per look direction.
    Returns (A, n_time, n_freq)."""
    a = steering_matrix(elem_offsets, directions, freq, c)
    R = sample_covariance(cube, diag_load)
    w = mvdr_weights(R, a)
    return jnp.einsum('ae,etf->atf', jnp.conj(w), cube)
