"""Sensors: perspective, thinlens, fluxmeter, radiancemeter, irradiancemeter.

Replaces reference `src/sensors/*.cpp`.  A sensor is a host-side spec; ray
generation is a pure function over film-plane uv + aperture samples.  The
`fluxmeter` (shape-attached total-flux sensor, reference
`src/sensors/fluxmeter.cpp:43-90`) is the Rx antenna in film-mode radar
scenes: it samples a position on its shape and a cosine-weighted direction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from .core import transform as tfm, warp
from .core.math import Pi, normalize
from .geometry.sample import sample_position
from .geometry.shapes import ShapeTable

PERSPECTIVE = 0
THINLENS = 1
FLUXMETER = 2
RADIANCEMETER = 3
IRRADIANCEMETER = 4


@dataclasses.dataclass
class SensorSpec:
    id: str
    type: int
    to_world: np.ndarray = None
    fov_deg: float = 45.0
    aperture_radius: float = 0.0
    focus_distance: float = 1.0
    shape: Optional[str] = None       # fluxmeter/irradiancemeter owner
    film_size: tuple = (64, 64)
    spp: int = 64
    near: float = 1e-2
    far: float = 1e4


def _m4(m):
    return np.eye(4, dtype=np.float32) if m is None else np.asarray(m, np.float32)


def perspective(id="sensor", fov=45.0, to_world=None, film_size=(64, 64),
                spp=64, **kw) -> SensorSpec:
    return SensorSpec(id=id, type=PERSPECTIVE, to_world=_m4(to_world),
                      fov_deg=float(fov), film_size=tuple(film_size), spp=spp, **kw)


def thinlens(id="sensor", fov=45.0, aperture_radius=0.1, focus_distance=5.0,
             to_world=None, film_size=(64, 64), spp=64) -> SensorSpec:
    return SensorSpec(id=id, type=THINLENS, to_world=_m4(to_world),
                      fov_deg=float(fov), aperture_radius=float(aperture_radius),
                      focus_distance=float(focus_distance),
                      film_size=tuple(film_size), spp=spp)


def fluxmeter(id="sensor", film_size=(1, 1), spp=1024) -> SensorSpec:
    return SensorSpec(id=id, type=FLUXMETER, film_size=tuple(film_size), spp=spp)


def radiancemeter(id="sensor", to_world=None, film_size=(1, 1), spp=1024) -> SensorSpec:
    return SensorSpec(id=id, type=RADIANCEMETER, to_world=_m4(to_world),
                      film_size=tuple(film_size), spp=spp)


def irradiancemeter(id="sensor", film_size=(1, 1), spp=1024) -> SensorSpec:
    return SensorSpec(id=id, type=IRRADIANCEMETER, film_size=tuple(film_size), spp=spp)


def sample_ray(spec: SensorSpec, shapes: ShapeTable, shape_idx: int,
               uv, u_ap, u_dir):
    """Generate camera rays.

    uv: (n,2) film coordinates in [0,1)^2 (already jittered);
    u_ap: (n,2) aperture sample; u_dir: (n,2) direction sample (fluxmeter).
    Returns (o (n,3), d (n,3), weight (n,)).

    Importance normalization: perspective/thinlens weight 1 (ideal pinhole);
    fluxmeter weight = area * pi (so the film accumulates total flux [W]
    when radiance integrates to 1 — matches reference fluxmeter which
    divides by position/direction pdf, `fluxmeter.cpp:60-85`).
    """
    m = jnp.asarray(spec.to_world if spec.to_world is not None else np.eye(4))
    n = uv.shape[0]
    if spec.type in (PERSPECTIVE, THINLENS):
        w, h = spec.film_size
        aspect = w / h
        tan_half = jnp.tan(0.5 * jnp.deg2rad(spec.fov_deg))
        # fov is along the x (width) axis, Mitsuba convention
        x = (2 * uv[:, 0] - 1) * tan_half
        y = (2 * uv[:, 1] - 1) * tan_half / aspect
        d_local = normalize(jnp.stack([x, -y, jnp.ones_like(x)], -1))
        if spec.type == THINLENS:
            pl = warp.square_to_uniform_disk_concentric(u_ap) * spec.aperture_radius
            focus = d_local * (spec.focus_distance / d_local[:, 2:3])
            o_local = jnp.concatenate([pl, jnp.zeros((n, 1), jnp.float32)], -1)
            d_local = normalize(focus - o_local)
        else:
            o_local = jnp.zeros((n, 3), jnp.float32)
        o = tfm.apply_point(m, o_local)
        d = tfm.apply_vector(m, d_local)
        return o, d, jnp.ones((n,), jnp.float32)

    if spec.type == RADIANCEMETER:
        o = jnp.broadcast_to(m[:3, 3], (n, 3))
        d = jnp.broadcast_to(m[:3, 2], (n, 3))
        return o, d, jnp.ones((n,), jnp.float32)

    if spec.type in (FLUXMETER, IRRADIANCEMETER):
        idxs = jnp.full((n,), shape_idx, jnp.int32)
        p, nrm, pdf_a, _ = sample_position(shapes, idxs, u_ap)
        d_local = warp.square_to_cosine_hemisphere(u_dir)
        frame = tfm.frame_from_normal(nrm)
        d = tfm.to_world(frame, d_local)
        o = p + 1e-4 * nrm
        if spec.type == FLUXMETER:
            # flux weight: 1/(pdf_pos * pdf_dir) * cos = area * pi
            wgt = Pi / jnp.maximum(pdf_a, 1e-20)
        else:
            # irradiance: 1/(pdf_dir/cos) = pi
            wgt = jnp.full((n,), Pi)
        return o, d, wgt

    raise ValueError(f"unknown sensor type {spec.type}")
