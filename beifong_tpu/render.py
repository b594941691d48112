"""render(): the camera-side driver.

Replaces the reference CPU/GPU render drivers
(`src/librender/integrator.cpp:58-204` spiral-of-blocks + TBB; `:160-196` GPU
wavefront): on TPU the whole (pixels x spp-pass) wavefront is one fused jit
program; multi-pass accumulation replaces the block spiral, and the film
scatter-add replaces the mutex merge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .core.rng import SampleStream
from . import film as film_mod
from .integrators.path import path_sample
from .sensors import sample_ray as sensor_sample_ray
from .scene import Scene, SceneData


@functools.partial(jax.jit, static_argnames=('sensor_spec', 'shape_idx',
                                             'max_depth', 'rfilter', 'spp_pass'))
def _render_pass(scene_data: SceneData, sensor_spec, shape_idx: int, key,
                 pass_idx, film, spp_pass: int, max_depth: int, rfilter: int):
    w, h = sensor_spec.film_size
    n = w * h * spp_pass
    stream = SampleStream.make(key, n, pass_idx)

    # Pixel-stratified film coordinates
    pix = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(w * h)
    px = (pix % jnp.uint32(w)).astype(jnp.float32)
    py = (pix // jnp.uint32(w)).astype(jnp.float32)
    u_jit, stream = stream.next_2d()
    pos = jnp.stack([px, py], -1) + u_jit            # pixel coords
    uv = pos / jnp.array([w, h], jnp.float32)

    u_ap, stream = stream.next_2d()
    u_dir, stream = stream.next_2d()
    o, d, wgt = sensor_sample_ray(sensor_spec, scene_data.shapes, shape_idx,
                                  uv, u_ap, u_dir)
    L, valid, stream = path_sample(scene_data, stream, o, d, max_depth=max_depth)
    vals = L * wgt[:, None]
    return film_mod.splat(film, pos, vals, jnp.ones((n,), bool), rfilter)


def render(scene: Scene, scene_data: SceneData | None = None, sensor_idx: int = 0,
           seed: int = 0, spp: int | None = None, max_depth: int = 8,
           rfilter: int = film_mod.BOX, spp_per_pass: int | None = None):
    """Render `scene` through sensor `sensor_idx`; returns the raw film
    (H, W, C+2).  Use `film.develop()` for the normalized image."""
    if scene_data is None:
        scene_data = scene.compile()
    spec = scene.sensors[sensor_idx]
    shape_idx = scene.sensor_shape_index(sensor_idx)
    w, h = spec.film_size
    spp = spp or spec.spp
    if spp_per_pass is None:
        # target <= ~2M lanes per pass
        spp_per_pass = max(1, min(spp, (2 << 20) // max(w * h, 1)))
    n_pass = (spp + spp_per_pass - 1) // spp_per_pass

    film = film_mod.film_new(h, w, 3)
    key = jax.random.key(seed)
    # freeze the spec into a hashable static: use tuple-ized dataclass
    spec_h = _HashableSpec(spec)
    for p in range(n_pass):
        film = _render_pass(scene_data, spec_h, shape_idx, key,
                            jnp.uint32(p), film, spp_per_pass, max_depth, rfilter)
    return film, spp_per_pass * n_pass


class _HashableSpec:
    """Static wrapper so SensorSpec can be a jit static arg."""

    def __init__(self, spec):
        object.__setattr__(self, '_spec', spec)
        object.__setattr__(self, '_key', (
            spec.id, spec.type, tuple(map(tuple, spec.to_world.tolist()))
            if spec.to_world is not None else None,
            spec.fov_deg, spec.aperture_radius, spec.focus_distance,
            tuple(spec.film_size), spec.near, spec.far))

    def __getattr__(self, k):
        return getattr(self._spec, k)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _HashableSpec) and self._key == other._key
