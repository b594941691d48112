"""Interaction records carried through the wavefront tracer.

TPU-native replacement for reference `include/mitsuba/render/interaction.h`:
plain pytree dataclasses with a leading lane/batch dimension instead of
enoki structs.  `SurfaceInteraction` carries the radar state the reference
added (`interaction.h:40,80`): interaction `time` (retarded) and `phase`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .core import transform as tfm


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SurfaceInteraction:
    """Per-lane surface interaction (all fields shape (lanes, ...))."""

    valid: jax.Array        # (n,) bool — hit anything
    t: jax.Array            # (n,) distance along ray
    p: jax.Array            # (n,3) world hit position
    n: jax.Array            # (n,3) geometric normal (world)
    sh_frame: jax.Array     # (n,3,3) shading frame rows (s,t,n)
    uv: jax.Array           # (n,2)
    wi: jax.Array           # (n,3) incident dir in LOCAL shading frame (towards origin)
    wi_world: jax.Array     # (n,3) -ray.d (world)
    shape_idx: jax.Array    # (n,) int32 index into scene shape table (-1 = miss)
    prim_idx: jax.Array     # (n,) int32 triangle index for meshes (-1 otherwise)

    @property
    def cos_theta_i(self):
        return self.wi[..., 2]

    def to_local(self, v_world):
        return tfm.to_local(self.sh_frame, v_world)

    def to_world(self, v_local):
        return tfm.to_world(self.sh_frame, v_local)

    def spawn_origin(self, d_world, eps: float = 1e-4):
        """Offset hit point along the geometric normal to avoid
        self-intersection (replaces reference RayEpsilon machinery)."""
        sign = jnp.where(jnp.sum(self.n * d_world, axis=-1, keepdims=True) >= 0.0,
                         1.0, -1.0)
        # Scale epsilon with distance from origin to keep it above f32 ulp
        # for far hits.
        scale = eps * jnp.maximum(1.0, jnp.max(jnp.abs(self.p), axis=-1, keepdims=True))
        return self.p + sign * scale * self.n

    @staticmethod
    def none(n_lanes: int) -> "SurfaceInteraction":
        f3 = jnp.zeros((n_lanes, 3), jnp.float32)
        return SurfaceInteraction(
            valid=jnp.zeros((n_lanes,), bool),
            t=jnp.full((n_lanes,), jnp.inf, jnp.float32),
            p=f3, n=f3,
            sh_frame=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n_lanes, 3, 3)),
            uv=jnp.zeros((n_lanes, 2), jnp.float32),
            wi=f3, wi_world=f3,
            shape_idx=jnp.full((n_lanes,), -1, jnp.int32),
            prim_idx=jnp.full((n_lanes,), -1, jnp.int32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DirectionSample:
    """Direction sample toward an endpoint (reference `records.h`
    DirectionSample3f): position/normal/direction/distance + pdf, with the
    radar retarded `time` field."""

    p: jax.Array            # (n,3) sampled position on the endpoint
    n: jax.Array            # (n,3) normal there
    d: jax.Array            # (n,3) unit direction from the reference point
    dist: jax.Array         # (n,)
    pdf: jax.Array          # (n,) solid-angle density
    delta: jax.Array        # (n,) bool — delta distribution (point sources)
    uv: jax.Array           # (n,2)
