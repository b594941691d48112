"""Analytic shape tables: rectangles, spheres, disks, cylinders.

TPU-native replacement for the reference's shape plugin family
(`src/shapes/{rectangle,sphere,disk,cylinder}.cpp`): instead of one C++ object
per shape with virtual intersection, all primitives of a kind live in a
structure-of-arrays table, and intersection is a batched jnp computation over
(ray, primitive) with a min-reduce — XLA-friendly, no divergent dispatch.

Shape builders are host-side Python dataclasses (numpy); `ShapeTable.build`
flattens them into device arrays carried inside the compiled scene pytree.

Each primitive row stores:
  to_world (4,4), to_object (4,4), velocity (3,) [m/s, world frame]
  bsdf_idx, emitter_idx/transmitter_idx/sensor_idx/receiver_idx (-1 if none)
and per-kind parameters implied by the unit-object convention (unit rectangle
[-1,1]^2 in z=0 plane, unit sphere, unit disk, unit cylinder along z — same
conventions as the reference shapes).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Primitive kind codes
RECTANGLE = 0
SPHERE = 1
DISK = 2
CYLINDER = 3
TRIANGLE = 4   # mesh triangles are stored in their own table


@dataclasses.dataclass
class ShapeSpec:
    """Host-side shape description (pre-compile)."""

    kind: int
    to_world: np.ndarray                     # (4,4)
    bsdf: Optional[str] = None               # bsdf id (resolved at compile)
    velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    # endpoint attachment ids (resolved at compile time)
    emitter: Optional[str] = None
    transmitter: Optional[str] = None
    sensor: Optional[str] = None
    receiver: Optional[str] = None
    flip_normals: bool = False


def rectangle(to_world=None, **kw) -> ShapeSpec:
    """Unit rectangle spanning [-1,1]^2 in the z=0 plane, normal +z
    (reference `src/shapes/rectangle.cpp`)."""
    return ShapeSpec(kind=RECTANGLE, to_world=_m4(to_world), **kw)


def sphere(to_world=None, center=None, radius: float = 1.0, **kw) -> ShapeSpec:
    m = _m4(to_world)
    if center is not None or radius != 1.0:
        c = np.zeros(3, np.float32) if center is None else np.asarray(center, np.float32)
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = c
        s = np.diag([radius, radius, radius, 1.0]).astype(np.float32)
        m = m @ t @ s
    return ShapeSpec(kind=SPHERE, to_world=m, **kw)


def disk(to_world=None, **kw) -> ShapeSpec:
    return ShapeSpec(kind=DISK, to_world=_m4(to_world), **kw)


def cylinder(to_world=None, **kw) -> ShapeSpec:
    """Unit cylinder: radius 1, z in [0, 1] (reference `src/shapes/cylinder.cpp`)."""
    return ShapeSpec(kind=CYLINDER, to_world=_m4(to_world), **kw)


def trihedral(apex, toward, size: float = 1.0, **kw) -> list:
    """Trihedral corner reflector: three mutually-perpendicular square
    plates of side `size` meeting at `apex`, the corner's symmetry axis
    (1,1,1)/sqrt(3) rotated onto `toward` (apex-toward-radar, the standard
    mounting).  No face is then normal to the boresight, so single- and
    double-bounce specular paths deflect away and the only return is the
    triple-bounce retro path — a point reflection through the apex, the
    classic radar calibration target.  Returns three rectangle ShapeSpecs
    (pass bsdf=<mirror conductor> via **kw)."""
    from ..core import transform as tfm
    a = np.array([1.0, 1.0, 1.0]) / np.sqrt(3.0)
    b = np.asarray(toward, np.float64)
    b = b / np.linalg.norm(b)
    vx = np.cross(a, b)
    s = np.linalg.norm(vx)
    cth = float(a.dot(b))
    if s < 1e-12:
        rot = np.eye(3) if cth > 0 else -np.eye(3)
    else:
        k = np.array([[0, -vx[2], vx[1]],
                      [vx[2], 0, -vx[0]],
                      [-vx[1], vx[0], 0]])
        rot = np.eye(3) + k + k @ k * ((1 - cth) / s ** 2)
    h = size / 2
    faces = []
    for i in range(3):
        n_l = np.eye(3)[i]                    # face normal = local axis i
        t1, t2 = np.eye(3)[(i + 1) % 3], np.eye(3)[(i + 2) % 3]
        c = np.asarray(apex, np.float64) + rot @ (h * t1 + h * t2)
        m = tfm.compose(tfm.look_at(c, c + rot @ n_l, up=tuple(rot @ t2)),
                        tfm.scale(h))
        faces.append(rectangle(to_world=np.asarray(m), **kw))
    return faces


def _m4(m) -> np.ndarray:
    if m is None:
        return np.eye(4, dtype=np.float32)
    return np.asarray(m, np.float32).reshape(4, 4)


@dataclasses.dataclass
class ShapeGroup:
    """Named collection of shapes for instancing (reference
    `src/shapes/shapegroup.cpp`).  Not itself rendered; `instance()` stamps
    transformed copies into the scene at compile time."""

    id: str
    shapes: list

    endpoint_kind: str = dataclasses.field(default='shapegroup', init=False)


@dataclasses.dataclass
class InstanceSpec:
    """Instance of a ShapeGroup with its own to_world (reference
    `src/shapes/instance.cpp`).  Expanded at Scene.compile: each member
    shape appears with to_world = instance.to_world @ member.to_world —
    exact (no LOD/shared-BLAS tricks; geometry is SoA-flattened anyway)."""

    group: str
    to_world: np.ndarray
    endpoint_kind: str = dataclasses.field(default='instance', init=False)


def shapegroup(id, shapes) -> ShapeGroup:
    return ShapeGroup(id=id, shapes=list(shapes))


def instance(group, to_world=None) -> InstanceSpec:
    return InstanceSpec(group=group, to_world=_m4(to_world))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShapeTable:
    """Device-side SoA of analytic primitives."""

    kind: jax.Array          # (n,) int32
    to_world: jax.Array      # (n,4,4)
    to_object: jax.Array     # (n,4,4)
    velocity: jax.Array      # (n,3)
    bsdf_idx: jax.Array      # (n,) int32
    emitter_idx: jax.Array   # (n,) int32, -1 if none
    transmitter_idx: jax.Array
    sensor_idx: jax.Array
    receiver_idx: jax.Array
    flip: jax.Array          # (n,) float32 (+1 / -1 normal sign)
    surface_area: jax.Array  # (n,)

    @property
    def n(self) -> int:
        return self.kind.shape[0]

    @staticmethod
    def build(specs, resolve) -> "ShapeTable":
        """`resolve(kind_name, id)` maps string ids to table indices."""
        n = max(len(specs), 1)
        # padding rows get kind=-1: matches no intersection routine (inert)
        kind = np.full(n, -1, np.int32)
        tw = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        vel = np.zeros((n, 3), np.float32)
        bsdf = np.full(n, -1, np.int32)
        em = np.full(n, -1, np.int32)
        tx = np.full(n, -1, np.int32)
        sen = np.full(n, -1, np.int32)
        rx = np.full(n, -1, np.int32)
        flip = np.ones(n, np.float32)
        for i, s in enumerate(specs):
            kind[i] = s.kind
            tw[i] = s.to_world
            vel[i] = s.velocity
            bsdf[i] = resolve('bsdf', s.bsdf)
            em[i] = resolve('emitter', s.emitter)
            tx[i] = resolve('transmitter', s.transmitter)
            sen[i] = resolve('sensor', s.sensor)
            rx[i] = resolve('receiver', s.receiver)
            flip[i] = -1.0 if s.flip_normals else 1.0
        to = np.linalg.inv(tw)
        area = np.array([_surface_area(specs[i]) if i < len(specs) else 1.0
                         for i in range(n)], np.float32)
        return ShapeTable(
            kind=jnp.asarray(kind), to_world=jnp.asarray(tw),
            to_object=jnp.asarray(to), velocity=jnp.asarray(vel),
            bsdf_idx=jnp.asarray(bsdf), emitter_idx=jnp.asarray(em),
            transmitter_idx=jnp.asarray(tx), sensor_idx=jnp.asarray(sen),
            receiver_idx=jnp.asarray(rx), flip=jnp.asarray(flip),
            surface_area=jnp.asarray(area))


def _surface_area(s: ShapeSpec) -> float:
    m = s.to_world
    sx = float(np.linalg.norm(m[:3, 0]))
    sy = float(np.linalg.norm(m[:3, 1]))
    sz = float(np.linalg.norm(m[:3, 2]))
    if s.kind == RECTANGLE:
        return 4.0 * sx * sy          # unit rect spans [-1,1]^2
    if s.kind == DISK:
        return float(np.pi) * sx * sy
    if s.kind == SPHERE:
        r = (sx + sy + sz) / 3.0
        return float(4.0 * np.pi * r * r)
    if s.kind == CYLINDER:
        return float(2.0 * np.pi) * sx * sz
    return 1.0


def aperture_extents(table: ShapeTable, idx):
    """Physical half-extent-derived widths (wx, wy) of a rectangle primitive —
    used by the Wigner aperture gain (reference `rectangle.cpp:132-140` uses
    |frame.s|, |frame.t|)."""
    m = table.to_world[idx]
    wx = jnp.linalg.norm(m[..., :3, 0], axis=-1)
    wy = jnp.linalg.norm(m[..., :3, 1], axis=-1)
    return wx, wy
