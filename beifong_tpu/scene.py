"""Scene: host-side builder + compiled device pytree.

Replaces the reference `Scene` (`src/librender/scene.cpp:22-120` constructor
sorting children into emitters/transmitters/sensors/receivers + accel init)
and the XML object graph: here a `Scene` collects host-side spec dataclasses,
and `compile()` flattens everything into `SceneData` — a pytree of SoA device
arrays that every jitted kernel takes as an argument.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.config import Band, ULTRASOUND_40K
from .geometry.shapes import ShapeSpec, ShapeTable, TRIANGLE
from .geometry.mesh import MeshSpec
from .geometry.intersect import TriData, closest_hit, any_hit
from .bsdf.tables import BSDFSpec, BSDFTable
from .textures import TextureSpec, TextureTable
from .emitters import EmitterSpec, EmitterTable
from .sensors import SensorSpec


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneData:
    """Everything a jitted kernel needs, as device arrays."""

    band: Band = dataclasses.field(metadata=dict(static=True))
    shapes: ShapeTable
    tris: Optional[TriData]
    bsdfs: BSDFTable
    textures: TextureTable
    emitters: EmitterTable
    transmitters: object   # radar.TransmitterTable | None
    receivers: object      # radar.ReceiverTable | None
    medium: object = None  # media.HomogeneousMedium | None (global ambient)
    bvh: object = None     # geometry.bvh.BVH | None (large meshes)

    has_shading_maps: bool = dataclasses.field(
        metadata=dict(static=True), default=False)

    # --- queries (reference Scene::ray_intersect / ray_test) ---

    def ray_intersect(self, o, d, tmax=None):
        si = closest_hit(self.shapes, self.tris, o, d, tmax=tmax,
                         bvh=self.bvh)
        if self.has_shading_maps:
            si = self._apply_shading_maps(si)
        return si

    def _apply_shading_maps(self, si):
        """Perturb shading frames by normal/bump maps (reference
        `src/bsdfs/{normalmap,bumpmap}.cpp`).  Tangent basis = the shading
        frame's s/t rows (procedural convention)."""
        from .textures import texture_eval
        from .core import transform as tfm
        from .core.math import normalize as _norm
        bidx = self.bsdf_of(si.shape_idx)
        i = jnp.maximum(bidx, 0)
        nm = self.bsdfs.normalmap_idx[i]
        bm = self.bsdfs.bumpmap_idx[i]
        frame = si.sh_frame

        # normal map: rgb in [0,1] -> tangent normal 2c-1
        rgb = texture_eval(self.textures, nm, si.uv)
        n_t = _norm(2.0 * rgb - 1.0)
        n_nm = tfm.to_world(frame, n_t)

        # bump map: finite differences of height (channel 0)
        eps = 1e-3
        h0 = texture_eval(self.textures, bm, si.uv)[..., 0]
        hx = texture_eval(self.textures, bm,
                          si.uv + jnp.array([eps, 0.0]))[..., 0]
        hy = texture_eval(self.textures, bm,
                          si.uv + jnp.array([0.0, eps]))[..., 0]
        scale = self.bsdfs.alpha[i]
        dhdu = (hx - h0) / eps * scale
        dhdv = (hy - h0) / eps * scale
        n_bm = tfm.to_world(frame, _norm(jnp.stack(
            [-dhdu, -dhdv, jnp.ones_like(dhdu)], -1)))

        n_new = jnp.where((nm >= 0)[:, None], n_nm,
                          jnp.where((bm >= 0)[:, None], n_bm,
                                    frame[:, 2]))
        new_frame = tfm.frame_from_normal(_norm(n_new))
        use = (nm >= 0) | (bm >= 0)
        frame = jnp.where(use[:, None, None], new_frame, frame)
        wi = tfm.to_local(frame, si.wi_world)
        return dataclasses.replace(si, sh_frame=frame, wi=wi)

    def ray_test(self, o, d, maxt):
        return any_hit(self.shapes, self.tris, o, d, maxt, bvh=self.bvh)

    # --- per-hit attribute gathers ---

    def bsdf_of(self, shape_idx):
        return jnp.where(shape_idx >= 0,
                         self.shapes.bsdf_idx[jnp.maximum(shape_idx, 0)], -1)

    def emitter_of(self, shape_idx):
        return jnp.where(shape_idx >= 0,
                         self.shapes.emitter_idx[jnp.maximum(shape_idx, 0)], -1)

    def transmitter_of(self, shape_idx):
        return jnp.where(shape_idx >= 0,
                         self.shapes.transmitter_idx[jnp.maximum(shape_idx, 0)], -1)

    def velocity_of(self, shape_idx):
        return jnp.where((shape_idx >= 0)[..., None],
                         self.shapes.velocity[jnp.maximum(shape_idx, 0)], 0.0)


@dataclasses.dataclass
class Scene:
    """Host-side scene description (mutable builder)."""

    band: Band = ULTRASOUND_40K
    medium: object = None   # optional ambient HomogeneousMedium
    shapes: list = dataclasses.field(default_factory=list)
    bsdfs: list = dataclasses.field(default_factory=list)
    textures: list = dataclasses.field(default_factory=list)
    emitters: list = dataclasses.field(default_factory=list)
    transmitters: list = dataclasses.field(default_factory=list)
    receivers: list = dataclasses.field(default_factory=list)
    sensors: list = dataclasses.field(default_factory=list)

    groups: dict = dataclasses.field(default_factory=dict)

    def add(self, *objs) -> "Scene":
        from .geometry.shapes import ShapeGroup, InstanceSpec
        import copy as _copy
        for o in objs:
            if isinstance(o, ShapeGroup):
                self.groups[o.id] = o
            elif isinstance(o, InstanceSpec):
                grp = self.groups[o.group]
                for member in grp.shapes:
                    m = _copy.copy(member)
                    m.to_world = np.asarray(o.to_world, np.float32) @ member.to_world
                    self.shapes.append(m)
            elif isinstance(o, MeshSpec) or isinstance(o, ShapeSpec):
                self.shapes.append(o)
            elif isinstance(o, BSDFSpec):
                self.bsdfs.append(o)
            elif isinstance(o, TextureSpec):
                self.textures.append(o)
            elif isinstance(o, EmitterSpec):
                self.emitters.append(o)
            elif isinstance(o, SensorSpec):
                self.sensors.append(o)
            else:
                # radar transmitter/receiver specs (duck-typed by attribute)
                kind = getattr(o, 'endpoint_kind', None)
                if kind == 'transmitter':
                    self.transmitters.append(o)
                elif kind == 'receiver':
                    self.receivers.append(o)
                else:
                    raise TypeError(f"don't know where to put {o!r}")
        return self

    # ------------------------------------------------------------------

    def _index_of(self, lst, id_) -> int:
        if id_ is None:
            return -1
        for i, s in enumerate(lst):
            if s.id == id_:
                return i
        raise KeyError(f"unresolved reference {id_!r}")

    def shape_index_of_endpoint(self, kind: str, endpoint_id: str) -> int:
        """Row of the shape that carries endpoint `endpoint_id` (-1 if free)."""
        for i, s in enumerate(self.shapes):
            if getattr(s, kind, None) == endpoint_id:
                return i
        return -1

    def sensor_shape_index(self, sensor_idx: int = 0) -> int:
        return self.shape_index_of_endpoint('sensor', self.sensors[sensor_idx].id)

    def at_time(self, t: float) -> "Scene":
        """Snapshot the scene at absolute time t: any `to_world` that is a
        keyframed `core.transform.AnimatedTransform` (shapes, free-standing
        endpoints) is evaluated at t, and the matching `velocity` field is
        set from the keyframe derivative — so intra-pulse Doppler follows
        automatically from the animation (reference AnimatedTransform +
        `endpoint.h:165` m_velocity / `shape.cpp:375-404` doppler).  The
        slow-time (pulse/frame) axis stays quasistatic: call once per pulse
        (see `receive.receive_cpi`)."""
        from .core.transform import AnimatedTransform
        import copy as _copy

        def snap(spec, vel_override=None):
            anim = getattr(spec, 'to_world', None)
            if not isinstance(anim, AnimatedTransform) and vel_override is None:
                return spec, None
            c = _copy.copy(spec)
            vel = vel_override
            if isinstance(anim, AnimatedTransform):
                c.to_world = np.asarray(anim.eval(t), np.float32)
                vel = anim.velocity(t)
            if vel is not None and hasattr(c, 'velocity'):
                c.velocity = np.asarray(vel, np.float32)
            return c, vel

        out = Scene(band=self.band, medium=self.medium,
                    bsdfs=list(self.bsdfs), textures=list(self.textures),
                    emitters=list(self.emitters), sensors=list(self.sensors),
                    groups=dict(self.groups))
        endpoint_vel = {}   # endpoint id -> carrying shape velocity
        for s in self.shapes:
            c, vel = snap(s)
            out.shapes.append(c)
            if vel is not None:
                for kind in ('transmitter', 'receiver', 'emitter'):
                    eid = getattr(s, kind, None)
                    if eid is not None:
                        endpoint_vel[eid] = vel
        for lst, name in ((self.transmitters, 'transmitters'),
                          (self.receivers, 'receivers')):
            for e in lst:
                c, _ = snap(e, vel_override=endpoint_vel.get(e.id))
                getattr(out, name).append(c)
        return out

    def compile(self, use_bvh: str | bool = 'auto',
                bvh_threshold: int = 1024) -> SceneData:
        resolve = lambda kind, id_: {
            'bsdf': lambda: self._index_of(self.bsdfs, id_),
            'emitter': lambda: self._index_of(self.emitters, id_),
            'transmitter': lambda: self._index_of(self.transmitters, id_),
            'sensor': lambda: self._index_of(self.sensors, id_),
            'receiver': lambda: self._index_of(self.receivers, id_),
        }[kind]()
        resolve_tex = lambda id_: self._index_of(self.textures, id_)

        shape_table = ShapeTable.build(self.shapes, resolve)
        # Override surface areas for meshes
        areas = np.asarray(shape_table.surface_area).copy()
        tri_chunks = []
        for i, s in enumerate(self.shapes):
            if isinstance(s, MeshSpec):
                areas[i] = s.surface_area_world()
                v = s.world_vertices()
                a = v[s.faces[:, 0]]
                b = v[s.faces[:, 1]]
                c = v[s.faces[:, 2]]
                e1, e2 = b - a, c - a
                n = np.cross(e1, e2)
                nl = np.linalg.norm(n, axis=1, keepdims=True)
                n = n / np.maximum(nl, 1e-20)
                tri_chunks.append((a, e1, e2, n,
                                   np.full(len(a), i, np.int32)))
        shape_table = dataclasses.replace(shape_table,
                                          surface_area=jnp.asarray(areas))
        if tri_chunks:
            v0 = np.concatenate([t[0] for t in tri_chunks])
            tris = TriData(
                v0=jnp.asarray(v0, jnp.float32),
                e1=jnp.asarray(np.concatenate([t[1] for t in tri_chunks]), jnp.float32),
                e2=jnp.asarray(np.concatenate([t[2] for t in tri_chunks]), jnp.float32),
                n=jnp.asarray(np.concatenate([t[3] for t in tri_chunks]), jnp.float32),
                shape_idx=jnp.asarray(np.concatenate([t[4] for t in tri_chunks])))
        else:
            tris = None

        bsdf_table = BSDFTable.build(self.bsdfs, resolve_tex)
        tex_table = TextureTable.build(self.textures)
        em_table = EmitterTable.build(
            self.emitters,
            shape_of=lambda eid: self.shape_index_of_endpoint('emitter', eid),
            resolve_texture=resolve_tex,
            wl_centre=self.band.wavelength_centre)

        tx_table = rx_table = None
        if self.transmitters or self.receivers:
            from .radar.endpoints import TransmitterTable, ReceiverTable
            if self.transmitters:
                tx_table = TransmitterTable.build(
                    self.transmitters,
                    shape_of=lambda tid: self.shape_index_of_endpoint(
                        'transmitter', tid),
                    band_wl_centre=self.band.wavelength_centre)
            if self.receivers:
                rx_table = ReceiverTable.build(
                    self.receivers,
                    shape_of=lambda rid: self.shape_index_of_endpoint(
                        'receiver', rid))

        bvh = None
        if tris is not None:
            n_faces = tris.n_faces
            if use_bvh is True or (use_bvh == 'auto' and n_faces > bvh_threshold):
                from .geometry import bvh as bvh_mod
                bvh = bvh_mod.build(np.asarray(tris.v0), np.asarray(tris.e1),
                                    np.asarray(tris.e2))

        has_maps = any(s.normalmap is not None or s.bumpmap is not None
                       for s in self.bsdfs)
        return SceneData(band=self.band, shapes=shape_table, tris=tris,
                         bsdfs=bsdf_table, textures=tex_table,
                         emitters=em_table, transmitters=tx_table,
                         receivers=rx_table, medium=self.medium, bvh=bvh,
                         has_shading_maps=has_maps)
