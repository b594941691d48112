"""Optical emitter tables + NEE sampling.

Replaces reference `src/emitters/*.cpp` (area, point, spot, directional,
constant, projector, pointbeam) with one SoA table.  The radar-flavored
emitters (wigner/coherent/incoherent/phased) live in `radar/transmitter.py`
as transmitters; the plain `pointbeam` (angular falloff point source,
reference `src/emitters/pointbeam.cpp:67-90`) is included here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.math import normalize, InvFourPi, Pi, safe_rsqrt
from .geometry.sample import sample_position
from .geometry.shapes import ShapeTable
from .interaction import DirectionSample

AREA = 0
POINT = 1
SPOT = 2
DIRECTIONAL = 3
CONSTANT = 4
POINTBEAM = 5
PROJECTOR = 6
ENVMAP = 7
WIGNER_AREA = 8   # area emitter x shape-aperture WDF gain (coherent.cpp)

MAX_C = 3


@dataclasses.dataclass
class EmitterSpec:
    id: str
    type: int
    value: np.ndarray                   # radiance / intensity / irradiance
    to_world: np.ndarray = None
    cutoff_angle: float = 20.0          # spot (deg)
    beam_width: float = 15.0            # spot inner angle (deg) / pointbeam
    shape: Optional[str] = None         # area: owning shape id (set by Scene)
    texture: Optional[str] = None


def _c(v):
    a = np.asarray(v, np.float32).reshape(-1)
    return np.repeat(a, MAX_C) if a.size == 1 else a


def _m4(m):
    return np.eye(4, dtype=np.float32) if m is None else np.asarray(m, np.float32)


def area(id, radiance=1.0, texture=None) -> EmitterSpec:
    return EmitterSpec(id=id, type=AREA, value=_c(radiance), texture=texture)


def coherent(id, power=1.0, gain=1.0, texture=None) -> EmitterSpec:
    """Coherent antenna emitter (reference `src/emitters/coherent.cpp`):
    radiance = power * gain * antenna_texture * shape WDF directional gain
    (`coherent.cpp:71-97` — the aperture Wigner function evaluated at the
    band-centre wavelength on the optical render path)."""
    return EmitterSpec(id=id, type=WIGNER_AREA, value=_c(power * gain),
                       texture=texture)


# `wigner` area emitter (reference src/emitters/wigner.cpp) shares the
# coherent semantics: area radiance gated by the aperture WDF
wigner_area = coherent


def incoherent(id, power=1.0, gain=1.0, texture=None) -> EmitterSpec:
    """Incoherent antenna emitter (reference `src/emitters/incoherent.cpp`):
    radiance = power * gain * antenna_texture / (6 pi)
    (`incoherent.cpp:85` geom_gain = rcp(6) * InvPi — no WDF term)."""
    return EmitterSpec(id=id, type=AREA,
                       value=_c(power * gain / (6.0 * np.pi)),
                       texture=texture)


def point(id, intensity=1.0, position=(0, 0, 0)) -> EmitterSpec:
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = position
    return EmitterSpec(id=id, type=POINT, value=_c(intensity), to_world=m)


def spot(id, intensity=1.0, cutoff_angle=20.0, beam_width=None, to_world=None) -> EmitterSpec:
    """Spot light; local +z is the beam axis (reference `src/emitters/spot.cpp`)."""
    if beam_width is None:
        beam_width = cutoff_angle * 0.75
    return EmitterSpec(id=id, type=SPOT, value=_c(intensity), to_world=_m4(to_world),
                       cutoff_angle=float(cutoff_angle), beam_width=float(beam_width))


def directional(id, irradiance=1.0, direction=(0, 0, -1)) -> EmitterSpec:
    d = np.asarray(direction, np.float32)
    d /= np.linalg.norm(d)
    m = np.eye(4, dtype=np.float32)
    m[:3, 2] = d
    return EmitterSpec(id=id, type=DIRECTIONAL, value=_c(irradiance), to_world=m)


def constant(id, radiance=1.0) -> EmitterSpec:
    return EmitterSpec(id=id, type=CONSTANT, value=_c(radiance))


def pointbeam(id, intensity=1.0, beam_width=15.0, to_world=None) -> EmitterSpec:
    return EmitterSpec(id=id, type=POINTBEAM, value=_c(intensity),
                       to_world=_m4(to_world), beam_width=float(beam_width))


def envmap(id, data, scale=1.0, to_world=None) -> EmitterSpec:
    """Equirectangular environment map (reference `src/emitters/envmap.cpp`):
    `data` is an (H, W, 3) latitude-longitude radiance image; sampling is
    importance-weighted by sin(theta)-corrected luminance via Marginal2D."""
    spec = EmitterSpec(id=id, type=ENVMAP, value=_c(scale), to_world=_m4(to_world))
    spec.env_data = np.asarray(data, np.float32)
    return spec


def projector(id, data, intensity=1.0, fov=45.0, to_world=None) -> EmitterSpec:
    """Textured spot projector (reference `src/emitters/projector.cpp`):
    projects the image within a perspective frustum along local +z."""
    spec = EmitterSpec(id=id, type=PROJECTOR, value=_c(intensity),
                       to_world=_m4(to_world), cutoff_angle=float(fov))
    spec.env_data = np.asarray(data, np.float32)
    return spec


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EmitterTable:
    type: jax.Array        # (E,) int32
    value: jax.Array       # (E,MAX_C)
    to_world: jax.Array    # (E,4,4)
    cos_cutoff: jax.Array  # (E,)
    cos_beam: jax.Array    # (E,)
    shape_idx: jax.Array   # (E,) int32 (-1 for point-likes)
    texture_idx: jax.Array
    env_img: object = None      # (H,W,3) equirect radiance (one envmap)
    env_distr: object = None    # Marginal2D over sin-weighted luminance
    env_row: int = dataclasses.field(metadata=dict(static=True), default=-1)
    proj_img: object = None     # (H,W,3) projector image (one projector)
    proj_row: int = dataclasses.field(metadata=dict(static=True), default=-1)
    # band-centre wavelength [m] for WIGNER_AREA directional gain
    wl_centre: float = dataclasses.field(metadata=dict(static=True),
                                         default=550e-9)

    @property
    def n(self) -> int:
        return self.type.shape[0]

    @staticmethod
    def build(specs, shape_of, resolve_texture,
              wl_centre: float = 550e-9) -> "EmitterTable":
        n = max(len(specs), 1)
        typ = np.zeros(n, np.int32)
        val = np.zeros((n, MAX_C), np.float32)
        tw = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        cc = np.zeros(n, np.float32)
        cb = np.zeros(n, np.float32)
        sidx = np.full(n, -1, np.int32)
        tex = np.full(n, -1, np.int32)
        env_img = None
        env_distr = None
        env_row = -1
        proj_img = None
        proj_row = -1
        for i, s in enumerate(specs):
            typ[i] = s.type
            val[i] = s.value
            if s.to_world is not None:
                tw[i] = s.to_world
            cc[i] = np.cos(np.deg2rad(s.cutoff_angle))
            cb[i] = np.cos(np.deg2rad(s.beam_width))
            sidx[i] = shape_of(s.id)
            tex[i] = resolve_texture(s.texture)
            if s.type == ENVMAP:
                from .core.distr import Marginal2D
                img = np.asarray(s.env_data, np.float32)
                lum = (0.2126 * img[..., 0] + 0.7152 * img[..., 1]
                       + 0.0722 * img[..., 2])
                h = img.shape[0]
                sin_t = np.sin((np.arange(h) + 0.5) / h * np.pi)
                env_img = jnp.asarray(img)
                env_distr = Marginal2D.build(lum * sin_t[:, None])
                env_row = i
            if s.type == PROJECTOR and s.env_data is not None:
                img = np.asarray(s.env_data, np.float32)
                if img.ndim == 2:
                    img = np.repeat(img[..., None], MAX_C, -1)
                proj_img = jnp.asarray(img)
                proj_row = i
        return EmitterTable(type=jnp.asarray(typ), value=jnp.asarray(val),
                            to_world=jnp.asarray(tw), cos_cutoff=jnp.asarray(cc),
                            cos_beam=jnp.asarray(cb), shape_idx=jnp.asarray(sidx),
                            texture_idx=jnp.asarray(tex), env_img=env_img,
                            env_distr=env_distr, env_row=env_row,
                            proj_img=proj_img, proj_row=proj_row,
                            wl_centre=float(wl_centre))




def _wdf_gain(shapes: ShapeTable, sidx, uv, d_out, wl):
    """Rect-aperture WDF directional gain (reference
    `src/shapes/rectangle.cpp:132-220` sample_wigner, consumed by the
    coherent emitter `coherent.cpp:90`): 4 tri(rx)tri(ry) sinc(2 pi nu_x
    w_x tri) sinc(2 pi nu_y w_y tri), with the local position from the
    shape uv and the wavevector nu = d/wl in the aperture frame.  Signed —
    WDF sidelobes are negative, like the radar path."""
    from .core.math import sinc as _sinc, tri as _tri
    i = jnp.maximum(sidx, 0)
    tw = shapes.to_world[i]
    c0 = tw[..., :3, 0]
    c1 = tw[..., :3, 1]
    wx = jnp.sqrt(jnp.maximum(jnp.sum(c0 * c0, -1), 1e-20))
    wy = jnp.sqrt(jnp.maximum(jnp.sum(c1 * c1, -1), 1e-20))
    lx = 2.0 * uv[..., 0] - 1.0
    ly = 2.0 * uv[..., 1] - 1.0
    nu_x = jnp.sum(c0 * d_out, -1) / wx / wl
    nu_y = jnp.sum(c1 * d_out, -1) / wy / wl
    trx = _tri(0.5 * lx)
    try_ = _tri(0.5 * ly)
    return (4.0 * trx * try_
            * _sinc(2.0 * jnp.pi * nu_x * wx * trx)
            * _sinc(2.0 * jnp.pi * nu_y * wy * try_))

def eval_hit(em: EmitterTable, em_idx, cos_theta_surface,
             shapes: ShapeTable = None, uv=None, d_in=None):
    """Radiance of an area emitter seen from direction with local cosine
    cos_theta_surface (>0 = front).  em_idx (n,), -1 = none.

    `shapes`/`uv`/`d_in` (incoming ray direction at the hit) enable the
    WIGNER_AREA directional gain; without them wigner emitters evaluate as
    plain area (callers on paths that never carry uv)."""
    i = jnp.maximum(em_idx, 0)
    typ = em.type[i]
    live = (em_idx >= 0) & ((typ == AREA) | (typ == WIGNER_AREA)) \
        & (cos_theta_surface > 0.0)
    out = jnp.where(live[..., None], em.value[i], 0.0)
    if shapes is not None and uv is not None and d_in is not None:
        g = _wdf_gain(shapes, em.shape_idx[i], uv, -d_in, em.wl_centre)
        out = jnp.where((typ == WIGNER_AREA)[..., None],
                        out * g[..., None], out)
    return out


def _env_uv(em: EmitterTable, d_world):
    """Equirect (u, v) for world directions (env emitter's frame, z-up)."""
    r = em.to_world[em.env_row][:3, :3]
    dl = jnp.einsum('ji,...j->...i', r, d_world)
    theta = jnp.arccos(jnp.clip(dl[..., 2], -1.0, 1.0))
    phi = jnp.mod(jnp.arctan2(dl[..., 1], dl[..., 0]), 2 * jnp.pi)
    return phi / (2 * jnp.pi), theta / jnp.pi


def _env_lookup(em: EmitterTable, d_world):
    u, v = _env_uv(em, d_world)
    h, w = em.env_img.shape[:2]
    px = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    py = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    return em.env_img[py, px] * em.value[em.env_row]


def eval_env(em: EmitterTable, d_world):
    """Environment radiance for escaped rays: CONSTANT emitters + envmap."""
    is_const = (em.type == CONSTANT)[:, None]
    total = jnp.sum(jnp.where(is_const, em.value, 0.0), axis=0)
    out = jnp.broadcast_to(total, d_world.shape[:-1] + (MAX_C,))
    if em.env_img is not None:
        out = out + _env_lookup(em, d_world)
    return out


def sample_direction(em: EmitterTable, shapes: ShapeTable, ref_p, u_sel, u_pos):
    """NEE: pick an emitter uniformly, sample a point/direction toward it.

    Equivalent of reference `Scene::sample_emitter_direction`
    (`scene.cpp:181-246`) minus the visibility test (the caller traces the
    shadow ray).  Returns (DirectionSample, weight (n,C) = value/pdf).
    pdf in the returned sample is the full solid-angle density including
    the 1/E emitter-choice factor.
    """
    n_em = em.n
    e = jnp.clip((u_sel * n_em).astype(jnp.int32), 0, n_em - 1)
    typ = em.type[e]
    tw = em.to_world[e]
    val = em.value[e]

    # --- area: sample position on the owning shape ---
    sidx = jnp.maximum(em.shape_idx[e], 0)
    p_s, n_s, pdf_a, uv = sample_position(shapes, sidx, u_pos)
    d_vec_a = p_s - ref_p
    dist2_a = jnp.sum(d_vec_a * d_vec_a, axis=-1)
    dist_a = jnp.sqrt(jnp.maximum(dist2_a, 1e-20))
    d_a = d_vec_a / dist_a[..., None]
    cos_l = jnp.sum(-d_a * n_s, axis=-1)
    pdf_sa = jnp.where(cos_l > 1e-6, pdf_a * dist2_a / jnp.maximum(cos_l, 1e-6), 0.0)

    # --- point-likes: delta toward position ---
    p_pt = tw[:, :3, 3]
    d_vec_p = p_pt - ref_p
    dist2_p = jnp.sum(d_vec_p * d_vec_p, axis=-1)
    dist_p = jnp.sqrt(jnp.maximum(dist2_p, 1e-20))
    d_p = d_vec_p / dist_p[..., None]
    # Spot falloff along local -z→beam axis: direction from light to ref
    axis = tw[:, :3, 2]
    cos_dir = jnp.sum(-d_p * axis, axis=-1)
    t = (cos_dir - em.cos_cutoff[e]) / jnp.maximum(
        em.cos_beam[e] - em.cos_cutoff[e], 1e-6)
    spot_fall = jnp.clip(t, 0.0, 1.0)
    spot_fall = jnp.where(cos_dir >= em.cos_beam[e], 1.0, spot_fall)
    spot_fall = jnp.where(cos_dir <= em.cos_cutoff[e], 0.0, spot_fall)
    beam_fall = jnp.exp(-jnp.maximum(1.0 - cos_dir, 0.0) /
                        jnp.maximum(1.0 - em.cos_beam[e], 1e-6))

    is_wig = typ == WIGNER_AREA
    is_area = (typ == AREA) | is_wig
    is_delta = ~is_area
    d = jnp.where(is_area[..., None], d_a, d_p)
    dist = jnp.where(is_area, dist_a, dist_p)
    p = jnp.where(is_area[..., None], p_s, p_pt)
    nrm = jnp.where(is_area[..., None], n_s, -d)

    # Intensity → radiance-equivalent weight: I/r^2 for point-likes
    inv_d2 = 1.0 / jnp.maximum(dist * dist, 1e-20)
    w_pt = val * inv_d2[..., None]
    w_pt = jnp.where((typ == SPOT)[..., None], w_pt * spot_fall[..., None], w_pt)
    w_pt = jnp.where((typ == POINTBEAM)[..., None], w_pt * beam_fall[..., None], w_pt)
    if em.proj_img is not None:
        # projector: intensity modulated by the IMAGE pixel whose
        # perspective frustum ray passes through the shading point
        # (reference `src/emitters/projector.cpp` sample_direction — the
        # image is projected along local +z with x-fov = cutoff_angle)
        twp = em.to_world[em.proj_row]
        # light -> ref direction in the projector frame
        dl = jnp.einsum('ji,...j->...i', twp[:3, :3], -d_p)
        lz = dl[..., 2]
        c_f = em.cos_cutoff[em.proj_row]
        tan_half = jnp.sqrt(jnp.maximum((1.0 - c_f) / (1.0 + c_f), 1e-12))
        h_p, w_p = em.proj_img.shape[:2]
        aspect = w_p / h_p
        safe_lz = jnp.where(jnp.abs(lz) > 1e-8, lz, 1e-8)
        u_im = 0.5 + 0.5 * (dl[..., 0] / safe_lz) / tan_half
        v_im = 0.5 + 0.5 * (dl[..., 1] / safe_lz) / (tan_half / aspect)
        inside = ((lz > 0.0) & (u_im >= 0.0) & (u_im < 1.0)
                  & (v_im >= 0.0) & (v_im < 1.0))
        px = jnp.clip((u_im * w_p).astype(jnp.int32), 0, w_p - 1)
        py = jnp.clip((v_im * h_p).astype(jnp.int32), 0, h_p - 1)
        img_v = em.proj_img[py, px] * jnp.where(inside, 1.0, 0.0)[..., None]
        w_pt = jnp.where((typ == PROJECTOR)[..., None], w_pt * img_v, w_pt)
    # directional: constant irradiance from fixed direction
    dir_axis = tw[:, :3, 2]
    d = jnp.where((typ == DIRECTIONAL)[..., None], -dir_axis, d)
    dist = jnp.where(typ == DIRECTIONAL, 1e7, dist)
    w_pt = jnp.where((typ == DIRECTIONAL)[..., None], val, w_pt)

    # constant (environment): uniform sphere direction, non-delta
    from .core import warp as _warp
    d_env = _warp.square_to_uniform_sphere(u_pos)
    is_const_env = typ == CONSTANT
    is_envmap = typ == ENVMAP
    is_env = is_const_env | is_envmap
    d = jnp.where(is_env[..., None], d_env, d)
    pdf_env = jnp.full(dist.shape, InvFourPi)
    w_env = val / InvFourPi
    if em.env_img is not None:
        # importance-sample the equirect luminance distribution
        h_img, w_img = em.env_img.shape[:2]
        r_c, c_c, pdf_cell = em.env_distr.sample(u_pos)
        theta = (r_c.astype(jnp.float32) + 0.5) / h_img * jnp.pi
        phi = (c_c.astype(jnp.float32) + 0.5) / w_img * 2 * jnp.pi
        st = jnp.sin(theta)
        dl = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi),
                        jnp.cos(theta)], -1)
        rmat = em.to_world[em.env_row][:3, :3]
        d_em = jnp.einsum('ij,...j->...i', rmat, dl)
        # pdf over solid angle: cell pdf * (H W) / (2 pi^2 sin(theta))
        pdf_sa_env = pdf_cell * (h_img * w_img) / jnp.maximum(
            2.0 * jnp.pi * jnp.pi * st, 1e-8)
        rad = em.env_img[r_c, c_c] * em.value[em.env_row]
        d = jnp.where(is_envmap[..., None], d_em, d)
        pdf_env = jnp.where(is_envmap, pdf_sa_env, pdf_env)
        # weight = radiance / pdf_solid_angle (emitter-choice 1/E applied by
        # the caller-side division like the other point-like branches)
        w_env = jnp.where(is_envmap[..., None],
                          rad / jnp.maximum(pdf_sa_env, 1e-20)[..., None],
                          w_env)
    dist = jnp.where(is_env, 1e7, dist)
    w_pt = jnp.where(is_env[..., None], w_env, w_pt)
    is_delta = is_delta & ~is_env

    pdf_sel = 1.0 / n_em
    pdf = jnp.where(is_area, pdf_sa * pdf_sel,
                    jnp.where(is_env, pdf_env * pdf_sel, pdf_sel))
    w_area = val / jnp.maximum(pdf_sa, 1e-20)[..., None]
    # coherent/wigner emitters: aperture WDF gain toward the shading point
    g_wig = _wdf_gain(shapes, em.shape_idx[e], uv, -d_a, em.wl_centre)
    w_area = jnp.where(is_wig[..., None], w_area * g_wig[..., None], w_area)
    weight = jnp.where(is_area[..., None],
                       jnp.where((pdf_sa > 0.0)[..., None], w_area, 0.0),
                       w_pt / pdf_sel)

    ds = DirectionSample(p=p, n=nrm, d=d, dist=dist, pdf=pdf,
                         delta=is_delta, uv=uv)
    return ds, weight, e


def pdf_direction_env(em: EmitterTable, d_world=None):
    """Solid-angle NEE pdf of the environment in direction d (for MIS on
    escaped rays): uniform for CONSTANT, luminance-importance for ENVMAP."""
    has_const = jnp.any(em.type == CONSTANT)
    p = jnp.where(has_const, InvFourPi / em.n, 0.0)
    if em.env_img is not None and d_world is not None:
        u, v = _env_uv(em, d_world)
        h, w = em.env_img.shape[:2]
        px = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
        py = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
        pdf_cell = em.env_distr.pdf(py, px)
        st = jnp.sin(jnp.clip(v, 1e-4, 1 - 1e-4) * jnp.pi)
        p = p + pdf_cell * (h * w) / jnp.maximum(
            2.0 * jnp.pi * jnp.pi * st, 1e-8) / em.n
    return p


def pdf_direction_area(em: EmitterTable, shapes: ShapeTable, em_idx, d, dist,
                       cos_at_emitter):
    """Solid-angle pdf that `sample_direction` would produce the area-emitter
    hit described by (d, dist, cos) — used for MIS after a BSDF sample
    (reference `Scene::pdf_emitter_direction`)."""
    i = jnp.maximum(em_idx, 0)
    live = (em_idx >= 0) & (em.type[i] == AREA)
    sidx = jnp.maximum(em.shape_idx[i], 0)
    area_pdf = 1.0 / jnp.maximum(shapes.surface_area[sidx], 1e-20)
    pdf = area_pdf * dist * dist / jnp.maximum(cos_at_emitter, 1e-6)
    pdf = pdf / em.n
    return jnp.where(live & (cos_at_emitter > 1e-6), pdf, 0.0)
