"""BSDF parameter tables (SoA) + host-side constructors.

Replaces the reference's BSDF plugin family (`src/bsdfs/*.cpp`, 17 plugins)
with one parameter table and masked wavefront dispatch in `eval.py`.  The
radar-relevant set (diffuse, conductor, roughconductor, twosided, mask, null —
SURVEY.md §2.3) plus the common optical ones are first-class; `twosided` is a
per-row flag rather than a wrapper plugin (the shading frame is already
two-sided; the flag controls whether back-face lobes are evaluated).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

DIFFUSE = 0
CONDUCTOR = 1          # smooth mirror with complex Fresnel (delta lobe)
ROUGH_CONDUCTOR = 2    # GGX microfacet
DIELECTRIC = 3         # smooth glass (delta reflect+refract)
THIN_DIELECTRIC = 4
PLASTIC = 5            # diffuse base + smooth dielectric coat
ROUGH_PLASTIC = 6      # diffuse base + GGX coat
NULL = 7               # passthrough (participating-media boundaries)
MASK = 8               # opacity-weighted nested bsdf
BLEND = 9              # convex blend of two nested bsdfs
ROUGH_DIELECTRIC = 10  # GGX microfacet glass (reflect + refract)
MEASURED = 11          # tabulated isotropic BRDF (theta_i, theta_o, dphi)

MAX_C = 3  # parameter storage channel count (rgb); mono scenes use channel 0


@dataclasses.dataclass
class BSDFSpec:
    """Host-side BSDF description."""

    id: str
    type: int
    reflectance: np.ndarray          # (MAX_C,) albedo / specular reflectance
    alpha: float = 0.1               # roughness
    eta: np.ndarray = None           # (MAX_C,) real part of IOR (or ratio)
    k: np.ndarray = None             # (MAX_C,) imaginary part (conductors)
    twosided: bool = False
    texture: Optional[str] = None    # texture id for reflectance
    nested0: Optional[str] = None    # nested bsdf ids (mask/blend)
    nested1: Optional[str] = None
    weight: float = 0.5              # blend weight / mask opacity
    normalmap: Optional[str] = None  # texture id: tangent-space normal map
    bumpmap: Optional[str] = None    # texture id: height map (channel 0)


def _c(v, default=1.0) -> np.ndarray:
    if v is None:
        v = default
    a = np.asarray(v, np.float32).reshape(-1)
    if a.size == 1:
        a = np.repeat(a, MAX_C)
    assert a.size == MAX_C
    return a


def diffuse(id, reflectance=0.5, twosided=False, texture=None) -> BSDFSpec:
    """Lambertian (reference `src/bsdfs/diffuse.cpp`)."""
    return BSDFSpec(id=id, type=DIFFUSE, reflectance=_c(reflectance),
                    twosided=twosided, texture=texture)


def conductor(id, eta=0.2, k=3.0, specular_reflectance=1.0,
              twosided=False) -> BSDFSpec:
    """Smooth conductor (reference `src/bsdfs/conductor.cpp`)."""
    return BSDFSpec(id=id, type=CONDUCTOR, reflectance=_c(specular_reflectance),
                    eta=_c(eta), k=_c(k), twosided=twosided)


def rough_conductor(id, alpha=0.1, eta=0.2, k=3.0, specular_reflectance=1.0,
                    twosided=False) -> BSDFSpec:
    """GGX rough conductor (reference `src/bsdfs/roughconductor.cpp`)."""
    return BSDFSpec(id=id, type=ROUGH_CONDUCTOR, reflectance=_c(specular_reflectance),
                    alpha=float(alpha), eta=_c(eta), k=_c(k), twosided=twosided)


def dielectric(id, int_ior=1.5046, ext_ior=1.000277,
               specular_reflectance=1.0, specular_transmittance=1.0) -> BSDFSpec:
    """Smooth dielectric (reference `src/bsdfs/dielectric.cpp`); `reflectance`
    stores specular_reflectance, transmittance goes in `k`."""
    return BSDFSpec(id=id, type=DIELECTRIC, reflectance=_c(specular_reflectance),
                    eta=_c(int_ior / ext_ior), k=_c(specular_transmittance),
                    twosided=True)


def rough_dielectric(id, alpha=0.1, int_ior=1.5046, ext_ior=1.000277,
                     specular_reflectance=1.0,
                     specular_transmittance=1.0) -> BSDFSpec:
    """GGX rough glass (reference `src/bsdfs/roughdielectric.cpp`)."""
    return BSDFSpec(id=id, type=ROUGH_DIELECTRIC,
                    reflectance=_c(specular_reflectance), alpha=float(alpha),
                    eta=_c(int_ior / ext_ior), k=_c(specular_transmittance),
                    twosided=True)


def thin_dielectric(id, int_ior=1.5046, ext_ior=1.000277) -> BSDFSpec:
    return BSDFSpec(id=id, type=THIN_DIELECTRIC, reflectance=_c(1.0),
                    eta=_c(int_ior / ext_ior), k=_c(1.0), twosided=True)


def plastic(id, diffuse_reflectance=0.5, int_ior=1.49, ext_ior=1.000277,
            twosided=False, texture=None) -> BSDFSpec:
    return BSDFSpec(id=id, type=PLASTIC, reflectance=_c(diffuse_reflectance),
                    eta=_c(int_ior / ext_ior), twosided=twosided, texture=texture)


def rough_plastic(id, diffuse_reflectance=0.5, alpha=0.1, int_ior=1.49,
                  ext_ior=1.000277, twosided=False, texture=None) -> BSDFSpec:
    return BSDFSpec(id=id, type=ROUGH_PLASTIC, reflectance=_c(diffuse_reflectance),
                    alpha=float(alpha), eta=_c(int_ior / ext_ior),
                    twosided=twosided, texture=texture)


def measured(id, brdf_grid, twosided=False) -> BSDFSpec:
    """Tabulated isotropic BRDF (reference `src/bsdfs/measured.cpp`, RGL
    format): `brdf_grid` is (n_theta_i, n_theta_o, n_dphi[, C]) of BRDF
    values f_r (WITHOUT the cosine factor) on uniform angle grids
    theta in [0, pi/2], dphi in [0, pi] (isotropic + reciprocal symmetry).
    Sampling uses the cosine hemisphere (pdf exact; weights = f*cos/pdf).
    One measured table per scene."""
    g = np.asarray(brdf_grid, np.float32)
    if g.ndim == 3:
        g = np.repeat(g[..., None], MAX_C, -1)
    spec = BSDFSpec(id=id, type=MEASURED, reflectance=_c(1.0),
                    twosided=twosided)
    spec.brdf_grid = g
    return spec


def null(id="null") -> BSDFSpec:
    return BSDFSpec(id=id, type=NULL, reflectance=_c(0.0), twosided=True)


def mask(id, nested, opacity=0.5) -> BSDFSpec:
    return BSDFSpec(id=id, type=MASK, reflectance=_c(opacity), nested0=nested,
                    weight=float(opacity), twosided=True)


def blend(id, bsdf0, bsdf1, weight=0.5) -> BSDFSpec:
    return BSDFSpec(id=id, type=BLEND, reflectance=_c(weight), nested0=bsdf0,
                    nested1=bsdf1, weight=float(weight))


def normalmap(id, nested, texture) -> BSDFSpec:
    """Tangent-space normal map over a nested BSDF (reference
    `src/bsdfs/normalmap.cpp`).  The perturbation applies to the shading
    frame at intersection time (scene.ray_intersect)."""
    spec = BSDFSpec(id=id, type=BLEND, reflectance=_c(1.0), nested0=nested,
                    nested1=nested, weight=1.0, normalmap=texture)
    return spec


def bumpmap(id, nested, texture, scale: float = 1.0) -> BSDFSpec:
    """Height-field bump map (reference `src/bsdfs/bumpmap.cpp`): finite
    differences of the height texture tilt the shading normal."""
    spec = BSDFSpec(id=id, type=BLEND, reflectance=_c(1.0), nested0=nested,
                    nested1=nested, weight=1.0, bumpmap=texture)
    spec.alpha = float(scale)
    return spec


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSDFTable:
    type: jax.Array          # (B,) int32
    reflectance: jax.Array   # (B,MAX_C)
    alpha: jax.Array         # (B,)
    eta: jax.Array           # (B,MAX_C)
    k: jax.Array             # (B,MAX_C)
    twosided: jax.Array      # (B,) bool
    texture_idx: jax.Array   # (B,) int32 (-1: use constant reflectance)
    nested0: jax.Array       # (B,) int32 (-1 none)
    nested1: jax.Array       # (B,) int32
    weight: jax.Array        # (B,)
    normalmap_idx: jax.Array  # (B,) int32 (-1 none)
    bumpmap_idx: jax.Array    # (B,) int32 (-1 none)
    # static set of type codes present — lets eval/sample skip dead lobes
    present: tuple = dataclasses.field(metadata=dict(static=True),
                                       default=())
    measured_grid: object = None   # (Nti,Nto,Ndp,MAX_C) one table per scene

    @staticmethod
    def build(specs: list[BSDFSpec], resolve_texture) -> "BSDFTable":
        n = max(len(specs), 1)

        def col(fn, shape, dtype=np.float32, fill=0):
            a = np.full((n, *shape), fill, dtype)
            for i, s in enumerate(specs):
                a[i] = fn(s)
            return jnp.asarray(a)

        ids = {s.id: i for i, s in enumerate(specs)}
        return BSDFTable(
            type=col(lambda s: s.type, (), np.int32),
            reflectance=col(lambda s: s.reflectance, (MAX_C,)),
            alpha=col(lambda s: max(s.alpha, 1e-3), ()),
            eta=col(lambda s: _c(s.eta, 1.5), (MAX_C,)),
            k=col(lambda s: _c(s.k, 0.0 if s.type != DIELECTRIC else 1.0), (MAX_C,)),
            twosided=col(lambda s: s.twosided, (), bool),
            texture_idx=col(lambda s: resolve_texture(s.texture), (), np.int32, -1),
            nested0=col(lambda s: ids.get(s.nested0, -1), (), np.int32, -1),
            nested1=col(lambda s: ids.get(s.nested1, -1), (), np.int32, -1),
            weight=col(lambda s: s.weight, ()),
            normalmap_idx=col(lambda s: resolve_texture(s.normalmap), (),
                              np.int32, -1),
            bumpmap_idx=col(lambda s: resolve_texture(s.bumpmap), (),
                            np.int32, -1),
            present=tuple(sorted({s.type for s in specs})),
            measured_grid=next(
                (jnp.asarray(s.brdf_grid) for s in specs
                 if getattr(s, 'brdf_grid', None) is not None), None))
