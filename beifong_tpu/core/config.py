"""Runtime band / simulation configuration.

The reference hardcodes the propagation band at compile time by hijacking the
visible-spectrum constants (`include/mitsuba/core/spectrum.h:15-40`:
MTS_WAVELENGTH_MIN/MAX, MTS_C propagation speed, MTS_P per-bounce boundary
phase).  Here the band is a runtime dataclass carried inside the compiled scene
pytree, so one binary handles sonar, MMW radar and optical without rebuilds.

Units are SI throughout: wavelength [m], frequency [Hz], time [s], speed [m/s].
(The reference uses nm-of-sound units with 1e-9 fudge factors; we do not.)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax

from . import math as m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Band:
    """Propagation band: speed, wavelength extents, per-bounce phase shift.

    Mirrors the compile-time constants in reference `spectrum.h:15-40` as a
    runtime value. `boundary_phase` is MTS_P — the phase added per reflection
    (0 for sound/pressure, pi for EM field reflections).
    """

    c: float = dataclasses.field(metadata=dict(static=True), default=m.C_AIR_SOUND)
    wavelength_min: float = dataclasses.field(metadata=dict(static=True), default=m.C_AIR_SOUND / 45e3)
    wavelength_max: float = dataclasses.field(metadata=dict(static=True), default=m.C_AIR_SOUND / 35e3)
    boundary_phase: float = dataclasses.field(metadata=dict(static=True), default=0.0)

    @property
    def freq_min(self) -> float:
        return self.c / self.wavelength_max

    @property
    def freq_max(self) -> float:
        return self.c / self.wavelength_min

    @property
    def freq_centre(self) -> float:
        return 0.5 * (self.freq_min + self.freq_max)

    @property
    def wavelength_centre(self) -> float:
        return 0.5 * (self.wavelength_min + self.wavelength_max)

    def wavelength_of(self, freq):
        return self.c / freq

    def freq_of(self, wavelength):
        return self.c / wavelength

    @staticmethod
    def from_freq(c: float, f_centre: float, f_ext: float, boundary_phase: float = 0.0) -> "Band":
        lo, hi = f_centre - 0.5 * f_ext, f_centre + 0.5 * f_ext
        return Band(c=c, wavelength_min=c / hi, wavelength_max=c / lo,
                    boundary_phase=boundary_phase)


# Presets matching the bands the reference compiles in (spectrum.h comments).
ULTRASOUND_40K = Band.from_freq(m.C_AIR_SOUND, 40e3, 10e3, boundary_phase=0.0)
SONAR_40K_NARROW = Band.from_freq(m.C_AIR_SOUND, 40e3, 2e3, boundary_phase=0.0)
MMW_94G = Band.from_freq(m.C_VACUUM, 94e9, 6e9, boundary_phase=m.Pi)
AUTO_77G = Band.from_freq(m.C_VACUUM, 77e9, 4e9, boundary_phase=m.Pi)
OPTICAL = Band(c=m.C_VACUUM, wavelength_min=360e-9, wavelength_max=830e-9,
               boundary_phase=0.0)


def band_preset(name: str) -> Band:
    presets = {
        "ultrasound_40k": ULTRASOUND_40K,
        "sonar_40k_narrow": SONAR_40K_NARROW,
        "mmw_94g": MMW_94G,
        "auto_77g": AUTO_77G,
        "optical": OPTICAL,
    }
    if name not in presets:
        raise KeyError(f"unknown band preset {name!r}; have {sorted(presets)}")
    return presets[name]


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Top-level simulation knobs (replaces reference CLI `-m/-t/-D` tiers,
    `src/mitsuba/mitsuba.cpp:171-183` + mitsuba.conf variants)."""

    max_depth: int = 8
    rr_depth: int = 1000          # Russian roulette start depth (disabled by default)
    spp: int = 1024
    spp_per_pass: int = 0          # 0 = auto (fit device memory)
    dtype: Any = None              # jnp dtype for radiometric quantities
    seed: int = 0
