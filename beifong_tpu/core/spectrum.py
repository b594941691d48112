"""Spectral sampling and color conversion.

Replaces reference `include/mitsuba/core/spectrum.h` / `src/libcore/spectrum.cpp`.
For non-visible bands (radar/sonar) the reference falls back to uniform
wavelength sampling (`spectrum.h:341-376`); we do the same, parameterized by the
runtime `Band`.  For optical rendering we provide CIE XYZ via the analytic
multi-lobe Gaussian fit of Wyman, Sloan & Shirley (JCGT 2013) instead of the
reference's embedded tables.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .config import Band


def sample_uniform_wavelength(u, band: Band):
    """Uniform wavelength sample in the band; returns (wavelength [m], pdf [1/m]).

    Mirrors reference `sample_wavelength` / non-visible `sample_rgb_spectrum`
    branch (`spectrum.h:341-376`).
    """
    wl = band.wavelength_min + u * (band.wavelength_max - band.wavelength_min)
    pdf = 1.0 / (band.wavelength_max - band.wavelength_min)
    return wl, jnp.full(jnp.shape(wl), pdf)


def sample_uniform_frequency(u, band: Band):
    f = band.freq_min + u * (band.freq_max - band.freq_min)
    pdf = 1.0 / (band.freq_max - band.freq_min)
    return f, jnp.full(jnp.shape(f), pdf)


def sample_shifted(u, n: int = 4):
    """Stratified shift of one uniform into n spectral samples
    (reference `math::sample_shifted`)."""
    offs = jnp.arange(n, dtype=jnp.float32) / n
    v = u[..., None] + offs
    return v - jnp.floor(v)


# ---------------------------------------------------------------------------
# CIE 1931 XYZ (analytic fit; wavelength in nanometres)
# ---------------------------------------------------------------------------


def _gauss(x, alpha, mu, s1, s2):
    s = jnp.where(x < mu, s1, s2)
    t = (x - mu) / s
    return alpha * jnp.exp(-0.5 * t * t)


def cie1931_xyz(wl_nm):
    """Approximate CIE 1931 color matching functions (Wyman et al. 2013)."""
    x = (_gauss(wl_nm, 1.056, 599.8, 37.9, 31.0)
         + _gauss(wl_nm, 0.362, 442.0, 16.0, 26.7)
         + _gauss(wl_nm, -0.065, 501.1, 20.4, 26.2))
    y = (_gauss(wl_nm, 0.821, 568.8, 46.9, 40.5)
         + _gauss(wl_nm, 0.286, 530.9, 16.3, 31.1))
    z = (_gauss(wl_nm, 1.217, 437.0, 11.8, 36.0)
         + _gauss(wl_nm, 0.681, 459.0, 26.0, 13.8))
    return jnp.stack([x, y, z], axis=-1)


# Column-major sRGB (D65) <-> XYZ matrices.
# numpy (not jnp): module-level device arrays would initialize the XLA
# backend at import, which breaks jax.distributed.initialize ordering
_XYZ_TO_SRGB = np.array([
    [3.240479, -1.537150, -0.498535],
    [-0.969256, 1.875991, 0.041556],
    [0.055648, -0.204043, 1.057311]], np.float32)
_SRGB_TO_XYZ = np.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227]], np.float32)


def xyz_to_srgb(xyz):
    return jnp.einsum('ij,...j->...i', _XYZ_TO_SRGB, xyz)


def srgb_to_xyz(rgb):
    return jnp.einsum('ij,...j->...i', _SRGB_TO_XYZ, rgb)


def luminance(rgb):
    return (0.212671 * rgb[..., 0] + 0.715160 * rgb[..., 1]
            + 0.072169 * rgb[..., 2])


def srgb_gamma(linear):
    """Linear -> sRGB gamma encode (reference Bitmap convert path)."""
    a = 0.055
    lin = jnp.maximum(linear, 0.0)
    return jnp.where(lin <= 0.0031308, 12.92 * lin,
                     (1 + a) * jnp.power(jnp.maximum(lin, 1e-8), 1 / 2.4) - a)


# ---------------------------------------------------------------------------
# CIE standard illuminant D65 (reference `src/spectra/d65.cpp`)
# ---------------------------------------------------------------------------

# Relative SPD, 360-830 nm at 10 nm steps, normalized to 100 at 560 nm.
_D65_WL_NM0, _D65_WL_STEP = 360.0, 10.0
_D65_SPD = np.array([
    46.64, 52.09, 49.98, 54.65, 82.75, 91.49, 93.43, 86.68, 104.86, 117.01,
    117.81, 114.86, 115.92, 108.81, 109.35, 107.80, 104.79, 107.69, 104.41,
    104.05, 100.00, 96.33, 95.79, 88.69, 90.01, 89.60, 87.70, 83.29, 83.70,
    80.03, 80.21, 82.28, 78.28, 69.72, 71.61, 74.35, 61.60, 69.89, 75.09,
    63.59, 46.42, 66.81, 63.38, 64.30, 59.45, 51.96, 57.44, 60.31],
    np.float32)


def d65_curve(scale: float = 1.0):
    """(wavelengths [m], values) of the D65 illuminant SPD, normalized so the
    band-average over the visible range is `scale` (reference `d65.cpp`
    normalizes by the integral against CIE Y)."""
    wl = (_D65_WL_NM0 + _D65_WL_STEP * np.arange(_D65_SPD.size)) * 1e-9
    v = _D65_SPD / 100.0 * scale
    return wl, v.astype(np.float32)


def curve_to_rgb(wl_m, values):
    """Project a spectral curve to linear sRGB by integrating against the CIE
    matching functions under uniform wavelength weighting, normalized by the
    Y integral (so a flat unit curve maps near [1,1,1]).  Used to collapse
    regular/irregular/d65 reflectance curves for the RGB render path
    (reference `srgb_d65.cpp` spectral upsampling, run in reverse)."""
    wl = np.asarray(wl_m, np.float64)
    v = np.asarray(values, np.float64)
    xs = np.linspace(360e-9, 830e-9, 471)
    vi = np.interp(xs, wl, v, left=0.0, right=0.0)

    def g(x, alpha, mu, s1, s2):          # numpy twin of _gauss (host-side)
        s = np.where(x < mu, s1, s2)
        t = (x - mu) / s
        return alpha * np.exp(-0.5 * t * t)

    nm = xs * 1e9
    cmf = np.stack([
        g(nm, 1.056, 599.8, 37.9, 31.0) + g(nm, 0.362, 442.0, 16.0, 26.7)
        + g(nm, -0.065, 501.1, 20.4, 26.2),
        g(nm, 0.821, 568.8, 46.9, 40.5) + g(nm, 0.286, 530.9, 16.3, 31.1),
        g(nm, 1.217, 437.0, 11.8, 36.0) + g(nm, 0.681, 459.0, 26.0, 13.8),
    ], axis=-1)
    xyz = (cmf * vi[:, None]).sum(0)
    ynorm = cmf[:, 1].sum()
    rgb = np.asarray(_XYZ_TO_SRGB, np.float64) @ (xyz / max(ynorm, 1e-30))
    return np.clip(rgb, 0.0, None).astype(np.float32)


def blackbody(wl_m, temperature):
    """Planck spectral radiance [W / (m^2 sr m)] (reference `src/spectra/blackbody.cpp`)."""
    h = 6.62607015e-34
    c = 299792458.0
    kb = 1.380649e-23
    wl5 = wl_m ** 5
    return (2 * h * c * c) / (wl5 * (jnp.exp(h * c / (wl_m * kb * temperature)) - 1.0))
