"""Radar/optical math helpers (TPU-native).

Re-expresses the reference's radar math (beifong `include/mitsuba/core/math.h:60-135`)
as pure JAX ops: `sinc`, `tri`, `rect`, `wchirp` (Wigner distribution of a linear
chirp), spherical direction helpers, MIS heuristics, and double-single (two-float)
accumulation used for long-path phase accuracy (the reference struggles with f32
phase, see its iterative `fmodulo` workaround at `math.h:108-124`; we instead keep
a (hi, lo) compensated representation of path length and take an exact fractional
part, which keeps phase accurate over ~1e7 wavelengths in pure f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Pi = 3.141592653589793
TwoPi = 6.283185307179586
InvPi = 1.0 / Pi
InvTwoPi = 1.0 / TwoPi
InvFourPi = 1.0 / (4.0 * Pi)

# Propagation speeds (reference `math.h:40-41`).
C_VACUUM = 299792458.0
C_AIR_SOUND = 340.0
C_WATER_SOUND = 1480.0


def sinc(x):
    """Unnormalized sinc: sin(x)/x with sinc(0)=1 (reference `math.h:74-79`)."""
    x = jnp.asarray(x)
    # Guard the removable singularity; series limit at 0 is 1.
    safe = jnp.where(jnp.abs(x) > 1e-8, x, 1.0)
    return jnp.where(jnp.abs(x) > 1e-8, jnp.sin(safe) / safe, 1.0)


def tri(x):
    """Triangle function of base length 1: 1-2|x| on |x|<1/2 (reference `math.h:82-85`)."""
    x = jnp.asarray(x)
    return jnp.where(jnp.abs(x) < 0.5, 1.0 - 2.0 * jnp.abs(x), 0.0)


def rect(x):
    """Rectangular window of width 1 (reference `math.h:88-91`)."""
    x = jnp.asarray(x)
    return jnp.where(jnp.abs(x) < 0.5, 1.0, 0.0)


def fmodulo(a, b):
    """Floating modulo with result in [0, |b|) for b>0 (reference `math.h:108-124`).

    The reference implements this with an iterative subtraction loop (an enoki
    workaround); `jnp.mod` already has the right semantics on TPU.
    """
    return jnp.mod(a, b)


def wchirp(t, f, w, a):
    """Wigner distribution of a 1-D linear chirp segment (reference `math.h:127-131`).

    W(t, f) = 2 a^2 w * tri(t/w) * sinc(2*pi*f*w*tri(t/w))

    `t` is time offset from the chirp centre, `f` the frequency offset from the
    instantaneous chirp frequency, `w` the chirp extent, `a` the amplitude.
    The WDF may be negative — downstream accumulators must not clamp.
    """
    tw = tri(t / w)
    return 2.0 * a * a * w * tw * sinc(TwoPi * f * w * tw)


def sphdir(theta, phi):
    """Spherical angles to unit direction (reference `math.h:51-61`)."""
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return jnp.stack([cp * st, sp * st, ct], axis=-1)


def safe_sqrt(x):
    """sqrt clamped at 0 with a finite gradient for x <= 0.

    The naive sqrt(maximum(x, 0)) back-propagates 0 * sqrt'(0) = NaN on
    clamped lanes, poisoning geometry gradients (inverse rendering
    differentiates through miss-lane discriminants); the double-where
    keeps the forward value identical and the cotangent exactly 0 there.
    """
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def safe_rsqrt(x):
    return jax.lax.rsqrt(jnp.maximum(x, 1e-30))


def safe_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def sqr(x):
    return x * x


def dot(a, b, keepdims: bool = False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def norm(a, keepdims: bool = False):
    return jnp.sqrt(jnp.maximum(jnp.sum(a * a, axis=-1, keepdims=keepdims), 0.0))


def normalize(a):
    return a * safe_rsqrt(jnp.sum(a * a, axis=-1, keepdims=True))


def cross(a, b):
    return jnp.cross(a, b)


def lerp(a, b, t):
    return a + (b - a) * t


def mis_weight(pdf_a, pdf_b):
    """Power heuristic (beta=2) MIS weight, matching the reference path tracers
    (`src/integrators/path.cpp` mis_weight)."""
    pdf_a = pdf_a * pdf_a
    pdf_b = pdf_b * pdf_b
    w = pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-30)
    return jnp.where(pdf_a > 0.0, w, 0.0)


def mis_balance(pdf_a, pdf_b):
    return pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-30)


# ---------------------------------------------------------------------------
# Double-single (compensated two-float) arithmetic.
#
# A value is represented as (hi, lo) with value = hi + lo and |lo| <= ulp(hi)/2.
# Used for accumulating path length / retarded time / phase over many bounces
# where a single f32 aliases (hard part #3 in SURVEY.md §7).
# ---------------------------------------------------------------------------


def two_sum(a, b):
    """Error-free transformation: a + b = s + e exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def ds(hi, lo=None):
    hi = jnp.asarray(hi, jnp.float32)
    if lo is None:
        lo = jnp.zeros_like(hi)
    return hi, lo


def ds_add(x, y):
    """(hi,lo) + (hi,lo) -> (hi,lo)."""
    xh, xl = x
    yh, yl = y
    s, e = two_sum(xh, yh)
    e = e + xl + yl
    hi, lo = two_sum(s, e)
    return hi, lo


def ds_add_f(x, y):
    """(hi,lo) + scalar f32 -> (hi,lo)."""
    xh, xl = x
    s, e = two_sum(xh, y)
    e = e + xl
    hi, lo = two_sum(s, e)
    return hi, lo


def ds_neg(x):
    return -x[0], -x[1]


def ds_to_f(x):
    return x[0] + x[1]


def _split(a):
    """Veltkamp split of an f32 into two 12-bit halves (exact)."""
    c = a * jnp.float32(4097.0)  # 2^12 + 1
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Error-free product: a*b = p + e exactly (Dekker, f32, no FMA needed)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def ds_inv(b):
    """Double-single reciprocal of an f32 scalar: returns (hi, lo) with
    hi + lo ~= 1/b to ~2^-46 relative accuracy."""
    b = jnp.asarray(b, jnp.float32)
    inv_hi = 1.0 / b
    p, pe = two_prod(inv_hi, b)
    r = (1.0 - p) - pe
    inv_lo = r / b
    return inv_hi, inv_lo


def wlfrac_zero(shape=()):
    """Fractional wavelength-count accumulator, value in [0, 1) cycles."""
    z = jnp.zeros(shape, jnp.float32)
    return z, jnp.zeros_like(z)


def _frac_renorm(hi, lo):
    """Renormalize a ds pair into ([0,1) hi, tiny lo)."""
    h = hi - jnp.floor(hi)
    h2, l2 = two_sum(h, lo)
    h3 = h2 - jnp.floor(h2)
    return h3, l2


def wlfrac_add_dist(acc, dist, inv_wl_ds):
    """acc += frac(dist / wavelength), all error-free in f32 pairs.

    `inv_wl_ds` is `ds_inv(wavelength)`.  Replaces the reference's
    `Ray::update_state` phase accumulation (`include/mitsuba/core/ray.h:89-93`)
    which aliases badly in f32 once dist/wavelength exceeds ~2^24 cycles
    (SURVEY.md hard part #3): here the integer cycle count is discarded
    per-segment with exact (Sterbenz) subtractions, so phase stays accurate
    over arbitrarily long paths.
    """
    ah, al = acc
    ih, il = inv_wl_ds
    p1, e1 = two_prod(dist, ih)
    # q = dist/wl = p1 + e1 + dist*il (+ O(2^-48) relative)
    q_hi, q_lo = two_sum(p1, e1 + dist * il)
    f_hi = q_hi - jnp.floor(q_hi)          # exact (Sterbenz)
    h, l = two_sum(ah, f_hi)
    l = l + al + q_lo
    return _frac_renorm(h, l)


def wlfrac_phase(acc):
    """Accumulated phase in radians, in [0, 2*pi)."""
    return TwoPi * _frac_renorm(*acc)[0]


def ds_mul(x, y):
    """(hi,lo) * (hi,lo) -> (hi,lo) (~2^-46 relative)."""
    xh, xl = x
    yh, yl = y
    p, e = two_prod(xh, yh)
    e = e + xh * yl + xl * yh
    return two_sum(p, e)


def ds_const(v):
    """Split a Python float (f64, known at trace time) into an f32 (hi, lo)
    pair with hi + lo == v to ~2^-48 relative."""
    import numpy as np
    hi = np.float32(v)
    lo = np.float32(np.float64(v) - np.float64(hi))
    return jnp.float32(hi), jnp.float32(lo)


def cyc_frac_prod(a_ds, b):
    """frac((a_hi + a_lo) * b) for f32 array b — exact-for-inputs cycle
    count of a big product (e.g. carrier freq x time), in [0, 1)."""
    ah, al = a_ds
    p, e = two_prod(jnp.broadcast_to(jnp.float32(ah), jnp.shape(b)), b)
    fr = (p - jnp.floor(p)) + (e + al * b)
    return fr - jnp.floor(fr)


def wlfrac_add_phase(acc, phase_rad):
    """Add a raw phase offset (e.g. per-bounce boundary phase MTS_P,
    reference `spectrum.h:36-40`) in radians to the cycle accumulator."""
    h, l = two_sum(acc[0], phase_rad * jnp.float32(InvTwoPi))
    return _frac_renorm(h, l + acc[1])
