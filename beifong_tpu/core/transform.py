"""Affine transforms and orthonormal frames.

TPU-native replacement for reference `include/mitsuba/core/transform.h` /
`src/libcore/transform.cpp`: plain (4,4) arrays + pure functions instead of a
Transform class; frames are (3,3) row-stacked (s, t, n) bases.  Everything
broadcasts over leading batch dims and works under jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math import normalize, cross, safe_rsqrt


def identity():
    return jnp.eye(4, dtype=jnp.float32)


def translate(v):
    t = jnp.eye(4, dtype=jnp.float32)
    return t.at[:3, 3].set(jnp.asarray(v, jnp.float32))


def scale(v):
    v = jnp.asarray(v, jnp.float32)
    if v.ndim == 0:
        v = jnp.full((3,), v)
    return jnp.diag(jnp.concatenate([v, jnp.ones((1,), jnp.float32)]))


def rotate(axis, angle_deg):
    """Rotation about `axis` by `angle_deg` degrees (matches Mitsuba XML
    `<rotate>` semantics)."""
    a = normalize(jnp.asarray(axis, jnp.float32))
    th = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    s, c = jnp.sin(th), jnp.cos(th)
    x, y, z = a[0], a[1], a[2]
    r = jnp.array([
        [c + x * x * (1 - c), x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
        [y * x * (1 - c) + z * s, c + y * y * (1 - c), y * z * (1 - c) - x * s],
        [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s, c + z * z * (1 - c)],
    ], jnp.float32)
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, :3].set(r)


def look_at(origin, target, up=(0.0, 0.0, 1.0)):
    """Camera-style look-at: maps local +Z to (target-origin), matching
    Mitsuba's `<lookat>` (reference `transform.h` look_at)."""
    origin = jnp.asarray(origin, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    d = normalize(target - origin)
    left = normalize(cross(up, d))
    new_up = cross(d, left)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, 0].set(left)
    m = m.at[:3, 1].set(new_up)
    m = m.at[:3, 2].set(d)
    m = m.at[:3, 3].set(origin)
    return m


def compose(*mats):
    """compose(A, B, C) = A @ B @ C (applied right-to-left, like Mitsuba's
    `*` chain)."""
    out = mats[0]
    for mx in mats[1:]:
        out = out @ mx
    return out


def inverse(m):
    return jnp.linalg.inv(m)


def apply_point(m, p):
    """Transform points; supports batched p of shape (..., 3)."""
    r = jnp.einsum('ij,...j->...i', m[:3, :3], p) + m[:3, 3]
    return r


def apply_vector(m, v):
    return jnp.einsum('ij,...j->...i', m[:3, :3], v)


def apply_normal(m_inv, n):
    """Transform normals with the inverse-transpose: n' = (M^-1)^T n."""
    return jnp.einsum('ji,...j->...i', m_inv[:3, :3], n)


# ---------------------------------------------------------------------------
# Frames: orthonormal (s, t, n) bases stored as (..., 3, 3) with rows s, t, n.
# Replaces reference `include/mitsuba/core/frame.h`.
# ---------------------------------------------------------------------------


def frame_from_normal(n):
    """Build an orthonormal frame around normal n (Duff et al. branchless)."""
    n = jnp.asarray(n)
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack([1.0 + sign * n[..., 0] ** 2 * a, sign * b, -sign * n[..., 0]], axis=-1)
    t = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return jnp.stack([s, t, n], axis=-2)


def to_local(frame, v):
    """World -> local: rows of `frame` are the basis vectors."""
    return jnp.einsum('...ij,...j->...i', frame, v)


def to_world(frame, v):
    return jnp.einsum('...ji,...j->...i', frame, v)


def cos_theta(v_local):
    return v_local[..., 2]
