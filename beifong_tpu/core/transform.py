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


# ---------------------------------------------------------------------------
# AnimatedTransform: keyframed transform for endpoint/shape motion.
# Replaces reference `include/mitsuba/core/transform.h` AnimatedTransform
# (used for endpoint velocity, `render/endpoint.h:165`): keyframes are
# decomposed into translation + rotation quaternion + symmetric stretch
# (polar decomposition) and interpolated lerp/slerp/lerp.  Host-side numpy:
# evaluation happens at scene-build time (the slow-time axis is quasistatic
# per pulse/frame), with `velocity()` supplying the intra-pulse Doppler term
# that the tracer consumes on-device.
# ---------------------------------------------------------------------------

import dataclasses as _dc

import numpy as _np


def _polar_rotation(m3):
    """Orthogonal polar factor of a 3x3 matrix (Higham iteration)."""
    r = _np.asarray(m3, _np.float64)
    for _ in range(32):
        r_next = 0.5 * (r + _np.linalg.inv(r).T)
        if _np.abs(r_next - r).max() < 1e-12:
            r = r_next
            break
        r = r_next
    return r


def _quat_from_mat(r):
    """Unit quaternion (w, x, y, z) from a rotation matrix."""
    t = _np.trace(r)
    if t > 0:
        s = _np.sqrt(t + 1.0) * 2
        return _np.array([0.25 * s, (r[2, 1] - r[1, 2]) / s,
                          (r[0, 2] - r[2, 0]) / s, (r[1, 0] - r[0, 1]) / s])
    i = int(_np.argmax(_np.diag(r)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = _np.sqrt(max(1.0 + r[i, i] - r[j, j] - r[k, k], 1e-12)) * 2
    q = _np.zeros(4)
    q[0] = (r[k, j] - r[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (r[j, i] + r[i, j]) / s
    q[1 + k] = (r[k, i] + r[i, k]) / s
    return q


def _mat_from_quat(q):
    w, x, y, z = q / _np.linalg.norm(q)
    return _np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _slerp(q0, q1, u):
    if _np.dot(q0, q1) < 0:
        q1 = -q1
    d = _np.clip(_np.dot(q0, q1), -1.0, 1.0)
    if d > 1.0 - 1e-8:
        q = (1 - u) * q0 + u * q1
        return q / _np.linalg.norm(q)
    th = _np.arccos(d)
    return (_np.sin((1 - u) * th) * q0 + _np.sin(u * th) * q1) / _np.sin(th)


@_dc.dataclass(frozen=True)
class AnimatedTransform:
    """Keyframed (time -> 4x4) transform; see module note above."""

    times: _np.ndarray     # (K,) strictly increasing keyframe times [s]
    trans: _np.ndarray     # (K, 3) translations
    quats: _np.ndarray     # (K, 4) unit rotation quaternions (w, x, y, z)
    stretch: _np.ndarray   # (K, 3, 3) symmetric stretch factors S (M3 = R S)

    @staticmethod
    def from_keyframes(pairs) -> "AnimatedTransform":
        """pairs: iterable of (time, (4,4) matrix)."""
        pairs = sorted(pairs, key=lambda p: float(p[0]))
        times, trans, quats, stretch = [], [], [], []
        prev_q = None
        for t, m in pairs:
            m = _np.asarray(m, _np.float64)
            r = _polar_rotation(m[:3, :3])
            s = r.T @ m[:3, :3]
            q = _quat_from_mat(r)
            if prev_q is not None and _np.dot(prev_q, q) < 0:
                q = -q   # keep the short arc between neighbours
            prev_q = q
            times.append(float(t))
            trans.append(m[:3, 3])
            quats.append(q)
            stretch.append(s)
        return AnimatedTransform(_np.asarray(times), _np.asarray(trans),
                                 _np.asarray(quats), _np.asarray(stretch))

    def eval(self, t: float) -> _np.ndarray:
        """Interpolated (4,4) float32 matrix at time t (clamped ends)."""
        t = float(t)
        k = int(_np.searchsorted(self.times, t, side='right')) - 1
        k = max(0, min(k, len(self.times) - 2)) if len(self.times) > 1 else 0
        if len(self.times) == 1:
            tr, q, s = self.trans[0], self.quats[0], self.stretch[0]
        else:
            t0, t1 = self.times[k], self.times[k + 1]
            u = _np.clip((t - t0) / max(t1 - t0, 1e-30), 0.0, 1.0)
            tr = (1 - u) * self.trans[k] + u * self.trans[k + 1]
            q = _slerp(self.quats[k], self.quats[k + 1], u)
            s = (1 - u) * self.stretch[k] + u * self.stretch[k + 1]
        m = _np.eye(4)
        m[:3, :3] = _mat_from_quat(q) @ s
        m[:3, 3] = tr
        return m.astype(_np.float32)

    def velocity(self, t: float, p_local=(0.0, 0.0, 0.0)) -> _np.ndarray:
        """World-frame velocity [m/s] of local point p_local at time t
        (central finite difference of the keyframe interpolation — the
        Doppler source term the reference derives from AnimatedTransform,
        `src/librender/shape.cpp:375-404`)."""
        if len(self.times) == 1:
            return _np.zeros(3, _np.float32)
        span = float(self.times[-1] - self.times[0])
        dt = max(span * 1e-5, 1e-9)
        p = _np.asarray([*p_local, 1.0])
        a = (self.eval(t + dt).astype(_np.float64) @ p)[:3]
        b = (self.eval(t - dt).astype(_np.float64) @ p)[:3]
        return ((a - b) / (2 * dt)).astype(_np.float32)
