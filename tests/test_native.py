"""Native C++ component tests: builder/parser parity with Python fallbacks."""

import numpy as np
import pytest
import jax.numpy as jnp

from beifong_tpu import native
from beifong_tpu.geometry import bvh as bvh_mod
from beifong_tpu.geometry.mesh import load_obj, make_grid


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def _soup(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    a = rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    b = rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    return c, a, b


def test_native_bvh_traversal_matches_python_build():
    v0, e1, e2 = _soup(3000, seed=2)
    bvh_n = bvh_mod.build(v0, e1, e2, use_native=True)
    bvh_p = bvh_mod.build(v0, e1, e2, use_native=False)
    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.uniform(-3, 3, (256, 3)).astype(np.float32))
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_n, i_n, _, _ = bvh_mod.traverse_closest(bvh_n, o, d)
    t_p, i_p, _, _ = bvh_mod.traverse_closest(bvh_p, o, d)
    np.testing.assert_allclose(np.asarray(t_n), np.asarray(t_p), rtol=1e-5)
    hit = np.isfinite(np.asarray(t_p))
    np.testing.assert_array_equal(np.asarray(i_n)[hit], np.asarray(i_p)[hit])


def test_native_obj_parser_matches_python(tmp_path):
    p = tmp_path / "mesh.obj"
    lines = ["# test mesh"]
    v, f = make_grid(6, 6)
    for vv in v:
        lines.append(f"v {vv[0]} {vv[1]} {vv[2]}")
    for ff in f[: len(f) // 2]:
        lines.append(f"f {ff[0] + 1} {ff[1] + 1} {ff[2] + 1}")
    # one quad to exercise fan triangulation + texture/normal indices
    lines.append("f 1/1/1 2/2/2 9/3/3 8/4/4")
    p.write_text("\n".join(lines) + "\n")
    m_native = load_obj(str(p), use_native=True)
    m_python = load_obj(str(p), use_native=False)
    np.testing.assert_allclose(m_native.vertices, m_python.vertices)
    np.testing.assert_array_equal(m_native.faces, m_python.faces)


def test_native_builder_speed_sanity():
    """Native build of a 50k-triangle soup completes quickly and yields a
    valid tree."""
    import time
    v0, e1, e2 = _soup(50_000, seed=5)
    t0 = time.time()
    bvh = bvh_mod.build(v0, e1, e2, use_native=True)
    dt = time.time() - t0
    assert bvh.n_nodes > 50_000 / bvh_mod.LEAF_SIZE
    assert dt < 5.0, f"native build too slow: {dt:.1f}s"
