import numpy as np
import pytest
import jax.numpy as jnp

from beifong_tpu.chi2 import ChiSquareTest
from beifong_tpu.core import warp
from beifong_tpu.util import dict_to_xml, db10, time_string


def test_chi2_accepts_correct_sampler():
    t = ChiSquareTest(sample_fn=warp.square_to_cosine_hemisphere,
                      pdf_fn=warp.square_to_cosine_hemisphere_pdf,
                      sample_count=100_000)
    assert t.run(), t.messages
    assert t.p_value > 0.01


def test_chi2_rejects_wrong_pdf():
    # sample cosine hemisphere but claim uniform-hemisphere pdf
    t = ChiSquareTest(sample_fn=warp.square_to_cosine_hemisphere,
                      pdf_fn=warp.square_to_uniform_hemisphere_pdf,
                      sample_count=100_000)
    assert not t.run(), t.messages


def test_dict_to_xml_roundtrip(tmp_path):
    import beifong_tpu as bt
    from beifong_tpu.io.scene_loader import load_dict, load_xml
    d = {
        "type": "scene",
        "mat": {"type": "diffuse", "id": "mat",
                "reflectance": {"type": "spectrum", "value": 0.7}},
        "tgt": {"type": "rectangle", "to_world": np.eye(4, dtype=np.float32),
                "ref0": {"type": "ref", "id": "mat"}},
        "light": {"type": "point", "intensity": {"type": "spectrum", "value": 2.0},
                  "position": [0.0, 0.0, 3.0]},
    }
    xml = dict_to_xml(d, str(tmp_path / "scene.xml"))
    assert "<shape" in xml and "<bsdf" in xml and '<ref id="mat"/>' in xml
    scene, meta = load_xml(str(tmp_path / "scene.xml"))
    assert len(scene.shapes) == 1
    assert len(scene.bsdfs) == 1
    assert len(scene.emitters) == 1
    sd = scene.compile()
    assert float(sd.bsdfs.reflectance[0, 0]) == pytest.approx(0.7)


def test_db_and_time_helpers():
    assert db10(100.0) == pytest.approx(20.0)
    assert db10(0.0) == pytest.approx(-300.0)
    assert time_string(0.5) == "500.0ms"
    assert time_string(90) == "1m 30.0s"


def test_quad_rules():
    """Gauss-Legendre exact for degree 2n-1; Simpson rules integrate
    smooth functions (reference quad.h)."""
    import numpy as np
    from beifong_tpu.core.quad import (gauss_legendre, composite_simpson,
                                       composite_simpson_38, integrate)
    for n in (2, 4, 8):
        x, w = gauss_legendre(n)
        for deg in range(2 * n):
            exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
            assert np.sum(w * x ** deg) == pytest.approx(exact, abs=1e-12)
    x, w = composite_simpson(9)
    assert np.sum(w * np.cos(x)) == pytest.approx(2 * np.sin(1.0), abs=2e-4)
    x, w = composite_simpson_38(10)
    assert np.sum(w * np.cos(x)) == pytest.approx(2 * np.sin(1.0), abs=2e-4)
    assert integrate(np.exp, 0.0, 1.0, 16) == pytest.approx(np.e - 1,
                                                            rel=1e-12)


def test_spline_eval_integrate():
    """Catmull-Rom spline: exact at knots, beats linear interp on smooth
    curves, integrate_1d matches the analytic integral (reference
    spline.h)."""
    import numpy as np
    import jax.numpy as jnp
    from beifong_tpu.core.spline import eval_1d, integrate_1d, eval_2d
    xs = np.linspace(0.0, np.pi, 9)
    v = np.sin(xs)
    q = jnp.asarray(np.linspace(0, np.pi, 101))
    got = np.asarray(eval_1d(0.0, np.pi, jnp.asarray(v), q))
    ref = np.sin(np.asarray(q))
    lin = np.interp(np.asarray(q), xs, v)
    assert np.abs(got - ref).max() < 0.2 * np.abs(lin - ref).max() + 1e-9
    # knots exact
    gk = np.asarray(eval_1d(0.0, np.pi, jnp.asarray(v), jnp.asarray(xs)))
    np.testing.assert_allclose(gk, v, atol=1e-6)
    # integral of sin over [0, pi] = 2
    I = np.asarray(integrate_1d(0.0, np.pi, jnp.asarray(v)))
    assert I[-1] == pytest.approx(2.0, abs=5e-3)
    assert I[0] == 0.0
    # 2-D separable: f(x,y) = sin(x) cos(y) on a coarse grid
    ys = np.linspace(0.0, 1.0, 7)
    grid = np.cos(ys)[:, None] * np.sin(xs)[None, :]
    qx = jnp.asarray([0.4, 1.3, 2.2])
    qy = jnp.asarray([0.1, 0.5, 0.9])
    g2 = np.asarray(eval_2d(0.0, np.pi, 0.0, 1.0, jnp.asarray(grid), qx, qy))
    ref2 = np.sin(np.asarray(qx)) * np.cos(np.asarray(qy))
    np.testing.assert_allclose(g2, ref2, atol=5e-3)
