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
