"""CLI smoke tests (subprocess, CPU backend)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/python_scripts"


def _run_cli(args):
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable, "-m", "beifong_tpu", *args],
                          cwd=REPO, env=env, capture_output=True, text=True,
                          timeout=600)


@pytest.mark.skipif(not os.path.exists(f"{REF}/trans_image.xml"),
                    reason="reference scenes not mounted")
def test_cli_renders_reference_scene(tmp_path):
    out = tmp_path / "out.exr"
    r = _run_cli([f"{REF}/trans_image.xml", "-D", "spp=4", "-D", "resx=8",
                  "-D", "resy=8", "--band", "optical", "--depth", "2",
                  "--cpu", "-o", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
    from beifong_tpu.io.bitmap import read_exr
    img, names = read_exr(str(out))
    assert np.isfinite(img).all()


def test_cli_receive(tmp_path):
    # write a radar scene via the dict->xml writer, then receive via CLI
    from beifong_tpu.util import dict_to_xml
    import numpy as np
    from beifong_tpu.core import transform as tf
    aim = np.asarray(tf.compose(tf.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                tf.scale([0.05, 0.05, 1.0])))
    aim_rx = np.asarray(tf.compose(tf.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                                   tf.scale([0.05, 0.05, 1.0])))
    tgt = np.asarray(tf.compose(tf.look_at([0, -4, 0], [0, 0, 0]),
                                tf.scale(0.5)))
    d = {
        "type": "scene",
        "mat": {"type": "diffuse", "id": "mat", "reflectance": 1.0},
        "txs": {"type": "rectangle", "to_world": aim,
                "tx": {"type": "wignertransmitter", "signaltype": "pulse",
                       "prf": 10.0, "pulse_len": 2e-3, "freq_centre": 40e3,
                       "freq_ext": 2e3, "sig_is_delta": True,
                       "resample_freq": True}},
        "rxs": {"type": "rectangle", "to_world": aim_rx,
                "rx": {"type": "wignerreceiver", "receive_type": "raw",
                       "adc_sampling_start": 0.0,
                       "adc_sampling_time": 0.06,
                       "adc": {"type": "hdradc", "width": 1, "height": 32,
                               "freq_lo": 35e3, "freq_hi": 45e3}}},
        "tgt": {"type": "rectangle", "to_world": tgt,
                "ref0": {"type": "ref", "id": "mat"}},
    }
    scene_xml = tmp_path / "radar.xml"
    dict_to_xml(d, str(scene_xml))
    out = tmp_path / "sig.exr"
    r = _run_cli([str(scene_xml), "-r", "0", "--spp", "2048", "--depth", "2",
                  "--cpu", "-o", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
