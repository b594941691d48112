"""Spectral curve textures (reference `src/spectra/{regular,irregular,d65}.cpp`).

The reference carries radar band tables as regular/irregular spectra evaluated
at each ray's sampled wavelength; d65/srgb_d65 feed optical scenes.  Here
curves are fixed-grid textures gathered per-lane in the radar path and
collapsed to band means / RGB projections where no wavelength exists.
"""

import numpy as np
import pytest


def test_curve_texture_eval_matches_interp():
    import jax.numpy as jnp
    from beifong_tpu.textures import spectrum_curve, TextureTable, texture_eval

    wl = np.array([1.0e-3, 2.0e-3, 4.0e-3])
    v = np.array([0.0, 1.0, 0.5])
    s = spectrum_curve("c", wavelengths=wl, values=v)
    tab = TextureTable.build([s])
    q = jnp.asarray([0.5e-3, 1.5e-3, 2.0e-3, 3.0e-3, 4.5e-3])
    got = np.asarray(texture_eval(tab, jnp.zeros(5, jnp.int32),
                                  jnp.zeros((5, 2)), wl=q))[:, 0]
    want = np.array([0.0, 0.5, 1.0, 0.75, 0.0])  # 0 outside support
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_regular_spectrum_dict_loads_as_texture():
    from beifong_tpu.io.scene_loader import load_dict
    d = {
        "type": "scene",
        "mat": {"type": "diffuse",
                "reflectance": {"type": "regular", "lambda_min": 7.6e-3,
                                "lambda_max": 9.7e-3,
                                "values": "0.1 0.9"}},
        "tgt": {"type": "rectangle", "bsdf": {"type": "ref", "id": "mat"}},
    }
    scene, _ = load_dict(d)
    assert len(scene.textures) == 1
    assert scene.bsdfs[0].texture == scene.textures[0].id
    sd = scene.compile()
    assert int(np.asarray(sd.bsdfs.texture_idx)[0]) == 0


def test_d65_and_srgb_d65_collapse():
    from beifong_tpu.io.scene_loader import _refl_of
    from beifong_tpu.core.config import OPTICAL
    r = _refl_of({"radiance": {"type": "d65"}}, "radiance", band=OPTICAL)
    assert 0.5 < float(r) < 1.5       # D65 normalized near unity
    r2 = _refl_of({"radiance": {"type": "srgb_d65", "color": [0.5, 0.5, 0.5]}},
                  "radiance", band=OPTICAL)
    assert abs(float(r2) / float(r) - 0.5) < 0.05


def test_d65_curve_is_white_in_srgb():
    from beifong_tpu.core import spectrum as spec
    wl, v = spec.d65_curve()
    rgb = spec.curve_to_rgb(wl, v)
    assert np.all(np.abs(rgb - 1.0) < 0.05), rgb


def test_subband_reflectance_localizes_adc_frequency_axis():
    """An irregular reflectance curve that is 1 only on the upper half of the
    band (reference `trans_image.xml:66` pattern) must kill connections whose
    sampled wavelength falls outside it: the ADC frequency axis shows energy
    only in the covered bins, and total energy scales by ~ the covered
    fraction vs a flat-reflectance run."""
    import jax.numpy as jnp
    import beifong_tpu as bt
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tf
    from beifong_tpu.core.config import Band
    from beifong_tpu.textures import spectrum_curve
    from beifong_tpu.radar import (pulse, wigner_transmitter, wigner_receiver,
                                   ADCConfig)
    from beifong_tpu.receive import receive

    from beifong_tpu.radar import linfmcw

    C = 340.0
    band = Band.from_freq(C, 40e3, 10e3)   # 35-45 kHz

    def build(curve):
        s = sc.Scene(band=band)
        if curve:
            # reflective only for f in [40, 45] kHz  (wl in [7.56, 8.5] mm)
            s.add(spectrum_curve("bandrefl",
                                 wavelengths=[C / 45e3, C / 40e3,
                                              C / 39.999e3, C / 35e3],
                                 values=[1.0, 1.0, 0.0, 0.0], band=band))
            s.add(diffuse("mat", reflectance=1.0, texture="bandrefl",
                          twosided=True))
        else:
            s.add(diffuse("mat", reflectance=1.0, twosided=True))
        # delta-resampled LFM sweeping the whole band: each connection's
        # emitted frequency is the chirp's instantaneous one, and the NEE
        # vertex reflectance is evaluated at exactly that frequency
        wf = linfmcw(f_centre=40e3, crf=10.0, chirp_len=50e-3,
                     freq_sweep=9.9e3, is_delta=True)
        s.add(wigner_transmitter("tx", wf, resample_freq=True))
        # tx behind the rx hemisphere: no direct tx->rx contamination;
        # small aperture so the WDF beam covers the target
        aim_tx = np.asarray(tf.compose(
            tf.look_at([0, -6, -3], [0, 0, 0], up=(0, 1, 0)),
            tf.scale([0.05, 0.05, 1.0])))
        s.add(sh.rectangle(to_world=aim_tx, transmitter="tx"))
        adc = ADCConfig(n_time=8, n_freq=16, sampling_start=0.0,
                        sampling_time=0.09, freq_lo=35e3, freq_hi=45e3)
        rx = wigner_receiver("rx", adc, receive_type='raw')
        s.add(rx)
        aim_rx = np.asarray(tf.compose(tf.look_at([0, -5, 0], [0, 0, 0]),
                                       tf.scale([0.05, 0.05, 1.0])))
        s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
        aim_p = np.asarray(tf.look_at([0, 0, 0], [0, -1, -0.3]))
        s.add(sh.rectangle(to_world=aim_p, bsdf="mat"))
        return s, rx

    s_c, rx_c = build(True)
    a_c, _ = receive(s_c, receiver=rx_c, spp=1 << 14, max_depth=2, seed=3,
                     time_sampling='gate')
    s_f, rx_f = build(False)
    a_f, _ = receive(s_f, receiver=rx_f, spp=1 << 14, max_depth=2, seed=3,
                     time_sampling='gate')

    prof_c = np.asarray(a_c)[..., 0].sum(axis=0)    # (n_freq,)
    prof_f = np.asarray(a_f)[..., 0].sum(axis=0)
    assert prof_f.sum() > 0 and prof_c.sum() > 0
    # bins below 40 kHz (lower half) carry (almost) nothing in the curve run.
    # NEE evaluates reflectance at the connection's exact frequency; the
    # small residue is the direct-hit path whose bounce throughput used the
    # lane's receiver-sampled lambda (reference-matching approximation).
    lo, hi = prof_c[:8].sum(), prof_c[8:].sum()
    assert lo < 0.06 * hi, (lo, hi)
    # flat run fills both halves
    assert prof_f[:8].sum() > 0.2 * prof_f[8:].sum()
    # energy ratio ~ covered fraction (upper half of the rx-sampled band);
    # direct tx->rx hits are unaffected by reflectance, so compare the
    # scattered-path upper halves only
    ratio = hi / prof_f[8:].sum()
    assert 0.7 < ratio < 1.3, ratio


def test_xml_irregular_spectrum_units():
    """XML wl:val pairs are nm (reference irregular.cpp); the loader converts
    to SI metres and builds a curve texture for diffuse reflectance."""
    import tempfile, os
    from beifong_tpu.io.scene_loader import load_xml
    xml = """<scene version="2.0.0">
      <shape type="rectangle">
        <bsdf type="diffuse">
          <spectrum name="reflectance" value="8292683:1, 8717949:1"/>
        </bsdf>
      </shape>
    </scene>"""
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.xml")
        with open(p, "w") as f:
            f.write(xml)
        scene, _ = load_xml(p)
    assert len(scene.textures) == 1
    t = scene.textures[0]
    assert abs(t.curve_lo - 8.292683e-3) < 1e-6
    assert abs(t.curve_hi - 8.717949e-3) < 1e-6
    # band-mean fallback ~ covered fraction of the 35-45 kHz band
    assert 0.15 < float(t.color0[0]) < 0.25
