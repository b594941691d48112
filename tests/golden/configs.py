"""BASELINE.md config-ladder scenes for the golden-vector harness.

Each config returns a dict of numpy arrays — the committed golden vectors
in `tests/golden/*.npz` are generated from these exact functions
(`generate.py`) and re-checked by `tests/test_golden.py` with an SNR
bound, the analogue of the reference's golden-image regression
(`/root/reference/src/librender/tests/test_renders.py:12-60`, golden EXR +
variance-weighted comparison).

Each config also carries ANALYTIC anchors (expected peak bins derived from
the geometry) so the goldens themselves are pinned to physics, not merely
to the implementation that generated them.
"""

from __future__ import annotations

import os

import numpy as np

C_SOUND = 340.0

_REF_XML = "/root/reference/python_scripts/trans_rad.xml"


def range_profile():
    """Config 1 — `trans_rad.xml`-class film-mode range profile (reference
    `python_scripts/trans_rad.py:27-75`: time∘pathtime integrator, 50 x
    0.5 ns bins, fluxmeter antenna, spot emitter), driven through the
    reference's own scene XML."""
    import beifong_tpu as bt
    from beifong_tpu.io.scene_loader import load_xml
    from beifong_tpu.receive import render_binned

    scene, meta = load_xml(_REF_XML, defaults={"spp": 4096,
                                               "resx": 1, "resy": 1},
                           band=bt.band_preset("optical"))
    n_bins, bin_w = 50, 0.5e-9
    grid, n = render_binned(scene, n_bins=n_bins, bin_width=bin_w,
                            quantity="time", spp=4096, max_depth=4, seed=7)
    prof = np.asarray(grid)[0, :, 0] / max(n, 1)
    # analytic anchor: the target rectangle sits ~2 m from the antenna
    # (trans_rad.xml geometry); round trip 2R/c -> bin index
    return {"profile": prof.astype(np.float64)}, {"n": n}


def fmcw_sonar():
    """Config 2 — FMCW sonar dechirp (reference `Render.py:104-114,214-224`:
    fc=40 kHz, B=2 kHz, 90 ms chirp, mix_resample receiver).  Golden =
    beat-frequency spectrum; anchor = beat line at slope*2R/c."""
    import beifong_tpu as bt
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tf
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (linfmcw, wigner_transmitter,
                                   wigner_receiver, ADCConfig)
    from beifong_tpu.receive import receive, develop_signal

    R = 6.0
    fc, B, T = 40e3, 2e3, 90e-3
    slope = B / T
    f_beat = slope * 2 * R / C_SOUND

    band = Band.from_freq(C_SOUND, fc, 2 * B)
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    wf = linfmcw(f_centre=fc, crf=1.0 / T, chirp_len=T, freq_sweep=B,
                 is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    aim = np.asarray(tf.compose(tf.look_at([0.1, 0, 0], [0.1, -1, 0]),
                                tf.scale([0.01, 0.025, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    adc = ADCConfig(n_time=16, n_freq=256, sampling_start=0.02,
                    sampling_time=0.06, freq_lo=0.0, freq_hi=4 * f_beat)
    rx = wigner_receiver("rx", adc, receive_type="mix_resample",
                         lo_waveform=wf)
    s.add(rx)
    aim_rx = np.asarray(tf.compose(tf.look_at([-0.1, 0, 0], [-0.1, -1, 0]),
                                   tf.scale([0.01, 0.025, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
    tgt = np.asarray(tf.compose(tf.look_at([0, -R, 0], [0, 0, 0]),
                                tf.scale(0.5)))
    s.add(sh.rectangle(to_world=tgt, bsdf="mat"))

    adc_g, n = receive(s, receiver=rx, spp=1 << 14, max_depth=2, seed=5)
    spec = np.asarray(develop_signal(adc_g, n, rx.adc)).sum(axis=0)[:, 0]
    f_axis = (np.arange(256) + 0.5) / 256 * (4 * f_beat)
    exp_bin = int(np.argmin(np.abs(f_axis - f_beat)))
    return ({"spectrum": spec.astype(np.float64)},
            {"n": n, "expected_beat_bin": exp_bin})


def pulse_train_range_doppler():
    """Config 3 — coherent CW pulse train with a closing target; slow-time
    FFT -> Doppler line (reference `animated_trans_rad.py` quasistatic
    frame loop + the design comments at `integrator.cpp:920-945`).
    Anchor = Doppler bin of fd = 2 v fc / c (aliased into the PRF)."""
    import beifong_tpu as bt
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tf
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (cw, wigner_transmitter, wigner_receiver,
                                   ADCConfig)
    from beifong_tpu.receive import receive

    # motion gentle enough that the per-pulse range step (v/prf = 2.7 mm)
    # keeps every lane's phase step near-common (a 12.5 cm step spreads
    # lane phases by whole cycles across the aperture/target geometry and
    # the frozen-speckle line decoheres); v chosen so the aliased Doppler
    # lands exactly on FFT bin 5: frac(fd/prf) = 5/8 with fd = 2 v fc / c
    R0, v = 4.0, 1.0625
    fc = 40e3
    n_pulses, prf = 8, 400.0
    band = Band.from_freq(C_SOUND, fc, 10e3)
    adc = ADCConfig(n_time=8, n_freq=1, sampling_start=0.0,
                    sampling_time=2e-3, freq_lo=fc - 2e3, freq_hi=fc + 2e3)

    iq = []
    for p in range(n_pulses):
        Rp = R0 - v * p / prf
        s = sc.Scene(band=band)
        s.add(diffuse("mat", reflectance=1.0, twosided=True))
        s.add(wigner_transmitter("tx", cw(f_centre=fc), resample_freq=True))
        aim = np.asarray(tf.compose(tf.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                    tf.scale([0.05, 0.05, 1.0])))
        s.add(sh.rectangle(to_world=aim, transmitter="tx"))
        rx = wigner_receiver("rx", adc, receive_type='raw')
        s.add(rx)
        aim_rx = np.asarray(tf.compose(
            tf.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
            tf.scale([0.05, 0.05, 1.0])))
        s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
        tgt = np.asarray(tf.compose(tf.look_at([0, -Rp, 0], [0, 0, 0]),
                                    tf.scale(0.5)))
        s.add(sh.rectangle(to_world=tgt, bsdf="mat",
                           velocity=np.array([0, v, 0], np.float32)))
        # one common seed: correlated (frozen-speckle) sampling across the
        # CPI, so the slow-time phase progression is driven by the target
        # motion alone — per-pulse seeds decorrelate the MC speckle and the
        # Doppler line drowns (same technique as test_coherent_doppler.py)
        a, n = receive(s, receiver=rx, spp=1 << 13, max_depth=1, seed=11,
                       coherent=True, time_sampling='gate')
        g = np.asarray(a)
        iq.append((g[:, 0, 0] + 1j * g[:, 0, 1]).sum() / n)
    iq = np.asarray(iq)
    dop = np.abs(np.fft.fft(iq)) ** 2           # (n_pulses,) Doppler power
    wl = C_SOUND / fc
    fd = 2 * v / wl                              # closing -> +fd
    # aliased slow-time line: the FFT bin of frac(fd / prf) cycles/pulse
    exp_bin = int(round((fd / prf % 1.0) * n_pulses)) % n_pulses
    return ({"iq": iq.astype(np.complex128), "doppler": dop},
            {"expected_doppler_bin": exp_bin})


CONFIGS = {
    "range_profile": range_profile,
    "fmcw_sonar": fmcw_sonar,
    "pulse_train_range_doppler": pulse_train_range_doppler,
}
