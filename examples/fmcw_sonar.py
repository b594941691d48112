"""FMCW sonar experiment — port of the reference's `Render.py` WDF setup.

40 kHz ultrasound linear-FMCW transmitter on a small rectangular aperture
(reference `Render.py:104-114, 214-224`: fc=40 kHz, B=2 kHz, 90 ms chirp),
`mix_resample` receiver -> beat-frequency spectrum -> range estimate.

    python examples/fmcw_sonar.py
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# honor JAX_PLATFORM_NAME=cpu even though the ambient axon
# sitecustomize pre-imports jax (the env var alone is consumed
# too early to switch backends)
if os.environ.get("JAX_PLATFORM_NAME") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import beifong_tpu as bt
from beifong_tpu import scene as sc
from beifong_tpu.bsdf import diffuse
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.core import transform as tf
from beifong_tpu.core.config import Band
from beifong_tpu.radar import linfmcw, wigner_transmitter, wigner_receiver, ADCConfig
from beifong_tpu.receive import receive, develop_signal

C = 340.0


def main():
    R = 6.0                      # target range [m]
    fc, B, T = 40e3, 2e3, 90e-3  # reference Render.py:104-114
    slope = B / T
    f_beat_true = slope * 2 * R / C

    band = Band.from_freq(C, fc, 2 * B)
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    wf = linfmcw(f_centre=fc, crf=1.0 / T, chirp_len=T, freq_sweep=B,
                 is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    # 20 x 50 mm aperture (Render.py:214-224)
    aim = np.asarray(tf.compose(tf.look_at([0.1, 0, 0], [0.1, -1, 0]),
                                tf.scale([0.01, 0.025, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))

    adc = ADCConfig(n_time=16, n_freq=256, sampling_start=0.02,
                    sampling_time=0.06, freq_lo=0.0, freq_hi=4 * f_beat_true)
    rx = wigner_receiver("rx", adc, receive_type="mix_resample", lo_waveform=wf)
    s.add(rx)
    aim_rx = np.asarray(tf.compose(tf.look_at([-0.1, 0, 0], [-0.1, -1, 0]),
                                   tf.scale([0.01, 0.025, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
    tgt = np.asarray(tf.compose(tf.look_at([0, -R, 0], [0, 0, 0]),
                                tf.scale(0.5)))
    s.add(sh.rectangle(to_world=tgt, bsdf="mat"))

    adc_g, n = receive(s, receiver=rx, spp=1 << 16, max_depth=2)
    spec = np.asarray(develop_signal(adc_g, n, rx.adc)).sum(axis=0)[:, 0]
    f_axis = (np.arange(256) + 0.5) / 256 * (4 * f_beat_true)
    f_peak = f_axis[spec.argmax()]
    r_est = f_peak * C / (2 * slope)
    print(f"beat frequency: {f_peak:.2f} Hz (theory {f_beat_true:.2f} Hz)")
    print(f"estimated range: {r_est:.2f} m (true {R:.2f} m)")


if __name__ == "__main__":
    main()
