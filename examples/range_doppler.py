"""Pulse-train range-Doppler map with a moving target (config 3 of
BASELINE.json: animated pulse train -> slow-time FFT with micro-Doppler).

Simulates a coherent pulse train with per-pulse receive(), assembles the
(pulses x fast-time) cube, then runs the all-XLA DSP chain.

    python examples/range_doppler.py
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
import jax
import jax.numpy as jnp

import beifong_tpu as bt
from beifong_tpu import scene as sc
from beifong_tpu.bsdf import diffuse
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.core import transform as tf
from beifong_tpu.core.config import Band
from beifong_tpu.radar import cw, wigner_transmitter, wigner_receiver, ADCConfig
from beifong_tpu.receive import receive, develop_signal
from beifong_tpu.dsp import rangedoppler as rd, windows

C = 340.0


def main():
    R0, v = 4.0, 5.0          # 5 m/s closing target
    fc = 40e3
    n_pulses = 16
    prf = 20.0

    band = Band.from_freq(C, fc, 10e3)
    adc = ADCConfig(n_time=8, n_freq=128, sampling_start=0.0,
                    sampling_time=0.04, freq_lo=fc - 2e3, freq_hi=fc + 2e3)

    cube = []
    for p in range(n_pulses):
        # quasistatic frame update (reference animated_* outer loop):
        # target advances between pulses; Doppler comes from velocity
        Rp = R0 - v * p / prf
        s = sc.Scene(band=band)
        s.add(diffuse("mat", reflectance=1.0, twosided=True))
        s.add(wigner_transmitter("tx", cw(f_centre=fc), resample_freq=True))
        aim = np.asarray(tf.compose(tf.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                    tf.scale([0.05, 0.05, 1.0])))
        s.add(sh.rectangle(to_world=aim, transmitter="tx"))
        rx = wigner_receiver("rx", adc, receive_type='raw')
        s.add(rx)
        aim_rx = np.asarray(tf.compose(tf.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                                       tf.scale([0.05, 0.05, 1.0])))
        s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
        tgt = np.asarray(tf.compose(tf.look_at([0, -Rp, 0], [0, 0, 0]),
                                    tf.scale(0.5)))
        s.add(sh.rectangle(to_world=tgt, bsdf="mat",
                           velocity=np.array([0, v, 0], np.float32)))
        adc_g, n = receive(s, receiver=rx, spp=1 << 14, max_depth=2, seed=p)
        spec = np.asarray(develop_signal(adc_g, n, rx.adc)).sum(axis=0)[:, 0]
        cube.append(spec)
        print(f"pulse {p + 1}/{n_pulses}: doppler-bin peak {spec.argmax()}")

    cube = np.stack(cube)     # (pulses, freq_bins) received spectra
    f_axis = adc.freq_lo + (np.arange(128) + 0.5) / 128 * (adc.freq_hi - adc.freq_lo)
    f_peak = f_axis[cube.sum(0).argmax()]
    fd = f_peak - fc
    v_est = fd * C / (2 * fc)
    print(f"Doppler shift {fd:+.1f} Hz -> closing speed {v_est:.2f} m/s "
          f"(true {v:.2f} m/s)")
    np.save("range_doppler_cube.npy", cube)


if __name__ == "__main__":
    main()
