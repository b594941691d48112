"""End-to-end FMCW dechirp chain (config 4 of BASELINE.md's ladder) — the
pipeline the reference only sketches in design comments
(`/root/reference/src/librender/integrator.cpp:1011-1109`):

  multi-bounce specular scene (tilted trihedral corner reflector)
    -> coherent `mix_resample` receive: the fast-time I/Q series IS the
       dechirped beat signal at the simulation rate (stretch processing)
    -> polyphase decimation to the ADC rate       (dsp/resample.py)
    -> range FFT + slow-time Doppler FFT          (dsp/rangedoppler.py)
    -> range-Doppler map with the corner in its analytic cell.

The corner is mounted apex-toward-radar, so the ONLY specular return is the
triple-bounce retro path — every pixel of the final map went through three
mirror reflections.  On TPU the receive rides the Pallas megakernel
(`use_pallas` defaults to 'auto'); on CPU it falls back to the jnp
wavefront.

Run: python examples/fmcw_dechirp_chain.py
     (CPU ok: JAX_PLATFORM_NAME=cpu python examples/fmcw_dechirp_chain.py)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# honor JAX_PLATFORM_NAME=cpu even though the ambient axon
# sitecustomize pre-imports jax (the env var alone is consumed
# too early to switch backends)
if os.environ.get("JAX_PLATFORM_NAME") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from beifong_tpu import scene as sc
from beifong_tpu.bsdf import conductor
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.core import transform as tf
from beifong_tpu.core.config import Band
from beifong_tpu.radar import (linfmcw, wigner_transmitter, wigner_receiver,
                               ADCConfig)
from beifong_tpu.core.transform import AnimatedTransform
from beifong_tpu.receive import receive_cpi
from beifong_tpu.dsp import resample, rangedoppler as rd, windows

C = 340.0
FC, B, T = 40e3, 2e3, 90e-3          # sonar FMCW (reference Render.py band)
N_PULSES, PRF = 64, 1.0 / T
R = 4.0                               # corner apex range
N_FAST, WINDOW, T0 = 1024, 50e-3, 30e-3
Q = 8                                 # decimation factor to ADC rate


def make_scene(v):
    band = Band.from_freq(C, FC, 4 * B)
    s = sc.Scene(band=band)
    s.add(conductor("m", eta=0.2, k=3.0, twosided=True))
    wf = linfmcw(f_centre=FC, crf=PRF, chirp_len=T, freq_sweep=B,
                 is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    s.add(sh.rectangle(to_world=np.asarray(
        tf.compose(tf.look_at([0.0, 0, 0], [0.0, -1, 0]),
                   tf.scale([0.8, 0.8, 1.0]))), transmitter="tx"))
    adc = ADCConfig(n_time=N_FAST, n_freq=1, sampling_start=T0,
                    sampling_time=WINDOW, freq_lo=0.0, freq_hi=1.5e3)
    rx = wigner_receiver("rx", adc, receive_type="mix_resample",
                         lo_waveform=wf)
    s.add(rx)
    rx_pos = np.array([0.0, -0.1, 0.0])
    apex = np.array([0.0, -R, 0.0])
    s.add(sh.rectangle(to_world=np.asarray(
        tf.compose(tf.look_at(rx_pos, apex), tf.scale([0.02, 0.02, 1.0]))),
        receiver="rx"))
    # the corner's rigid translation is DECLARED, not re-built per pulse:
    # AnimatedTransform keyframes carry the slow-time poses, the velocity
    # field the intra-pulse Doppler — one scene serves the whole CPI
    for f in sh.trihedral(apex, rx_pos - apex, bsdf="m",
                          velocity=np.array([0, v, 0], np.float32)):
        base = np.asarray(f.to_world)
        f.to_world = AnimatedTransform.from_keyframes(
            [(p / PRF, np.asarray(tf.compose(
                tf.translate([0.0, v * p / PRF, 0.0]), base)))
             for p in range(N_PULSES + 1)])
        s.add(f)
    return s, rx, apex, rx_pos


def main():
    import time
    # closing speed for a clean Doppler bin: fd = 2 v FC / C on bin 20/64
    v = (20.0 / 64.0) * PRF * C / (2 * FC)
    slope = B / T

    s, rx, apex, rx_pos = make_scene(v=v)
    # ONE jitted lax.scan over the pulse axis (receive_cpi engine='scan'):
    # no per-pulse scene rebuilds or device dispatches.  Common random
    # numbers across the CPI: slow-time phase progression is then pure
    # target motion (frozen speckle).
    t0 = time.perf_counter()
    cube, n = receive_cpi(s, n_pulses=N_PULSES, prf=PRF, seed=13,
                          coherent=True, common_random_numbers=True,
                          spp=1 << 16, max_depth=4)
    cube.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"CPI: {N_PULSES} pulses x {n} samples in {dt:.2f} s "
          f"({N_PULSES / dt:.1f} pulses/s, "
          f"{N_PULSES * n / dt / 1e6:.2f} M samples/s)", flush=True)
    g = np.asarray(cube)
    iq = (g[:, :, 0, 0] + 1j * g[:, :, 0, 1]) * (N_FAST / max(n, 1))

    # conjugate (dechirp sign convention) -> decimate -> 2-D FFT
    dec = np.asarray(resample.decimate(np.conj(iq), Q))
    n_adc = dec.shape[-1]
    rc = np.asarray(rd.range_fft(dec, window=np.asarray(windows.hann(n_adc))))
    rdm = np.asarray(rd.doppler_fft(rc, window=np.asarray(
        windows.hann(N_PULSES))))

    fs_adc = N_FAST / WINDOW / Q
    tau = 2 * np.linalg.norm(np.array([0.0, -R, 0.0])
                             - np.array([0.0, -0.1, 0.0])) / C
    exp_rbin = round(slope * tau / fs_adc * n_adc)
    mag = np.abs(rdm)
    pk = np.unravel_index(mag.argmax(), mag.shape)
    r_axis = np.asarray(rd.range_axis_fmcw(n_adc, fs_adc, slope, C))
    d_axis = np.asarray(rd.doppler_axis(N_PULSES, PRF))
    # the conj() that puts the beat line on the positive range axis also
    # negates the slow-time phasor, so Doppler reads sign-flipped
    v_est = -d_axis[pk[0]] * C / (2 * FC)
    print(f"corner at range {r_axis[pk[1]]:.2f} m (true ~{tau * C / 2:.2f}), "
          f"closing {v_est * 1e3:.1f} mm/s (true {v * 1e3:.1f} mm/s)")
    print(f"peak cell (doppler, range) = {pk}, analytic range bin "
          f"{exp_rbin}")
    np.save("fmcw_dechirp_rd_map.npy", rdm)


if __name__ == "__main__":
    main()
