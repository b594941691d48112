"""MMW-scale DSP chain benchmark, driven by a REAL receive.

The reference only sketches this pipeline in comments
(`src/librender/integrator.cpp:919-945,1011-1109`: 94 GHz FMCW, 250 MSPS,
~62.5k samples/chirp, 16k FFT).  This benchmark runs that scale end to end:

  94 GHz +-3 GHz FMCW, trihedral corner reflector at 30 m closing at
  0.86 m/s -> Pallas megakernel `mix_resample` coherent receive, ONE
  dispatch per chirp producing the full 65536-sample dechirped beat
  record at the 250 MSPS simulation rate (the factorized 1-D MXU splat)
  -> (128, 65536) cube -> polyphase decimation by 4 to the ADC rate
  -> 16384-point range FFT + slow-time Doppler FFT (all jnp.fft / XLA).

Correctness is pinned against geometry: the corner must land in its
analytic range-Doppler cell (beat = slope * two-way delay; Doppler =
2 v / lambda).  Per-stage wall time and effective HBM bandwidth vs the
v5e speed-of-light (~819 GB/s) are printed — the FFT chain is
memory-bound, so bandwidth fraction IS the efficiency metric.

A second, synthetic-cube measurement keeps the PULSE-mode kernel rate
on record: overlap-save matched filtering (4k-tap LFM replica, 16k
blocks) needs fs >= sweep bandwidth, which at 6 GHz is above any real
ADC — it is a kernel benchmark, not a scene result.

    python benchmarks/dsp_chain.py            (TPU via ambient axon)
    python benchmarks/dsp_chain.py --quick    (16 pulses, CPU-friendly)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from beifong_tpu import scene as sc
from beifong_tpu.bsdf import conductor
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.core import transform as tf
from beifong_tpu.core.config import Band
from beifong_tpu.radar import (linfmcw, wigner_transmitter, wigner_receiver,
                               ADCConfig)
from beifong_tpu.receive import receive
from beifong_tpu.dsp import resample, rangedoppler as rd, windows
from beifong_tpu.dsp.fir import lfm_chirp
from beifong_tpu.dsp.pulse import (matched_filter_freq, overlap_save,
                                   compression_gain)

# ---- the reference's intended MMW scale -----------------------------------
C = 3e8
FC, B = 94e9, 6e9          # 94 GHz +- 3 GHz sweep
FS_SIM = 250e6             # simulation rate == the reference's ADC rate
N_SAMP = 65536             # ~62.5k samples/chirp (one kernel dispatch)
T_CHIRP = N_SAMP / FS_SIM  # 262.144 us, chirped continuously (prf = 1/T)
PRF = 1.0 / T_CHIRP
Q = 4                      # decimation to the range-processing rate
N_FFT = N_SAMP // Q        # the "16k FFT"
N_PULSES = 128
R = 30.0                   # corner apex range [m]
DOP_BIN = 18               # Doppler line on fftshifted bin 64 + 18
V = (DOP_BIN / N_PULSES) * PRF * C / (2 * FC)   # ~0.856 m/s closing
N_TAPS = 4096              # pulse-mode LFM replica length (synthetic stage)


def make_scene(dy):
    band = Band.from_freq(C, FC, 2 * B)
    s = sc.Scene(band=band)
    s.add(conductor("m", eta=0.2, k=3.0, twosided=True))
    wf = linfmcw(f_centre=FC, crf=PRF, chirp_len=T_CHIRP, freq_sweep=B,
                 is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    s.add(sh.rectangle(to_world=np.asarray(tf.compose(
        tf.look_at([0.0, 0, 0], [0.0, -1, 0]),
        tf.scale([1.5, 1.5, 1.0]))), transmitter="tx"))
    adc = ADCConfig(n_time=N_SAMP, n_freq=1, sampling_start=0.0,
                    sampling_time=T_CHIRP, freq_lo=0.0, freq_hi=10e6)
    rx = wigner_receiver("rx", adc, receive_type="mix_resample",
                         lo_waveform=wf)
    s.add(rx)
    rx_pos = np.array([0.0, -0.1, 0.0])
    apex = np.array([0.0, -R + dy, 0.0])
    s.add(sh.rectangle(to_world=np.asarray(tf.compose(
        tf.look_at(rx_pos, apex), tf.scale([0.05, 0.05, 1.0]))),
        receiver="rx"))
    for f in sh.trihedral(apex, rx_pos - apex, bsdf="m",
                          velocity=np.array([0, V, 0], np.float32)):
        s.add(f)
    return s, rx, apex, rx_pos


def simulate_cube(n_pulses, spp):
    """One megakernel dispatch per chirp -> (n_pulses, N_SAMP) complex
    dechirped beat cube (conjugated so the beat is positive)."""
    iq = []
    t0 = time.perf_counter()
    for p in range(n_pulses):
        s, rx, apex, rx_pos = make_scene(dy=V * p / PRF)
        # common random numbers across the CPI (frozen speckle)
        a, n = receive(s, receiver=rx, spp=spp, max_depth=4, seed=13,
                       coherent=True, lanes_per_pass=spp)
        g = np.asarray(a)
        iq.append(np.conj(g[:, 0, 0] + 1j * g[:, 0, 1]) / max(n, 1))
        if p == 0:
            t0 = time.perf_counter()   # exclude the one-time compile
    dt = time.perf_counter() - t0
    lanes = spp * max(n_pulses - 1, 1)
    print(f"receive: {n_pulses} chirps x {N_SAMP} samples "
          f"(megakernel, {lanes / dt / 1e6:.0f} M samples/s/chip "
          f"after compile)", flush=True)
    return jnp.asarray(np.stack(iq).astype(np.complex64))


@jax.jit
def fmcw_chain(cube):
    dec = resample.decimate(cube, Q)
    rc = rd.range_fft(dec, window=windows.hann(dec.shape[-1]))
    return rd.doppler_fft(rc, window=windows.hann(cube.shape[0]))


def bench(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return out, float(np.median(ts))


def synthetic_pulse_mode(key):
    """Pulse-mode overlap-save matched filter at the same scale (synthetic
    cube: fs >= 6 GHz sweep is above any real ADC — kernel rate only)."""
    rep = lfm_chirp(N_TAPS, FS_SIM, 0.0, B, N_TAPS / FS_SIM)
    k1, k2 = jax.random.split(key)
    noise = (jax.random.normal(k1, (N_PULSES, N_SAMP))
             + 1j * jax.random.normal(k2, (N_PULSES, N_SAMP))) * 0.5
    cube = noise.astype(jnp.complex64)
    dop = jnp.exp(2j * jnp.pi * 18.0 / N_PULSES
                  * jnp.arange(N_PULSES))[:, None]
    echo = jnp.zeros((1, N_SAMP), jnp.complex64).at[
        0, 20000:20000 + N_TAPS].set(rep.astype(jnp.complex64) * 0.05)
    cube = cube + dop * echo
    h = matched_filter_freq(rep, 16384)

    @jax.jit
    def chain(c, hf):
        return rd.doppler_fft(overlap_save(c, hf, 16384, N_TAPS))

    rdm, dt = bench(chain, cube, h)
    mag = np.abs(np.asarray(rdm))
    pk = np.unravel_index(mag.argmax(), mag.shape)
    assert pk[0] == N_PULSES // 2 + 18 and abs(pk[1] - 20000) <= 1, pk
    gain = float(np.asarray(compression_gain(rep)))
    print(f"pulse-mode (synthetic): {dt * 1e3:.2f} ms/CPI, TB gain "
          f"{10 * np.log10(gain):.1f} dB, peak ok", flush=True)
    return dt


def main():
    quick = "--quick" in sys.argv
    n_pulses = 16 if quick else N_PULSES
    spp = 1 << 16 if quick else 1 << 18
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    cube = simulate_cube(n_pulses, spp)
    rdm, dt = bench(fmcw_chain, cube)

    # analytic anchors: beat = slope * tau, Doppler = 2 v / lambda
    slope = B / T_CHIRP
    tau = 2 * np.linalg.norm([0.0, R - 0.1, 0.0]) / C
    fs_adc = FS_SIM / Q
    exp_rbin = int(round(slope * tau / fs_adc * N_FFT))
    exp_dbin = n_pulses // 2 + int(round(2 * V * FC / C / PRF * n_pulses))
    mag = np.abs(np.asarray(rdm))
    pk = np.unravel_index(mag.argmax(), mag.shape)
    print(f"corner at (doppler, range) = {pk}; analytic "
          f"({exp_dbin}, {exp_rbin})", flush=True)
    assert abs(int(pk[1]) - exp_rbin) <= 2, (pk, exp_rbin)
    assert abs(int(pk[0]) - exp_dbin) <= 1, (pk, exp_dbin)

    # memory model: decimation reads the cube once & writes 1/Q of it;
    # range FFT reads + writes the decimated cube; Doppler FFT reads +
    # writes again -> ~(1 + 5/Q) cube passes of complex64 traffic
    cube_bytes = n_pulses * N_SAMP * 8
    gbytes = (1 + 5 / Q) * cube_bytes / 1e9
    sps = n_pulses * N_SAMP / dt
    hbm_frac = (gbytes / dt) / 819.0     # v5e HBM speed of light
    print(f"fmcw chain: {dt * 1e3:.2f} ms/CPI  ({1 / dt:.1f} CPI/s, "
          f"{sps / 1e9:.2f} Gsamples/s, ~{gbytes / dt:.0f} GB/s "
          f"= {100 * hbm_frac:.0f}% of v5e HBM SoL)", flush=True)

    if not quick:
        synthetic_pulse_mode(jax.random.key(0))

    print('{"metric": "dsp_chain_samples_per_s", '
          f'"value": {sps:.3e}, "unit": "samples/s", '
          f'"ms_per_cpi": {dt * 1e3:.3f}, "receive_driven": true}}',
          flush=True)


if __name__ == "__main__":
    main()
