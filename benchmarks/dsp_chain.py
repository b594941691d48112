"""MMW-scale DSP chain benchmark: pulse compression + range-Doppler.

The reference only sketches this pipeline in comments
(`src/librender/integrator.cpp:919-945,1011-1109`: 94 GHz FMCW, 250 MSPS,
~62.5k samples/chirp, 16k FFT).  This benchmark runs that scale for real:
a (128 pulses x 65536 samples) complex cube through overlap-save
matched-filter pulse compression (4k-tap LFM replica, 16k-point blocks)
and a slow-time Doppler FFT — all jnp.fft (XLA), the fusion-friendly
formulation that also shards (parallel/shard.py::overlap_save_sharded).

Prints per-stage wall time, CPIs/s, and effective HBM bandwidth vs the
v5e speed-of-light (~819 GB/s) — the chain is memory-bound, so bandwidth
fraction IS the efficiency metric.  Correctness is pinned inside: a point
target must land in its range-Doppler cell with ~time-bandwidth gain.

    python benchmarks/dsp_chain.py          (TPU via ambient axon, or CPU)
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

from beifong_tpu.dsp.fir import lfm_chirp
from beifong_tpu.dsp.pulse import (matched_filter_freq, overlap_save,
                                   compression_gain)
from beifong_tpu.dsp.rangedoppler import doppler_fft

# ---- the reference's intended MMW scale ----------------------------------
FS = 250e6                 # ADC rate [S/s]
N_SAMP = 65536             # ~62.5k samples/chirp, padded to a power of two
N_PULSES = 128
N_TAPS = 4096              # LFM replica length (16.4 us)
N_FFT = 16384              # overlap-save block size (the "16k FFT")
B = 6e9                    # 94 GHz +- 3 GHz sweep


def make_cube(key):
    """Point target at delay bin 20000, Doppler bin +18, in noise."""
    rep = lfm_chirp(N_TAPS, FS, 0.0, B, N_TAPS / FS)
    k1, k2 = jax.random.split(key)
    noise = (jax.random.normal(k1, (N_PULSES, N_SAMP))
             + 1j * jax.random.normal(k2, (N_PULSES, N_SAMP))) * 0.5
    cube = noise.astype(jnp.complex64)
    dop = jnp.exp(2j * jnp.pi * 18.0 / N_PULSES
                  * jnp.arange(N_PULSES))[:, None]
    echo = jnp.zeros((1, N_SAMP), jnp.complex64).at[
        0, 20000:20000 + N_TAPS].set(rep.astype(jnp.complex64) * 0.05)
    return cube + dop * echo, rep


@jax.jit
def chain(cube, h_freq):
    rc = overlap_save(cube, h_freq, N_FFT, N_TAPS)
    rd = doppler_fft(rc)
    return rd


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


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    cube, rep = make_cube(jax.random.key(0))
    h = matched_filter_freq(rep, N_FFT)
    rd, dt = bench(chain, cube, h)

    # correctness: peak in the right range-Doppler cell, ~TB-product gain
    mag = np.abs(np.asarray(rd))
    pk = np.unravel_index(mag.argmax(), mag.shape)
    assert pk[0] == N_PULSES // 2 + 18, pk          # fftshifted Doppler
    assert abs(pk[1] - 20000) <= 1, pk
    gain = float(np.asarray(compression_gain(rep)))
    snr_out = mag.max() / np.median(mag)
    print(f"peak at doppler {pk[0] - N_PULSES // 2:+d}, range {pk[1]} "
          f"(TB gain {10 * np.log10(gain):.1f} dB, "
          f"output peak/median {20 * np.log10(snr_out):.1f} dB)", flush=True)

    # memory model: overlap-save reads the cube once into blocks
    # (x1.33 overlap), writes it once; doppler FFT reads + writes once
    # -> ~4.33 cube passes of complex64 traffic
    cube_bytes = N_PULSES * N_SAMP * 8
    gbytes = 4.33 * cube_bytes / 1e9
    sps = N_PULSES * N_SAMP / dt
    hbm_frac = (gbytes / dt) / 819.0     # v5e HBM speed of light
    print(f"chain: {dt * 1e3:.2f} ms/CPI  ({1 / dt:.1f} CPI/s, "
          f"{sps / 1e9:.2f} Gsamples/s, ~{gbytes / dt:.0f} GB/s "
          f"= {100 * hbm_frac:.0f}% of v5e HBM SoL)", flush=True)
    print('{"metric": "dsp_chain_samples_per_s", '
          f'"value": {sps:.3e}, "unit": "samples/s", '
          f'"ms_per_cpi": {dt * 1e3:.3f}}}', flush=True)


if __name__ == "__main__":
    main()
