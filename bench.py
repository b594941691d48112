"""Single-chip benchmark: radar receive throughput on the flagship scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: radar receive samples traced per second (each sample = one receive
ray with full reverse path trace, transmitter NEE, per-connection ADC
binning, max_depth bounces).  The reference publishes no numbers
(BASELINE.md), so vs_baseline is reported against an internal anchor of
1e6 samples/s — the rough throughput class of the reference's
multi-threaded CPU path (10k spp x 1 px renders in seconds).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

# persistent compile cache: TPU compiles for the full pass are minutes-long
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ANCHOR_SAMPLES_PER_S = 1.0e6


def _trivial_floor_fraction(n_lanes: int, max_depth: int) -> float:
    """Wall-time fraction of the flagship dispatch that is launch + RNG +
    accumulation alone (BF_ABLATE=trivial in a subprocess — the ablation
    flag is read at import).  1 - fraction is real physics work; the
    flagship number is self-interpreting against its scheduling floor."""
    import os
    import subprocess
    import sys as _sys
    code = (
        "import jax, time, sys;"
        "jax.config.update('jax_compilation_cache_dir',"
        "'/root/repo/.jax_cache');"
        "sys.path.insert(0, '/root/repo');"
        "import __graft_entry__ as g;"
        "from beifong_tpu.integrators.pallas_receive import receive_pallas;"
        "s, rx = g._build_scene();"
        "sd = s.compile();"
        f"spp = {n_lanes};"
        "out, n = receive_pallas(s, sd, rx, spp=spp, seed=0,"
        f" max_depth={max_depth}, time_sampling='gate');"
        "jax.block_until_ready(out);"
        "t0 = time.perf_counter();"
        "out, n = receive_pallas(s, sd, rx, spp=spp, seed=1,"
        f" max_depth={max_depth}, time_sampling='gate');"
        "jax.block_until_ready(out);"
        "print(time.perf_counter() - t0)")
    t_full = float(subprocess.run(
        [_sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600, check=True).stdout.strip().splitlines()[-1])
    env = dict(os.environ, BF_ABLATE="trivial")
    t_triv = float(subprocess.run(
        [_sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=600, check=True).stdout.strip().splitlines()[-1])
    return t_triv / t_full


def _mimo_floor_fraction(n_lanes: int = 1 << 22) -> float:
    """Config-5 self-context (like the flagship's ablation floor): wall
    fraction of the MIMO dispatch that is launch + RNG + accumulation
    alone (BF_ABLATE=trivial subprocess).  benchmarks/ablate_mimo.py has
    the full variant breakdown (channel count, phase trig)."""
    import os
    import subprocess
    import sys as _sys
    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "sys.path.insert(0, '/root/repo/benchmarks');"
        "import jax;"
        "jax.config.update('jax_compilation_cache_dir',"
        "'/root/repo/.jax_cache');"
        "from ablate_mimo import _CODE;"
        f"exec(_CODE.format(n_elems=8, n_lanes={n_lanes}, iters=4))")
    out_full = subprocess.run([_sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=900,
                              check=True).stdout.strip().splitlines()[-1]
    env = dict(os.environ, BF_ABLATE="trivial")
    out_triv = subprocess.run([_sys.executable, "-c", code], env=env,
                              capture_output=True, text=True, timeout=900,
                              check=True).stdout.strip().splitlines()[-1]
    return float(out_full) / float(out_triv)


def _mimo_rate(n_lanes: int = 1 << 22, iters: int = 4) -> float:
    """Megakernel samples/s for the per-element MIMO cube (BASELINE
    config 5 at kernel rate: 8-element ULA, 16 I/Q channels splatted per
    connection)."""
    import numpy as _np
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter,
                                   phased_receiver, ADCConfig)
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tf
    from beifong_tpu.integrators.pallas_receive import receive_pallas
    band = Band.from_freq(340.0, 40e3, 1e3)
    wl = band.wavelength_centre
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    s.add(wigner_transmitter(
        "tx", pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=1e3,
                    is_delta=True), resample_freq=True))
    s.add(sh.rectangle(to_world=_np.asarray(
        tf.compose(tf.look_at([0.1, 0, 0], [0.1, -1, 0]),
                   tf.scale([0.004, 0.004, 1.0]))), transmitter="tx"))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=39.5e3, freq_hi=40.5e3)
    rx = phased_receiver("rxm", adc, n_elems=8, elem_spacing=wl / 2,
                         elem_wid=(wl / 4, wl / 4), receive_type='raw')
    s.add(rx)
    s.add(sh.rectangle(to_world=_np.asarray(
        tf.compose(tf.look_at([0.0, 0, 0], [0.0, -1, 0]),
                   tf.scale([1e-4, 1e-4, 1.0]))), receiver="rxm"))
    s.add(sh.rectangle(to_world=_np.asarray(
        tf.compose(tf.look_at([0, -4.0, 0], [0, 0, 0]), tf.scale(0.5))),
        bsdf="mat"))
    sd = s.compile()
    out, _ = receive_pallas(s, sd, rx, spp=n_lanes, seed=0, max_depth=2,
                            time_sampling='gate', mimo=True)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out, _ = receive_pallas(s, sd, rx, spp=n_lanes, seed=i + 1,
                                max_depth=2, time_sampling='gate', mimo=True)
    jax.block_until_ready(out)
    return iters * n_lanes / (time.perf_counter() - t0)


def _mesh_rate(max_depth: int = 2, n_lanes: int = 1 << 20,
               iters: int = 4) -> float:
    """Megakernel samples/s on the 9.8k-triangle BVH scene (the realistic
    workload class; the flagship number is the 4-rect analytic scene)."""
    import sys as _sys
    _sys.path.insert(0, "/root/repo/benchmarks")
    from mesh_megakernel import build
    from beifong_tpu.integrators.pallas_receive import receive_pallas
    s, rx = build()
    sd = s.compile(use_bvh=False)
    out, _ = receive_pallas(s, sd, rx, spp=n_lanes, seed=0,
                            max_depth=max_depth, time_sampling='gate')
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out, _ = receive_pallas(s, sd, rx, spp=n_lanes, seed=i + 1,
                                max_depth=max_depth, time_sampling='gate')
    jax.block_until_ready(out)
    return iters * n_lanes / (time.perf_counter() - t0)


def main():
    import __graft_entry__ as g
    from beifong_tpu import film as film_mod
    from beifong_tpu.receive import _receive_pass, _HashableRx, scene_mono
    from beifong_tpu.integrators.pallas_receive import (receive_pallas,
                                                        supported)

    s, rx = g._build_scene()
    sd_full = s.compile()
    scene_data = scene_mono(sd_full)
    shape_idx = s.shape_index_of_endpoint('receiver', rx.id)
    rx_h = _HashableRx(rx)

    max_depth = 3

    if supported(sd_full, rx):
        # Pallas megakernel path (the production hot loop).  One LARGE call:
        # the kernel grid scales with spp, and each dispatch over the
        # tunneled chip costs ~8-24 ms of fixed host/RPC overhead — round-1's
        # 8x 1M-lane calls measured dispatch latency (173-237 M/s,
        # run-to-run jitter), while a single 256M-lane call runs the kernel
        # at its real ~920 M samples/s within +-1%.
        n_lanes = 1 << 28
        n_blocks = 4
        out, nn = receive_pallas(s, sd_full, rx, spp=n_lanes, seed=0,
                                 max_depth=max_depth, time_sampling='gate')
        jax.block_until_ready(out)
        rates = []
        for b in range(n_blocks):
            t0 = time.perf_counter()
            out, nn = receive_pallas(s, sd_full, rx, spp=n_lanes, seed=b + 1,
                                     max_depth=max_depth,
                                     time_sampling='gate')
            jax.block_until_ready(out)
            rates.append(n_lanes / (time.perf_counter() - t0))
        samples_per_s = sorted(rates)[len(rates) // 2]

        # roofline context (VERDICT r3 #7): the same dispatch with ALL
        # physics ablated (BF_ABLATE=trivial subprocess: launch + RNG +
        # accumulation only) gives the kernel's scheduling floor; the
        # fraction of wall above it is real physics work.  And the mesh
        # workload class (9.8k-tri BVH scene, depth 2) is the realistic
        # counterpart of the analytic flagship number.
        extras = {}
        try:
            extras["ablation_floor_fraction"] = round(
                _trivial_floor_fraction(n_lanes, max_depth), 3)
        except Exception as e:  # noqa: BLE001 — context, not the metric
            extras["ablation_floor_fraction"] = f"failed: {type(e).__name__}"
        try:
            extras["mesh_samples_per_s_depth2"] = round(
                _mesh_rate(max_depth=2), 1)
        except Exception as e:  # noqa: BLE001
            extras["mesh_samples_per_s_depth2"] = \
                f"failed: {type(e).__name__}"
        try:
            extras["mimo8_samples_per_s"] = round(_mimo_rate(), 1)
        except Exception as e:  # noqa: BLE001
            extras["mimo8_samples_per_s"] = f"failed: {type(e).__name__}"
        try:
            extras["mimo8_floor_fraction"] = round(
                _mimo_floor_fraction(), 3)
        except Exception as e:  # noqa: BLE001
            extras["mimo8_floor_fraction"] = f"failed: {type(e).__name__}"
        print(json.dumps({
            "metric": "radar_receive_samples_per_s_per_chip",
            "value": round(samples_per_s, 1),
            "unit": "samples/s",
            "vs_baseline": round(samples_per_s / ANCHOR_SAMPLES_PER_S, 3),
            **extras,
        }))
        return 0

    n_lanes = 1 << 20
    n_iter = 8
    adc = film_mod.film_new(rx.adc.n_time, rx.adc.n_freq, 1)
    key = jax.random.key(0)

    # warmup/compile
    adc1 = _receive_pass(scene_data, rx_h, shape_idx, None, key,
                         jnp.uint32(0), adc, n_lanes, max_depth, False)
    adc1.block_until_ready()

    t0 = time.perf_counter()
    a = adc
    for i in range(n_iter):
        a = _receive_pass(scene_data, rx_h, shape_idx, None, key,
                          jnp.uint32(i + 1), a, n_lanes, max_depth, False)
    a.block_until_ready()
    dt = time.perf_counter() - t0

    samples_per_s = n_iter * n_lanes / dt
    print(json.dumps({
        "metric": "radar_receive_samples_per_s_per_chip",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / ANCHOR_SAMPLES_PER_S, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
