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
        print(json.dumps({
            "metric": "radar_receive_samples_per_s_per_chip",
            "value": round(samples_per_s, 1),
            "unit": "samples/s",
            "vs_baseline": round(samples_per_s / ANCHOR_SAMPLES_PER_S, 3),
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
