"""Kernel-rate CPI over the 9.8k-tri mesh target on the real TPU
(VERDICT r4 #4): one lax.scan of the mesh megakernel over per-pulse
packed BVH tables — reports pulses/s and samples/s.

    python benchmarks/mesh_cpi_rate.py
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mesh_megakernel import build
from beifong_tpu.geometry.mesh import MeshSpec
from beifong_tpu.core import transform as tf
from beifong_tpu.core.transform import AnimatedTransform
from beifong_tpu.integrators.pallas_receive import receive_cpi_pallas


def main(n_pulses=16, prf=400.0, spp=1 << 20):
    s, rx = build()
    # make the mesh target close at 2 cm/pulse (rigid translation: the
    # per-pulse BVHs stack — same topology)
    mesh_spec = next(sp for sp in s.shapes if isinstance(sp, MeshSpec))
    s.shapes.remove(mesh_spec)
    tgt = MeshSpec(mesh_spec.vertices, mesh_spec.faces, bsdf="mat")
    frames = [(p / prf, np.asarray(
        tf.compose(tf.look_at([0, -(4.0 - 0.02 * p), 0], [0, 0, 0]),
                   tf.scale(0.6)))) for p in range(n_pulses + 1)]
    tgt.to_world = AnimatedTransform.from_keyframes(frames)
    s.add(tgt)

    t0 = time.perf_counter()
    cube, n = receive_cpi_pallas(s, n_pulses=n_pulses, prf=prf, seed=3,
                                 spp=spp, max_depth=2,
                                 time_sampling='gate', coherent=True)
    jax.block_until_ready(cube)
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    cube, n = receive_cpi_pallas(s, n_pulses=n_pulses, prf=prf, seed=4,
                                 spp=spp, max_depth=2,
                                 time_sampling='gate', coherent=True)
    jax.block_until_ready(cube)
    dt = time.perf_counter() - t0
    print(f"mesh CPI: {n_pulses} pulses x {n} lanes, cube {cube.shape}")
    print(f"cold (pack+compile) {t_cold:.1f} s; warm {dt:.3f} s = "
          f"{n_pulses / dt:.1f} pulses/s, "
          f"{n_pulses * n / dt / 1e6:.1f} M samples/s", flush=True)


if __name__ == "__main__":
    main()
