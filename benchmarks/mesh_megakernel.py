"""Mesh megakernel throughput on the real TPU: 10k-tri target."""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from beifong_tpu import scene as sc
from beifong_tpu.bsdf import diffuse
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.geometry.mesh import MeshSpec, make_grid
from beifong_tpu.core import transform as tf
from beifong_tpu.core.config import Band
from beifong_tpu.radar import pulse, wigner_transmitter, wigner_receiver, ADCConfig
from beifong_tpu.integrators.pallas_receive import receive_pallas, supported


def build(R=4.0, n_side=71):
    band = Band.from_freq(340.0, 40e3, 10e3)
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3, is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    aim = np.asarray(tf.compose(tf.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
    rx = wigner_receiver("rx", adc, receive_type='raw')
    s.add(rx)
    aim_rx = np.asarray(tf.compose(tf.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                                   tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
    v, f = make_grid(n_side, n_side)
    v = np.asarray(v, np.float32)
    v[:, 2] = 0.05 * np.sin(6 * v[:, 0]) * np.cos(5 * v[:, 1])
    m = np.asarray(tf.compose(tf.look_at([0, -R, 0], [0, 0, 0]), tf.scale(0.6)))
    s.add(MeshSpec(v, np.asarray(f), bsdf="mat", to_world=m))
    return s, rx


def main():
  for depth in (1, 2):
    s, rx = build()
    sd = s.compile(use_bvh=False)
    why = []
    assert supported(sd, rx, why), why
    n = 1 << 20
    t0 = time.perf_counter()
    out, nn = receive_pallas(s, sd, rx, spp=n, seed=0, max_depth=depth,
                             time_sampling='gate')
    jax.block_until_ready(out)
    print(f"depth={depth}: first (compile+run) {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    it = 4
    for i in range(it):
        out, nn = receive_pallas(s, sd, rx, spp=n, seed=i + 1,
                                 max_depth=depth, time_sampling='gate')
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / it
    sig = np.asarray(out)[:, 0]
    print(f"depth={depth}: {dt*1e3:.1f} ms /1M samples "
          f"({n/dt/1e6:.1f} M samples/s)  peak bin {sig.argmax()} "
          f"energy {sig.sum():.3e}", flush=True)


if __name__ == "__main__":
    main()
