"""Multi-body scene: two mesh vehicles with different materials and
different radial velocities, resolved in range AND Doppler in one
receive pass (per-shape velocity/lobe tables — the megakernel resolves
each triangle's owning body after the BVH walk; the same estimator runs
on the jnp wavefront on CPU).

A 40 kHz sonar stares down-range at:
  * a stationary diffuse body at 3 m, and
  * a GGX-conductor body at 5.5 m closing at 3 m/s (offset off-axis so
    the first body doesn't shadow it).

The (fast-time x frequency) ADC grid separates them: each body's time
gate carries its own Doppler line.

Run: python examples/multi_body.py  (CPU ok:
     JAX_PLATFORM_NAME=cpu python examples/multi_body.py)
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
from beifong_tpu.bsdf import diffuse, rough_conductor
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.geometry.mesh import MeshSpec, make_grid
from beifong_tpu.core import transform as tf
from beifong_tpu.core.config import Band
from beifong_tpu.radar import (pulse, wigner_transmitter, wigner_receiver,
                               ADCConfig)
from beifong_tpu.receive import receive, develop_signal

C = 340.0


def main():
    fc = 40e3
    R1, R2, v2 = 3.0, 5.5, 3.0
    band = Band.from_freq(C, fc, 10e3)
    s = sc.Scene(band=band)
    s.add(diffuse("hull", reflectance=1.0, twosided=True))
    s.add(rough_conductor("metal", specular_reflectance=1.0, alpha=0.3,
                          eta=1.5, k=3.0, twosided=True))

    wf = pulse(f_centre=fc, prf=10.0, pulse_len=2e-3, f_ext=2e3,
               is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    # small apertures -> wide beam covering both bodies
    aim = np.asarray(tf.compose(tf.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                tf.scale([0.0125, 0.0125, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    adc = ADCConfig(n_time=16, n_freq=32, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=fc - 1e3, freq_hi=fc + 3e3)
    rx = wigner_receiver("rx", adc, receive_type='raw')
    s.add(rx)
    aim_rx = np.asarray(tf.compose(tf.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                                   tf.scale([0.0125, 0.0125, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))

    v, f = make_grid(9, 9)
    v = np.asarray(v, np.float32)
    v[:, 2] = 0.05 * np.sin(4 * v[:, 0]) * np.cos(3 * v[:, 1])
    m1 = np.asarray(tf.compose(tf.look_at([0, -R1, 0], [0, 0, 0]),
                               tf.scale(0.6)))
    s.add(MeshSpec(v, np.asarray(f), bsdf="hull", to_world=m1))
    p2 = np.asarray([0.0, -R2, 1.5])
    m2 = np.asarray(tf.compose(tf.look_at(p2, [0, 0, 0]), tf.scale(0.6)))
    mover = MeshSpec(v, np.asarray(f), bsdf="metal", to_world=m2)
    mover.velocity = np.asarray([0.0, v2, 0.0], np.float32)
    s.add(mover)

    sd = s.compile(use_bvh=False)
    adc_g, n = receive(s, sd, rx, spp=1 << 14, max_depth=1, seed=0,
                       time_sampling='gate', use_pallas='auto')
    grid = np.asarray(develop_signal(adc_g, n, rx.adc))[..., 0]

    t_axis = (np.arange(adc.n_time) + 0.5) / adc.n_time * adc.sampling_time
    f_axis = adc.freq_lo + (np.arange(adc.n_freq) + 0.5) / adc.n_freq \
        * (adc.freq_hi - adc.freq_lo)
    tau2 = (np.linalg.norm(p2 - [0.3, 0, 0])
            + np.linalg.norm(p2 - [-0.3, 0, 0])) / C
    tb1 = int(2 * R1 / C / adc.sampling_time * adc.n_time)
    tb2 = int(tau2 / adc.sampling_time * adc.n_time)
    for name, tb, vel in (("body 1 (diffuse, static)", tb1, 0.0),
                          ("body 2 (conductor, closing)", tb2, v2)):
        spec = grid[max(tb - 1, 0):tb + 2].sum(axis=0)
        fpk = f_axis[spec.argmax()]
        v_est = (fpk - fc) * C / (2 * fc)
        print(f"{name}: gate {tb} ({t_axis[tb]*1e3:.1f} ms) "
              f"doppler peak {fpk - fc:+.0f} Hz -> v ~ {v_est:+.2f} m/s "
              f"(true {vel:+.2f})")
    np.save("multi_body_grid.npy", grid)


if __name__ == "__main__":
    main()
