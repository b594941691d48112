"""Inverse radar: recover target range and reflectance by gradient descent.

The compiled scene is a pytree of device arrays, so ANY function of it —
including the full receive chain (ray sampling, tracing, waveform/WDF
weights, ADC binning) — differentiates with `jax.grad`.  This example
treats an observed range profile as data and fits two unknowns:

  * the target's range offset `dy` (timing: gradient flows through the
    intersection distance into the tent-splat bin coordinates), and
  * its reflectance (amplitude).

This is the reference's `mitsuba.python.autodiff` workflow
(`src/python/python/autodiff.py:121-380`) without the adjoint machinery.

    python examples/inverse_radar.py
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORM_NAME") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from beifong_tpu import scene as sc, film as film_mod
from beifong_tpu.autodiff import Adam
from beifong_tpu.bsdf import diffuse
from beifong_tpu.core import transform as tf
from beifong_tpu.core.config import Band
from beifong_tpu.core.rng import SampleStream
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.integrators.radar_path import radar_receive_trace
from beifong_tpu.radar import (pulse, wigner_transmitter, wigner_receiver,
                               ADCConfig)
from beifong_tpu.radar.endpoints import rx_sample_ray, rx_sample_frequency

C, R_TRUE, REFL_TRUE = 340.0, 4.0, 0.7


def build_scene():
    band = Band.from_freq(C, 40e3, 10e3)
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
               is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    aim = np.asarray(tf.compose(tf.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
    rx = wigner_receiver("rx", adc, receive_type="raw")
    s.add(rx)
    aim_rx = np.asarray(tf.compose(tf.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                                   tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))   # shape row 1
    tgt = np.asarray(tf.compose(tf.look_at([0, -R_TRUE, 0], [0, 0, 0]),
                                tf.scale(0.5)))
    s.add(sh.rectangle(to_world=tgt, bsdf="mat"))         # shape row 2
    return s, rx


N_LANES = 1 << 15


def signal(scene_data, rx, n=N_LANES, seed=1):
    """Range profile via the library's sampling ops (fixed RNG: the same
    sample set for data and model makes the inverse problem noiseless)."""
    cfg = rx.adc
    stream = SampleStream.make(jax.random.key(seed), n, 0)
    u_t, stream = stream.next_1d()
    t_rx = cfg.sampling_start + u_t * cfg.sampling_time
    u_f, stream = stream.next_1d()
    f_rx, f_w = rx_sample_frequency(rx.receive_type, None, scene_data.band,
                                    t_rx, u_f)
    u_pos, stream = stream.next_2d()
    u_dir, stream = stream.next_2d()
    o, d, w = rx_sample_ray(scene_data, rx, 1, t_rx, u_pos, u_dir)
    adc = film_mod.film_new(cfg.n_time, cfg.n_freq, 1)
    adc, _ = radar_receive_trace(scene_data, stream, o, d, t_rx, f_rx,
                                 w * f_w, adc, cfg, rx.receive_type, None,
                                 jnp.zeros(3), max_depth=2)
    return adc[..., 0] * 1e6     # scale into a friendly loss range


def main():
    s, rx = build_scene()
    sd = s.compile()

    def with_params(dy, refl):
        # slide the target in world y: move to_world AND the cached
        # inverse to_object (the intersector works in the local frame)
        tw = sd.shapes.to_world.at[2, 1, 3].add(dy)
        to = sd.shapes.to_object
        to = to.at[2, :3, 3].add(-to[2, :3, 1] * dy)
        import dataclasses as dc
        return dc.replace(
            sd,
            shapes=dc.replace(sd.shapes, to_world=tw, to_object=to),
            bsdfs=dc.replace(sd.bsdfs,
                             reflectance=sd.bsdfs.reflectance * refl))

    observed = signal(with_params(0.0, REFL_TRUE), rx)

    @jax.jit
    def loss(p):
        sig = signal(with_params(p['dy'], p['refl']), rx)
        return jnp.mean((sig - observed) ** 2)

    # start 20 cm off in range and 2.3x off in reflectance
    params = {'dy': jnp.float32(0.2), 'refl': jnp.float32(0.3)}
    opt = Adam(lr=0.03)
    grad = jax.jit(jax.value_and_grad(loss))
    val, gr = grad(params)   # compile outside the timed loop
    jax.block_until_ready(val)
    import time as _time
    t_opt = _time.perf_counter()
    n_grad_samples = 0
    for i in range(160):
        val, gr = grad(params)
        params = opt.step(params, gr)
        n_grad_samples += N_LANES
        if i % 20 == 0:
            print(f"step {i:2d}: loss {float(val):.3e}  "
                  f"range err {abs(float(params['dy'])) * 100:.1f} cm  "
                  f"refl {float(params['refl']):.3f}", flush=True)

    jax.block_until_ready(params['dy'])
    dt_opt = _time.perf_counter() - t_opt
    print(f"gradient path rate: {n_grad_samples / dt_opt:,.0f} "
          f"samples/s (fwd+bwd through the jnp wavefront; the megakernel "
          f"primal rides autodiff.differentiable_receive)", flush=True)
    dy, refl = float(params['dy']), float(params['refl'])
    print(f"recovered: range offset {dy * 100:+.1f} cm (true 0), "
          f"reflectance {refl:.3f} (true {REFL_TRUE})")
    assert abs(dy) < 0.03, dy
    assert abs(refl - REFL_TRUE) < 0.05, refl


if __name__ == "__main__":
    main()
