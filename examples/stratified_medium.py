"""Sonar ranging through a stratified absorbing layer.

A z-layered ambient medium (`media.LayeredMedium`) models a water-column /
atmospheric absorption profile: the echo of a target BELOW an absorbing
thermocline-like layer is attenuated by the exact two-crossing optical
depth, while a reference target at sensor depth is untouched.  The layered
profile runs inside the Pallas megakernel (closed-form segment tau, no ray
marching); this example uses the portable jnp chain so it runs anywhere.

    python examples/stratified_medium.py
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORM_NAME") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from beifong_tpu import scene as sc
from beifong_tpu.bsdf import diffuse
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.core import transform as tf
from beifong_tpu.core.config import Band
from beifong_tpu.media import LayeredMedium
from beifong_tpu.radar import pulse, wigner_transmitter, omni_receiver, \
    ADCConfig
from beifong_tpu.receive import receive, develop_signal

C = 340.0


def build(med):
    band = Band.from_freq(C, 40e3, 10e3)
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
               is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    aim = np.asarray(tf.compose(tf.look_at([0.3, 0, 3], [0, -4, 0]),
                                tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
    rx = omni_receiver("rx", adc, position=(-0.3, 0, 3), receive_type="raw")
    s.add(rx)
    # deep target: paths cross the absorbing layer twice per leg pair
    tgt = np.asarray(tf.compose(tf.look_at([0, -4, 0], [0, 0, 3]),
                                tf.scale(0.5)))
    s.add(sh.rectangle(to_world=tgt, bsdf="mat"))
    s.medium = med
    return s, rx


def profile(adc_g, n, rx):
    return np.asarray(develop_signal(adc_g, n, rx.adc))[:, 0, 0]


def main():
    # absorbing slab for z in [1, 2] (e.g. a turbid layer), clear elsewhere
    med = LayeredMedium.make([0.0, 0.4, 0.0, 0.0], z_min=0.0, z_max=4.0)

    s, rx = build(None)
    a, n = receive(s, receiver=rx, spp=1 << 14, max_depth=2, seed=1)
    vac = profile(a, n, rx)
    s, rx = build(med)
    a, n = receive(s, receiver=rx, spp=1 << 14, max_depth=2, seed=1)
    lay = profile(a, n, rx)

    pk = 10 + int(vac[10:].argmax())      # skip the direct tx->rx blast
    t_pk = (pk + 0.5) / 64 * 0.06
    att = lay[pk - 2:pk + 3].sum() / vac[pk - 2:pk + 3].sum()
    print(f"target return at t = {t_pk * 1e3:.1f} ms "
          f"(range ~ {t_pk * C / 2:.2f} m one-way equivalent)")
    print(f"echo attenuation through the layer: {att:.3f} "
          f"({10 * np.log10(max(att, 1e-12)):.1f} dB)")
    assert 0.05 < att < 0.9, "expected partial absorption through the slab"


if __name__ == "__main__":
    main()
