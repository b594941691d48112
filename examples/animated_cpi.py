"""Coherent CPI over a keyframe-animated scene — the framework version of
the reference's per-frame reload loop (`python_scripts/animated_trans_rad.py`
rebuilds scene dicts per frame; here `AnimatedTransform` + `receive_cpi`
do it declaratively, with intra-pulse Doppler derived from the keyframes).

A 40 kHz CW sonar stares at a plate closing at 1 m/s; 16 coherent pulses at
PRF 400 Hz are slow-time FFT'd into a Doppler spectrum whose line sits at
the (aliased) 2 v f / c.

Run: python examples/animated_cpi.py  (CPU ok:
     JAX_PLATFORM_NAME=cpu python examples/animated_cpi.py)
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
import jax.numpy as jnp

from beifong_tpu import scene as sc
from beifong_tpu.bsdf import diffuse
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.core import transform as tf
from beifong_tpu.core.config import Band
from beifong_tpu.core.transform import AnimatedTransform
from beifong_tpu.radar import cw, wigner_transmitter, omni_receiver, ADCConfig
from beifong_tpu.receive import receive_cpi
from beifong_tpu.dsp import rangedoppler as rd, windows

C, FC = 340.0, 40e3
V, PRF, N_PULSES = 1.0, 400.0, 16

s = sc.Scene(band=Band.from_freq(C, FC, 10e3))
s.add(diffuse("mat", reflectance=1.0, twosided=True))
s.add(wigner_transmitter("tx", cw(f_centre=FC), resample_freq=True))
s.add(sh.rectangle(to_world=np.asarray(
    tf.compose(tf.look_at([0, 0, 0], [0, -1, 0]),
               tf.scale([0.05, 0.05, 1.0]))), transmitter="tx"))
rx = omni_receiver("rx", ADCConfig(n_time=2, n_freq=1, sampling_start=0.0,
                                   sampling_time=0.04,
                                   freq_lo=35e3, freq_hi=45e3),
                   position=(0.0, 0.0, 0.0), receive_type='raw')
s.add(rx)

# target: R(t) = 4 - V t via two keyframes — velocity (and hence Doppler)
# comes from the animation derivative, no manual velocity fields
t_end = N_PULSES / PRF
tgt = sh.rectangle(bsdf="mat")
tgt.to_world = AnimatedTransform.from_keyframes([
    (0.0, np.asarray(tf.compose(tf.look_at([0, -4.0, 0], [0, 0, 0]),
                                tf.scale(0.3)))),
    (t_end, np.asarray(tf.compose(
        tf.look_at([0, -(4.0 - V * t_end), 0], [0, 0, 0]), tf.scale(0.3)))),
])
s.add(tgt)

cube, n = receive_cpi(s, n_pulses=N_PULSES, prf=PRF, seed=11, coherent=True,
                      spp=1 << 13, max_depth=2, time_sampling='gate')
a = np.asarray(cube)
iq = (a[..., 0] + 1j * a[..., 1]).sum(axis=(1, 2))

spec = np.abs(np.asarray(rd.doppler_fft(jnp.asarray(iq[:, None]),
                                        window=windows.hann(N_PULSES))))[:, 0]
d_axis = np.asarray(rd.doppler_axis(N_PULSES, PRF))
fd_true = 2 * V * FC / C
fd_folded = abs(((fd_true + PRF / 2) % PRF) - PRF / 2)
print("Doppler spectrum (dB):")
for f_hz, p in zip(d_axis, spec):
    bar = "#" * int(max(0.0, 10 * np.log10(p / spec.max() + 1e-12) + 40) // 2)
    print(f"  {f_hz:8.1f} Hz  {bar}")
print(f"estimated line: {abs(d_axis[spec.argmax()]):.1f} Hz; "
      f"expected (aliased): {fd_folded:.1f} Hz")
