"""MIMO megakernel ablation (VERDICT r4 #5): where does config 5's gap to
the analytic flagship go?

Run on a real TPU:

    python benchmarks/ablate_mimo.py

Variants measured (each in a fresh subprocess so BF_ABLATE binds at
import):
  e1        coherent non-MIMO (2 channels) — the flagship-style baseline
  e2/e4/e8  MIMO with 2/4/8 elements (4/8/16 I/Q channels): channel-count
            scaling of the concat + (n_time, 2E) dot splat
  e8-notrig 16 channels but ONE shared phase (trig ablated): per-element
            phase trig cost
  e8-trivial launch + RNG + accumulation only: the scheduling floor

The per-connection MIMO cost decomposes as
  rate(e8) vs rate(e8-notrig)  -> trig share
  rate(e8-notrig) vs rate(e2..) -> splat-width share
  rate(trivial)                -> floor fraction (bench.py reports it)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

_CODE = """
import jax, time, sys
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, '/root/repo')
import numpy as np
from beifong_tpu import scene as sc
from beifong_tpu.bsdf import diffuse
from beifong_tpu.core.config import Band
from beifong_tpu.radar import (pulse, wigner_transmitter, phased_receiver,
                               wigner_receiver, ADCConfig)
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.core import transform as tf
from beifong_tpu.integrators.pallas_receive import receive_pallas

n_elems = {n_elems}
n_lanes = {n_lanes}
iters = {iters}
band = Band.from_freq(340.0, 40e3, 1e3)
wl = band.wavelength_centre
s = sc.Scene(band=band)
s.add(diffuse('mat', reflectance=1.0, twosided=True))
s.add(wigner_transmitter(
    'tx', pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=1e3,
                is_delta=True), resample_freq=True))
s.add(sh.rectangle(to_world=np.asarray(
    tf.compose(tf.look_at([0.1, 0, 0], [0.1, -1, 0]),
               tf.scale([0.004, 0.004, 1.0]))), transmitter='tx'))
adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                sampling_time=0.06, freq_lo=39.5e3, freq_hi=40.5e3)
rx = phased_receiver('rxm', adc, n_elems=max(n_elems, 2),
                     elem_spacing=wl / 2, elem_wid=(wl / 4, wl / 4),
                     receive_type='raw')
s.add(rx)
s.add(sh.rectangle(to_world=np.asarray(
    tf.compose(tf.look_at([0.0, 0, 0], [0.0, -1, 0]),
               tf.scale([1e-4, 1e-4, 1.0]))), receiver='rxm'))
s.add(sh.rectangle(to_world=np.asarray(
    tf.compose(tf.look_at([0, -4.0, 0], [0, 0, 0]), tf.scale(0.5))),
    bsdf='mat'))
sd = s.compile()
kw = dict(spp=n_lanes, max_depth=2, time_sampling='gate')
if n_elems >= 2:
    kw['mimo'] = True
else:
    kw['coherent'] = True   # flagship-style 2-channel I/Q baseline
out, _ = receive_pallas(s, sd, rx, seed=0, **kw)
jax.block_until_ready(out)
t0 = time.perf_counter()
for i in range(iters):
    out, _ = receive_pallas(s, sd, rx, seed=i + 1, **kw)
jax.block_until_ready(out)
print(iters * n_lanes / (time.perf_counter() - t0))
"""


def run(n_elems: int, ablate: str = "", n_lanes: int = 1 << 22,
        iters: int = 4) -> float:
    env = dict(os.environ)
    env.pop("BF_ABLATE", None)
    if ablate:
        env["BF_ABLATE"] = ablate
    code = _CODE.format(n_elems=n_elems, n_lanes=n_lanes, iters=iters)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=900,
                         check=True)
    return float(out.stdout.strip().splitlines()[-1])


def main():
    res = {}
    res["e1_coherent"] = run(1)
    for e in (2, 4, 8):
        res[f"e{e}"] = run(e)
    res["e8_notrig"] = run(8, ablate="notrig")
    res["e8_trivial"] = run(8, ablate="trivial")
    res["floor_fraction"] = res["e8"] / res["e8_trivial"]
    res["trig_share"] = 1.0 - res["e8"] / res["e8_notrig"]
    print(json.dumps({k: round(v, 4) if k.endswith(("fraction", "share"))
                      else round(v, 1) for k, v in res.items()}, indent=1))


if __name__ == "__main__":
    main()
