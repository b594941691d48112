"""Megakernel ablation profile (BF_ABLATE knob): run with
  for m in "" trivial nooccl nosplat; do BF_ABLATE=$m python benchmarks/ablate_megakernel.py; done
v5e, 64M lanes, depth 3 (2026-08): none 69.7ms (963M samples/s),
trivial 12.8ms (launch+RNG floor), nooccl 63.5ms, nosplat 52.1ms
-> occlusion 9%, splat 25%, trace+waveform 47%, floor 18%.
The splat is near its formulation floor: tent weights cost 2 nonzeros/lane
but Mosaic has no scatter, so every cell does a masked tile reduce; the
dot_general alternative moves the same arithmetic to the MXU without
reducing it (measured no win at n_freq == 1).
"""
import sys, time, os
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tests')
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import __graft_entry__ as g

mode = os.environ.get("BF_ABLATE", "")
from beifong_tpu.integrators.pallas_receive import receive_pallas
s, rx = g._build_scene(ground=False, rx_kind="wigner")
sd = s.compile()
n = 1 << 26
out, nn = receive_pallas(s, sd, rx, spp=n, seed=0, max_depth=3,
                         time_sampling='gate')
jax.block_until_ready(out)
t0 = time.perf_counter()
for i in range(3):
    out, nn = receive_pallas(s, sd, rx, spp=n, seed=i + 1, max_depth=3,
                             time_sampling='gate')
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 3
print(f"ablate={mode or 'none':8s} {dt*1e3:7.1f} ms /64M "
      f"({n/dt/1e6:6.0f} M samples/s)", flush=True)
