"""A/B the DFS-window BVH walk + direction-strata depth on the real TPU.

Variants (fresh subprocess each — BF_MESH_WINDOW / BF_PATCH_P bind at
import): window 1 (classic walk) / 8 / 16, each at PATCH_P 16 and 32,
on the 9.8k-tri bench scene at depth 2 (the BENCH mesh line config).

    python benchmarks/mesh_window_ab.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CODE = """
import jax, time, sys
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/benchmarks')
from mesh_megakernel import build
from beifong_tpu.integrators.pallas_receive import receive_pallas
s, rx = build()
sd = s.compile(use_bvh=False)
n_lanes = 1 << 20
out, _ = receive_pallas(s, sd, rx, spp=n_lanes, seed=0, max_depth=2,
                        time_sampling='gate')
jax.block_until_ready(out)
t0 = time.perf_counter()
iters = 4
for i in range(iters):
    out, _ = receive_pallas(s, sd, rx, spp=n_lanes, seed=i + 1,
                            max_depth=2, time_sampling='gate')
jax.block_until_ready(out)
print(iters * n_lanes / (time.perf_counter() - t0))
"""


def run(window: int, patch: int) -> float:
    env = dict(os.environ, BF_MESH_WINDOW=str(window),
               BF_PATCH_P=str(patch))
    out = subprocess.run([sys.executable, "-c", _CODE], env=env,
                         capture_output=True, text=True, timeout=1200,
                         check=True)
    return float(out.stdout.strip().splitlines()[-1])


def main():
    res = {}
    for patch in (16, 32):
        for window in (1, 8, 16):
            key = f"w{window}_p{patch}"
            try:
                res[key] = round(run(window, patch), 1)
            except subprocess.CalledProcessError as e:
                res[key] = f"failed: {e.stderr[-400:]}"
            print(json.dumps({key: res[key]}), flush=True)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
