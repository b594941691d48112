"""Mesh megakernel roofline: measured BVH visit counts x per-step cost
model vs achieved throughput on the 9.8k-tri scene (VERDICT r3 #3).

The walk is a shared-scalar-pointer speculative traversal
(`geometry/pallas_bvh.py`): a (8,128) ray tile advances ONE node pointer;
per node step the cost is ~9 scalar SMEM loads + a 22-op vectorized slab
test + ONE any-lane reduce whose result gates the hit/miss branch (a
serial vector->scalar dependency), and per visited leaf an 8-triangle
Moller-Trumbore block (~360 vector ops + ~80 scalar loads).

Throughput is therefore (visits per tile) x (per-step wall cost).  This
script measures both factors:
  - achieved samples/s at depth 1/2 (packed once; kernel-only timing),
  - actual node steps / leaf visits per tile via the kernel's `count`
    instrumentation — AT THE SAME TILE COUNT CLASS as the timed runs
    (>= 256 tiles so the per-tile direction stratification is active;
    below that threshold tiles go iid and visit ~2-3x more nodes),
  - the no-NEE-occlusion ablation (BF_ABLATE=nooccl subprocess) to split
    the closest-hit walk from the occlusion walk.

Run on the real TPU: python benchmarks/mesh_roofline.py
"""
import os
import subprocess
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from mesh_megakernel import build
from beifong_tpu.integrators.pallas_receive import (_pack_scene, _run,
                                                    supported, MESH_SUB,
                                                    MESH_STREAMS, LANE)

# one kernel block = MESH_STREAMS interleaved 8-row walks
TILE = MESH_SUB * MESH_STREAMS * LANE


class Runner:
    """Pack once; time kernel-only (packing costs ~160 ms of D2H reads)."""

    def __init__(self, s, sd, rx):
        shape_idx = s.shape_index_of_endpoint('receiver', rx.id)
        (params, prim, txp, php, rxph, msh, self.mesh_types, tex,
         self.bmp_meta, mp) = _pack_scene(sd, rx, shape_idx)
        self.params = params
        self.prim = jnp.asarray(prim)
        self.txp = jnp.asarray(txp)
        self.php = jnp.asarray(php)
        self.rxph = jnp.asarray(rxph)
        self.msh = jnp.asarray(msh)
        self.tex = jnp.asarray(tex)
        self.kinds = tuple(int(k) for k in prim[:, 0])
        self.ptx = tuple(int(f) for f in prim[:, 14])
        self.pbsdf = tuple(int(f) for f in prim[:, 18])
        self.ptex = tuple(int(f) for f in prim[:, 26])
        self.mp = mp
        self.rx = rx

    def __call__(self, n_lanes, depth, seed=0, count=''):
        p = self.params.copy()
        p[0] = float(seed * 1_000_003 % (1 << 30))
        out = _run(jnp.asarray(p), self.prim, self.txp, self.php, self.rxph,
                   jax.random.key(seed), self.kinds, self.ptx, self.pbsdf,
                   self.ptex, self.rx.adc, self.rx.receive_type, 'gate',
                   depth, 'wigner', n_lanes, False, False, has_mesh=True,
                   mesh_types=self.mesh_types, tex=self.tex, msh=self.msh,
                   bvh_bbox=self.mp.bbox, bvh_links=self.mp.links,
                   bvh_leaves=self.mp.leaves, count=count)
        jax.block_until_ready(out)
        return out


def median_rate(run, n_lanes, depth, iters=4):
    run(n_lanes, depth, seed=0)                           # compile
    rates = []
    for i in range(iters):
        t0 = time.perf_counter()
        run(n_lanes, depth, seed=i + 1)
        rates.append(n_lanes / (time.perf_counter() - t0))
    return sorted(rates)[len(rates) // 2]


def main():
    s, rx = build()
    sd = s.compile(use_bvh=False)
    why = []
    assert supported(sd, rx, why), why
    run = Runner(s, sd, rx)
    n_time = 1 << 20          # stratified (blocks*streams % 256 == 0)
    n_cnt = 1 << 18           # smallest stratified size

    print("devices:", jax.devices(), flush=True)
    for depth in (1, 2):
        rate = median_rate(run, n_time, depth)
        nodes = float(np.asarray(run(n_cnt, depth, 1, 'nodes')[4])[0, 0])
        leaves = float(np.asarray(run(n_cnt, depth, 1, 'leaves')[4])[0, 0])
        n_tiles = n_cnt // TILE
        npt, lpt = nodes / n_tiles, leaves / n_tiles
        t_tile = TILE / rate
        print(f"depth={depth} (S={MESH_STREAMS}): {rate / 1e6:.1f} M "
              f"samples/s | per block: {npt:.0f} node steps, {lpt:.0f} "
              f"leaf visits, {t_tile * 1e6:.1f} us wall -> "
              f"{t_tile / (npt + 2.0 * lpt) * 1e9:.1f} ns per "
              f"leaf-equivalent step", flush=True)

    print("bound check: wall/block ~= (nodes + 2*leaves) x 200-250 ns + "
          "1.1 us non-walk baseline (docs/MESH_PERF.md)", flush=True)
    # occlusion-walk share: rerun depth 2 without the NEE occlusion test
    env = dict(os.environ, BF_ABLATE='nooccl')
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), '--one', '2'],
        env=env, capture_output=True, text=True, timeout=900)
    print("nooccl depth=2:", out.stdout.strip().splitlines()[-1]
          if out.returncode == 0 else out.stderr[-500:], flush=True)


def one(depth):
    s, rx = build()
    sd = s.compile(use_bvh=False)
    run = Runner(s, sd, rx)
    rate = median_rate(run, 1 << 20, depth)
    print(f"{rate / 1e6:.1f} M samples/s")


if __name__ == "__main__":
    if sys.argv[1:2] == ['--one']:
        one(int(sys.argv[2]))
    else:
        main()
