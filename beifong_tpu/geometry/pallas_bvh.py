"""Pallas TPU kernel: speculative per-tile BVH traversal for triangle meshes.

The TPU answer to the reference's OptiX BVH (`scene_optix.inl`,
`src/librender/optix_api.cpp`): per-lane divergent traversal doesn't map to
a vector machine, so each (SUB, LANE) ray tile traverses the *threaded* BVH
(`geometry/bvh.py` hit/miss-link layout) with ONE shared scalar node
pointer.  At every node the AABB slab test runs vectorized across all lanes
of the tile; a scalar any-lane reduction decides hit_link vs miss_link, and
leaf triangles (packed 8 per leaf) are tested densely under per-lane masks.

Two TPU-specific tricks:
  * speculative traversal — a tile visits the union of its lanes' node
    sets, so throughput depends on ray coherence within a tile.  The
    receive pipeline makes tiles coherent *by construction*: direction
    strata are assigned per tile, so primary and NEE sweeps trace narrow
    beams.  Incoherent tiles degrade toward a dense sweep (correct, slower).
  * stream interleaving — each kernel invocation walks STREAMS independent
    tiles with independent node pointers inside one while loop; their
    scalar load -> vector slab -> any() reduce -> branch chains interleave,
    hiding the vector->scalar reduce latency that otherwise bounds the walk.

Scene tables live in SMEM (scalar memory, 1 MiB): traversal is a
scalar-indexed walk, which is exactly what SMEM is for.  Tables are FLAT
1-D because SMEM pads 2-D minor dims to 128 lanes.  Rays/outputs ride VMEM
tiles.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import BVH

SUB, LANE = 8, 128
TILE = SUB * LANE
STREAMS = 1          # interleaved traversals per invocation (measured:
#                      the walk is compute-bound, interleave doesn't pay)
# DFS-window width: per serial step, slab-test the next WINDOW nodes in
# DFS order at once and chase the hit/miss links through the window with
# cheap scalar bit tests — visited nodes are DFS-contiguous (measured
# ~4.7 visited nodes per 8-window on the bench scene), so this amortises
# the vector->scalar any-lane reduce that bounds the classic walk
# (docs/MESH_PERF.md).  1 = classic one-node stepping.
import os as _os
WINDOW = int(_os.environ.get("BF_MESH_WINDOW", "8"))
K_LEAF = 8           # triangles per packed leaf row
_INF = 3.4e38

# SMEM budget (bytes) available to the scene tables; the hard SMEM limit is
# 1 MiB and the kernel needs headroom for its own scalars.
SMEM_TABLE_BUDGET = 900 * 1024


def smem_bytes(n_tris: int, payload: bool = False,
               payload2: bool = False) -> int:
    """Approximate SMEM footprint of a packed BVH over n_tris (aligned
    leaves: ~n_tris/8 leaves, ~2x that many nodes)."""
    n_leaves = (n_tris + K_LEAF - 1) // K_LEAF
    n_nodes = 2 * n_leaves
    stride = 80 + (8 if payload else 0) + (8 if payload2 else 0)
    return n_nodes * (6 + 3) * 4 + n_leaves * stride * 4


@dataclasses.dataclass(frozen=True)
class PackedBVH:
    """Kernel-ready tables (see pack()); hashable by id for jit closure."""
    # All tables are FLAT 1-D: SMEM pads the minor dim of 2-D arrays to
    # 128 lanes (a (N,6) f32 table allocates N*512 bytes), and SMEM is 1 MiB.
    bbox: jax.Array     # (N*6,) f32: [bbmin(3), bbmax(3)] per node
    links: jax.Array    # (N*3,) i32: [hit_link, miss_link, leaf_id] per node
    leaves: jax.Array   # (L*stride,) f32: v0x*8 v0y*8 v0z*8 e1*24 e2*24
    #                     idx*8 [payload*8 at 80][payload2*8 at 88]
    n_nodes: int
    n_leaves: int
    stride: int = 80    # leaf row width: 80 plain, +8 per payload channel


def pack(bvh: BVH, payload=None, payload2=None) -> PackedBVH:
    """Flatten a threaded BVH into SMEM-friendly tables, padding every leaf
    to exactly K_LEAF triangles (degenerate zero-edge pads never hit).

    `payload`: optional (n_tris,) f32 per-ORIGINAL-triangle scalar (e.g.
    reflectance) carried next to each leaf triangle; widens rows to 88.
    `payload2`: optional second per-tri scalar (e.g. the owning shape's
    row in a per-shape table) at offset 88; requires `payload`."""
    bb_min = np.asarray(bvh.bb_min, np.float32)
    bb_max = np.asarray(bvh.bb_max, np.float32)
    hit_l = np.asarray(bvh.hit_link, np.int32)
    miss_l = np.asarray(bvh.miss_link, np.int32)
    leaf_off = np.asarray(bvh.leaf_offset, np.int32)
    leaf_cnt = np.asarray(bvh.leaf_count, np.int32)
    v0 = np.asarray(bvh.v0, np.float32)
    e1 = np.asarray(bvh.e1, np.float32)
    e2 = np.asarray(bvh.e2, np.float32)
    perm = np.asarray(bvh.perm, np.int32)

    n = len(bb_min)
    bbox = np.concatenate([bb_min, bb_max], axis=1).astype(np.float32)
    # pad with inverted (never-hit) boxes: the DFS-window walk slab-tests
    # up to WINDOW-1 nodes past the last one (traversal_body)
    pad_w = max(WINDOW, 16)
    bbox = np.concatenate([bbox, np.tile(
        np.array([[_INF, _INF, _INF, -_INF, -_INF, -_INF]], np.float32),
        (pad_w, 1))], axis=0)
    links = np.stack([hit_l, miss_l, np.full(n, -1, np.int32)], axis=1)

    assert payload2 is None or payload is not None
    stride = 80 + (0 if payload is None else 8) \
        + (0 if payload2 is None else 8)
    leaf_nodes = np.nonzero(leaf_off >= 0)[0]
    rows = []
    for li, ni in enumerate(leaf_nodes):
        links[ni, 2] = li
        off, cnt = int(leaf_off[ni]), int(leaf_cnt[ni])
        row = np.zeros(stride, np.float32)
        idxs = np.full(K_LEAF, -1, np.float32)
        for k in range(min(cnt, K_LEAF)):
            row[0 + k] = v0[off + k, 0]
            row[8 + k] = v0[off + k, 1]
            row[16 + k] = v0[off + k, 2]
            row[24 + k] = e1[off + k, 0]
            row[32 + k] = e1[off + k, 1]
            row[40 + k] = e1[off + k, 2]
            row[48 + k] = e2[off + k, 0]
            row[56 + k] = e2[off + k, 1]
            row[64 + k] = e2[off + k, 2]
            idxs[k] = float(perm[off + k])
            if payload is not None:
                row[80 + k] = float(payload[perm[off + k]])
            if payload2 is not None:
                row[88 + k] = float(payload2[perm[off + k]])
        row[72:80] = idxs
        rows.append(row)
    leaves = (np.stack(rows) if rows
              else np.zeros((1, stride), np.float32))
    return PackedBVH(bbox=jnp.asarray(bbox.reshape(-1)),
                     links=jnp.asarray(links.reshape(-1)),
                     leaves=jnp.asarray(leaves.reshape(-1)), n_nodes=n,
                     n_leaves=max(len(rows), 1), stride=stride)


def traversal_body(bbox_ref, links_ref, leaf_ref, rays, state, anyhit: bool,
                   streams: int = STREAMS, sub: int = SUB, stride: int = 80):
    """Run the interleaved traversal loop over `streams` independent tiles.

    rays: (rox..rdz, ix, iy, iz) tuple of (streams*sub, LANE) arrays.
    state: dict of mutable-ref callables — see bvh_closest/_run for the
    standalone wiring; the megakernel reuses this with its own state.
    Exposed as a library function so `integrators/pallas_receive.py` embeds
    the exact same walk inside the receive megakernel.
    `stride`: leaf row width (88 rows carry a per-tri payload scalar that is
    forwarded to leaf_hit; 80-wide rows forward 0.0).
    state may carry an optional 'visit' callable `(s, node, hit_any,
    leaf_id)` invoked once per node step — the perf-instrumentation hook
    behind `BF_COUNT` (benchmarks/mesh_roofline.py) that measures nodes /
    leaves actually visited per traversal.
    """
    visit = state.get('visit')
    rox, roy, roz, rdx, rdy, rdz, ix, iy, iz = rays
    S = streams

    def srows(x, s):
        return x[s * sub:(s + 1) * sub, :]

    W = max(int(state.get('window', WINDOW)), 1)

    def body(carry):
        nodes = carry[:S]
        new_nodes = []
        for s in range(S):
            node = nodes[s]
            w0 = jnp.maximum(node, 0)
            ox_s, oy_s, oz_s = srows(rox, s), srows(roy, s), srows(roz, s)
            ix_s, iy_s, iz_s = srows(ix, s), srows(iy, s), srows(iz, s)
            tb = state['tbest'](s)
            # --- DFS window: slab-test nodes [w0, w0+W) in one step; the
            # W any-lane reductions are mutually independent so their
            # vector->scalar latencies overlap (the classic walk pays one
            # full reduce->branch round trip PER node) ---
            M = jnp.int32(0)
            for c in range(W):
                nb = (w0 + c) * 6
                x0 = bbox_ref[nb + 0]
                y0 = bbox_ref[nb + 1]
                z0 = bbox_ref[nb + 2]
                x1 = bbox_ref[nb + 3]
                y1 = bbox_ref[nb + 4]
                z1 = bbox_ref[nb + 5]
                tx0 = (x0 - ox_s) * ix_s
                tx1 = (x1 - ox_s) * ix_s
                ty0 = (y0 - oy_s) * iy_s
                ty1 = (y1 - oy_s) * iy_s
                tz0 = (z0 - oz_s) * iz_s
                tz1 = (z1 - oz_s) * iz_s
                tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                             jnp.minimum(ty0, ty1)),
                                 jnp.minimum(tz0, tz1))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                             jnp.maximum(ty0, ty1)),
                                 jnp.maximum(tz0, tz1))
                mask = (tf >= jnp.maximum(tn, 0.0)) & (tn < tb)
                n_hit = jnp.sum(jnp.where(mask, 1.0, 0.0))
                M = M | jnp.where(n_hit > 0.0, jnp.int32(1 << c),
                                  jnp.int32(0))
            M = jnp.where(node >= 0, M, jnp.int32(0))

            # --- chase the hit/miss links through the window: visited
            # nodes are DFS-contiguous, so most steps stay inside and
            # cost only scalar link loads + a bit test (no vector work
            # except actual leaf hits) ---
            def _chase_cond(nd):
                return (nd >= w0) & (nd < w0 + W)

            def _chase_body(nd, s=s, w0=w0, M=M, ox_s=ox_s, oy_s=oy_s,
                            oz_s=oz_s):
                ci = nd - w0
                hit_any = (jax.lax.shift_right_logical(M, ci) & 1) > 0
                leaf_id = links_ref[nd * 3 + 2]

                @pl.when(hit_any & (leaf_id >= 0))
                def _():
                    dx_s, dy_s, dz_s = (srows(rdx, s), srows(rdy, s),
                                        srows(rdz, s))
                    lb = leaf_id * stride
                    for k in range(K_LEAF):
                        v0x = leaf_ref[lb + 0 + k]
                        v0y = leaf_ref[lb + 8 + k]
                        v0z = leaf_ref[lb + 16 + k]
                        e1x = leaf_ref[lb + 24 + k]
                        e1y = leaf_ref[lb + 32 + k]
                        e1z = leaf_ref[lb + 40 + k]
                        e2x = leaf_ref[lb + 48 + k]
                        e2y = leaf_ref[lb + 56 + k]
                        e2z = leaf_ref[lb + 64 + k]
                        tri = leaf_ref[lb + 72 + k]
                        # Möller-Trumbore, scalar triangle vs vector rays
                        px = dy_s * e2z - dz_s * e2y
                        py = dz_s * e2x - dx_s * e2z
                        pz = dx_s * e2y - dy_s * e2x
                        det = e1x * px + e1y * py + e1z * pz
                        inv = jnp.where(jnp.abs(det) > 1e-12, 1.0, 0.0) \
                            / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
                        tvx = ox_s - v0x
                        tvy = oy_s - v0y
                        tvz = oz_s - v0z
                        uu = (tvx * px + tvy * py + tvz * pz) * inv
                        qx = tvy * e1z - tvz * e1y
                        qy = tvz * e1x - tvx * e1z
                        qz = tvx * e1y - tvy * e1x
                        vv = (dx_s * qx + dy_s * qy + dz_s * qz) * inv
                        tt = (e2x * qx + e2y * qy + e2z * qz) * inv
                        hit = ((uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                               & (tt > 1e-4) & (tri >= 0.0))
                        pay = (leaf_ref[lb + 80 + k] if stride > 80
                               else jnp.float32(0.0))
                        pay2 = (leaf_ref[lb + 88 + k] if stride > 88
                                else jnp.float32(0.0))
                        state['leaf_hit'](s, hit, tt, uu, vv, tri,
                                          (e1x, e1y, e1z, e2x, e2y, e2z),
                                          pay, pay2)

                if visit is not None:
                    visit(s, nd, hit_any, leaf_id)
                return jnp.where(hit_any, links_ref[nd * 3],
                                 links_ref[nd * 3 + 1])

            if W == 1:
                # classic one-node stepping: exact old program shape (no
                # nested while — the chase would run exactly one
                # iteration); keeps BF_MESH_WINDOW=1 a faithful rollback
                nxt = _chase_body(w0)
            else:
                nxt = jax.lax.while_loop(_chase_cond, _chase_body, node)
            new_nodes.append(jnp.where(node >= 0, nxt, node))
        live = state['live']()
        return tuple(new_nodes) + (live,)

    def cond(carry):
        nodes = carry[:S]
        any_active = nodes[0] >= 0
        for s in range(1, S):
            any_active = any_active | (nodes[s] >= 0)
        return any_active & (carry[-1] > 0.0)

    init = tuple(jnp.int32(0) for _ in range(S)) + (jnp.float32(1.0),)
    jax.lax.while_loop(cond, body, init)


def _traversal_kernel(mode: str, streams: int = STREAMS, stride: int = 80):
    """mode: 'closest' -> (t, idx, u, v); 'any' -> occluded flag (t<maxt)."""
    anyhit = mode == 'any'
    S = streams

    def kernel(bbox_ref, links_ref, leaf_ref,          # SMEM scene
               ox, oy, oz, dx, dy, dz, *rest):
        if anyhit:
            (maxt_ref, occ_ref) = rest
        else:
            (t_ref, idx_ref, u_ref, v_ref) = rest

        rox, roy, roz = ox[:], oy[:], oz[:]
        rdx, rdy, rdz = dx[:], dy[:], dz[:]

        def safe_inv(v):
            tiny = jnp.where(v >= 0.0, 1e-12, -1e-12)
            return 1.0 / jnp.where(jnp.abs(v) > 1e-12, v, tiny)

        ix, iy, iz = safe_inv(rdx), safe_inv(rdy), safe_inv(rdz)

        if anyhit:
            occ_ref[:] = jnp.zeros_like(occ_ref)
            limit = maxt_ref[:] * (1.0 - 1e-3)
        else:
            t_ref[:] = jnp.full_like(t_ref, _INF)
            idx_ref[:] = jnp.full_like(idx_ref, -1)
            u_ref[:] = jnp.zeros_like(u_ref)
            v_ref[:] = jnp.zeros_like(v_ref)

        def sl(s):
            return slice(s * SUB, (s + 1) * SUB)

        if anyhit:
            def tbest(s):
                # once a lane is occluded it stops pruning: nothing to gain
                return jnp.where(occ_ref[sl(s), :] > 0.0, 0.0,
                                 limit[sl(s), :])

            def leaf_hit(s, hit, tt, uu, vv, tri, edges, pay, pay2):
                blocked = hit & (tt < limit[sl(s), :])
                occ_ref[sl(s), :] = jnp.where(blocked, 1.0, occ_ref[sl(s), :])

            def live():
                return jnp.sum(jnp.where(occ_ref[:] > 0.0, 0.0, 1.0))
        else:
            def tbest(s):
                return t_ref[sl(s), :]

            def leaf_hit(s, hit, tt, uu, vv, tri, edges, pay, pay2):
                better = hit & (tt < t_ref[sl(s), :])
                t_ref[sl(s), :] = jnp.where(better, tt, t_ref[sl(s), :])
                idx_ref[sl(s), :] = jnp.where(
                    better, tri.astype(jnp.int32), idx_ref[sl(s), :])
                u_ref[sl(s), :] = jnp.where(better, uu, u_ref[sl(s), :])
                v_ref[sl(s), :] = jnp.where(better, vv, v_ref[sl(s), :])

            def live():
                return jnp.float32(1.0)

        traversal_body(bbox_ref, links_ref, leaf_ref,
                       (rox, roy, roz, rdx, rdy, rdz, ix, iy, iz),
                       dict(tbest=tbest, leaf_hit=leaf_hit, live=live),
                       anyhit, streams=S, sub=SUB, stride=stride)

    return kernel


def _tile_shape(x, n, block_rows):
    pad = (-n) % (block_rows * LANE)
    xp = jnp.pad(x, ((0, pad),))
    return xp.reshape(-1, LANE), n + pad


@functools.partial(jax.jit, static_argnames=('pb_shape', 'streams',
                                             'interpret', 'stride'))
def _run_closest(ox, oy, oz, dx, dy, dz, bbox, links, leaves,
                 pb_shape, streams=STREAMS, interpret=False, stride=80):
    n_rows = ox.shape[0]
    block = streams * SUB
    grid = (n_rows // block,)
    ray_spec = pl.BlockSpec((block, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    t, idx, u, v = pl.pallas_call(
        _traversal_kernel('closest', streams, stride),
        grid=grid,
        in_specs=[smem, smem, smem] + [ray_spec] * 6,
        out_specs=[ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.int32),
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32),
        ],
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(bbox, links, leaves, ox, oy, oz, dx, dy, dz)
    return t, idx, u, v


def bvh_closest(pb: PackedBVH, o, d, streams: int = STREAMS,
                interpret: bool = False):
    """Closest hit for (R,3) rays; returns (t, tri_idx, u, v) like
    `bvh.traverse_closest` (t=inf on miss)."""
    n = o.shape[0]
    comps = []
    for arr, c in ((o, 0), (o, 1), (o, 2), (d, 0), (d, 1), (d, 2)):
        x, _ = _tile_shape(arr[:, c], n, streams * SUB)
        comps.append(x)
    t, idx, u, v = _run_closest(*comps, pb.bbox, pb.links, pb.leaves,
                                (pb.n_nodes, pb.n_leaves), streams, interpret,
                                pb.stride)
    t = t.reshape(-1)[:n]
    idx = idx.reshape(-1)[:n]
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    miss = t >= _INF
    return (jnp.where(miss, jnp.inf, t), jnp.where(miss, -1, idx), u, v)


@functools.partial(jax.jit, static_argnames=('pb_shape', 'streams',
                                             'interpret', 'stride'))
def _run_any(ox, oy, oz, dx, dy, dz, maxt, bbox, links, leaves,
             pb_shape, streams=STREAMS, interpret=False, stride=80):
    n_rows = ox.shape[0]
    block = streams * SUB
    grid = (n_rows // block,)
    ray_spec = pl.BlockSpec((block, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    occ = pl.pallas_call(
        _traversal_kernel('any', streams, stride),
        grid=grid,
        in_specs=[smem, smem, smem] + [ray_spec] * 7,
        out_specs=[ray_spec],
        out_shape=[jax.ShapeDtypeStruct((n_rows, LANE), jnp.float32)],
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(bbox, links, leaves, ox, oy, oz, dx, dy, dz, maxt)
    return occ[0]


def bvh_any(pb: PackedBVH, o, d, maxt, streams: int = STREAMS,
            interpret: bool = False):
    """Early-exit occlusion: True where a triangle blocks before maxt."""
    n = o.shape[0]
    comps = []
    for arr, c in ((o, 0), (o, 1), (o, 2), (d, 0), (d, 1), (d, 2)):
        x, _ = _tile_shape(arr[:, c], n, streams * SUB)
        comps.append(x)
    mt, _ = _tile_shape(maxt, n, streams * SUB)
    occ = _run_any(*comps, mt, pb.bbox, pb.links, pb.leaves,
                   (pb.n_nodes, pb.n_leaves), streams, interpret, pb.stride)
    return occ.reshape(-1)[:n] > 0.0
