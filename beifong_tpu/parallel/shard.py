"""Multi-chip sharding of the simulator + DSP chain.

The reference is single-node (SURVEY.md §2.5: TBB threads only, no comm
backend).  TPU-native scaling story (§5.8):

  mesh axes:  'pulse' — slow-time pulse blocks (host/DCN axis)
              'ray'   — ray lanes within a pulse (chip/ICI axis); after
                        tracing, the same axis resharded as the fast-time
                        sample axis (sp) for the DSP chain

  collectives: psum over 'ray' merges partial ADC accumulations (the exact
  analogue of the reference's mutex `SignalBlock::put` merge,
  `hdradc.cpp:172-176`); ppermute exchanges overlap-save FIR halos between
  neighboring fast-time shards; all_gather over 'pulse' assembles the
  slow-time axis for the Doppler FFT.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.rng import SampleStream
from ..radar.endpoints import (rx_sample_ray, rx_sample_frequency,
                               rx_aperture_weight)
from ..integrators.radar_path import radar_receive_trace
from ..dsp import pulse as pulse_mod
from .. import film as film_mod


def make_mesh(pulse: int = 1, ray: int | None = None, devices=None) -> Mesh:
    """Create a ('pulse', 'ray') device mesh covering `devices`."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if ray is None:
        ray = n // pulse
    assert pulse * ray == n, f"mesh {pulse}x{ray} != {n} devices"
    import numpy as np
    return Mesh(np.asarray(devices).reshape(pulse, ray), ('pulse', 'ray'))


# ---------------------------------------------------------------------------
# Sharded receive: rays over 'ray', pulse blocks over 'pulse'
# ---------------------------------------------------------------------------


def receive_sharded_pallas(scene_host, scene_data, rx, mesh: Mesh,
                           spp_per_device: int, seed: int = 0,
                           max_depth: int = 3, time_sampling: str = 'gate',
                           coherent: bool = False, interpret: bool = False):
    """Megakernel receive distributed over every device of `mesh`: each chip
    runs `integrators/pallas_receive` on its own lane share with a distinct
    seed; partial ADCs psum-merge across the whole mesh (the SignalBlock
    merge at pod scale).  Returns (signal grid, total_samples)."""
    from ..integrators.pallas_receive import (_pack_scene, _run, TILE,
                                              LANE, MESH_SUB, MESH_STREAMS,
                                              supported)
    assert supported(scene_data, rx), "scene outside megakernel scope"
    # cache packing: D2H reads cost ms each over the tunneled TPU
    # id()-keyed with a strong ref kept in the value; identity is re-checked
    # on lookup because CPython reuses ids after GC.
    cache = scene_host.__dict__.setdefault('_pallas_pack_cache', {})
    ck = (id(scene_data), rx.id, 'shard')
    hit = cache.get(ck)
    if hit is None or hit[0] is not scene_data:
        shape_idx0 = scene_host.shape_index_of_endpoint('receiver', rx.id)
        cache[ck] = (scene_data, shape_idx0,
                     *_pack_scene(scene_data, rx, shape_idx0))
    (_, shape_idx, params, prim, txp, php, rxph, msh, mesh_types, tex,
     bmp_meta, mesh_pack) = cache[ck]
    prim_kinds = tuple(int(k) for k in prim[:, 0])
    prim_tx = tuple(int(f) for f in prim[:, 14])
    prim_bsdf = tuple(int(f) for f in prim[:, 18])
    prim_tex = tuple(int(f) for f in prim[:, 26])
    import numpy as _np
    moving = bool(_np.abs(prim[:, 19:22]).max() > 0.0
                  or _np.abs(txp[:, 24:27]).max() > 0.0
                  or _np.abs(params[23:26]).max() > 0.0
                  or _np.abs(msh[:, 0:3]).max() > 0.0)
    absorbing = bool(params[29] > 0.0)
    layered = int(params[42])
    tx_kinds = tuple(int(f) for f in _np.asarray(txp)[:, 27])
    from ..radar.endpoints import PHASED as _RX_PHASED
    if getattr(rx, 'kind', None) == _RX_PHASED and rx.n_elems > 1:
        rx_kind = 'phased'
    else:
        rx_kind = 'omni' if shape_idx < 0 else 'wigner'
    has_mesh = mesh_pack is not None
    tile = ((MESH_SUB * MESH_STREAMS * LANE) if has_mesh
            else (MESH_SUB * LANE) if interpret else TILE)
    n_lanes = max(tile, (spp_per_device // tile) * tile)
    mesh_kw = {}
    if has_mesh:
        mesh_kw = dict(bvh_bbox=mesh_pack.bbox, bvh_links=mesh_pack.links,
                       bvh_leaves=mesh_pack.leaves)
    n_dev = mesh.devices.size
    params_dev = jnp.asarray(params)
    prim_dev = jnp.asarray(prim)
    axes = mesh.axis_names

    txp_dev = jnp.asarray(txp)
    php_dev = jnp.asarray(php)
    rxph_dev = jnp.asarray(rxph)
    msh_dev = jnp.asarray(msh)
    tex_dev = jnp.asarray(tex)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
                       out_specs=P(), check_vma=False)
    def run(params_r, prim_r, txp_r, php_r, rxph_r, msh_r, tex_r, key_data):
        dev = jax.lax.axis_index(axes[0])
        if len(axes) > 1:
            dev = dev * jax.lax.axis_size(axes[1]) + jax.lax.axis_index(axes[1])
        p2 = params_r.at[0].add(dev.astype(jnp.float32) * 7919.0)
        k = jax.random.fold_in(jax.random.wrap_key_data(key_data), dev)
        out = _run(p2, prim_r, txp_r, php_r, rxph_r, k, prim_kinds, prim_tx,
                   prim_bsdf, prim_tex, rx.adc, rx.receive_type,
                   time_sampling, max_depth, rx_kind, n_lanes, interpret,
                   coherent, has_mesh=has_mesh, mesh_types=mesh_types,
                   moving=moving, absorbing=absorbing, tx_kinds=tx_kinds,
                   has_lo=rx.lo_waveform is not None,
                   bmp_meta=bmp_meta, layered=layered,
                   tex=tex_r, msh=msh_r, **mesh_kw)
        sig = jnp.stack([out[0], out[1]], -1) if coherent else out[0]
        for ax in axes:
            sig = jax.lax.psum(sig, ax)
        return sig

    sig = run(params_dev, prim_dev, txp_dev, php_dev, rxph_dev, msh_dev,
              tex_dev, jax.random.key_data(jax.random.key(seed)))
    return sig, n_lanes * n_dev


def receive_sharded(scene_data, rx, shape_idx: int, lo_wf, mesh: Mesh, key,
                    pulse_starts, lanes_per_device: int, max_depth: int = 3,
                    coherent: bool = False):
    """Trace the receive wavefront across the mesh.

    pulse_starts: (n_pulses,) absolute window-start time of each pulse
    (sharded over 'pulse'); each device traces `lanes_per_device` rays and
    partial ADCs are psum-merged over 'ray'.

    Returns per-pulse ADC grids (n_pulses, n_time, n_freq, C+2), sharded over
    'pulse' and replicated over 'ray'.
    """
    cfg = rx.adc
    n_ch = 2 if coherent else 1
    from ..receive import scene_mono
    scene_data = scene_mono(scene_data)

    def trace_one_pulse(t_start, key, ray_idx, pulse_idx):
        n = lanes_per_device
        # Distinct sample stream per (pulse, ray-shard)
        k = jax.random.fold_in(jax.random.wrap_key_data(key), ray_idx)
        k = jax.random.fold_in(k, pulse_idx)
        stream = SampleStream.make(k, n, 0)
        u_t, stream = stream.next_1d()
        t_rx = t_start + cfg.sampling_start + u_t * cfg.sampling_time
        u_f, stream = stream.next_1d()
        f_rx, f_w = rx_sample_frequency(rx.receive_type, lo_wf,
                                        scene_data.band, t_rx, u_f, cfg)
        u_pos, stream = stream.next_2d()
        u_dir, stream = stream.next_2d()
        wl_rx = scene_data.band.c / jnp.maximum(f_rx, 1e-6)
        o, d, w = rx_sample_ray(scene_data, rx, shape_idx, t_rx, u_pos, u_dir,
                                wavelength=wl_rx)
        w = w * rx_aperture_weight(scene_data, rx, shape_idx, o, d, wl_rx)
        adc = film_mod.film_new(cfg.n_time, cfg.n_freq, n_ch)
        adc, _ = radar_receive_trace(
            scene_data, stream, o, d, t_rx - t_start, f_rx, w * f_w, adc, cfg,
            rx.receive_type, lo_wf, jnp.asarray(rx.velocity),
            max_depth=max_depth, coherent=coherent)
        return adc

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P('pulse'), P()),
        out_specs=P('pulse'),
        check_vma=False)
    def run(scene_data, pulse_starts_shard, key_data):
        ray_idx = jax.lax.axis_index('ray')
        pulse_idx0 = jax.lax.axis_index('pulse')
        n_local = pulse_starts_shard.shape[0]

        def one(carry, i):
            adc = trace_one_pulse(pulse_starts_shard[i], key_data,
                                  ray_idx, pulse_idx0 * n_local + i)
            return carry, adc

        _, adcs = jax.lax.scan(one, None, jnp.arange(n_local))
        # merge partial accumulations across ray shards (== SignalBlock merge)
        return jax.lax.psum(adcs, 'ray')

    return run(scene_data, pulse_starts, jax.random.key_data(key))


# ---------------------------------------------------------------------------
# MIMO channel sharding (BASELINE config 5: "channels sharded across hosts")
# ---------------------------------------------------------------------------


def make_mimo_mesh(chan: int, ray: int | None = None, devices=None) -> Mesh:
    """('chan', 'ray') device mesh: receive-array elements shard over
    'chan' (each device owns E/chan per-element signal chains), ray lanes
    shard over 'ray' (partial accumulations psum-merge)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if ray is None:
        ray = n // chan
    assert chan * ray == n, f"mesh {chan}x{ray} != {n} devices"
    import numpy as np
    return Mesh(np.asarray(devices).reshape(chan, ray), ('chan', 'ray'))


def receive_mimo_sharded_pallas(scene_host, scene_data, rx, mesh: Mesh,
                                spp_per_device: int, seed: int = 0,
                                max_depth: int = 3,
                                time_sampling: str = 'gate',
                                interpret: bool = False):
    """Megakernel MIMO receive (BASELINE config 5 at kernel rate) over a
    ('chan', 'ray') mesh: every device traces the SAME rays (the seed folds
    on the ray index only) but splats only its own element subset's 2E_loc
    I/Q channels in-kernel; ray shards psum-merge.  A chan-only mesh is
    bit-identical to dense `receive_pallas(..., mimo=True)` — each output
    channel column accumulates the same products in the same order.

    Returns (iq (E, n_time, n_freq, 2), total_samples), sharded over
    'chan' on axis 0 like `receive_mimo_sharded`."""
    from ..integrators.pallas_receive import (_pack_scene, _run, LANE, SUB,
                                              supported)
    from ..radar.endpoints import rx_elem_offsets
    import numpy as _np
    assert supported(scene_data, rx, mimo=True), \
        "scene outside megakernel MIMO scope"
    shape_idx = scene_host.shape_index_of_endpoint('receiver', rx.id)
    (params, prim, txp, php, rxph, msh, mesh_types, tex, bmp_meta,
     mesh_pack) = _pack_scene(scene_data, rx, shape_idx)
    assert mesh_pack is None, "MIMO kernel mode covers analytic prims"
    prim_kinds = tuple(int(k) for k in prim[:, 0])
    prim_tx = tuple(int(f) for f in prim[:, 14])
    prim_bsdf = tuple(int(f) for f in prim[:, 18])
    prim_tex = tuple(int(f) for f in prim[:, 26])
    moving = bool(_np.abs(prim[:, 19:22]).max() > 0.0
                  or _np.abs(txp[:, 24:27]).max() > 0.0
                  or _np.abs(params[23:26]).max() > 0.0)
    absorbing = bool(params[29] > 0.0)
    layered = int(params[42])
    tx_kinds = tuple(int(f) for f in _np.asarray(txp)[:, 27])
    offs = _np.asarray(rx_elem_offsets(scene_data, rx, shape_idx),
                       _np.float32)
    n_e = offs.shape[0]
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_chan = sizes['chan']
    assert n_e % n_chan == 0, f"{n_e} elements not divisible by {n_chan}"
    e_loc = n_e // n_chan
    from ..integrators.pallas_receive import MESH_SUB
    tile = (MESH_SUB if interpret else SUB) * LANE
    n_lanes = max(tile, (spp_per_device // tile) * tile)
    params = params.copy()
    params[0] = float(seed * 1_000_003 % (1 << 30))
    cfg = rx.adc

    # per-ray-shard keys, precomputed so shard 0 holds the EXACT dense key
    # (bit-identical chan-only parity with receive_pallas(mimo=True) in
    # both PRNG modes: in-kernel seeds add 7919*ridx = +0 at shard 0)
    base = jax.random.key(seed)
    key_rows = jnp.stack(
        [jax.random.key_data(base if r == 0 else jax.random.fold_in(base, r))
         for r in range(sizes['ray'])])

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), P(), P(), P(), P(), P('chan'),
                                 P('ray')),
                       out_specs=P('chan'), check_vma=False)
    def run(params_r, prim_r, txp_r, php_r, rxph_r, offs_local, key_local):
        ridx = jax.lax.axis_index('ray')
        p2 = params_r.at[0].add(ridx.astype(jnp.float32) * 7919.0)
        k = jax.random.wrap_key_data(key_local[0])
        out = _run(p2, prim_r, txp_r, php_r, rxph_r, k, prim_kinds, prim_tx,
                   prim_bsdf, prim_tex, cfg, rx.receive_type,
                   time_sampling, max_depth, 'phased', n_lanes, interpret,
                   False, moving=moving, absorbing=absorbing,
                   tx_kinds=tx_kinds, has_lo=rx.lo_waveform is not None,
                   bmp_meta=bmp_meta, layered=layered,
                   mimo_e=e_loc, eoff=offs_local)[0]
        out = jax.lax.psum(out, 'ray')
        iq = out.reshape(cfg.n_time, cfg.n_freq, e_loc, 2)
        return jnp.moveaxis(iq, 2, 0)          # (e_loc, n_time, n_freq, 2)

    iq = run(jnp.asarray(params), jnp.asarray(prim), jnp.asarray(txp),
             jnp.asarray(php), jnp.asarray(rxph), jnp.asarray(offs),
             key_rows)
    return iq, n_lanes * sizes['ray']


def receive_mimo_sharded(scene_host, scene_data, rx, mesh: Mesh,
                         spp: int = 4096, seed: int = 0, max_depth: int = 3,
                         sampler: str = 'independent',
                         time_sampling: str = 'fixed'):
    """MIMO receive with the ELEMENT (channel) axis sharded over the 'chan'
    mesh axis: every device traces the same paths (same key across 'chan')
    but splats only its own element subset's I/Q channels — the per-channel
    signal chains then run device-local with zero communication, and
    beamforming is the only cross-channel collective
    (`beamform_das_sharded`).  Lanes additionally shard over 'ray'
    (distinct fold per shard, psum merge).

    A channel-only mesh (ray=1) is bit-identical to dense
    `receive_mimo(seed=seed)` — the parity test for the sharding.

    Returns (iq (E, n_time, n_freq, 2) float32 — sharded over 'chan' on
    axis 0, total_samples).  `develop_mimo_iq` turns it into the complex
    cube.
    """
    from ..receive import scene_mono, _HashableRx, _receive_mimo_pass
    from ..radar.endpoints import rx_elem_offsets
    import numpy as np
    scene_data = scene_mono(scene_data)
    shape_idx = scene_host.shape_index_of_endpoint('receiver', rx.id)
    offs = np.asarray(rx_elem_offsets(scene_data, rx, shape_idx))
    n_e = offs.shape[0]
    n_chan = dict(zip(mesh.axis_names, mesh.devices.shape))['chan']
    n_ray = dict(zip(mesh.axis_names, mesh.devices.shape))['ray']
    assert n_e % n_chan == 0, f"{n_e} elements not divisible by chan={n_chan}"
    e_loc = n_e // n_chan
    lanes = max(1, spp // n_ray)
    n_total_log2 = max(1, (lanes * n_ray - 1).bit_length())
    rx_h = _HashableRx(rx)
    cfg = rx.adc

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), P('chan'), P()), out_specs=P('chan'),
                       check_vma=False)
    def run(sd, offs_local, key_data):
        ridx = jax.lax.axis_index('ray')
        k = jax.random.fold_in(jax.random.wrap_key_data(key_data), ridx)
        adc = film_mod.film_new(cfg.n_time, cfg.n_freq, 2 * e_loc)
        adc = _receive_mimo_pass(sd, rx_h, shape_idx, rx.lo_waveform, k,
                                 jnp.uint32(0), adc, offs_local, lanes,
                                 max_depth, sampler, n_total_log2,
                                 time_sampling)
        adc = jax.lax.psum(adc, 'ray')
        iq = adc[..., :2 * e_loc].reshape(cfg.n_time, cfg.n_freq, e_loc, 2)
        return jnp.moveaxis(iq, 2, 0)          # (e_loc, n_time, n_freq, 2)

    iq = run(scene_data, jnp.asarray(offs, jnp.float32),
             jax.random.key_data(jax.random.key(seed)))
    return iq, lanes * n_ray


def develop_mimo_iq(iq, total_samples, cfg):
    """(E, n_time, n_freq, 2) I/Q planes -> normalized complex cube."""
    scale = cfg.n_time / max(int(total_samples), 1)
    return (iq[..., 0] + 1j * iq[..., 1]) * scale


def beamform_das_sharded(iq_local, offs_local, directions, freq, c,
                         axis_name: str = 'chan'):
    """Delay-and-sum over a channel-sharded cube: each device forms the
    partial beam sum of ITS elements, one psum over `axis_name` completes
    it (runs inside shard_map; the only cross-channel collective in the
    MIMO chain).  iq_local: (e_loc, n_time, n_freq, 2); returns complex
    (A, n_time, n_freq) replicated."""
    from ..dsp.beamform import steering_matrix
    a = steering_matrix(offs_local, directions, freq, c)   # (A, e_loc)
    cube = iq_local[..., 0] + 1j * iq_local[..., 1]
    part = jnp.einsum('ae,etf->atf', jnp.conj(a), cube)
    n_e = jax.lax.psum(jnp.asarray(a.shape[1], jnp.float32), axis_name)
    return jax.lax.psum(part, axis_name) / n_e


# ---------------------------------------------------------------------------
# Sharded DSP
# ---------------------------------------------------------------------------


def overlap_save_sharded(x_local, h_freq, n_fft: int, n_taps: int,
                         axis_name: str):
    """Overlap-save FIR on a fast-time axis sharded over `axis_name`.

    Each shard needs the last (n_taps-1) samples of its LEFT neighbor as
    history — one ppermute, then purely local blocked FFT convolution
    (SURVEY.md §5.8 halo exchange).
    """
    n_dev = jax.lax.axis_size(axis_name)
    tail = x_local[..., -(n_taps - 1):]
    halo = jax.lax.ppermute(tail, axis_name,
                            [(i, (i + 1) % n_dev) for i in range(n_dev)])
    idx = jax.lax.axis_index(axis_name)
    halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
    return pulse_mod.overlap_save(x_local, h_freq, n_fft, n_taps, history=halo)


def doppler_fft_sharded(cube_local, axis_name: str, window=None):
    """Slow-time FFT when pulses are sharded over `axis_name`: all_gather the
    pulse axis (tiled) then FFT locally.  For long pulse trains a
    distributed-FFT transpose would be the next step; all_gather matches the
    moderate pulse counts of the reference configs (64-256)."""
    cube = jax.lax.all_gather(cube_local, axis_name, axis=0, tiled=True)
    n = cube.shape[0]
    if window is not None:
        cube = cube * window[:, None]
    return jnp.fft.fftshift(jnp.fft.fft(cube, axis=0), axes=0)


def pulse_train_pipeline(mesh: Mesh, signal_pulses, replica, n_fft: int = 0):
    """End-to-end sharded pulse-compression + Doppler pipeline.

    signal_pulses: (n_pulses, n_samples) complex — global array; it is
    resharded so pulses ride 'pulse' and fast-time rides 'ray'; pulse
    compression runs as halo-exchanged overlap-save over the fast-time
    shards; the Doppler FFT gathers pulses.  Returns the range-Doppler map
    replicated.
    """
    n_taps = replica.shape[-1]
    if n_fft == 0:
        n_fft = 1
        while n_fft < 4 * n_taps:
            n_fft *= 2
    # causal matched filter h[k] = conj(s[M-1-k]) (peak at delay + M-1) —
    # overlap-save assumes causal taps, so the anti-causal conj(FFT(s))
    # correlator form cannot be used here
    h = jnp.fft.fft(jnp.conj(replica[::-1]), n_fft)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P('pulse', 'ray'), P()),
        out_specs=P(),
        check_vma=False)
    def run(sig_local, h_freq):
        rc = overlap_save_sharded(sig_local, h_freq, n_fft, n_taps, 'ray')
        rc_full = jax.lax.all_gather(rc, 'ray', axis=-1, tiled=True)
        rd = doppler_fft_sharded(rc_full, 'pulse')
        return rd

    return run(signal_pulses, h)
