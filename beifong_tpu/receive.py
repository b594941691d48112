"""receive(): the radar-side driver.

Replaces the reference `SamplingIntegrator::receive` + `receive_sample`
(`src/librender/integrator.cpp:315-768, 1538-1667`): the spp loop over
`receive_sample` becomes jitted passes over a lane wavefront; the
SignalBlock/ADC mutex merge becomes scatter-add into the (fast-time, freq)
accumulation grid.

Per sample (mirroring `receive_sample`):
  1. receive time ~ U[adc_start, adc_start + window]        (:1556-1562)
  2. receive frequency per receive_type                     (wignerreceiver)
  3. receive ray from the antenna aperture                  (:1569)
  4. reverse path trace with per-connection binning         (radar_path.py)
  5. tf scaled into ADC pixels and splatted                 (:1639-1665)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .core.rng import SampleStream, make_stream
from .radar.endpoints import (ReceiverSpec, rx_sample_ray, rx_sample_frequency,
                              rx_aperture_weight, ADCConfig)
from .integrators.radar_path import radar_receive_trace, pathlength_histogram
from .scene import Scene, SceneData
from . import film as film_mod


def _spec_key(rx: ReceiverSpec):
    return (rx.id, rx.kind, rx.receive_type, rx.gain,
            tuple(map(tuple, rx.to_world.tolist())),
            tuple(rx.velocity.tolist()), rx.adc)


class _HashableRx:
    def __init__(self, spec):
        object.__setattr__(self, '_spec', spec)
        object.__setattr__(self, '_key', _spec_key(spec))

    def __getattr__(self, k):
        return getattr(self._spec, k)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, o):
        return isinstance(o, _HashableRx) and self._key == o._key


@functools.partial(jax.jit, static_argnames=('rx', 'shape_idx', 'n_lanes',
                                             'max_depth', 'coherent',
                                             'sampler', 'n_total_log2',
                                             'time_sampling', 'polarized'))
def _receive_pass(scene_data: SceneData, rx, shape_idx: int, lo_wf, key,
                  pass_idx, adc, n_lanes: int, max_depth: int, coherent: bool,
                  sampler: str = 'independent', n_total_log2: int = 20,
                  time_sampling: str = 'fixed', polarized: bool = False):
    cfg = rx.adc
    stream = make_stream(sampler, key, n_lanes, pass_idx, n_total_log2)

    if time_sampling == 'gate':
        # deferred time sampling (radar_path.py): emission times are drawn
        # at connection points; t_rx here only seeds frequency sampling
        t_rx = jnp.zeros((n_lanes,), jnp.float32)
        t_for_freq = jnp.full((n_lanes,),
                              cfg.sampling_start + 0.5 * cfg.sampling_time)
    else:
        u_t, stream = stream.next_1d()
        t_rx = cfg.sampling_start + u_t * cfg.sampling_time
        t_for_freq = t_rx

    u_f, stream = stream.next_1d()
    f_rx, f_w = rx_sample_frequency(rx.receive_type, lo_wf, scene_data.band,
                                    t_for_freq, u_f, cfg)

    u_pos, stream = stream.next_2d()
    u_dir, stream = stream.next_2d()
    wl_rx = scene_data.band.c / jnp.maximum(f_rx, 1e-6)
    o, d, w = rx_sample_ray(scene_data, rx, shape_idx, t_rx, u_pos, u_dir,
                            wavelength=wl_rx)
    # receiver aperture WDF directivity (signed; reference wignerreceiver)
    w = w * rx_aperture_weight(scene_data, rx, shape_idx, o, d, wl_rx)

    rx_vel = jnp.asarray(rx.velocity)
    adc, stream = radar_receive_trace(
        scene_data, stream, o, d, t_rx, f_rx, w * f_w, adc, cfg,
        rx.receive_type, lo_wf, rx_vel, max_depth=max_depth,
        coherent=coherent, time_sampling=time_sampling, polarized=polarized)
    return adc


def scene_mono(scene_data: SceneData) -> SceneData:
    """Slice color tables to one channel for the radar path (mono spectra):
    cuts BSDF/texture memory traffic 3x in the receive pass."""
    import dataclasses as dc
    b = scene_data.bsdfs
    t = scene_data.textures
    return dc.replace(
        scene_data,
        bsdfs=dc.replace(b, reflectance=b.reflectance[:, :1],
                         eta=b.eta[:, :1], k=b.k[:, :1]),
        textures=dc.replace(t, color0=t.color0[:, :1],
                            color1=t.color1[:, :1],
                            atlas=t.atlas[..., :1]))


def receive(scene: Scene, scene_data: SceneData | None = None,
            receiver: ReceiverSpec | None = None, seed: int = 0,
            spp: int = 4096, max_depth: int = 3, coherent: bool = False,
            lanes_per_pass: int = 1 << 17, sampler: str = 'independent',
            time_sampling: str = 'fixed', use_pallas: str | bool = 'auto',
            checkpoint_path: str | None = None, checkpoint_every: int = 16,
            resume: bool = False, timeout_s: float | None = None,
            polarized: bool = False):
    """Simulate the received signal; returns (adc_grid, total_samples).

    adc_grid: (n_time, n_freq, C+2) with C=1 (power), 2 (I/Q coherent) or
    4 (Stokes S0..S3 with `polarized=True` — the radar analogue of the
    reference's `*_polarized` variants, `mitsuba.conf:120-123`; S0 equals
    the unpolarized power).
    `sampler`: independent | stratified | multijitter | halton | ldsampler
    | orthogonal (the reference sampler plugin registry, `src/samplers/`).
    `time_sampling`: 'fixed' (reference semantics) or 'gate' (deferred
    time-gated importance sampling — ~window/pulse_len x effective spp for
    pulsed waveforms; requires window <= PRI).
    `use_pallas`: 'auto' (default) routes supported scenes through the
    Pallas megakernel (integrators/pallas_receive.py) on TPU — same
    estimator, different RNG stream; the returned grid has empty
    weight/count channels.  Unsupported scenes, CPU backends, and
    unexpected kernel failures fall back to the jnp wavefront with a
    logged reason.  True forces the kernel (raising outside its scope;
    interpret mode on CPU); False forces the jnp wavefront.

    Long-run controls (reference `Integrator::cancel`/timeout,
    `integrator.h:158-170`, and the SIGHUP partial develop,
    `mitsuba.cpp:149-157` — upgraded to true checkpoint/resume):
      checkpoint_path: save the accumulator + pass counter every
        `checkpoint_every` passes, and on SIGHUP / KeyboardInterrupt /
        timeout.  Accumulation is associative, so a resumed run is
        bit-exact with an uninterrupted one.
      resume: load `checkpoint_path` (if present) and continue from the
        saved pass.
      timeout_s: stop cleanly after this much wall time; the partial
        accumulation is returned (and checkpointed) with `total_samples`
        reflecting only the completed passes.
    """
    if scene_data is None:
        scene_data = scene.compile()
    if use_pallas and any(isinstance(leaf, jax.core.Tracer)
                          for leaf in jax.tree_util.tree_leaves(scene_data)):
        # under jax.grad / jit tracing the megakernel is not an option:
        # pallas_call has no VJP and the kernel packs scene tables on the
        # host.  'auto' routes the trace to the differentiable jnp
        # wavefront; an explicit use_pallas=True is a user error (the
        # kernel-forward/jnp-backward hybrid lives in
        # autodiff.differentiable_receive).
        if use_pallas is True:
            raise ValueError(
                'receive(use_pallas=True) called under a JAX trace '
                '(jax.grad/jit of scene_data): the megakernel is not '
                'differentiable/traceable — use use_pallas=False, or '
                'autodiff.differentiable_receive for a kernel-forward/'
                'jnp-backward hybrid')
        from .profiler import log
        log.info('receive: scene_data is traced (jax.grad/jit) — using '
                 'the differentiable jnp wavefront')
        use_pallas = False
    if use_pallas and polarized and coherent:
        if use_pallas is True:
            raise ValueError("polarized + coherent receive is outside the "
                             "megakernel's scope (jnp wavefront only)")
        use_pallas = False
    if use_pallas:
        from .integrators.pallas_receive import receive_pallas, supported
        why: list = []
        rx_chk = receiver or scene.receivers[0]
        on_cpu = jax.default_backend() == 'cpu'
        if on_cpu and use_pallas == 'auto':
            # Mosaic compiles for TPU only; interpret mode is a debugging
            # path, not a fast one — 'auto' on CPU stays on the jnp
            # wavefront (use_pallas=True forces interpret mode instead)
            why.append('CPU backend (megakernel is TPU-only; auto falls '
                       'back, use_pallas=True forces interpret mode)')
            ok_k = False
        else:
            ok_k = supported(scene_data, rx_chk, why)
        if ok_k:
            rx0 = receiver or scene.receivers[0]
            try:
                out, n = receive_pallas(scene, scene_data, rx0, spp=spp,
                                        seed=seed, max_depth=max_depth,
                                        time_sampling=time_sampling,
                                        coherent=coherent,
                                        polarized=polarized,
                                        interpret=on_cpu)
            except Exception as e:  # noqa: BLE001 — Mosaic compile guard
                # 'auto' must never crash a run the jnp wavefront can
                # finish: an unexpected Mosaic/XLA rejection of a kernel
                # variant (new flag combination on a new toolchain) logs
                # and falls back; an explicit use_pallas=True re-raises
                if use_pallas is True:
                    raise
                from .profiler import log
                log.warning('receive: megakernel failed (%s: %s) — '
                            'falling back to the jnp wavefront',
                            type(e).__name__, e)
                why.append(f'kernel failure {type(e).__name__}')
            else:
                n_ch0 = 4 if polarized else (2 if coherent else 1)
                adc = jnp.zeros((rx0.adc.n_time, rx0.adc.n_freq, n_ch0 + 2),
                                jnp.float32)
                if polarized or coherent:
                    for c_ in range(n_ch0):
                        adc = adc.at[..., c_].set(out[..., c_])
                else:
                    adc = adc.at[..., 0].set(out)
                return adc, n
        if not ok_k and use_pallas is True:
            raise ValueError("scene outside the Pallas megakernel's scope: "
                             + '; '.join(why))
        else:
            from .profiler import log
            log.info('receive: megakernel fallback to jnp wavefront (%s)',
                     '; '.join(why))
    scene_data = scene_mono(scene_data)
    if receiver is None:
        receiver = scene.receivers[0]
    shape_idx = scene.shape_index_of_endpoint('receiver', receiver.id)
    cfg = receiver.adc
    n_ch = 4 if polarized else (2 if coherent else 1)
    adc = film_mod.film_new(cfg.n_time, cfg.n_freq, n_ch)

    n_pass = max(1, (spp + lanes_per_pass - 1) // lanes_per_pass)
    lanes = min(spp, lanes_per_pass)
    total = lanes * n_pass
    n_total_log2 = max(1, (total - 1).bit_length())
    key = jax.random.key(seed)
    rx_h = _HashableRx(receiver)
    lo = receiver.lo_waveform

    import os
    import signal
    import time as _time
    from . import checkpoint as _ckpt
    from .profiler import log

    p0 = 0
    if resume and checkpoint_path is not None \
            and os.path.exists(_ckpt._npz_path(checkpoint_path)):
        accs, p0, _, meta = _ckpt.load(checkpoint_path)
        adc = accs['adc']
        log.info('receive: resumed %s at pass %d/%d', checkpoint_path, p0,
                 n_pass)

    hup = [False]
    prev_handler = None
    if checkpoint_path is not None and hasattr(signal, 'SIGHUP'):
        try:
            prev_handler = signal.signal(
                signal.SIGHUP, lambda *_: hup.__setitem__(0, True))
        except ValueError:
            prev_handler = None   # not the main thread

    def save(pidx):
        if checkpoint_path is not None:
            _ckpt.save(checkpoint_path, {'adc': adc}, pidx, key,
                       meta={'lanes': lanes, 'n_pass': n_pass, 'seed': seed})

    t_start = _time.monotonic()
    done = p0
    try:
        for p in range(p0, n_pass):
            adc = _receive_pass(scene_data, rx_h, shape_idx, lo, key,
                                jnp.uint32(p), adc, lanes, max_depth,
                                coherent, sampler, n_total_log2,
                                time_sampling, polarized)
            done = p + 1
            at_ckpt = (checkpoint_path is not None
                       and done % max(checkpoint_every, 1) == 0)
            if at_ckpt or hup[0]:
                jax.block_until_ready(adc)
                save(done)
                hup[0] = False
            if timeout_s is not None \
                    and _time.monotonic() - t_start > timeout_s:
                jax.block_until_ready(adc)
                save(done)
                log.info('receive: timeout after %d/%d passes', done, n_pass)
                break
    except KeyboardInterrupt:
        # reference: KeyboardInterrupt -> integrator->cancel() -> partial
        # develop (integrator_v.cpp:318-338); here: checkpoint + partial
        jax.block_until_ready(adc)
        save(done)
        log.info('receive: interrupted at pass %d/%d (checkpointed)', done,
                 n_pass)
    finally:
        if prev_handler is not None:
            signal.signal(signal.SIGHUP, prev_handler)
    if checkpoint_path is not None and done == n_pass:
        save(done)
    return adc, lanes * done


def develop_signal(adc, total_samples, cfg: ADCConfig, mode: str = 'density'):
    """Normalize the raw ADC accumulation.

    'density': mean received power density on the fast-time axis — each
    uniform time sample has pdf 1/window, so E[sum]/N * n_time estimates the
    per-bin mean power (matches how the reference's 1/spp + bin scaling is
    applied in `trans_rad.py:51-64`).
    'sum': raw accumulated values.
    """
    c = adc.shape[-1] - 2
    if mode == 'sum':
        return adc[..., :c]
    return adc[..., :c] * (cfg.n_time / jnp.maximum(total_samples, 1))


# ---------------------------------------------------------------------------
# MIMO multi-channel receive (BASELINE config 5): one coherent I/Q channel
# per receive-array element, ready for digital beamforming (dsp/beamform.py)
# and channel sharding (parallel/shard.py::receive_mimo_sharded).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=('rx', 'shape_idx', 'n_lanes',
                                             'max_depth', 'sampler',
                                             'n_total_log2', 'time_sampling'))
def _receive_mimo_pass(scene_data: SceneData, rx, shape_idx: int, lo_wf, key,
                       pass_idx, adc, elem_off, n_lanes: int, max_depth: int,
                       sampler: str = 'independent', n_total_log2: int = 20,
                       time_sampling: str = 'fixed'):
    from .core import transform as _tfm, warp as _warp
    from .core.math import Pi as _Pi
    from .radar.endpoints import rx_array_frame, rx_elem_pattern_gain
    cfg = rx.adc
    stream = make_stream(sampler, key, n_lanes, pass_idx, n_total_log2)

    if time_sampling == 'gate':
        t_rx = jnp.zeros((n_lanes,), jnp.float32)
        t_for_freq = jnp.full((n_lanes,),
                              cfg.sampling_start + 0.5 * cfg.sampling_time)
    else:
        u_t, stream = stream.next_1d()
        t_rx = cfg.sampling_start + u_t * cfg.sampling_time
        t_for_freq = t_rx

    u_f, stream = stream.next_1d()
    f_rx, f_w = rx_sample_frequency(rx.receive_type, lo_wf, scene_data.band,
                                    t_for_freq, u_f, cfg)

    _, stream = stream.next_2d()        # keep the stream layout of
    u_dir, stream = stream.next_2d()    # _receive_pass (u_pos unused here)
    wl_rx = scene_data.band.c / jnp.maximum(f_rx, 1e-6)

    # rays leave the ARRAY ORIGIN (per-element positions enter through the
    # exact spherical per-element phases in radar_receive_trace); cosine
    # hemisphere about the aperture normal, single-element pattern weight
    origin, sn, tn, nrm = rx_array_frame(scene_data, rx, shape_idx)
    o = jnp.broadcast_to(origin + 1e-4 * nrm, (n_lanes, 3))
    d_local = _warp.square_to_cosine_hemisphere(u_dir)
    frame = _tfm.frame_from_normal(jnp.broadcast_to(nrm, (n_lanes, 3)))
    d = _tfm.to_world(frame, d_local)
    w = _Pi * rx_elem_pattern_gain(rx, sn, tn, d, wl_rx) * rx.gain

    adc, stream = radar_receive_trace(
        scene_data, stream, o, d, t_rx, f_rx, w * f_w, adc, cfg,
        rx.receive_type, lo_wf, jnp.asarray(rx.velocity),
        max_depth=max_depth, coherent=True, time_sampling=time_sampling,
        elem_offsets=elem_off)
    return adc


def receive_mimo(scene: Scene, scene_data: SceneData | None = None,
                 receiver: ReceiverSpec | None = None, seed: int = 0,
                 spp: int = 4096, max_depth: int = 3,
                 lanes_per_pass: int = 1 << 17, sampler: str = 'independent',
                 time_sampling: str = 'fixed', elem_offsets=None):
    """Per-element MIMO receive (BASELINE config 5): returns
    (adc (n_time, n_freq, 2E+2), total_samples) where the 2E channels are
    interleaved I/Q per receive element.

    The reference's phased receiver folds the array into ONE analog
    cross-WDF gain summed into a single ADC
    (`src/receivers/phasedreceiver.cpp:118-145,293`); the data digital
    beamforming needs — per-element complex channels — is computed here
    instead: every path connection splats into each element's I/Q pair with
    the exact spherical per-element phase (see `radar_receive_trace`).
    Feed `develop_mimo` then `dsp.beamform`.

    `elem_offsets` overrides the (E,3) world element offsets derived from
    the receiver spec's element grid (e.g. for a sharded channel subset).
    """
    from .radar.endpoints import rx_elem_offsets
    if scene_data is None:
        scene_data = scene.compile()
    scene_data = scene_mono(scene_data)
    if receiver is None:
        receiver = scene.receivers[0]
    shape_idx = scene.shape_index_of_endpoint('receiver', receiver.id)
    if elem_offsets is None:
        elem_offsets = rx_elem_offsets(scene_data, receiver, shape_idx)
    elem_offsets = jnp.asarray(elem_offsets, jnp.float32)
    n_e = elem_offsets.shape[0]
    cfg = receiver.adc
    adc = film_mod.film_new(cfg.n_time, cfg.n_freq, 2 * n_e)

    n_pass = max(1, (spp + lanes_per_pass - 1) // lanes_per_pass)
    lanes = min(spp, lanes_per_pass)
    n_total_log2 = max(1, (lanes * n_pass - 1).bit_length())
    # fold index 0 == the 'ray' shard-0 stream of receive_mimo_sharded, so a
    # channel-only sharded run is bit-identical to this dense one
    key = jax.random.fold_in(jax.random.key(seed), 0)
    rx_h = _HashableRx(receiver)
    for p in range(n_pass):
        adc = _receive_mimo_pass(scene_data, rx_h, shape_idx,
                                 receiver.lo_waveform, key, jnp.uint32(p),
                                 adc, elem_offsets, lanes, max_depth, sampler,
                                 n_total_log2, time_sampling)
    return adc, lanes * n_pass


def develop_mimo(adc, total_samples, cfg: ADCConfig):
    """Normalize a MIMO accumulation into a complex channel cube
    (E, n_time, n_freq) — the input to `dsp.beamform`."""
    n_e = (adc.shape[-1] - 2) // 2
    iq = adc[..., :2 * n_e] * (cfg.n_time / max(int(total_samples), 1))
    cube = iq[..., 0::2] + 1j * iq[..., 1::2]        # (n_time, n_freq, E)
    return jnp.moveaxis(cube, -1, 0)


# ---------------------------------------------------------------------------
# Film-mode binned render (reference `range`/`time` wrappers over
# pathlength/pathtime + fluxmeter film scenes, e.g. trans_rad.xml)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=('sensor_spec', 'shape_idx',
                                             'n_lanes', 'n_bins', 'quantity',
                                             'max_depth'))
def _binned_pass(scene_data: SceneData, sensor_spec, shape_idx: int, key,
                 pass_idx, grid, n_lanes: int, n_bins: int, bin_width,
                 quantity: str, max_depth: int):
    from .sensors import sample_ray as sensor_sample_ray
    stream = SampleStream.make(key, n_lanes, pass_idx)
    w, h = sensor_spec.film_size
    pix = (jnp.arange(n_lanes, dtype=jnp.uint32) % jnp.uint32(w * h)).astype(jnp.int32)
    px = (pix % w).astype(jnp.float32)
    py = (pix // w).astype(jnp.float32)
    u_jit, stream = stream.next_2d()
    uv = (jnp.stack([px, py], -1) + u_jit) / jnp.array([w, h], jnp.float32)
    u_ap, stream = stream.next_2d()
    u_dir, stream = stream.next_2d()
    o, d, wgt = sensor_sample_ray(sensor_spec, scene_data.shapes, shape_idx,
                                  uv, u_ap, u_dir)
    grid, stream = pathlength_histogram(scene_data, stream, o, d, wgt, grid,
                                        pix, n_bins, bin_width, quantity,
                                        max_depth)
    return grid


def render_binned(scene: Scene, scene_data: SceneData | None = None,
                  sensor_idx: int = 0, n_bins: int = 50, bin_width: float = 0.2,
                  quantity: str = 'length', seed: int = 0, spp: int = 4096,
                  max_depth: int = 4, lanes_per_pass: int = 1 << 17):
    """Range/time-binned film render: returns grid (H*W, n_bins, 3) and spp.

    Mirrors the `range` integrator config (`range.cpp:74-76`: props `dr`,
    `bins`) and `time` (50 x 0.5 ns bins, `time.cpp:118-134`).
    """
    from .render import _HashableSpec
    if scene_data is None:
        scene_data = scene.compile()
    spec = scene.sensors[sensor_idx]
    shape_idx = scene.sensor_shape_index(sensor_idx)
    w, h = spec.film_size
    grid = jnp.zeros((w * h, n_bins, 3), jnp.float32)
    total = spp * w * h
    lanes = min(total, lanes_per_pass)
    n_pass = max(1, (total + lanes - 1) // lanes)
    key = jax.random.key(seed)
    spec_h = _HashableSpec(spec)
    for p in range(n_pass):
        grid = _binned_pass(scene_data, spec_h, shape_idx, key, jnp.uint32(p),
                            grid, lanes, n_bins, jnp.float32(bin_width),
                            quantity, max_depth)
    return grid, lanes * n_pass


@functools.partial(jax.jit, static_argnames=(
    'rx', 'shape_idx', 'n_lanes', 'n_pass', 'max_depth', 'coherent',
    'sampler', 'n_total_log2', 'time_sampling', 'polarized'))
def _cpi_scan(sd_stack, rx, shape_idx: int, lo_wf, key_rows,
              n_lanes: int, n_pass: int, max_depth: int, coherent: bool,
              sampler: str, n_total_log2: int, time_sampling: str,
              polarized: bool):
    """ONE compiled program for the whole CPI: `lax.scan` over the pulse
    axis of the stacked per-pulse SceneData (rigid motion = per-pulse
    to_world/velocity arrays, same topology), each step an ordinary
    `_receive_pass`.  Replaces n_pulses separate dispatches + host
    round-trips — on TPU the whole pulse train is a single launch."""
    cfg = rx.adc
    n_ch = 4 if polarized else (2 if coherent else 1)

    def one(carry, inp):
        sd_p, kd = inp
        k = jax.random.wrap_key_data(kd)
        adc = film_mod.film_new(cfg.n_time, cfg.n_freq, n_ch)
        for p in range(n_pass):
            adc = _receive_pass(sd_p, rx, shape_idx, lo_wf, k,
                                jnp.uint32(p), adc, n_lanes, max_depth,
                                coherent, sampler, n_total_log2,
                                time_sampling, polarized)
        return carry, adc

    _, cube = jax.lax.scan(one, 0, (sd_stack, key_rows))
    return cube


# receive() kwargs the scanned CPI supports; anything else (checkpointing,
# use_pallas routing, timeouts) falls back to the per-pulse loop
_CPI_SCAN_KW = {'spp', 'max_depth', 'sampler', 'time_sampling', 'polarized',
                'lanes_per_pass'}


def receive_cpi(scene: Scene, receiver_id: str | None = None,
                n_pulses: int = 16, prf: float = 1000.0, t0: float = 0.0,
                seed: int = 0, coherent: bool = True,
                common_random_numbers: bool = True, engine: str = 'scan',
                **receive_kw):
    """Coherent processing interval over an animated scene.

    Snapshots any `AnimatedTransform` motion at t = t0 + p / prf via
    `Scene.at_time` (quasistatic slow time — the framework version of the
    reference's per-frame reload loop,
    `python_scripts/animated_trans_rad.py:307-373`), and returns the
    per-pulse ADC grids as a (n_pulses, n_time, n_freq, C) cube ready for
    `dsp.rangedoppler.doppler_fft`.

    engine='scan' (default) stacks the per-pulse SceneData snapshots and
    runs the WHOLE train as one jitted `lax.scan` (`_cpi_scan`) — one
    compile, one device launch, no per-pulse host round-trips; bit-exact
    with the legacy loop.  engine='pallas' scans the MEGAKERNEL over
    per-pulse packed tables instead (`receive_cpi_pallas`): every pulse
    at the kernel's ~900M samples/s on TPU (analytic scenes, and mesh
    scenes under rigid per-pulse motion — the per-pulse BVH tables ride
    the scan; the returned cube carries zero weight/count channels).
    engine='loop'
    runs one `receive()` per pulse (also used automatically when
    `receive_kw` carries loop-only options like checkpointing or
    `use_pallas`).

    Returns (cube, samples_per_pulse).  Intra-pulse Doppler comes from the
    velocity fields the animation derivative fills in; inter-pulse phase
    progression comes from the re-evaluated geometry.

    `common_random_numbers` (default True) reuses the SAME sample stream
    for every pulse: the per-pulse MC phase errors are then correlated and
    cancel in slow-time differences, so the Doppler line needs far fewer
    samples per pulse.  Unbiased per pulse either way; set False for
    independent pulses (e.g. when averaging magnitude spectra).
    """
    if engine == 'pallas':
        # kernel-rate CPI: one lax.scan over per-pulse packed tables
        # (analytic + rigid-motion mesh scenes; ~900M samples/s per pulse
        # on TPU analytic, BVH-walk-bound for meshes).  Returns
        # the film-layout cube (zeros in the weight/count channels) so
        # downstream develop code is engine-agnostic.
        from .integrators.pallas_receive import receive_cpi_pallas
        sig, n = receive_cpi_pallas(
            scene, n_pulses=n_pulses, prf=prf, t0=t0, seed=seed,
            spp=receive_kw.get('spp', 4096),
            max_depth=receive_kw.get('max_depth', 3),
            time_sampling=receive_kw.get('time_sampling', 'gate'),
            coherent=coherent,
            common_random_numbers=common_random_numbers,
            interpret=jax.default_backend() == 'cpu',
            receiver_id=receiver_id)
        if sig.ndim == 3:
            sig = sig[..., None]
        pad = jnp.zeros(sig.shape[:-1] + (2,), sig.dtype)
        return jnp.concatenate([sig, pad], axis=-1), n
    if engine == 'scan' and set(receive_kw) <= _CPI_SCAN_KW:
        spp = receive_kw.get('spp', 4096)
        max_depth = receive_kw.get('max_depth', 3)
        sampler = receive_kw.get('sampler', 'independent')
        time_sampling = receive_kw.get('time_sampling', 'fixed')
        polarized = receive_kw.get('polarized', False)
        lanes_per_pass = receive_kw.get('lanes_per_pass', 1 << 17)
        snaps = [scene.at_time(t0 + p / prf) for p in range(n_pulses)]
        rxs = snaps[0].receivers
        rx = rxs[0] if receiver_id is None else next(
            r for r in rxs if r.id == receiver_id)
        shape_idx = snaps[0].shape_index_of_endpoint('receiver', rx.id)
        sds = [scene_mono(sn.compile()) for sn in snaps]
        sd_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *sds)
        n_pass = max(1, (spp + lanes_per_pass - 1) // lanes_per_pass)
        lanes = min(spp, lanes_per_pass)
        n_total_log2 = max(1, (lanes * n_pass - 1).bit_length())
        key_rows = jnp.stack([jax.random.key_data(jax.random.key(
            seed if common_random_numbers else seed + 7919 * p))
            for p in range(n_pulses)])
        cube = _cpi_scan(sd_stack, _HashableRx(rx), shape_idx,
                         rx.lo_waveform, key_rows, lanes, n_pass, max_depth,
                         coherent, sampler, n_total_log2, time_sampling,
                         polarized)
        return cube, lanes * n_pass
    cube = []
    n = 0
    for p in range(n_pulses):
        snap = scene.at_time(t0 + p / prf)
        rxs = snap.receivers
        rx = rxs[0] if receiver_id is None else next(
            r for r in rxs if r.id == receiver_id)
        sd = snap.compile()
        s_p = seed if common_random_numbers else seed + 7919 * p
        adc, n = receive(snap, sd, rx, seed=s_p,
                         coherent=coherent, **receive_kw)
        cube.append(adc)
    return jnp.stack(cube), n
