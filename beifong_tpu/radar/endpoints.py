"""Transmitter and receiver endpoint tables + sampling/eval ops.

Replaces the reference transmitter plugins (`src/transmitters/
{wignertransmitter,phasedtransmitter,areatransmitter}.cpp`) and receiver
plugins (`src/receivers/{wignerreceiver,phasedreceiver,omnidirectional}.cpp`)
plus the ADC (`src/adcs/hdradc.cpp`, `include/mitsuba/render/adc.h`).

Transmitters are compiled into a device SoA table (the tracer needs NEE
against all of them); the receiver drives `receive()` from a host spec, with
its LO waveform and ADC window as the fast-time/frequency binning config.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import transform as tfm, warp
from ..core.math import normalize, Pi, TwoPi
from ..geometry.sample import sample_position
from ..interaction import DirectionSample
from .waveform import Waveform, stack as wf_stack, cw
from .wigner import rect_aperture_gain, phased_aperture_gain
from .. import film as film_mod

WIGNER = 0
PHASED = 1
AREA = 2       # plain diffuse area transmitter (no WDF)
OMNI = 3       # point receiver


# ---------------------------------------------------------------------------
# ADC configuration (reference adc.h: size, crop window, bandwidth 2-vector)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ADCConfig:
    """Signal store config: (fast-time bins x frequency bins).

    The reference ADC has size = (time bins, freq/Doppler bins) and a
    `bandwidth()` 2-vector used to scale tf into pixel coordinates
    (`integrator.cpp:1639`: tf *= adc->size()/adc->bandwidth()).
    """

    n_time: int = 64
    n_freq: int = 1
    sampling_start: float = 0.0     # fast-time window start [s]
    sampling_time: float = 1e-3     # window length [s]
    freq_lo: float = 0.0            # frequency axis window [Hz]
    freq_hi: float = 1.0
    rfilter: int = film_mod.TENT

    def new(self):
        """Fresh accumulation grid (n_time, n_freq, 3): value/weight/count."""
        return film_mod.film_new(self.n_time, self.n_freq, 1)

    def tf_to_pixel(self, t, f):
        """Map (receive time offset [s], frequency [Hz]) to continuous
        (x=freq_bin, y=time_bin) pixel coords."""
        y = (t - 0.0) / self.sampling_time * self.n_time
        x = (f - self.freq_lo) / max(self.freq_hi - self.freq_lo, 1e-30) * self.n_freq
        return x, y


# ---------------------------------------------------------------------------
# Host specs
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TransmitterSpec:
    id: str
    kind: int
    waveform: Waveform
    gain: float = 1.0
    resample_freq: bool = False
    velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    # phased-array parameters (kind == PHASED)
    n_elems: int = 1
    elem_spacing: float = 0.0
    elem_axis: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([1.0, 0.0, 0.0], np.float32))
    elem_wid: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.01, 0.01], np.float32))
    steer_deg: float = 0.0
    endpoint_kind: str = dataclasses.field(default='transmitter', init=False)


def wigner_transmitter(id, waveform, gain=1.0, resample_freq=False) -> TransmitterSpec:
    """Aperture transmitter on a rectangle shape; directional gain from the
    shape's WDF (reference `wignertransmitter.cpp`)."""
    return TransmitterSpec(id=id, kind=WIGNER, waveform=waveform, gain=gain,
                           resample_freq=resample_freq)


def phased_transmitter(id, waveform, n_elems, elem_spacing, elem_wid,
                       steer_deg=0.0, elem_axis=(1, 0, 0), gain=1.0,
                       resample_freq=False) -> TransmitterSpec:
    """Phased-array transmitter (reference `phasedtransmitter.cpp`):
    N elements along `elem_axis`, steered by `steer_deg`."""
    return TransmitterSpec(id=id, kind=PHASED, waveform=waveform, gain=gain,
                           resample_freq=resample_freq, n_elems=int(n_elems),
                           elem_spacing=float(elem_spacing),
                           elem_axis=np.asarray(elem_axis, np.float32),
                           elem_wid=np.asarray(elem_wid, np.float32),
                           steer_deg=float(steer_deg))


def area_transmitter(id, waveform, gain=1.0,
                     resample_freq: bool = False) -> TransmitterSpec:
    """Plain diffuse area transmitter (reference `areatransmitter.cpp`)."""
    return TransmitterSpec(id=id, kind=AREA, waveform=waveform, gain=gain,
                           resample_freq=resample_freq)


@dataclasses.dataclass
class ReceiverSpec:
    id: str
    kind: int
    adc: ADCConfig
    lo_waveform: Optional[Waveform] = None   # mixer LO (mix mode)
    # raw | raw_resample | mix_resample | mixer (reference receiver.cpp:21)
    receive_type: str = 'raw'
    gain: float = 1.0
    to_world: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32))
    velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    n_elems: int = 1
    elem_spacing: float = 0.0
    elem_axis: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([1.0, 0.0, 0.0], np.float32))
    elem_wid: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.01, 0.01], np.float32))
    steer_deg: float = 0.0
    endpoint_kind: str = dataclasses.field(default='receiver', init=False)


def wigner_receiver(id, adc, receive_type='raw', lo_waveform=None, gain=1.0) -> ReceiverSpec:
    """Shape-attached aperture receiver (reference `wignerreceiver.cpp`)."""
    return ReceiverSpec(id=id, kind=WIGNER, adc=adc, receive_type=receive_type,
                        lo_waveform=lo_waveform, gain=gain)


def phased_receiver(id, adc, n_elems, elem_spacing, elem_wid, steer_deg=0.0,
                    elem_axis=(1, 0, 0), receive_type='raw', lo_waveform=None,
                    gain=1.0) -> ReceiverSpec:
    return ReceiverSpec(id=id, kind=PHASED, adc=adc, receive_type=receive_type,
                        lo_waveform=lo_waveform, gain=gain, n_elems=int(n_elems),
                        elem_spacing=float(elem_spacing),
                        elem_axis=np.asarray(elem_axis, np.float32),
                        elem_wid=np.asarray(elem_wid, np.float32),
                        steer_deg=float(steer_deg))


def omni_receiver(id, adc, position=(0, 0, 0), receive_type='raw',
                  lo_waveform=None, gain=1.0) -> ReceiverSpec:
    """Isotropic point receiver (reference `omnidirectional.cpp`)."""
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = position
    return ReceiverSpec(id=id, kind=OMNI, adc=adc, receive_type=receive_type,
                        lo_waveform=lo_waveform, gain=gain, to_world=m)


# ---------------------------------------------------------------------------
# Device tables
# ---------------------------------------------------------------------------


def _elem_locs(spec) -> np.ndarray:
    """Element centre positions in the array's LOCAL frame [m]
    (reference `phased.cpp:78-96` element grid)."""
    n = spec.n_elems
    axis = spec.elem_axis / max(np.linalg.norm(spec.elem_axis), 1e-20)
    if n % 2 == 0:
        return np.stack([-spec.elem_spacing * axis * (i - n / 2.0 + 0.5)
                         for i in range(n)]).astype(np.float32)
    return np.stack([-spec.elem_spacing * axis * (i - (n - 1) / 2.0)
                     for i in range(n)]).astype(np.float32)


def _phased_pairs(spec, band_wl_centre: float):
    """Virtual element pair geometry in the array's LOCAL frame
    (reference `phased.cpp:78-120`): midpoints, baselines, steering phases.
    Steering phases are baked at the band-centre wavelength, as the
    reference bakes `m_psi_dash` at construction."""
    n = spec.n_elems
    axis = spec.elem_axis / max(np.linalg.norm(spec.elem_axis), 1e-20)
    locs = _elem_locs(spec)
    mids, bases, psis = [], [], []
    steer = np.sin(np.deg2rad(spec.steer_deg))
    k_steer = 2.0 * np.pi / band_wl_centre * steer
    for i in range(n):
        for j in range(n):
            mids.append((locs[i] + locs[j]) / 2.0)
            bases.append(locs[i] - locs[j])
            # steering phase: conjugate pair term exp(-i k (ri - rj) . axis)
            psis.append(-k_steer * float(np.dot(locs[i] - locs[j], axis)))
    return (np.asarray(mids, np.float32), np.asarray(bases, np.float32),
            np.asarray(psis, np.float32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TransmitterTable:
    kind: jax.Array           # (T,) int32
    shape_idx: jax.Array      # (T,) int32 (-1 for free-standing)
    gain: jax.Array           # (T,)
    resample: jax.Array       # (T,) bool
    wf: Waveform              # stacked (T,)
    velocity: jax.Array       # (T,3)
    # phased-array pair geometry (local frame), padded to K = max pairs
    elem_mid: jax.Array       # (T,K,3)
    elem_baseline: jax.Array  # (T,K,3)
    psi: jax.Array            # (T,K)
    pair_mask: jax.Array      # (T,K) bool
    elem_wid: jax.Array       # (T,2)

    @property
    def n(self) -> int:
        return self.kind.shape[0]

    @staticmethod
    def build(specs: list[TransmitterSpec], shape_of,
              band_wl_centre: float = 1.0) -> "TransmitterTable":
        n = len(specs)
        K = max(max((s.n_elems ** 2 for s in specs), default=1), 1)
        kind = np.zeros(n, np.int32)
        sidx = np.full(n, -1, np.int32)
        gain = np.ones(n, np.float32)
        res = np.zeros(n, bool)
        vel = np.zeros((n, 3), np.float32)
        mids = np.zeros((n, K, 3), np.float32)
        bases = np.zeros((n, K, 3), np.float32)
        psis = np.zeros((n, K), np.float32)
        mask = np.zeros((n, K), bool)
        wid = np.full((n, 2), 0.01, np.float32)
        wfs = []
        for i, s in enumerate(specs):
            kind[i] = s.kind
            sidx[i] = shape_of(s.id)
            gain[i] = s.gain
            res[i] = s.resample_freq
            vel[i] = s.velocity
            wfs.append(s.waveform)
            if s.kind == PHASED:
                m, b, p = _phased_pairs(s, band_wl_centre)
                k = len(m)
                mids[i, :k], bases[i, :k], psis[i, :k] = m, b, p
                mask[i, :k] = True
                wid[i] = s.elem_wid
        return TransmitterTable(
            kind=jnp.asarray(kind), shape_idx=jnp.asarray(sidx),
            gain=jnp.asarray(gain), resample=jnp.asarray(res),
            wf=wf_stack(wfs), velocity=jnp.asarray(vel),
            elem_mid=jnp.asarray(mids), elem_baseline=jnp.asarray(bases),
            psi=jnp.asarray(psis), pair_mask=jnp.asarray(mask),
            elem_wid=jnp.asarray(wid))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ReceiverTable:
    """Minimal device-side receiver registry (shape attachment only; the
    receive() driver works from the host `ReceiverSpec`)."""

    kind: jax.Array
    shape_idx: jax.Array

    @staticmethod
    def build(specs, shape_of) -> "ReceiverTable":
        n = max(len(specs), 1)
        kind = np.zeros(n, np.int32)
        sidx = np.full(n, -1, np.int32)
        for i, s in enumerate(specs):
            kind[i] = s.kind
            sidx[i] = shape_of(s.id)
        return ReceiverTable(kind=jnp.asarray(kind), shape_idx=jnp.asarray(sidx))


# ---------------------------------------------------------------------------
# Transmitter ops (device)
# ---------------------------------------------------------------------------


def _wf_row(wf: Waveform, idx):
    return jax.tree_util.tree_map(lambda x: x[idx], wf)


def tx_aperture_gain(scene, tx_idx, p_world, d_world, wavelength):
    """Directional aperture gain [1/sr-ish] of transmitter rows `tx_idx`
    for radiation leaving point `p_world` in direction `d_world`."""
    tx = scene.transmitters
    i = jnp.maximum(tx_idx, 0)
    kind = tx.kind[i]
    sidx = jnp.maximum(tx.shape_idx[i], 0)

    g_wig = rect_aperture_gain(scene.shapes, sidx, p_world, d_world, wavelength)

    # phased: per-lane gather of pair geometry, array frame from the shape
    tw = scene.shapes.to_world[sidx]
    s_ax = tw[:, :3, 0]
    t_ax = tw[:, :3, 1]
    wx = jnp.linalg.norm(s_ax, axis=-1, keepdims=True)
    wy = jnp.linalg.norm(t_ax, axis=-1, keepdims=True)
    sn = s_ax / jnp.maximum(wx, 1e-20)
    tn = t_ax / jnp.maximum(wy, 1e-20)
    origin = tw[:, :3, 3]

    def one_lane(mid, base, psi, mask, sn_l, tn_l, wid, orig, p, d, wl):
        return phased_aperture_gain(mid, base, psi, mask, sn_l, tn_l, wid,
                                    orig, p[None], d[None], wl[None])[0]

    any_phased = bool(tx.pair_mask.shape[1] > 1)
    if any_phased:
        # world-space element offsets: local offsets along the shape frame
        mid_w = (tx.elem_mid[i, :, 0:1] * sn[:, None, :]
                 + tx.elem_mid[i, :, 1:2] * tn[:, None, :])
        base_w = (tx.elem_baseline[i, :, 0:1] * sn[:, None, :]
                  + tx.elem_baseline[i, :, 1:2] * tn[:, None, :])
        g_ph = jax.vmap(one_lane)(mid_w, base_w, tx.psi[i], tx.pair_mask[i],
                                  sn, tn, tx.elem_wid[i], origin,
                                  p_world, d_world, wavelength)
    else:
        g_ph = g_wig

    g = jnp.where(kind == WIGNER, g_wig,
                  jnp.where(kind == PHASED, g_ph, 1.0))
    return g


def tx_eval(scene, tx_idx, p_world, d_out_world, cos_theta, time_at_tx,
            freq_at_tx, wavelength):
    """Radiance-like weight of a transmitter at a direct hit
    (reference `wignertransmitter.cpp::eval:193-271`):
       W_signal(t, f) * gain * aperture_WDF * 2*pi,  gated on front side.
    Returns (weight (n,), f_emitted (n,)) — with `resample` the emission
    frequency snaps to the instantaneous waveform frequency.
    """
    tx = scene.transmitters
    i = jnp.maximum(tx_idx, 0)
    wf = _wf_row(tx.wf, i)
    resample = tx.resample[i]
    f_inst = wf.inst_freq(time_at_tx)
    f_emit = jnp.where(resample, f_inst, freq_at_tx)
    sig = wf.eval_wdf(time_at_tx, f_emit)
    wl_emit = scene.band.c / jnp.maximum(f_emit, 1e-6)
    ap = tx_aperture_gain(scene, tx_idx, p_world, d_out_world, wl_emit)
    w = sig * tx.gain[i] * ap * TwoPi
    live = (tx_idx >= 0) & (cos_theta > 0.0)
    return jnp.where(live, w, 0.0), f_emit


def tx_sample_geom(scene, ref_p, u_sel, u_pos):
    """Geometric half of transmitter NEE: pick a transmitter uniformly and
    sample a point on its shape; no waveform evaluation.

    Returns (ds: DirectionSample, tx_row (n,), cos_tx (n,)).
    """
    tx = scene.transmitters
    n_tx = tx.n
    e = jnp.clip((u_sel * n_tx).astype(jnp.int32), 0, n_tx - 1)
    sidx = jnp.maximum(tx.shape_idx[e], 0)
    p_s, n_s, pdf_a, uv = sample_position(scene.shapes, sidx, u_pos)
    d_vec = p_s - ref_p
    dist2 = jnp.sum(d_vec * d_vec, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
    d = d_vec / dist[..., None]
    cos_tx = jnp.sum(-d * n_s, axis=-1)       # emission angle at the tx
    pdf_sa = jnp.where(cos_tx > 1e-6,
                       pdf_a * dist2 / jnp.maximum(cos_tx, 1e-6), 0.0)
    pdf = pdf_sa / n_tx
    ds = DirectionSample(p=p_s, n=n_s, d=d, dist=dist, pdf=pdf,
                         delta=jnp.zeros_like(pdf, bool), uv=uv)
    return ds, e, cos_tx


def tx_sample_direction(scene, ref_p, time_at_ref, freq_at_ref, u_sel, u_pos,
                        t_emit_override=None):
    """NEE toward transmitters with retarded emission time
    (reference `Scene::sample_transmitter_direction` `scene.cpp:250-301` +
    `wignertransmitter::sample_direction:373-534`, including the
    `ds.time -= dist/MTS_C` retardation at `:420-425`).

    Returns (ds: DirectionSample, weight (n,), f_emit (n,), t_emit (n,),
    tx_row (n,)).  weight = tx radiance / pdf_solid_angle.
    `t_emit_override` replaces the retarded time (deferred time-gate
    sampling, see radar_path.py).
    """
    ds, e, cos_tx = tx_sample_geom(scene, ref_p, u_sel, u_pos)
    if t_emit_override is None:
        t_emit = time_at_ref - ds.dist / scene.band.c   # retarded emission
    else:
        t_emit = t_emit_override
    w_tx, f_emit = tx_eval(scene, e, ds.p, -ds.d, cos_tx, t_emit, freq_at_ref,
                           scene.band.c / jnp.maximum(freq_at_ref, 1e-6))
    weight = jnp.where(ds.pdf > 0.0, w_tx / jnp.maximum(ds.pdf, 1e-30), 0.0)
    return ds, weight, f_emit, t_emit, e


def tx_pdf_direction(scene, tx_idx, dist, cos_at_tx):
    """Solid-angle pdf of sampling that transmitter direction (for MIS),
    reference `Scene::pdf_transmitter_direction` (`scene.cpp:302`)."""
    tx = scene.transmitters
    i = jnp.maximum(tx_idx, 0)
    sidx = jnp.maximum(tx.shape_idx[i], 0)
    area_pdf = 1.0 / jnp.maximum(scene.shapes.surface_area[sidx], 1e-20)
    pdf = area_pdf * dist * dist / jnp.maximum(cos_at_tx, 1e-6) / tx.n
    return jnp.where((tx_idx >= 0) & (cos_at_tx > 1e-6), pdf, 0.0)


# ---------------------------------------------------------------------------
# Receiver ops (host spec + device sampling)
# ---------------------------------------------------------------------------


def rx_sample_ray(scene, rx_spec: ReceiverSpec, shape_idx: int, time,
                  u_pos, u_dir, wavelength=None):
    """Sample the receive ray: position on the antenna + direction, with the
    aperture WDF importance weight (reference
    `wignerreceiver.cpp::sample_ray_differential:208-269`).

    For rectangle apertures the direction is drawn from a 50/50 mixture of
    the cosine hemisphere and a power-cosine lobe whose width matches the
    aperture WDF mainlobe (first null at sin(theta) = lambda/2w), so
    directive antennas (w >> lambda) no longer waste ~all lanes outside the
    beam — the signed WDF weight stays in the estimator, only the sampling
    density changes (unbiased; reference samples pure cosine,
    `wignerreceiver.cpp:208-269`, which is the variance smell the round-1
    review flagged).  Branch selection rescales u_dir[:,0], keeping the QMC
    stream layout unchanged.

    Returns (o, d, weight).
    """
    n = time.shape[0]
    if rx_spec.kind == OMNI:
        p = jnp.broadcast_to(jnp.asarray(rx_spec.to_world)[:3, 3], (n, 3))
        d = warp.square_to_uniform_sphere(u_dir)
        # weight = 1/pdf = 4*pi
        return p, d, jnp.full((n,), 4.0 * Pi)

    if rx_spec.kind == PHASED and rx_spec.n_elems > 1:
        # Sample the position across the ARRAY's extent, not the plain
        # attached rect (reference `phasedreceiver.cpp:314-341` samples the
        # array-spanning shape; the cross-WDF's support is the union of
        # pair-midpoint footprints, which fills the array bounding rect).
        if shape_idx >= 0:
            tw = scene.shapes.to_world[shape_idx]
        else:
            tw = jnp.asarray(rx_spec.to_world)
        s_ax, t_ax = tw[:3, 0], tw[:3, 1]
        sn = s_ax / jnp.maximum(jnp.linalg.norm(s_ax), 1e-20)
        tn = t_ax / jnp.maximum(jnp.linalg.norm(t_ax), 1e-20)
        nrm = jnp.cross(sn, tn)
        nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm), 1e-20)
        origin = tw[:3, 3]
        # bounding rect of all element footprints, local in-plane extents
        locs = _elem_locs(rx_spec)
        hx = float(np.abs(locs[:, 0]).max()) + float(rx_spec.elem_wid[0])
        hy = float(np.abs(locs[:, 1]).max()) + float(rx_spec.elem_wid[1])
        lx = (u_pos[:, 0] * 2.0 - 1.0) * hx
        ly = (u_pos[:, 1] * 2.0 - 1.0) * hy
        p = origin[None] + lx[:, None] * sn[None] + ly[:, None] * tn[None]
        d_local = warp.square_to_cosine_hemisphere(u_dir)
        frame = tfm.frame_from_normal(jnp.broadcast_to(nrm, (n, 3)))
        d = tfm.to_world(frame, d_local)
        o = p + 1e-4 * nrm[None]
        area = 4.0 * hx * hy
        # cosine-hemisphere pdf cancels cos; uniform position pdf -> x area
        return o, d, jnp.full((n,), Pi * area * rx_spec.gain)

    idxs = jnp.full((n,), shape_idx, jnp.int32)
    p, nrm, pdf_a, _ = sample_position(scene.shapes, idxs, u_pos)
    if wavelength is None:
        d_local = warp.square_to_cosine_hemisphere(u_dir)
        frame = tfm.frame_from_normal(nrm)
        d = tfm.to_world(frame, d_local)
        o = p + 1e-4 * nrm
        # cosine-hemisphere pdf cancels cos; position pdf -> x area
        base_w = Pi / jnp.maximum(pdf_a, 1e-20)
        return o, d, base_w * rx_spec.gain

    tw = scene.shapes.to_world[shape_idx]
    w_min = jnp.minimum(jnp.linalg.norm(tw[:3, 0]), jnp.linalg.norm(tw[:3, 1]))
    # power-cosine exponent matching the WDF mainlobe: lobe rms angle
    # sqrt(2/(k+2)) ~= 0.6 * lambda/(2 w_min)
    k = jnp.maximum(2.0 * (2.0 * w_min / (0.6 * wavelength)) ** 2 - 2.0, 0.0)
    pick_lobe = u_dir[:, 0] >= 0.5
    u0 = jnp.where(pick_lobe, 2.0 * u_dir[:, 0] - 1.0, 2.0 * u_dir[:, 0])
    u1 = u_dir[:, 1]
    # cosine branch
    d_cos = warp.square_to_cosine_hemisphere(jnp.stack([u0, u1], -1))
    # lobe branch: cos(theta) = u^(1/(k+1)), phi = 2 pi u1
    ct = jnp.power(jnp.maximum(u0, 1e-12), 1.0 / (k + 1.0))
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    phi = TwoPi * u1
    d_lobe = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], -1)
    d_local = jnp.where(pick_lobe[:, None], d_lobe, d_cos)
    cos_t = jnp.maximum(d_local[:, 2], 0.0)
    pdf_dir = (0.5 * cos_t / Pi
               + 0.5 * (k + 1.0) / TwoPi * jnp.power(jnp.maximum(cos_t, 1e-12), k))
    frame = tfm.frame_from_normal(nrm)
    d = tfm.to_world(frame, d_local)
    o = p + 1e-4 * nrm
    w = cos_t / jnp.maximum(pdf_dir * pdf_a, 1e-30)
    return o, d, w * rx_spec.gain


def rx_aperture_weight(scene, rx_spec: ReceiverSpec, shape_idx: int,
                       p, d, wavelength):
    """Directional WDF weight of the receive aperture for (p, d)
    (reference `wignerreceiver.cpp::sample_ray_differential:208-269` WDF
    weight; `phasedreceiver.cpp` cross-WDF).  May be negative."""
    n = p.shape[0]
    if rx_spec.kind == OMNI:
        return jnp.ones((n,))
    idxs = jnp.full((n,), shape_idx, jnp.int32)
    if rx_spec.kind == PHASED and rx_spec.n_elems > 1:
        # steering phases baked at the band-centre wavelength (reference
        # phasedreceiver.cpp bakes m_psi_dash at construction)
        mids, bases, psis = _phased_pairs(rx_spec,
                                          scene.band.wavelength_centre)
        tw = scene.shapes.to_world[shape_idx]
        s_ax = tw[:3, 0] / jnp.maximum(jnp.linalg.norm(tw[:3, 0]), 1e-20)
        t_ax = tw[:3, 1] / jnp.maximum(jnp.linalg.norm(tw[:3, 1]), 1e-20)
        origin = tw[:3, 3]
        mid_w = mids[:, 0:1] * s_ax[None] + mids[:, 1:2] * t_ax[None]
        base_w = bases[:, 0:1] * s_ax[None] + bases[:, 1:2] * t_ax[None]
        from .wigner import phased_aperture_gain
        return phased_aperture_gain(
            jnp.asarray(mid_w), jnp.asarray(base_w), jnp.asarray(psis),
            jnp.ones(len(mids), bool), s_ax, t_ax,
            jnp.asarray(rx_spec.elem_wid), origin, p, d, wavelength)
    return rect_aperture_gain(scene.shapes, idxs, p, d, wavelength)


def rx_array_frame(scene, rx_spec: ReceiverSpec, shape_idx: int):
    """Aperture frame of the receive array: (origin, s_n, t_n, normal) —
    normalized in-plane axes + outward normal, from the attached shape's
    to_world (or the spec's own transform when free-standing)."""
    if shape_idx >= 0:
        tw = scene.shapes.to_world[shape_idx]
    else:
        tw = jnp.asarray(rx_spec.to_world)
    s_ax, t_ax = tw[:3, 0], tw[:3, 1]
    sn = s_ax / jnp.maximum(jnp.linalg.norm(s_ax), 1e-20)
    tn = t_ax / jnp.maximum(jnp.linalg.norm(t_ax), 1e-20)
    nrm = jnp.cross(sn, tn)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm), 1e-20)
    return tw[:3, 3], sn, tn, nrm


def rx_elem_offsets(scene, rx_spec: ReceiverSpec, shape_idx: int):
    """(E,3) world-frame offsets of the receive elements from the array
    origin (element grid of reference `phased.cpp:78-96`, kept per element
    instead of paired: MIMO channels need each element's own position)."""
    _, sn, tn, nrm = rx_array_frame(scene, rx_spec, shape_idx)
    locs = _elem_locs(rx_spec)          # (E,3) local in-plane coords
    return (locs[:, 0:1] * sn[None] + locs[:, 1:2] * tn[None]
            + locs[:, 2:3] * nrm[None])


def rx_elem_pattern_gain(rx_spec: ReceiverSpec, sn, tn, d, wavelength):
    """Single-element WDF directional gain x element area for direction `d`
    — the aperture-centre cut of the rect WDF (`rectangle.cpp:132-220` with
    tri(0)=1), element half-widths from the spec.  Identical per element in
    the far field, so one factor serves every MIMO channel."""
    wx = float(rx_spec.elem_wid[0])
    wy = float(rx_spec.elem_wid[1])
    from ..core.math import sinc
    nu_x = jnp.einsum('nj,j->n', d, sn) / wavelength
    nu_y = jnp.einsum('nj,j->n', d, tn) / wavelength
    area = 4.0 * wx * wy
    return area * 4.0 * sinc(TwoPi * nu_x * wx) * sinc(TwoPi * nu_y * wy)


def rx_sample_frequency(receive_type: str, lo_wf, band, time, u,
                        adc_cfg: ADCConfig | None = None):
    """Receive-frequency sampling per receive_type (reference
    `wignerreceiver.cpp::sample_frequency:170-201` + the four types at
    `receiver.cpp:21`):
      raw: uniform over the band (importance over the ADC frequency axis)
        — returns the RECEIVED frequency;
      raw_resample: the rx frequency is RE-sampled from the receiver's LO
        waveform delta (instantaneous frequency at receive time) instead of
        uniformly.  The reference's raw/raw_resample `sample_frequency`
        branches are literally identical (`wignerreceiver.cpp:178-186`) —
        the distinct delta-resampling behavior lives in its else-branch /
        `sample_delta_frequency` (`:152-167`), which is what the name
        means; without an LO waveform this degrades to `raw` exactly as the
        reference degrades.
      mix_resample: delta at the LO instantaneous frequency (dechirp).
      mixer: importance-sample the BEAT axis (reference design comment,
        `integrator.cpp:1626-1636`): draw beat ~ U[ADC freq window], set
        f_rx = f_LO(t) - beat; paths whose delay matches the drawn beat get
        waveform weight, others evaluate the WDF's skirt — the frequency
        axis is filled by importance sampling rather than splatting.
    Returns (f_rx, pdf_weight).
    """
    if receive_type == 'mix_resample':
        if lo_wf is None:
            raise ValueError("mix_resample receiver needs lo_waveform")
        f = lo_wf.inst_freq(time)
        return f, jnp.ones_like(f)
    if receive_type == 'raw_resample' and lo_wf is not None:
        f = lo_wf.inst_freq(time)
        return f, jnp.ones_like(f)
    if receive_type == 'mixer':
        if lo_wf is None:
            raise ValueError("mixer receiver needs lo_waveform")
        if adc_cfg is None:
            raise ValueError("mixer receiver needs the ADC config")
        beat = adc_cfg.freq_lo + u * (adc_cfg.freq_hi - adc_cfg.freq_lo)
        f = lo_wf.inst_freq(time) - beat
        return f, jnp.ones_like(f)
    lo = band.freq_min
    hi = band.freq_max
    f = lo + u * (hi - lo)
    return f, jnp.ones_like(f)
