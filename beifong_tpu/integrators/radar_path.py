"""Radar path tracers: reverse tracing from the receiver with retarded time,
compensated phase, per-bounce Doppler, and NEE against transmitters.

TPU-native re-expression of the reference's radar integrators:
  - `pathtimefrequency` (`src/integrators/pathtimefrequency.cpp:103-460`):
    backward time via `ray.update_state(-si.t)`, transmitter NEE
    (`scene->sample_transmitter_direction` at `:290`), transmitter-hit eval
    (`:192`), MIS (`:396`).
  - `pathlength`/`pathtime` (`pathlength.cpp:114-325`, `pathtime.cpp`):
    path-length/time accumulation for film-mode range/time binning.

Improvements over the reference (documented deviations):
  - every transmitter connection is binned individually with its own
    emission time/frequency (the reference writes one wavelength back per
    sample, `pathtimefrequency.cpp:449-454`, which smears multi-bounce FMCW
    returns — its comments call these "ghost signals");
  - phase is accumulated in a compensated double-single wavelength-count
    accumulator (exact over arbitrarily long paths);
  - per-bounce Doppler from shape velocities is active (the reference's
    Doppler hooks are commented out, `pathtimefrequency.cpp:252-274`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.rng import SampleStream
from ..bsdf.eval import bsdf_eval_pdf, bsdf_sample
from ..textures import texture_eval
from ..radar.endpoints import (tx_sample_direction, tx_eval, tx_pdf_direction,
                               ADCConfig)
from .. import film as film_mod
from ..scene import SceneData


def _adc_splat(adc, cfg: ADCConfig, t_off, f_out, value, active, phase=None,
               coherent: bool = False, elem_dphase=None):
    """Scatter one batch of connection events into the ADC grid.

    adc: (n_time, n_freq, C+2); t_off [s] receive-time offset; f_out [Hz].
    In coherent mode two channels (I, Q) accumulate sqrt(power)*e^{i phase}.
    `value` may be (n,) power or (n, C) multi-channel (polarized Stokes).
    `elem_dphase`: (n, E) per-element phase offsets (MIMO receive) — the
    splat then fills 2E channels [I_0, Q_0, I_1, Q_1, ...].
    """
    x = (f_out - cfg.freq_lo) / max(cfg.freq_hi - cfg.freq_lo, 1e-30) * cfg.n_freq
    y = t_off / cfg.sampling_time * cfg.n_time
    pos = jnp.stack([x, y], axis=-1)
    if elem_dphase is not None:
        amp = jnp.sqrt(jnp.maximum(value, 0.0))[:, None]
        ph_e = phase[:, None] + elem_dphase
        vals = jnp.stack([amp * jnp.cos(ph_e), amp * jnp.sin(ph_e)],
                         -1).reshape(value.shape[0], -1)
    elif coherent:
        amp = jnp.sqrt(jnp.maximum(value, 0.0))
        vals = jnp.stack([amp * jnp.cos(phase), amp * jnp.sin(phase)], -1)
    elif value.ndim == 2:
        vals = value
    else:
        vals = value[:, None]
    return film_mod.splat(adc, pos, vals, active, cfg.rfilter)


# ---------------------------------------------------------------------------
# Polarized transport helpers (reference `*_polarized` variants,
# `mitsuba.conf:120-123` + `include/mitsuba/render/mueller.h`)
# ---------------------------------------------------------------------------


def _side_sign(si):
    """+1 where the two-sided shading frame kept the geometric orientation,
    -1 where `intersect` flipped it toward the ray (intersect.py:281).

    BSDF eval/sample (`bsdf/eval.py`) are written against the UNFLIPPED
    frame — transmissive lobes ((rough/thin) dielectric) read the geometric
    side off sign(wi.z) to pick eta vs 1/eta.  The pre-flipped frame hid
    back hits (every hit looked like 'entering': an eta^2 energy error on
    glass transmission).  Isotropic BSDFs depend only on z components and
    pairwise dots, so restoring the geometric convention is one z-sign
    flip on the local vectors."""
    s = jnp.sum(si.sh_frame[:, 2, :] * si.n, axis=-1)
    return jnp.where(s < 0.0, -1.0, 1.0)


def _flip_z(v, sgn):
    """Flip the z component of local directions by the per-lane sign."""
    return v * jnp.stack([jnp.ones_like(sgn), jnp.ones_like(sgn), sgn], -1)


def _perp_basis(d):
    """An arbitrary transverse basis vector perpendicular to direction d."""
    z = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    x = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    ref = jnp.where(jnp.abs(d[:, 2:3]) < 0.9, z[None], x[None])
    b = jnp.cross(ref, d)
    return b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-20)


def _vertex_mueller(scene, bsdf_idx, d_rx_side, d_tx_side, pol_b):
    """Mueller matrix of one path vertex for reverse-traced radar transport.

    d_rx_side: reverse-ray arrival direction at the vertex (physical light
    LEAVES the vertex along -d_rx_side, toward the receiver side);
    d_tx_side: unit direction from the vertex toward the transmitter side
    (physical light ARRIVES along -d_tx_side).  pol_b: transverse basis
    (perpendicular to d_rx_side) in which the accumulated chain expects its
    input Stokes.

    Returns (M, s_axis): M = R(pol_b <- s/p frame) @ M_vertex with
    M_vertex normalized so M[0,0] == 1 — the scalar Fresnel/albedo factor
    already lives in the path throughput, so the matrix carries only the
    polarization STRUCTURE (S0 of a polarized run equals the unpolarized
    power exactly).  Conductor/dielectric families use
    `mueller.specular_reflection` at the (half-vector) incidence angle;
    everything else depolarizes (reference `mueller.h` + `depolarize`
    semantics of diffuse scattering)."""
    from .. import mueller as mu
    from ..bsdf.tables import (CONDUCTOR, ROUGH_CONDUCTOR, DIELECTRIC,
                               ROUGH_DIELECTRIC, THIN_DIELECTRIC)
    i = jnp.maximum(bsdf_idx, 0)
    typ = scene.bsdfs.type[i]
    eta = jnp.maximum(scene.bsdfs.eta[i, 0], 1e-3)
    kk = scene.bsdfs.k[i, 0]

    # away-from-surface directions: in = d_tx_side, out = -d_rx_side
    h = d_tx_side - d_rx_side
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-20)
    cos_i = jnp.clip(jnp.abs(jnp.sum(d_tx_side * h, axis=-1)), 1e-3, 1.0)

    m_cond = mu.specular_reflection(cos_i, eta, kk)
    m_diel = mu.specular_reflection(cos_i, eta)
    m_cond = m_cond / jnp.maximum(m_cond[..., 0:1, 0:1], 1e-20)
    m_diel = m_diel / jnp.maximum(m_diel[..., 0:1, 0:1], 1e-20)
    m_depol = jnp.broadcast_to(mu.depolarizer(1.0), m_cond.shape)

    is_cond = (typ == CONDUCTOR) | (typ == ROUGH_CONDUCTOR)
    is_diel = ((typ == DIELECTRIC) | (typ == ROUGH_DIELECTRIC)
               | (typ == THIN_DIELECTRIC))
    m_sp = jnp.where(is_cond[:, None, None], m_cond,
                     jnp.where(is_diel[:, None, None], m_diel, m_depol))

    # s axis of the plane of incidence (perpendicular to both segments);
    # degenerate at normal incidence -> fall back to pol_b (rotator -> I)
    s_ax = jnp.cross(d_rx_side, d_tx_side)
    s_n = jnp.linalg.norm(s_ax, axis=-1, keepdims=True)
    s_ax = jnp.where(s_n > 1e-6, s_ax / jnp.maximum(s_n, 1e-20), pol_b)

    # rotator aligning the vertex's s/p output frame to pol_b, around the
    # physical out-propagation axis (-d_rx_side)
    cos_a = jnp.clip(jnp.sum(s_ax * pol_b, axis=-1), -1.0, 1.0)
    sin_a = jnp.sum(jnp.cross(s_ax, pol_b) * (-d_rx_side), axis=-1)
    ang = jnp.arctan2(sin_a, cos_a)
    m = mu.rotator(ang) @ m_sp
    return m, s_ax


def radar_receive_trace(scene: SceneData, stream: SampleStream, o, d,
                        t_rx, f_rx, ray_weight, adc, cfg: ADCConfig,
                        receive_type: str, lo_wf, rx_velocity,
                        max_depth: int = 4, coherent: bool = False,
                        time_sampling: str = 'fixed',
                        polarized: bool = False, elem_offsets=None):
    """Trace one wavefront of receive rays, splatting every transmitter
    connection into `adc`.  Returns (adc, stream).

    o, d: (n,3) receive ray; t_rx: (n,) absolute receive time [s];
    f_rx: (n,) sampled receive frequency [Hz]; ray_weight: (n,) receiver
    importance weight (aperture area/pdf terms).

    elem_offsets: (E,3) world-frame receive-element offsets from the ray
    origin (MIMO per-channel receive, BASELINE config 5; requires
    `coherent=True`).  The adc then carries 2E channels — element e
    accumulates the SAME path contribution with the extra phase of the
    exact spherical wavefront at its position: every connection of a lane
    shares the first path vertex x1, so the per-element path differs only
    in its last segment, delta_e = |x1 - (o + r_e)| - |x1 - o| (reduces to
    the plane-wave steering phase -k d.r_e in the far field).  This is the
    per-element data the reference's phased receiver sums ANALOGUELY into
    one ADC (`src/receivers/phasedreceiver.cpp:118-145,293`) — kept
    per-channel here so digital beamforming (dsp/beamform.py) runs on the
    cube.

    time_sampling:
      'fixed' — t_rx was drawn uniformly over the ADC window before tracing
        (the reference's `receive_sample` strategy, `integrator.cpp:1556`).
      'gate'  — deferred time-gated importance sampling (improvement over the
        reference): the scene is static, so geometry does not depend on
        t_rx; at every transmitter connection an EMISSION time is drawn
        uniformly within the waveform's pulse support and the receive time
        follows as t_emit + path delay (+ a PRI shift into the ADC window).
        Every path then contributes inside the pulse gate instead of
        (pulse_len / window) of them — ~window/pulse_len x effective spp for
        short pulses.  Requires window <= PRI.  Caller passes t_rx = 0.
    """
    n = o.shape[0]
    c = scene.band.c
    gate = time_sampling == 'gate'
    if polarized:
        assert not coherent, "polarized + coherent not supported together"
        # Accumulated Mueller chain of the rx-side path prefix (identity at
        # the receiver) and the transverse basis its input Stokes uses.
        # ADC gets 4 Stokes channels; S0 equals the unpolarized power
        # (matrices are M00-normalized, scalars stay in `throughput`).
        pol_M = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n, 4, 4))
        pol_b = _perp_basis(d)

    throughput = ray_weight
    active = jnp.ones((n,), bool)
    time = t_rx                                   # runs backward
    plen = m.ds(jnp.zeros((n,), jnp.float32))     # path length (double-single)
    # Doppler: cumulative factor D with f_received = f_emitted * D.
    # Receiver motion: physical arrival direction at rx is -d.
    dop = 1.0 + jnp.sum(d * rx_velocity[None, :], axis=-1) / c

    d_cur = d
    si = scene.ray_intersect(o, d)
    active &= si.valid
    emission_weight = jnp.ones((n,), jnp.float32)

    if elem_offsets is not None:
        assert coherent, "MIMO per-element receive needs coherent=True"
        # exact per-element last-segment path difference, anchored at the
        # first path vertex (shared by every connection of the lane)
        x1 = jnp.where(si.valid[:, None], si.p, o + d)
        r0 = jnp.linalg.norm(x1 - o, axis=-1)
        re = jnp.linalg.norm(x1[:, None, :] - (o[:, None, :]
                                               + elem_offsets[None]), axis=-1)
        elem_dd = re - r0[:, None]                       # (n, E) [m]
    else:
        elem_dd = None

    def elem_dphase(f_recv):
        if elem_dd is None:
            return None
        return -m.TwoPi * (f_recv / c)[:, None] * elem_dd

    t_off = t_rx - cfg.sampling_start

    def lo_freq(t):
        if lo_wf is None:
            return jnp.zeros_like(t)
        return lo_wf.inst_freq(t)

    def bin_freq(f_recv, t_rx_conn):
        """Frequency-axis bin coordinate per receive type (reference
        `integrator.cpp:1588-1625` + the mixer design comment `:1626-1636`):
        raw/raw_resample bin the received (Doppler-shifted) frequency;
        mix_resample bins the unsigned beat |f_recv - f_LO(t)|; mixer bins
        the signed lower-sideband beat f_LO(t) - f_recv (positive for a
        delayed echo of an up-chirp)."""
        if receive_type == 'mix_resample':
            return jnp.abs(f_recv - lo_freq(t_rx_conn))
        if receive_type == 'mixer':
            return lo_freq(t_rx_conn) - f_recv
        return f_recv

    def gate_times(tau, tx_row, u_g):
        """Deferred emission-time sample for connections with delay tau.
        Returns (t_emit, t_rx_conn, weight_factor, k_pri) where k_pri is the
        integer count of whole PRIs the receive time was shifted by."""
        wf = scene.transmitters.wf
        from ..radar.waveform import CW
        t_ext = wf.t_ext[tx_row]
        kind = wf.kind[tx_row]
        prf = wf.rep_freq[tx_row]
        window = cfg.sampling_time
        # CW: support is the whole window (equivalent to uniform sampling)
        is_cw = kind == CW
        sup = jnp.where(is_cw, window, t_ext)
        t_emit0 = jnp.where(is_cw, cfg.sampling_start - tau, 0.0) + u_g * sup
        t_recv = tau + t_emit0
        # shift by whole PRIs into the ADC window (window <= PRI assumed)
        k = jnp.ceil((cfg.sampling_start - t_recv) * prf)
        k = jnp.where(is_cw, 0.0, jnp.maximum(k, 0.0))
        t_recv = t_recv + k / jnp.maximum(prf, 1e-12)
        t_emit = t_emit0
        w = sup / window
        return t_emit, t_recv, w, k

    med = scene.medium

    for depth in range(max_depth):
        # -------- advance ray state to the hit (backward time) --------
        dt = jnp.where(active, si.t, 0.0)
        time = time - dt / c
        plen = m.ds_add_f(plen, dt)
        if med is not None:
            # ambient-medium absorption along the segment (two-way paths
            # accumulate the full exponent; replaces reference media for the
            # radar chain — atmosphere / water column).  attenuation(o, d,
            # dist) is uniform across media: gridded media integrate sigma
            # along the segment (dead lanes: dt = 0 -> exp(0))
            seg_o = si.p - d_cur * dt[:, None]
            throughput = throughput * med.attenuation(seg_o, d_cur, dt)

        seg_boundary = scene.band.boundary_phase   # per-reflection phase

        # -------- direct transmitter hit --------
        tx_idx = scene.transmitter_of(si.shape_idx)
        cos_hit = jnp.sum(-d_cur * si.n, axis=-1)
        hit_tx = active & (tx_idx >= 0)
        f_at_tx = f_rx / jnp.maximum(dop, 1e-6)
        if gate:
            u_g, stream = stream.next_1d()
            t_emit_hit, t_rx_hit, w_gate, k_hit = gate_times(
                -time, jnp.maximum(tx_idx, 0), u_g)
        else:
            t_emit_hit, t_rx_hit, w_gate, k_hit = time, t_rx, 1.0, 0.0
        w_hit, f_emit_hit = tx_eval(scene, tx_idx, si.p, -d_cur, cos_hit,
                                    t_emit_hit, f_at_tx,
                                    c / jnp.maximum(f_at_tx, 1e-6))
        f_recv_hit = f_emit_hit * dop
        val_hit = throughput * emission_weight * w_hit * w_gate
        if coherent:
            tx_row = jnp.maximum(tx_idx, 0)
            ph_hit = _echo_phase(scene, tx_row, lo_wf, plen, 0.0,
                                 t_emit_hit, k_hit, t_rx_hit,
                                 depth, seg_boundary)
        else:
            ph_hit = None
        if polarized:
            # unpolarized tx Stokes e0 through the accumulated chain
            val_hit = val_hit[:, None] * pol_M[:, :, 0]
            ok_hit = hit_tx & (val_hit[:, 0] != 0.0)
        else:
            ok_hit = hit_tx & (val_hit != 0.0)
        adc = _adc_splat(adc, cfg, t_rx_hit - cfg.sampling_start,
                         bin_freq(f_recv_hit, t_rx_hit), val_hit,
                         ok_hit, ph_hit, coherent,
                         elem_dphase=elem_dphase(f_recv_hit))

        # -------- NEE toward transmitters --------
        bsdf_idx = scene.bsdf_of(si.shape_idx)
        has_bsdf = bsdf_idx >= 0
        tex_idx = scene.bsdfs.texture_idx[jnp.maximum(bsdf_idx, 0)]
        # per-lane wavelength feeds spectral-curve reflectance (reference
        # evaluates textures at si.wavelengths — the ray's sampled lambda)
        refl_scale = texture_eval(scene.textures, tex_idx, si.uv, si.prim_idx,
                                  wl=c / jnp.maximum(f_rx, 1e-20))

        u_sel, stream = stream.next_1d()
        u_pos, stream = stream.next_2d()
        # Doppler of the connection vertex: arrival a = d_cur, departure = ds.d
        vel_here = scene.velocity_of(si.shape_idx)
        if gate:
            from ..radar.endpoints import tx_sample_geom
            ds, tx_row_g, cos_tx_g = tx_sample_geom(scene, si.p, u_sel, u_pos)
            tau_nee = -time + ds.dist / c
            u_g2, stream = stream.next_1d()
            t_emit_s, t_rx_nee, w_gate_nee, k_nee = gate_times(tau_nee,
                                                               tx_row_g, u_g2)
            ds, w_nee, f_emit_nee, t_emit, tx_row = tx_sample_direction(
                scene, si.p, time, f_rx / jnp.maximum(dop, 1e-6), u_sel, u_pos,
                t_emit_override=t_emit_s)
        else:
            ds, w_nee, f_emit_nee, t_emit, tx_row = tx_sample_direction(
                scene, si.p, time, f_rx / jnp.maximum(dop, 1e-6), u_sel, u_pos)
            t_rx_nee, w_gate_nee, k_nee = t_rx, 1.0, 0.0
        # per-connection Doppler: vertex bounce + tx motion
        dop_vtx = 1.0 + jnp.sum((ds.d - d_cur) * vel_here, axis=-1) / c
        tx_vel = scene.transmitters.velocity[tx_row]
        dop_tx = 1.0 - jnp.sum(ds.d * tx_vel, axis=-1) / c
        dop_conn = dop * dop_vtx * dop_tx
        f_recv_nee = f_emit_nee * dop_conn

        spawn_o = si.spawn_origin(ds.d)
        occluded = scene.ray_test(spawn_o, ds.d, ds.dist)
        wo_nee = si.to_local(ds.d)
        # spectral reflectance of the NEE vertex at the connection's ACTUAL
        # frequency: for delta-resampled transmitters f_emit is the chirp's
        # instantaneous frequency, not the lane's receiver-sampled one (the
        # reference evaluates at the ray's lambda — an approximation; same
        # cost either way here, so take the exact value)
        refl_nee = texture_eval(scene.textures, tex_idx, si.uv, si.prim_idx,
                                wl=c / jnp.maximum(f_recv_nee, 1e-20))
        sgn_geo = _side_sign(si)
        f_b, pdf_b_nee = bsdf_eval_pdf(scene.bsdfs, bsdf_idx,
                                       _flip_z(si.wi, sgn_geo),
                                       _flip_z(wo_nee, sgn_geo), refl_nee)
        mis = m.mis_weight(ds.pdf, pdf_b_nee)
        nee_ok = active & has_bsdf & ~occluded & (ds.pdf > 0.0)
        val_nee = throughput * f_b[:, 0] * w_nee * mis * w_gate_nee
        if med is not None:
            val_nee = val_nee * med.attenuation(si.p, ds.d, ds.dist)
        if coherent:
            ph_nee = _echo_phase(scene, tx_row, lo_wf, plen, ds.dist,
                                 t_emit, k_nee, t_rx_nee,
                                 depth + 1, seg_boundary)
        else:
            ph_nee = None
        if polarized:
            # the NEE vertex scatters tx light toward the rx-side segment
            m_nee, _ = _vertex_mueller(scene, bsdf_idx, d_cur, ds.d, pol_b)
            val_nee = val_nee[:, None] * (pol_M @ m_nee)[:, :, 0]
            ok_nee = nee_ok & (val_nee[:, 0] != 0.0)
        else:
            ok_nee = nee_ok & (val_nee != 0.0)
        adc = _adc_splat(adc, cfg, t_rx_nee - cfg.sampling_start,
                         bin_freq(f_recv_nee, t_rx_nee), val_nee,
                         ok_nee, ph_nee, coherent,
                         elem_dphase=elem_dphase(f_recv_nee))

        if depth == max_depth - 1:
            break

        # -------- BSDF continuation --------
        u_lobe, stream = stream.next_1d()
        u_dir, stream = stream.next_2d()
        wo, w_b, pdf_b, is_delta, _ = bsdf_sample(scene.bsdfs, bsdf_idx,
                                                  _flip_z(si.wi, sgn_geo),
                                                  u_lobe, u_dir, refl_scale)
        throughput = jnp.where(active, throughput * w_b[:, 0], throughput)
        alive = active & has_bsdf & (pdf_b > 0.0) & (throughput != 0.0)

        d_new = si.to_world(_flip_z(wo, sgn_geo))
        if polarized:
            # extend the accumulated Mueller chain through this bounce; the
            # chain's new input basis is the bounce's s/p frame on the
            # tx-side segment
            m_b, s_ax = _vertex_mueller(scene, bsdf_idx, d_cur, d_new, pol_b)
            pol_M = jnp.where(alive[:, None, None], pol_M @ m_b, pol_M)
            pol_b = jnp.where(alive[:, None], s_ax, pol_b)
        # bounce Doppler for the continued path
        dop = dop * (1.0 + jnp.sum((d_new - d_cur) * vel_here, axis=-1) / c)
        o_new = si.spawn_origin(d_new)
        si2 = scene.ray_intersect(o_new, d_new)

        # MIS weight for a transmitter hit on the continued ray
        tx2 = scene.transmitter_of(si2.shape_idx)
        cos2 = jnp.sum(-d_new * si2.n, axis=-1)
        pdf_tx = tx_pdf_direction(scene, tx2, si2.t, cos2)
        emission_weight = jnp.where(is_delta, 1.0, m.mis_weight(pdf_b, pdf_tx))

        active = alive & si2.valid
        si = si2
        d_cur = d_new

    return adc, stream


def _h_cycles(kind, fc_x, t_ext, f_ext, tm_ds, fc_ref_ds):
    """Small-argument waveform cycles h(tm) = g(tm) - fc_ref*tm (mod 1).

    g is the folded carrier/chirp cycle count of `Waveform.phase`
    (waveform.py:72-80); subtracting the fc_ref*tm pivot removes the only
    term whose f32 rounding exceeds a cycle at MMW frequencies.  `tm_ds` is
    the folded time as a double-single pair — the chirp's quadratic term has
    sensitivity s*dtc up to sweep/2 Hz, so even ulp(tm) matters.  Every
    product is an error-free two_prod of the (rounded) inputs:
      tone:  (fc_x - fc_ref) * tm
      chirp: (fc_x - fc_ref) * tm - fc_x*ti + 0.5*s*(tm - ti)^2
    """
    from ..radar.waveform import LINFMCW
    tm_hi, tm_lo = tm_ds
    fr_hi, fr_lo = fc_ref_ds
    # delta-f as a ds pair: (fc_x - hi) is Sterbenz-exact when close
    df_hi = fc_x - fr_hi
    p, e = m.two_prod(df_hi, tm_hi)
    cyc = (p - jnp.floor(p)) + (e + df_hi * tm_lo - fr_lo * (tm_hi + tm_lo))

    ti = 0.5 * t_ext
    s = f_ext / jnp.maximum(t_ext, 1e-12)
    d0, e0 = m.two_sum(tm_hi, -ti)
    dtc_hi, dtc_lo = d0, e0 + tm_lo
    p2, e2 = m.two_prod(fc_x, ti)
    sd_hi, sd_lo = m.two_prod(s, dtc_hi)
    q_hi, q_lo = m.two_prod(sd_hi, 0.5 * dtc_hi)
    chirp_extra = ((q_hi - jnp.floor(q_hi)) + q_lo
                   + 0.5 * sd_lo * dtc_hi + sd_hi * dtc_lo
                   - ((p2 - jnp.floor(p2)) + e2))
    cyc = cyc + jnp.where(kind == LINFMCW, chirp_extra, 0.0)
    return cyc - jnp.floor(cyc)


def _echo_phase(scene, tx_row, lo_wf, plen_ds, extra_dist, t_emit, k_pri,
                t_recv, n_boundary, boundary_phase):
    """Coherent baseband phase of one transmitter connection [rad].

    Mathematically identical (mod 2 pi) to
    `wf.phase(t_emit) - ref_phase(t_recv)` but computed from the
    propagation delay tau = (plen + extra_dist)/c, which is known to
    ~2^-46 relative through the double-single path length — the direct
    time difference loses whole cycles at MMW (f * ulp(t_recv) ~= 5.6
    cycles at 94 GHz with millisecond receive times; VERDICT weak #7).

    Decomposition (cycles, everything mod 1):
      phi0_tx - phi0_lo + h_tx(tm_e) - h_lo(tm_r)
        - frac(fc_ref * tau) - (m_e + k_pri) * frac(fc_ref * PRI_tx)
        + m_r * frac(fc_ref * PRI_lo)
    with tm/m the PRI folds of emission/receive time, fc_ref the static
    band centre, and every big product an exact two_prod (core/math.py).
    `k_pri` is the whole-PRI shift gate mode applied to t_recv (0 fixed).
    """
    band = scene.band
    c = band.c
    fc_ref = 0.5 * (band.freq_min + band.freq_max)   # static python f64
    fc_ref_ds = m.ds_const(fc_ref)

    wfr = jax.tree_util.tree_map(lambda x: x[tx_row], scene.transmitters.wf)
    prf = jnp.maximum(wfr.rep_freq, 1e-12)
    pri = 1.0 / prf

    # tau cycles at fc_ref from the compensated path length
    acc = m.wlfrac_zero(plen_ds[0].shape)
    inv_wl = m.ds_const(fc_ref / c)                  # 1/lambda_ref, exact ds
    acc = m.wlfrac_add_dist(acc, plen_ds[0], inv_wl)
    acc = m.wlfrac_add_dist(acc, extra_dist, inv_wl)
    # low word separately: adding it to extra_dist first would round it away
    acc = m.wlfrac_add_dist(acc, plen_ds[1], inv_wl)
    cyc_tau = m._frac_renorm(*acc)[0]

    # emission fold
    m_e = jnp.floor(t_emit * prf)
    tm_e = t_emit - m_e * pri
    cyc = (wfr.phi0 * jnp.float32(m.InvTwoPi)
           + _h_cycles(wfr.kind, wfr.f_centre, wfr.t_ext, wfr.f_ext,
                       (tm_e, jnp.zeros_like(tm_e)), fc_ref_ds)
           - cyc_tau
           - (m_e + k_pri) * m.cyc_frac_prod(fc_ref_ds, pri))

    if lo_wf is not None:
        prf_lo = jnp.maximum(lo_wf.rep_freq, 1e-12)
        pri_lo = 1.0 / prf_lo
        m_r = jnp.floor(t_recv * prf_lo)
        tm_r0 = t_recv - m_r * pri_lo
        # high-precision receive fold: when tau + tm_e - tm_r is a whole
        # number of LO PRIs (matched dechirp), rebuild tm_r from the ds
        # delay so h_lo sees a sub-wavelength-accurate argument
        tau_f = (plen_ds[0] + plen_ds[1] + extra_dist) / c
        jr = (tau_f + tm_e - tm_r0) * prf_lo
        j = jnp.round(jr)
        tau_ds = m.ds_mul(m.ds_add_f(plen_ds, extra_dist),
                          m.ds_const(1.0 / c))
        jp_hi, jp_lo = m.two_prod(j, pri_lo)
        delta = m.ds_add(tau_ds, (-jp_hi, -jp_lo))
        hp_hi, hp_e = m.two_sum(tm_e, delta[0])
        hp = (hp_hi, hp_e + delta[1])
        use_hp = jnp.abs(jr - j) < 1e-3
        tm_r = (jnp.where(use_hp, hp[0], tm_r0),
                jnp.where(use_hp, hp[1], 0.0))
        cyc = (cyc
               - lo_wf.phi0 * jnp.float32(m.InvTwoPi)
               - _h_cycles(lo_wf.kind, lo_wf.f_centre, lo_wf.t_ext,
                           lo_wf.f_ext, tm_r, fc_ref_ds)
               + m_r * m.cyc_frac_prod(fc_ref_ds, pri_lo))

    cyc = cyc + n_boundary * (boundary_phase * jnp.float32(m.InvTwoPi))
    return m.TwoPi * (cyc - jnp.floor(cyc))


def _prop_phase(plen, wavelength, n_bounces, boundary_phase):
    """Propagation + boundary phase from the compensated path length."""
    inv = m.ds_inv(wavelength)
    acc = m.wlfrac_zero(plen[0].shape)
    # single "distance" add of the accumulated (hi, lo) pair
    acc = m.wlfrac_add_dist(acc, plen[0], inv)
    acc = m.wlfrac_add_dist(acc, plen[1], inv)
    acc = m.wlfrac_add_phase(acc, jnp.asarray(n_bounces * boundary_phase,
                                              jnp.float32))
    return m.wlfrac_phase(acc)


# ---------------------------------------------------------------------------
# Film-mode path-length tracer (reference pathlength/pathtime + range/time
# binning wrappers)
# ---------------------------------------------------------------------------


def pathlength_histogram(scene: SceneData, stream: SampleStream, o, d,
                         ray_weight, grid, pixel_idx, n_bins: int,
                         bin_width: float, quantity: str = 'length',
                         max_depth: int = 4, rfilter: int = film_mod.TENT):
    """Trace optical paths (NEE against EMITTERS) and histogram each
    contribution by total path length, time (= length/c), or phase
    (= 2 pi frac(length/lambda_centre), the reference `phase` integrator,
    `src/integrators/phase.cpp:79-130`; use bin_width = 2*pi/n_bins).

    Re-expresses `range` over `pathlength` (`src/integrators/range.cpp:
    136-161` + `pathlength.cpp:114-325`) and `time` over `pathtime`
    (`time.cpp:134-167`): instead of AOV channel bins compiled into the
    wrapper, contributions scatter-add into `grid` of shape
    (n_pixels, n_bins, 3) at their exact fractional bin.

    pixel_idx: (n,) int32 flat pixel id per lane.
    """
    from .. import emitters as em_mod

    n = o.shape[0]
    em = scene.emitters
    scale = 1.0 / scene.band.c if quantity == 'time' else 1.0
    if quantity == 'phase':
        inv_wl = m.ds_inv(jnp.float32(scene.band.wavelength_centre))

    throughput = ray_weight[:, None] * jnp.ones((n, 3), jnp.float32)
    active = jnp.ones((n,), bool)
    plen = jnp.zeros((n,), jnp.float32)

    d_cur = d
    si = scene.ray_intersect(o, d)
    active &= si.valid
    em_weight = jnp.ones((n,), jnp.float32)

    def put(grid, value, length, ok):
        if quantity == 'phase':
            acc_ph = m.wlfrac_add_dist(m.wlfrac_zero(length.shape),
                                       length, inv_wl)
            b = m.wlfrac_phase(acc_ph) / bin_width
        else:
            b = length * scale / bin_width
        x = jnp.zeros_like(b)
        pos = jnp.stack([x, b], -1)
        # reuse film splat over a (n_pixels*n_bins, 1) virtual image per pixel:
        # do it directly with tent weights over the bin axis
        b0 = jnp.floor(b - 0.5).astype(jnp.int32)
        for db in (0, 1):
            bi = b0 + db
            w = film_mod.filter_eval(rfilter, bi.astype(jnp.float32) + 0.5 - b)
            okb = ok & (bi >= 0) & (bi < n_bins) & (w > 0)
            idx = pixel_idx * n_bins + jnp.clip(bi, 0, n_bins - 1)
            contrib = jnp.concatenate([value[:, :1] * w[:, None],
                                       w[:, None], jnp.ones((n, 1))], -1)
            contrib = jnp.where(okb[:, None], contrib, 0.0)
            grid = grid.reshape(-1, grid.shape[-1]).at[idx].add(contrib).reshape(grid.shape)
        return grid

    for depth in range(max_depth):
        dt = jnp.where(active, si.t, 0.0)
        plen = plen + dt

        # direct emitter hit
        em_idx = scene.emitter_of(si.shape_idx)
        cos_hit = jnp.sum(-d_cur * si.n, axis=-1)
        L_hit = em_mod.eval_hit(em, em_idx, cos_hit)
        val = throughput * em_weight[:, None] * L_hit
        grid = put(grid, val, plen, active & jnp.any(val != 0, -1))

        # NEE
        bsdf_idx = scene.bsdf_of(si.shape_idx)
        tex_idx = scene.bsdfs.texture_idx[jnp.maximum(bsdf_idx, 0)]
        refl_scale = texture_eval(scene.textures, tex_idx, si.uv, si.prim_idx)
        u_sel, stream = stream.next_1d()
        u_pos, stream = stream.next_2d()
        ds, w_em, _ = em_mod.sample_direction(em, scene.shapes, si.p, u_sel, u_pos)
        spawn_o = si.spawn_origin(ds.d)
        occluded = scene.ray_test(spawn_o, ds.d, ds.dist)
        wo_nee = si.to_local(ds.d)
        sgn_geo = _side_sign(si)
        f_nee, pdf_bn = bsdf_eval_pdf(scene.bsdfs, bsdf_idx,
                                      _flip_z(si.wi, sgn_geo),
                                      _flip_z(wo_nee, sgn_geo), refl_scale)
        mis = jnp.where(ds.delta, 1.0, m.mis_weight(ds.pdf, pdf_bn))
        ok = active & ~occluded & (ds.pdf > 0.0)
        val = throughput * f_nee * w_em * mis[:, None]
        grid = put(grid, val, plen + ds.dist, ok & jnp.any(val != 0, -1))

        if depth == max_depth - 1:
            break

        u_lobe, stream = stream.next_1d()
        u_dir, stream = stream.next_2d()
        wo, w_b, pdf_b, is_delta, _ = bsdf_sample(scene.bsdfs, bsdf_idx,
                                                  _flip_z(si.wi, sgn_geo),
                                                  u_lobe, u_dir, refl_scale)
        throughput = jnp.where(active[:, None], throughput * w_b, throughput)
        alive = active & (pdf_b > 0.0) & jnp.any(throughput != 0, -1)
        d_new = si.to_world(_flip_z(wo, sgn_geo))
        o_new = si.spawn_origin(d_new)
        si2 = scene.ray_intersect(o_new, d_new)
        em2 = scene.emitter_of(si2.shape_idx)
        cos2 = jnp.sum(-d_new * si2.n, axis=-1)
        pdf_em = em_mod.pdf_direction_area(em, scene.shapes, em2, d_new,
                                           si2.t, cos2)
        em_weight = jnp.where(is_delta, 1.0, m.mis_weight(pdf_b, pdf_em))
        active = alive & si2.valid
        si = si2
        d_cur = d_new

    return grid, stream
