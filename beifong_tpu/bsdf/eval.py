"""Wavefront BSDF evaluation/sampling with masked type dispatch.

One fused computation per lobe family, `jnp.where`-selected by the per-lane
BSDF type — the TPU-native replacement for the reference's per-plugin virtual
`BSDF::eval/sample/pdf` (`include/mitsuba/render/bsdf.h`).  All directions are
in the local shading frame (+z = normal); values include the cosine
foreshortening factor, matching Mitsuba convention.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.math import Pi, InvPi, safe_sqrt, normalize
from ..core import warp
from .tables import (BSDFTable, DIFFUSE, CONDUCTOR, ROUGH_CONDUCTOR, DIELECTRIC,
                     THIN_DIELECTRIC, PLASTIC, ROUGH_PLASTIC, NULL, MASK, BLEND,
                     ROUGH_DIELECTRIC, MEASURED)


def fresnel_conductor(cos_i, eta, k):
    """Unpolarized conductor Fresnel reflectance; eta,k shape (...,C)."""
    c = jnp.abs(cos_i)[..., None]
    c2 = c * c
    s2 = 1.0 - c2
    e2 = eta * eta
    k2 = k * k
    t0 = e2 - k2 - s2
    a2b2 = safe_sqrt(t0 * t0 + 4.0 * e2 * k2)
    t1 = a2b2 + c2
    a = safe_sqrt(0.5 * (a2b2 + t0))
    t2 = 2.0 * a * c
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
    return 0.5 * (rs + rp)


def fresnel_dielectric(cos_i, eta):
    """Unpolarized dielectric Fresnel reflectance + cos of transmitted angle.
    eta = n_transmitted/n_incident for cos_i>0 side; handles both sides."""
    out = cos_i >= 0.0
    rcp_eta = 1.0 / eta
    eta_it = jnp.where(out, eta, rcp_eta)
    c2t = 1.0 - (1.0 - cos_i * cos_i) / (eta_it * eta_it)
    tir = c2t <= 0.0
    cos_t = safe_sqrt(c2t)
    ci = jnp.abs(cos_i)
    rs = (ci - eta_it * cos_t) / jnp.maximum(ci + eta_it * cos_t, 1e-20)
    rp = (eta_it * ci - cos_t) / jnp.maximum(eta_it * ci + cos_t, 1e-20)
    F = jnp.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))
    return F, cos_t, eta_it


def ggx_ndf(h, alpha):
    ct = h[..., 2]
    a2 = alpha * alpha
    d = ct * ct * (a2 - 1.0) + 1.0
    return jnp.where(ct > 0.0, a2 / jnp.maximum(Pi * d * d, 1e-20), 0.0)


def ggx_g1(v, alpha):
    ct = jnp.abs(v[..., 2])
    a2 = alpha * alpha
    t2 = (1.0 - ct * ct) / jnp.maximum(ct * ct, 1e-12)
    return 2.0 / (1.0 + jnp.sqrt(1.0 + a2 * t2))


def _reflect(wi, h):
    return 2.0 * jnp.sum(wi * h, axis=-1, keepdims=True) * h - wi


def _gather(table: BSDFTable, idx):
    i = jnp.maximum(idx, 0)
    return dict(type=table.type[i], refl=table.reflectance[i], alpha=table.alpha[i],
                eta=table.eta[i], k=table.k[i], twosided=table.twosided[i],
                weight=table.weight[i], nested0=table.nested0[i],
                nested1=table.nested1[i], texture_idx=table.texture_idx[i])


def _resolve_nested(table: BSDFTable, idx, u):
    """One level of MASK/BLEND indirection: returns (effective idx, scale,
    passthrough_mask).  MASK: with prob (1-opacity) pass straight through
    (null transmission); BLEND: pick nested lobe by weight."""
    g = _gather(table, idx)
    is_mask = g['type'] == MASK
    is_blend = g['type'] == BLEND
    pass_through = is_mask & (u >= g['weight'])
    idx2 = jnp.where(is_mask & ~pass_through, g['nested0'], idx)
    pick1 = is_blend & (u >= g['weight'])
    idx2 = jnp.where(is_blend, jnp.where(pick1, g['nested1'], g['nested0']), idx2)
    return idx2, pass_through


def bsdf_eval_pdf(table: BSDFTable, idx, wi, wo, refl_scale=None):
    """Evaluate f(wi,wo)*cos(theta_o) and the sampling pdf for NEE/MIS.

    wi, wo: (n,3) local directions.  Delta lobes return (0, 0).
    `refl_scale` optionally modulates the reflectance (texture lookup result).
    Handles one level of BLEND (both lobes evaluated); MASK evaluates the
    nested lobe scaled by opacity.
    """
    # static short-circuit: no mask/blend rows -> single basic evaluation
    if table.present and not ({MASK, BLEND} & set(table.present)):
        return _eval_pdf_basic(table, idx, wi, wo, refl_scale)
    g = _gather(table, idx)
    is_blend = g['type'] == BLEND
    is_mask = g['type'] == MASK
    nested_any = is_blend | is_mask
    idx_a = jnp.where(nested_any, g['nested0'], idx)
    f_a, pdf_a = _eval_pdf_basic(table, idx_a, wi, wo, refl_scale)
    f_b, pdf_b = _eval_pdf_basic(table, jnp.where(is_blend, g['nested1'], idx_a),
                                 wi, wo, refl_scale)
    w = g['weight']
    f = jnp.where(is_blend[..., None], w[..., None] * f_a + (1 - w[..., None]) * f_b,
                  jnp.where(is_mask[..., None], w[..., None] * f_a, f_a))
    pdf = jnp.where(is_blend, w * pdf_a + (1 - w) * pdf_b,
                    jnp.where(is_mask, w * pdf_a, pdf_a))
    return f, pdf


def _eval_pdf_basic(table: BSDFTable, idx, wi, wo, refl_scale):
    g = _gather(table, idx)
    refl = g['refl'] if refl_scale is None else g['refl'] * refl_scale
    ci, co = wi[..., 2], wo[..., 2]
    front = (ci > 0.0) & (co > 0.0)
    # For twosided materials, flip to the upper hemisphere when hit from behind
    flip = g['twosided'] & (ci < 0.0)
    s = jnp.where(flip, -1.0, 1.0)[..., None]
    wi_f, wo_f = wi * s, wo * s
    ci_f, co_f = wi_f[..., 2], wo_f[..., 2]
    both_up = (ci_f > 0.0) & (co_f > 0.0)

    # --- diffuse ---
    f_diff = refl * InvPi * jnp.maximum(co_f, 0.0)[..., None]
    pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo_f)

    # static fast path: diffuse-only scene (typical radar) skips every
    # other lobe family entirely
    if table.present and set(table.present) <= {DIFFUSE}:
        live = jnp.where(g['twosided'], both_up, front)
        return (jnp.where(live[..., None], f_diff, 0.0),
                jnp.where(live, pdf_diff, 0.0))

    # --- rough conductor (GGX) ---
    h = normalize(wi_f + wo_f)
    h = h * jnp.sign(h[..., 2:3])
    D = ggx_ndf(h, g['alpha'])
    G = ggx_g1(wi_f, g['alpha']) * ggx_g1(wo_f, g['alpha'])
    F = fresnel_conductor(jnp.sum(wi_f * h, axis=-1), g['eta'], g['k'])
    denom = jnp.maximum(4.0 * ci_f, 1e-8)
    f_rc = refl * F * (D * G / denom)[..., None]
    doth = jnp.abs(jnp.sum(wo_f * h, axis=-1))
    pdf_rc = D * jnp.abs(h[..., 2]) / jnp.maximum(4.0 * doth, 1e-8)

    # --- (rough) plastic: diffuse base * (1-F_i)(1-F_o) + GGX coat ---
    Fi, _, _ = fresnel_dielectric(ci_f, g['eta'][..., 0])
    Fo, _, _ = fresnel_dielectric(co_f, g['eta'][..., 0])
    f_pl_diff = refl * InvPi * jnp.maximum(co_f, 0.0)[..., None] \
        * ((1.0 - Fi) * (1.0 - Fo))[..., None]
    Fh, _, _ = fresnel_dielectric(jnp.sum(wi_f * h, axis=-1), g['eta'][..., 0])
    f_rpl = f_pl_diff + (Fh * D * G / denom)[..., None]
    spec_w = jnp.clip(Fi, 0.05, 0.95)
    pdf_rpl = (1 - spec_w) * pdf_diff + spec_w * pdf_rc

    # --- rough dielectric (GGX glass): reflection + transmission lobes,
    #     evaluated in the UNflipped frame (transmission crosses sides) ---
    eta_s = g['eta'][..., 0]
    ci_u, co_u = wi[..., 2], wo[..., 2]
    same_side = ci_u * co_u > 0.0
    eta_it_u = jnp.where(ci_u > 0.0, eta_s, 1.0 / eta_s)
    # reflection half-vector
    h_r = normalize(wi + wo)
    h_r = h_r * jnp.sign(h_r[..., 2:3])
    # transmission half-vector: -(wi + eta wo) normalized (Walter 2007)
    h_t = normalize(-(wi + wo * eta_it_u[..., None]))
    h_t = h_t * jnp.sign(h_t[..., 2:3])
    h_d = jnp.where(same_side[..., None], h_r, h_t)
    D_d = ggx_ndf(h_d, g['alpha'])
    G_d = ggx_g1(wi, g['alpha']) * ggx_g1(wo, g['alpha'])
    idoth = jnp.sum(wi * h_d, axis=-1)
    odoth = jnp.sum(wo * h_d, axis=-1)
    F_d, _, _ = fresnel_dielectric(idoth, eta_s)
    aci = jnp.maximum(jnp.abs(ci_u), 1e-6)
    f_rd_refl = (F_d * D_d * G_d / (4.0 * aci))
    denom_t = idoth + eta_it_u * odoth
    jac_t = (eta_it_u * eta_it_u * jnp.abs(odoth)
             / jnp.maximum(denom_t * denom_t, 1e-12))
    f_rd_trans = ((1.0 - F_d) * D_d * G_d * jnp.abs(idoth) * jac_t
                  / aci) / (eta_it_u * eta_it_u)
    f_rd = jnp.where(same_side, f_rd_refl, f_rd_trans)[..., None] \
        * jnp.where(same_side[..., None], refl, g['k'])
    pdf_h = D_d * jnp.abs(h_d[..., 2])
    # transmission: jac_t already IS |dw_h/dw_o| (Walter 2007 eq. 17) —
    # no extra 1/|odoth| (that factor belongs to the reflection Jacobian
    # 1/(4|odoth|) only); verified against the sampler by quadrature
    pdf_rd = jnp.where(same_side,
                       F_d * pdf_h / jnp.maximum(4.0 * jnp.abs(odoth), 1e-8),
                       (1.0 - F_d) * pdf_h * jac_t)
    # Walter's chi+ sidedness (eq. 27/34): each direction must lie on the
    # same side of the microfacet as of the macro normal — kills
    # reflection samples that cross the surface (and vice versa), making
    # sample()'s density and this pdf agree on the support of f
    chi_rd = (idoth * ci_u > 0.0) & (odoth * co_u > 0.0)
    valid_rd = (jnp.abs(ci_u) > 1e-6) & chi_rd

    typ = g['type']
    f = jnp.where((typ == DIFFUSE)[..., None], f_diff,
        jnp.where((typ == ROUGH_CONDUCTOR)[..., None], f_rc,
        jnp.where((typ == PLASTIC)[..., None], f_pl_diff,
        jnp.where((typ == ROUGH_PLASTIC)[..., None], f_rpl, 0.0))))
    pdf = jnp.where(typ == DIFFUSE, pdf_diff,
          jnp.where(typ == ROUGH_CONDUCTOR, pdf_rc,
          jnp.where(typ == PLASTIC, (1 - spec_w) * pdf_diff,
          jnp.where(typ == ROUGH_PLASTIC, pdf_rpl, 0.0))))

    # --- measured (tabulated isotropic BRDF): nearest-cell lookup over
    #     (theta_i, theta_o, delta_phi); cosine-hemisphere sampling pdf ---
    if MEASURED in table.present and table.measured_grid is not None:
        gm = table.measured_grid
        nti, nto, ndp = gm.shape[:3]
        half_pi = 0.5 * Pi
        ti = jnp.arccos(jnp.clip(ci_f, 0.0, 1.0))
        to = jnp.arccos(jnp.clip(co_f, 0.0, 1.0))
        phi_i = jnp.arctan2(wi_f[..., 1], wi_f[..., 0])
        phi_o = jnp.arctan2(wo_f[..., 1], wo_f[..., 0])
        dphi = jnp.abs(phi_o - phi_i)
        dphi = jnp.where(dphi > Pi, 2 * Pi - dphi, dphi)
        ii = jnp.clip((ti / half_pi * nti).astype(jnp.int32), 0, nti - 1)
        io = jnp.clip((to / half_pi * nto).astype(jnp.int32), 0, nto - 1)
        ip = jnp.clip((dphi / Pi * ndp).astype(jnp.int32), 0, ndp - 1)
        f_meas = gm[ii, io, ip] * refl * jnp.maximum(co_f, 0.0)[..., None]
        is_meas = typ == MEASURED
        f = jnp.where(is_meas[..., None], f_meas, f)
        pdf = jnp.where(is_meas, pdf_diff, pdf)

    live = jnp.where(g['twosided'], both_up, front)
    f = jnp.where(live[..., None], f, 0.0)
    pdf = jnp.where(live, pdf, 0.0)
    # rough dielectric bypasses the hemisphere gating (transmits)
    is_rd = typ == ROUGH_DIELECTRIC
    f = jnp.where(is_rd[..., None], jnp.where(valid_rd[..., None], f_rd, 0.0), f)
    pdf = jnp.where(is_rd, jnp.where(valid_rd, pdf_rd, 0.0), pdf)
    return f, pdf


def bsdf_sample(table: BSDFTable, idx, wi, u_lobe, u_dir, refl_scale=None):
    """Sample an outgoing direction.

    Returns (wo_local, weight=(f*cos/pdf) (n,C), pdf, is_delta, eta_scale).
    """
    idx, pass_through = _resolve_nested(table, idx, u_lobe)
    g = _gather(table, idx)
    refl = g['refl'] if refl_scale is None else g['refl'] * refl_scale
    ci = wi[..., 2]

    # static fast path: diffuse-only scene
    if table.present and set(table.present) <= {DIFFUSE}:
        flip_d = g['twosided'] & (ci < 0.0)
        s_d = jnp.where(flip_d, -1.0, 1.0)[..., None]
        wo_d = warp.square_to_cosine_hemisphere(u_dir) * s_d
        f_s, pdf_s = _eval_pdf_basic(table, idx, wi, wo_d, refl_scale)
        w_s = f_s / jnp.maximum(pdf_s, 1e-20)[..., None]
        live_d = pdf_s > 0.0
        return (wo_d, jnp.where(live_d[..., None], w_s, 0.0), pdf_s,
                jnp.zeros_like(live_d), jnp.ones_like(pdf_s))
    flip = g['twosided'] & (ci < 0.0)
    s = jnp.where(flip, -1.0, 1.0)[..., None]
    wi_f = wi * s
    ci_f = wi_f[..., 2]
    typ = g['type']

    # Diffuse / plastic base: cosine hemisphere
    wo_diff = warp.square_to_cosine_hemisphere(u_dir)

    # GGX: sample half-vector, reflect
    h = warp.square_to_ggx(u_dir, g['alpha'])
    wo_ggx = _reflect(wi_f, h)

    # Smooth conductor: mirror
    wo_mirror = jnp.stack([-wi_f[..., 0], -wi_f[..., 1], wi_f[..., 2]], axis=-1)

    # Smooth dielectric: reflect or refract by Fresnel
    F, cos_t, eta_it = fresnel_dielectric(ci, g['eta'][..., 0])
    do_reflect = u_lobe < F   # reuse lobe u (independent enough per-dim stream)
    wo_refl_d = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
    scale = 1.0 / eta_it
    wo_refr = jnp.stack([-wi[..., 0] * scale, -wi[..., 1] * scale,
                         -jnp.sign(ci) * cos_t], axis=-1)
    wo_diel = jnp.where(do_reflect[..., None], wo_refl_d, wo_refr)
    # radiance scaling on refraction (solid-angle compression)
    eta_sc = jnp.where((typ == DIELECTRIC) & ~do_reflect, 1.0 / eta_it, 1.0)

    # Plastic lobe choice
    Fi, _, _ = fresnel_dielectric(ci_f, g['eta'][..., 0])
    spec_w = jnp.clip(Fi, 0.05, 0.95)
    pick_spec = u_lobe < spec_w
    is_rpl = typ == ROUGH_PLASTIC
    is_pl = typ == PLASTIC
    wo_pl = jnp.where((is_rpl & pick_spec)[..., None], wo_ggx,
                      jnp.where((is_pl & pick_spec)[..., None], wo_mirror, wo_diff))

    # Rough dielectric: reflect/refract through the sampled microfacet
    # (unflipped frame, h oriented toward wi's side).  The relative IOR is
    # picked by the GEOMETRIC side wi came from (sign of ci), not by
    # wi.h_u (always >= 0 since h_u rides wi's hemisphere) — otherwise
    # back-face hits refract as if ENTERING the medium while the eval-side
    # pdf reconstructs h with the exiting eta, and the hit-arm weight
    # f/pdf is taken against the wrong sampling density (a ~eta^2 bias).
    h_u = h * jnp.where(ci < 0.0, -1.0, 1.0)[..., None]
    idoth_u = jnp.sum(wi * h_u, axis=-1)
    F_rd, cos_t_h, eta_it_h = fresnel_dielectric(
        idoth_u * jnp.where(ci >= 0.0, 1.0, -1.0), g['eta'][..., 0])
    refl_rd = u_lobe < F_rd
    wo_rd_refl = _reflect(wi, h_u)
    inv_eta = 1.0 / eta_it_h
    wo_rd_refr = normalize((inv_eta * jnp.abs(idoth_u) - cos_t_h)[..., None]
                           * h_u * jnp.sign(idoth_u)[..., None]
                           - wi * inv_eta[..., None])
    wo_rd = jnp.where(refl_rd[..., None], wo_rd_refl, wo_rd_refr)
    is_rd = typ == ROUGH_DIELECTRIC
    # sampling-side chi+ rejection (mirrors the microfacet convention of
    # `roughdielectric.cpp::sample`): the picked lobe must land on its own
    # side, and both directions must agree with the SAMPLED h (h rides the
    # upper hemisphere; its sidedness vs wi/wo uses the +z orientation).
    # Without this, reflect-picked lanes that cross the surface get
    # evaluated as transmission at a density the pdf doesn't describe.
    co_rd = wo_rd[..., 2]
    rd_side_ok = jnp.where(refl_rd, ci * co_rd > 0.0, ci * co_rd < 0.0)
    rd_chi = ((jnp.sum(wi * h, axis=-1) * ci > 0.0)
              & (jnp.sum(wo_rd * h, axis=-1) * co_rd > 0.0))
    rd_ok = rd_side_ok & rd_chi

    wo_f = jnp.where((typ == DIFFUSE)[..., None], wo_diff,
           jnp.where((typ == ROUGH_CONDUCTOR)[..., None], wo_ggx,
           jnp.where((typ == CONDUCTOR)[..., None], wo_mirror,
           jnp.where((is_pl | is_rpl)[..., None], wo_pl, wo_diff))))
    wo = wo_f * s
    wo = jnp.where(is_rd[..., None], wo_rd, wo)
    # Dielectric/thin/null operate in the unflipped frame
    wo = jnp.where((typ == DIELECTRIC)[..., None], wo_diel, wo)
    wo = jnp.where((typ == THIN_DIELECTRIC)[..., None],
                   jnp.where(do_reflect[..., None], wo_refl_d, -wi), wo)
    wo = jnp.where(((typ == NULL)[..., None]) | pass_through[..., None], -wi, wo)

    is_delta = (typ == CONDUCTOR) | (typ == DIELECTRIC) | (typ == THIN_DIELECTRIC) \
        | (typ == NULL) | pass_through

    # Weights
    f_s, pdf_s = _eval_pdf_basic(table, idx, wi, wo, refl_scale)
    w_smooth = f_s / jnp.maximum(pdf_s, 1e-20)[..., None]

    Fc = fresnel_conductor(jnp.abs(ci), g['eta'], g['k'])
    w_mirror = refl * Fc
    w_diel_refl = refl
    w_diel_refr = g['k'] * (eta_sc * eta_sc)[..., None]  # k column = transmittance
    w_diel = jnp.where(do_reflect[..., None], w_diel_refl, w_diel_refr)
    # Thin dielectric: total internal bounce series -> R' = 2F/(1+F)
    Rp = jnp.where(F < 1.0, 2.0 * F / (1.0 + F), 1.0)
    w_thin = jnp.ones_like(refl)
    do_reflect_thin = u_lobe < Rp

    weight = jnp.where((typ == CONDUCTOR)[..., None], w_mirror,
             jnp.where((typ == DIELECTRIC)[..., None], w_diel,
             jnp.where((typ == THIN_DIELECTRIC)[..., None], w_thin,
             jnp.where(((typ == NULL) | pass_through)[..., None], 1.0, w_smooth))))
    wo = jnp.where((typ == THIN_DIELECTRIC)[..., None],
                   jnp.where(do_reflect_thin[..., None], wo_refl_d, -wi), wo)

    pdf = jnp.where(is_delta, 1.0, pdf_s)
    pdf = jnp.where(is_rd & ~rd_ok, 0.0, pdf)
    live = pdf > 0.0
    weight = jnp.where(live[..., None], weight, 0.0)
    return wo, weight, pdf, is_delta, eta_sc
