"""Scene loaders: Mitsuba-style dict and XML formats.

Replaces the reference's XML/dict scene parser (`src/libcore/xml.cpp`, 1284
LoC: tag->class registry at `:117-167`, `$var` substitution, `<ref>`
resolution) so the reference's scene files (`python_scripts/trans_rad.xml`,
`trans_image_rad.xml`, dict scenes in `Render.py` / `animated_trans_rad.py`)
load directly into a `beifong_tpu.scene.Scene`.

Returns (Scene, meta) where meta carries integrator/driver config that is not
part of the compiled scene (integrator type, bin counts, spp).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Any

import numpy as np

from ..core import transform as tfm
from ..core.config import Band, ULTRASOUND_40K
from ..scene import Scene
from ..geometry import shapes as sh
from ..geometry.mesh import load_obj, load_ply
from ..bsdf import tables as bt
from .. import emitters as em
from .. import sensors as sn
from ..radar import (waveform as wfm, wigner_transmitter, phased_transmitter,
                     area_transmitter, wigner_receiver, phased_receiver,
                     omni_receiver, ADCConfig)

_ID = [0]


def _gen_id(prefix):
    _ID[0] += 1
    return f"{prefix}_{_ID[0]}"


def _np4(m):
    return np.asarray(m, np.float32).reshape(4, 4)


# ---------------------------------------------------------------------------
# dict loader
# ---------------------------------------------------------------------------


def load_dict(d: dict, band: Band = ULTRASOUND_40K):
    """Load a Mitsuba-style scene dict (reference `xml.cpp` load_dict path)."""
    assert d.get("type") == "scene", "top-level dict must have type='scene'"
    scene = Scene(band=band)
    meta: dict[str, Any] = {"integrator": {"type": "path"}, "spp": None}
    named_bsdfs: dict[str, str] = {}

    # two passes: named bsdfs first (so refs resolve)
    for key, val in d.items():
        if key == "type" or not isinstance(val, dict):
            continue
        if val.get("type") in _BSDF_TYPES and "id" not in val:
            val = dict(val, id=key)
        if val.get("type") in _BSDF_TYPES:
            bid = _load_bsdf(scene, val)
            named_bsdfs[val.get("id", key)] = bid
            named_bsdfs[key] = bid

    for key, val in d.items():
        if key == "type" or not isinstance(val, dict):
            continue
        t = val.get("type")
        if t in _BSDF_TYPES:
            continue
        if t in _SHAPE_TYPES:
            _load_shape(scene, val, named_bsdfs, meta)
        elif t in _INTEGRATOR_TYPES:
            meta["integrator"] = _integrator_meta(val)
        elif t in _EMITTER_TYPES:
            _load_emitter(scene, val, None)
        elif t in _SENSOR_TYPES:
            _load_sensor(scene, val, None, meta)
        elif t in _TX_TYPES:
            _load_transmitter(scene, val, None)
        elif t in _RX_TYPES:
            _load_receiver(scene, val, None)
        elif t in _MEDIUM_TYPES:
            _load_medium(scene, val)
        else:
            raise ValueError(f"unknown scene object type {t!r} at key {key!r}")

    # Optically-lit fallback: scenes like the reference's trans_image.xml
    # attach ONLY a wignertransmitter as the light source and render with
    # emitter-based integrators (range over pathlength).  Give each
    # transmitter shape an area-emitter proxy carrying its mean power so the
    # optical path sees it.
    if not scene.emitters and scene.transmitters:
        for shape in scene.shapes:
            if shape.transmitter is not None and shape.emitter is None:
                tx = next(t for t in scene.transmitters
                          if t.id == shape.transmitter)
                radiance = getattr(tx, "_proxy_radiance", None)
                if radiance is None:
                    radiance = float(np.asarray(tx.waveform.amplitude)) ** 2
                eid = _gen_id("txproxy")
                scene.add(em.area(eid, radiance=radiance * tx.gain))
                shape.emitter = eid
    return scene, meta


_BSDF_TYPES = {"diffuse", "twosided", "conductor", "roughconductor",
               "dielectric", "thindielectric", "plastic", "roughplastic",
               "null", "mask", "blendbsdf"}
_SHAPE_TYPES = {"rectangle", "sphere", "disk", "cylinder", "obj", "ply",
                "serialized"}
_INTEGRATOR_TYPES = {"path", "pathlength", "pathtime", "pathtimefrequency",
                     "pathrangedoppler", "time", "range", "phase", "raw",
                     "direct", "depth", "aov", "moment"}
_EMITTER_TYPES = {"area", "point", "spot", "directional", "constant",
                  "pointbeam", "projector", "envmap", "coherent",
                  "incoherent", "phased", "wigner"}
_SENSOR_TYPES = {"perspective", "thinlens", "fluxmeter", "radiancemeter",
                 "irradiancemeter"}
_TX_TYPES = {"wignertransmitter", "phasedtransmitter", "areatransmitter"}
_RX_TYPES = {"wignerreceiver", "phasedreceiver", "omnidirectional"}
_MEDIUM_TYPES = {"homogeneous", "layered", "heterogeneous"}


def _medium_scalar(v, default=0.0) -> float:
    """Coerce a loader value (float / {'type':'spectrum','value':x}) to a
    scalar; multi-entry spectra collapse to their mean (band average)."""
    if v is None:
        return float(default)
    if isinstance(v, dict):
        val = v.get("value", default)
        if isinstance(val, (list, tuple)):
            return float(np.mean(val))
        return float(val)
    if isinstance(v, (list, tuple)):
        return float(np.mean(v))
    return float(v)


def _load_medium(scene: Scene, val):
    """Global ambient medium (reference `<medium>` tags,
    `src/media/{homogeneous,heterogeneous}.cpp`).  The radar chain applies
    it as per-segment path absorption; a nested `<phase type="hg">` sets g.

    `layered` is this framework's stratified extension
    (`media.LayeredMedium`): props `sigma` (list), `z_min`, `z_max`.
    Gridded heterogeneous media need volume data — build them in Python
    (`media.HeterogeneousMedium.make`) and set `scene.medium` directly.
    """
    from .. import media as media_mod
    t = val["type"]
    g = 0.0
    for v in val.values():
        if isinstance(v, dict) and v.get("type") == "hg":
            g = _medium_scalar(v.get("g"), 0.0)
    albedo = _medium_scalar(val.get("albedo"), 0.0)
    if t == "homogeneous":
        sigma_t = val.get("sigma_t")
        if sigma_t is None:
            # reference alternative parameterization: sigma_s + sigma_a
            sigma_t = (_medium_scalar(val.get("sigma_s"), 0.0)
                       + _medium_scalar(val.get("sigma_a"), 0.0))
        else:
            sigma_t = _medium_scalar(sigma_t)
        scene.medium = media_mod.HomogeneousMedium.make(
            sigma_t=sigma_t, albedo=albedo, g=g)
    elif t == "layered":
        sigma = val.get("sigma", 0.0)
        if isinstance(sigma, dict):
            sigma = sigma.get("value", 0.0)
        if not isinstance(sigma, (list, tuple)):
            sigma = [float(sigma)]
        scene.medium = media_mod.LayeredMedium.make(
            np.asarray(sigma, np.float32),
            z_min=_medium_scalar(val.get("z_min"), 0.0),
            z_max=_medium_scalar(val.get("z_max"), 1.0),
            albedo=albedo, g=g)
    else:
        # heterogeneous: nested <volume type="grid3d" name="sigma_t"> with
        # a Mitsuba `.vol` file (reference `src/textures/grid3d.cpp`,
        # `src/textures/volume_data.h`; `src/media/heterogeneous.cpp`
        # resolves the sigma_t/albedo volumes by name)
        from .volume import read_vol
        vols = {k: v for k, v in val.items()
                if isinstance(v, dict) and v.get("type") == "grid3d"}
        sig = vols.get("sigma_t") or next(iter(vols.values()), None)
        if sig is None or "filename" not in sig:
            raise ValueError(
                "heterogeneous medium needs a nested "
                "<volume type=\"grid3d\" name=\"sigma_t\"> with a "
                "filename (.vol), or build "
                "media.HeterogeneousMedium.make(...) directly")
        data, bmin, bmax = read_vol(sig["filename"])
        scale = _medium_scalar(val.get("scale"), 1.0)
        alb = vols.get("albedo")
        if alb is not None and "filename" in alb:
            # collapse an albedo grid to its mean (the medium applies a
            # scalar single-scatter albedo)
            a_data, _, _ = read_vol(alb["filename"])
            albedo = float(a_data.mean())
        scene.medium = media_mod.HeterogeneousMedium.make(
            data[..., 0] * scale, albedo=albedo, g=g,
            box_min=tuple(float(x) for x in bmin),
            box_max=tuple(float(x) for x in bmax))


def _integrator_meta(val):
    out = {k: v for k, v in val.items() if not isinstance(v, dict)}
    for k, v in val.items():
        if isinstance(v, dict) and v.get("type") in _INTEGRATOR_TYPES:
            out["nested"] = _integrator_meta(v)
    return out


def _to_world_of(val):
    tw = val.get("to_world")
    if tw is None:
        return np.eye(4, dtype=np.float32)
    if isinstance(tw, np.ndarray):
        return _np4(tw)
    if hasattr(tw, "matrix"):
        return _np4(tw.matrix)
    return _np4(tw)


def _resolve_curve_refl(scene: Scene, val) -> dict:
    """If a diffuse-family reflectance slot holds a curve-typed spectrum,
    register a `spectrum_curve` texture evaluated per-wavelength along the
    radar path and rewrite the slot to (reflectance=1, texture=id)."""
    for key in ("reflectance", "diffuse_reflectance"):
        curve = _curve_of(val.get(key))
        if curve is not None:
            from ..textures import spectrum_curve
            tid = _gen_id("spectex")
            scene.add(spectrum_curve(tid, wavelengths=curve[0],
                                     values=curve[1], band=scene.band))
            val = dict(val)
            val[key] = 1.0
            val["texture"] = tid
    return val


def _load_bsdf(scene: Scene, val, id_hint=None) -> str:
    t = val["type"]
    bid = val.get("id", id_hint or _gen_id("bsdf"))
    if t == "twosided":
        nested = next(v for v in val.values()
                      if isinstance(v, dict) and v.get("type") in _BSDF_TYPES)
        inner = _resolve_curve_refl(scene, dict(nested, id=bid))
        spec = _bsdf_spec(inner, band=scene.band)
        spec.twosided = True
        scene.add(spec)
        return bid
    spec = _bsdf_spec(_resolve_curve_refl(scene, dict(val, id=bid)),
                      band=scene.band)
    scene.add(spec)
    return bid


_CURVE_SPECTRA = {"regular", "irregular", "d65", "srgb_d65"}


def _floats(v):
    if isinstance(v, str):
        return np.asarray([float(x) for x in v.replace(",", " ").split()],
                          np.float64)
    return np.asarray(v, np.float64).reshape(-1)


def _curve_of(r):
    """(wavelengths [m], values) if `r` is a curve-typed spectrum dict
    (reference `src/spectra/{regular,irregular,d65}.cpp`), else None.
    Wavelengths are SI metres; the XML path converts from the reference's
    nm units before this sees them."""
    if not isinstance(r, dict):
        return None
    t = r.get("type")
    if t == "irregular":
        return _floats(r["wavelengths"]), _floats(r["values"])
    if t == "regular":
        v = _floats(r["values"])
        return (np.linspace(float(r["lambda_min"]), float(r["lambda_max"]),
                            max(v.size, 2)),
                v if v.size > 1 else np.repeat(v, 2))
    if t == "d65":
        from ..core import spectrum as spec_mod
        return spec_mod.d65_curve(float(r.get("scale", 1.0)))
    if t == "srgb_d65":
        # RGB modulating the D65 illuminant; collapse the RGB to luminance
        # (non-visible bands cannot resolve hue) and carry the D65 shape
        from ..core import spectrum as spec_mod
        col = _floats(r.get("color", r.get("value", 1.0)))
        lum = (float(col[0]) if col.size == 1 else
               float(0.2126 * col[0] + 0.7152 * col[1] + 0.0722 * col[2]))
        return spec_mod.d65_curve(lum)
    return None


def _refl_of(val, key="reflectance", default=0.5, band=None):
    """Scalar/RGB reflectance value; curve-typed spectra collapse to their
    band mean (callers that can evaluate per-wavelength create a
    `spectrum_curve` texture instead — see `_load_bsdf`)."""
    r = val.get(key, default)
    curve = _curve_of(r)
    if curve is not None:
        from ..textures import spectrum_curve
        spec = spectrum_curve("_tmp", wavelengths=curve[0], values=curve[1],
                              band=band)
        return spec.color0[0] if band is not None else float(curve[1].mean())
    if isinstance(r, dict):
        # {"type":"spectrum"/"rgb", "value": x}
        return r.get("value", default)
    return r


def _bsdf_spec(val, band=None) -> bt.BSDFSpec:
    t = val["type"]
    bid = val["id"]
    tex = val.get("texture")
    if t == "diffuse":
        return bt.diffuse(bid, reflectance=_refl_of(val, band=band),
                          texture=tex)
    if t == "conductor":
        return bt.conductor(bid, eta=val.get("eta", 0.2), k=val.get("k", 3.0))
    if t == "roughconductor":
        return bt.rough_conductor(bid, alpha=val.get("alpha", 0.1),
                                  eta=val.get("eta", 0.2), k=val.get("k", 3.0))
    if t == "dielectric":
        return bt.dielectric(bid, int_ior=_ior(val.get("int_ior", 1.5046)),
                             ext_ior=_ior(val.get("ext_ior", 1.000277)))
    if t == "thindielectric":
        return bt.thin_dielectric(bid, int_ior=_ior(val.get("int_ior", 1.5046)))
    if t == "plastic":
        return bt.plastic(bid,
                          diffuse_reflectance=_refl_of(
                              val, "diffuse_reflectance", band=band),
                          texture=tex)
    if t == "roughplastic":
        return bt.rough_plastic(bid,
                                diffuse_reflectance=_refl_of(
                                    val, "diffuse_reflectance", band=band),
                                alpha=val.get("alpha", 0.1), texture=tex)
    if t == "null":
        return bt.null(bid)
    raise ValueError(f"unsupported bsdf {t}")


_IOR_NAMES = {"air": 1.000277, "water": 1.3330, "glass": 1.5046, "bk7": 1.5046,
              "diamond": 2.419, "vacuum": 1.0}


def _ior(v):
    if isinstance(v, str):
        return _IOR_NAMES[v.lower()]
    return float(v)


def _load_shape(scene: Scene, val, named_bsdfs, meta):
    t = val["type"]
    tw = _to_world_of(val)
    kw = {}
    # nested or referenced bsdf / emitter / sensor / transmitter / receiver
    for k, v in val.items():
        if not isinstance(v, dict):
            continue
        vt = v.get("type")
        if vt == "ref":
            kw["bsdf"] = named_bsdfs.get(v["id"], v["id"])
        elif vt in _BSDF_TYPES:
            kw["bsdf"] = _load_bsdf(scene, v)
        elif vt in _EMITTER_TYPES:
            kw["emitter"] = _load_emitter(scene, v, attached=True)
        elif vt in _SENSOR_TYPES:
            kw["sensor"] = _load_sensor(scene, v, attached=True, meta=meta)
        elif vt in _TX_TYPES:
            kw["transmitter"] = _load_transmitter(scene, v, attached=True)
        elif vt in _RX_TYPES:
            kw["receiver"] = _load_receiver(scene, v, attached=True)
    if "velocity" in val:
        kw["velocity"] = np.asarray(val["velocity"], np.float32)
    if t == "rectangle":
        scene.add(sh.rectangle(to_world=tw, **kw))
    elif t == "sphere":
        c = val.get("center")
        r = val.get("radius", 1.0)
        scene.add(sh.sphere(to_world=tw, center=c, radius=r, **kw))
    elif t == "disk":
        scene.add(sh.disk(to_world=tw, **kw))
    elif t == "cylinder":
        scene.add(sh.cylinder(to_world=tw, **kw))
    elif t == "obj":
        scene.add(load_obj(val["filename"], to_world=tw, **kw))
    elif t == "ply":
        scene.add(load_ply(val["filename"], to_world=tw, **kw))
    elif t == "serialized":
        from ..geometry.mesh import load_serialized
        scene.add(load_serialized(val["filename"],
                                  shape_index=int(val.get("shape_index", 0)),
                                  to_world=tw, **kw))
    else:
        raise ValueError(f"unsupported shape {t}")


def _load_emitter(scene: Scene, val, attached=False):
    t = val["type"]
    eid = val.get("id", _gen_id("em"))
    tw = _to_world_of(val)
    if t == "area":
        spec = em.area(eid, radiance=_refl_of(val, "radiance", 1.0, band=scene.band))
    elif t in ("wigner", "coherent"):
        # aperture-WDF-gated area emitter (reference coherent.cpp / wigner.cpp)
        spec = em.coherent(eid, power=val.get("power", 1.0),
                           gain=val.get("gain", 1.0))
    elif t == "incoherent":
        spec = em.incoherent(eid, power=val.get("power", 1.0),
                             gain=val.get("gain", 1.0))
    elif t == "point":
        spec = em.point(eid, intensity=_refl_of(val, "intensity", 1.0, band=scene.band),
                        position=val.get("position", tw[:3, 3]))
    elif t == "spot":
        spec = em.spot(eid, intensity=_refl_of(val, "intensity", 1.0, band=scene.band),
                       cutoff_angle=val.get("cutoff_angle", 20.0),
                       beam_width=val.get("beam_width"), to_world=tw)
    elif t == "directional":
        spec = em.directional(eid, irradiance=_refl_of(val, "irradiance", 1.0, band=scene.band),
                              direction=val.get("direction", (0, 0, -1)))
    elif t in ("constant", "envmap"):
        spec = em.constant(eid, radiance=_refl_of(val, "radiance", 1.0, band=scene.band))
    elif t == "pointbeam":
        spec = em.pointbeam(eid, intensity=_refl_of(val, "intensity", 1.0, band=scene.band),
                            beam_width=val.get("beam_width", 15.0), to_world=tw)
    elif t == "phased":
        spec = em.area(eid, radiance=_refl_of(val, "power", 1.0, band=scene.band))
    else:
        raise ValueError(f"unsupported emitter {t}")
    scene.add(spec)
    return eid


def _load_sensor(scene: Scene, val, attached, meta):
    t = val["type"]
    sid = val.get("id", _gen_id("sensor"))
    film = next((v for v in val.values()
                 if isinstance(v, dict) and v.get("type") in ("hdrfilm",)), {})
    sampler = next((v for v in val.values()
                    if isinstance(v, dict) and v.get("type", "").endswith(
                        ("independent", "stratified", "multijitter",
                         "ldsampler", "orthogonal"))), {})
    film_size = (int(film.get("width", 64)), int(film.get("height", 64)))
    spp = int(sampler.get("sample_count", 64))
    meta["spp"] = spp
    tw = _to_world_of(val)
    if t == "perspective":
        spec = sn.perspective(sid, fov=val.get("fov", 45.0), to_world=tw,
                              film_size=film_size, spp=spp)
    elif t == "thinlens":
        spec = sn.thinlens(sid, fov=val.get("fov", 45.0),
                           aperture_radius=val.get("aperture_radius", 0.1),
                           focus_distance=val.get("focus_distance", 5.0),
                           to_world=tw, film_size=film_size, spp=spp)
    elif t == "fluxmeter":
        spec = sn.fluxmeter(sid, film_size=film_size, spp=spp)
    elif t == "radiancemeter":
        spec = sn.radiancemeter(sid, to_world=tw, film_size=film_size, spp=spp)
    elif t == "irradiancemeter":
        spec = sn.irradiancemeter(sid, film_size=film_size, spp=spp)
    else:
        raise ValueError(f"unsupported sensor {t}")
    scene.add(spec)
    return sid


def _waveform_of(val) -> wfm.Waveform:
    st = val.get("signaltype", "cw")
    amp = val.get("amplitude", 1.0)
    phi0 = val.get("phase", 0.0)
    if st == "linfmcw":
        return wfm.linfmcw(f_centre=val.get("freq_centre", 1.0),
                           crf=val.get("crf", 1.0),
                           chirp_len=val.get("chirp_len", 1.0),
                           freq_sweep=val.get("freq_sweep", 1.0),
                           amplitude=amp, phi0=phi0,
                           is_delta=val.get("sig_is_delta", True))
    if st == "pulse":
        return wfm.pulse(f_centre=val.get("freq_centre", 1.0),
                         prf=val.get("prf", 1.0),
                         pulse_len=val.get("pulse_len", 1.0),
                         f_ext=val.get("freq_ext"), amplitude=amp, phi0=phi0,
                         is_delta=val.get("sig_is_delta", False))
    return wfm.cw(f_centre=val.get("freq_centre", 1.0),
                  f_ext=val.get("freq_ext", 0.0), amplitude=amp, phi0=phi0,
                  is_delta=val.get("sig_is_delta", True))


def _load_transmitter(scene: Scene, val, attached=False):
    t = val["type"]
    tid = val.get("id", _gen_id("tx"))
    wf = _waveform_of(val)
    gain = val.get("gain", 1.0)
    res = val.get("resample_freq", False)
    if t == "wignertransmitter":
        spec = wigner_transmitter(tid, wf, gain=gain, resample_freq=res)
        if "radiance" in val:
            spec._proxy_radiance = float(np.ravel(_refl_of(val, "radiance", 1.0, band=scene.band))[0])
        scene.add(spec)
    elif t == "phasedtransmitter":
        scene.add(phased_transmitter(
            tid, wf, n_elems=val.get("n_elems", 1),
            elem_spacing=val.get("elem_spacing", 0.0),
            elem_wid=np.asarray(val.get("elem_dims", (0.01, 0.01)))[:2],
            steer_deg=val.get("steer_angle", 0.0), gain=gain,
            resample_freq=res))
    else:
        scene.add(area_transmitter(tid, wf, gain=gain))
    return tid


def _adc_of(val) -> ADCConfig:
    adc = next((v for v in val.values()
                if isinstance(v, dict) and v.get("type") == "hdradc"), {})
    return ADCConfig(
        n_time=int(adc.get("height", adc.get("time_bins", 64))),
        n_freq=int(adc.get("width", adc.get("freq_bins", 1))),
        sampling_start=val.get("adc_sampling_start", 0.0),
        sampling_time=val.get("adc_sampling_time",
                              val.get("adc_sampling_end", 1e-3)
                              - val.get("adc_sampling_start", 0.0)),
        freq_lo=adc.get("freq_lo", 0.0), freq_hi=adc.get("freq_hi", 1.0))


def _load_receiver(scene: Scene, val, attached=False):
    t = val["type"]
    rid = val.get("id", _gen_id("rx"))
    adc = _adc_of(val)
    rtype = val.get("receive_type", "raw")
    lo = _waveform_of(val) if "signaltype" in val else None
    gain = val.get("gain", 1.0)
    if t == "wignerreceiver":
        scene.add(wigner_receiver(rid, adc, receive_type=rtype, lo_waveform=lo,
                                  gain=gain))
    elif t == "phasedreceiver":
        scene.add(phased_receiver(
            rid, adc, n_elems=val.get("n_elems", 1),
            elem_spacing=val.get("elem_spacing", 0.0),
            elem_wid=np.asarray(val.get("elem_dims", (0.01, 0.01)))[:2],
            receive_type=rtype, lo_waveform=lo, gain=gain))
    else:
        scene.add(omni_receiver(rid, adc,
                                position=_to_world_of(val)[:3, 3],
                                receive_type=rtype, lo_waveform=lo, gain=gain))
    return rid


# ---------------------------------------------------------------------------
# XML loader
# ---------------------------------------------------------------------------


def load_xml(path: str, defaults: dict | None = None, band: Band = ULTRASOUND_40K):
    """Load a Mitsuba 2 scene XML (reference `xml.cpp::load_file`) with
    `-D key=value` style `defaults` overriding `<default>` declarations."""
    tree = ET.parse(path)
    root = tree.getroot()
    assert root.tag == "scene"
    vars_ = {}
    for el in root.findall("default"):
        vars_[el.get("name")] = el.get("value")
    if defaults:
        vars_.update({k: str(v) for k, v in defaults.items()})

    def subst(s):
        if s is None:
            return s
        for k, v in vars_.items():
            s = s.replace(f"${k}", v)
        return s

    d = {"type": "scene"}
    idx = [0]

    named = {}

    def conv(el) -> dict:
        out = {"type": el.get("type")}
        if el.get("id"):
            out["id"] = el.get("id")
        for ch in el:
            tag = ch.tag
            name = ch.get("name")
            if tag == "default":
                continue
            if tag in ("float",):
                out[name] = float(subst(ch.get("value")))
            elif tag in ("integer",):
                out[name] = int(float(subst(ch.get("value"))))
            elif tag in ("boolean",):
                out[name] = subst(ch.get("value")).lower() == "true"
            elif tag in ("string",):
                out[name] = subst(ch.get("value"))
            elif tag in ("spectrum", "rgb") and ch.get("type"):
                # plugin-form spectrum, e.g. <spectrum type="d65"> (reference
                # src/spectra/*.cpp); wavelengths arrive in nm -> convert SI
                sub = conv(ch)
                for k in ("wavelengths", "lambda_min", "lambda_max"):
                    if k in sub:
                        sub[k] = (_floats(sub[k]) * 1e-9).tolist() \
                            if k == "wavelengths" else float(sub[k]) * 1e-9
                out[name] = sub
            elif tag in ("spectrum", "rgb"):
                v = subst(ch.get("value"))
                toks = v.replace(",", " ").split()
                if any(":" in t for t in toks):
                    # inline irregular spectrum "wavelength:value" pairs
                    # (reference src/spectra/irregular.cpp); nm -> m
                    wls = [float(t.split(":")[0]) * 1e-9 for t in toks]
                    vals = [float(t.split(":")[1]) for t in toks]
                    out[name] = {"type": "irregular",
                                 "wavelengths": wls, "values": vals}
                else:
                    vals = [float(x) for x in toks]
                    out[name] = {"type": "spectrum",
                                 "value": vals[0] if len(vals) == 1 else vals}
            elif tag in ("point", "vector"):
                if ch.get("value") is not None:
                    vals = [float(x) for x in subst(ch.get("value")).replace(",", " ").split()]
                else:
                    vals = [float(subst(ch.get(a, "0"))) for a in "xyz"]
                out[name] = vals
            elif tag == "transform":
                out[name or "to_world"] = _xml_transform(ch, subst)
            elif tag == "ref":
                key = f"_ref{idx[0]}"
                idx[0] += 1
                out[key] = {"type": "ref", "id": ch.get("id")}
            else:
                # nested objects keep their slot NAME when given (e.g.
                # <volume name="sigma_t" type="grid3d">: the reference
                # resolves volumes by parameter name)
                key = name or ch.get("id") or f"_{tag}{idx[0]}"
                idx[0] += 1
                out[key] = conv(ch)
        return out

    for el in root:
        if el.tag == "default":
            continue
        key = el.get("id") or f"_{el.tag}{idx[0]}"
        idx[0] += 1
        obj = conv(el)
        d[key] = obj
        if el.get("id"):
            named[el.get("id")] = obj

    # file references resolve relative to the scene file (reference
    # FileResolver semantics): absolutize grid3d volume filenames
    base = os.path.dirname(os.path.abspath(path))

    def _absolutize(obj):
        if not isinstance(obj, dict):
            return
        fn = obj.get("filename")
        if (obj.get("type") == "grid3d" and isinstance(fn, str)
                and not os.path.isabs(fn)):
            obj["filename"] = os.path.join(base, fn)
        for v in obj.values():
            _absolutize(v)

    _absolutize(d)
    return load_dict(d, band=band)


def _xml_transform(el, subst):
    import jax.numpy as jnp
    m = np.eye(4, dtype=np.float32)
    for op in el:
        if op.tag == "translate":
            v = [float(subst(op.get(a, "0"))) for a in "xyz"]
            t = np.asarray(tfm.translate(v))
        elif op.tag == "scale":
            if op.get("value") is not None:
                v = float(subst(op.get("value")))
                t = np.asarray(tfm.scale(v))
            else:
                v = [float(subst(op.get(a, "1"))) for a in "xyz"]
                t = np.asarray(tfm.scale(v))
        elif op.tag == "rotate":
            axis = [float(subst(op.get(a, "0"))) for a in "xyz"]
            t = np.asarray(tfm.rotate(axis, float(subst(op.get("angle", "0")))))
        elif op.tag == "lookat":
            def vec(s):
                return [float(x) for x in subst(s).replace(",", " ").split()]
            origin = np.asarray(vec(op.get("origin")), np.float32)
            target = np.asarray(vec(op.get("target")), np.float32)
            up = np.asarray(vec(op.get("up", "0 0 0")), np.float32)
            view = target - origin
            # missing/degenerate up: build an arbitrary perpendicular
            # (reference xml.cpp:901-913 coordinate_system fallback)
            if (np.linalg.norm(np.cross(up, view)) < 1e-9
                    or np.linalg.norm(up) == 0):
                v = view / max(np.linalg.norm(view), 1e-20)
                up = np.cross(v, [1.0, 0, 0])
                if np.linalg.norm(up) < 1e-6:
                    up = np.cross(v, [0, 1.0, 0])
            t = np.asarray(tfm.look_at(origin, target, up))
        elif op.tag == "matrix":
            vals = [float(x) for x in subst(op.get("value")).split()]
            t = np.asarray(vals, np.float32).reshape(4, 4)
        else:
            raise ValueError(f"unsupported transform op {op.tag}")
        m = t @ m    # later ops apply after earlier (Mitsuba semantics)
    return m
