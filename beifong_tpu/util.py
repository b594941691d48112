"""Utility helpers: dict -> scene XML writer, dB conversions, timing.

Replaces `mitsuba.python.xml` (dict->XML writer, `src/python/python/xml.py`)
and parts of `util.py` / `math.py` from the reference's Python library.
"""

from __future__ import annotations

import time

import numpy as np


def db10(x, floor=1e-30):
    return 10.0 * np.log10(np.maximum(np.asarray(x), floor))


def db20(x, floor=1e-30):
    return 20.0 * np.log10(np.maximum(np.abs(np.asarray(x)), floor))


def time_string(seconds: float) -> str:
    """Human-readable duration (reference `util::time_string`)."""
    if seconds < 1:
        return f"{seconds * 1e3:.1f}ms"
    if seconds < 60:
        return f"{seconds:.2f}s"
    m, s = divmod(seconds, 60)
    if m < 60:
        return f"{int(m)}m {s:.1f}s"
    h, m = divmod(m, 60)
    return f"{int(h)}h {int(m)}m"


def dict_to_xml(d: dict, path: str | None = None) -> str:
    """Serialize a Mitsuba-style scene dict to scene XML
    (reference `src/python/python/xml.py` dict->XML writer).

    Supports the same structure `io.scene_loader.load_dict` consumes:
    nested object dicts, {"type": "ref", "id": ...}, transforms as 4x4
    arrays, spectrum dicts.
    """
    assert d.get("type") == "scene"
    lines = ['<scene version="2.1.0">']

    def emit_value(name, v, ind):
        pad = "\t" * ind
        if isinstance(v, bool):
            lines.append(f'{pad}<boolean name="{name}" value="{str(v).lower()}"/>')
        elif isinstance(v, int):
            lines.append(f'{pad}<integer name="{name}" value="{v}"/>')
        elif isinstance(v, float):
            lines.append(f'{pad}<float name="{name}" value="{v}"/>')
        elif isinstance(v, str):
            lines.append(f'{pad}<string name="{name}" value="{v}"/>')
        elif isinstance(v, np.ndarray) and v.shape == (4, 4):
            flat = " ".join(str(float(x)) for x in v.reshape(-1))
            lines.append(f'{pad}<transform name="{name}">')
            lines.append(f'{pad}\t<matrix value="{flat}"/>')
            lines.append(f'{pad}</transform>')
        elif isinstance(v, (list, tuple, np.ndarray)):
            vals = ", ".join(str(float(x)) for x in np.ravel(v))
            lines.append(f'{pad}<point name="{name}" value="{vals}"/>')
        elif isinstance(v, dict):
            emit_obj(name, v, ind)
        else:
            raise TypeError(f"cannot serialize {name}={v!r}")

    def emit_obj(key, obj, ind):
        pad = "\t" * ind
        t = obj.get("type")
        if t == "ref":
            lines.append(f'{pad}<ref id="{obj["id"]}"/>')
            return
        if t == "spectrum":
            v = obj.get("value")
            if isinstance(v, (list, tuple, np.ndarray)):
                v = ", ".join(str(float(x)) for x in np.ravel(v))
            lines.append(f'{pad}<spectrum name="{key}" value="{v}"/>')
            return
        tag = _tag_of(t)
        idattr = f' id="{obj["id"]}"' if "id" in obj else ""
        lines.append(f'{pad}<{tag} type="{t}"{idattr}>')
        for k, v in obj.items():
            if k in ("type", "id"):
                continue
            emit_value(k, v, ind + 1)
        lines.append(f'{pad}</{tag}>')

    for key, obj in d.items():
        if key == "type":
            continue
        emit_obj(key, obj, 1)
    lines.append('</scene>')
    out = "\n".join(lines)
    if path:
        with open(path, "w") as fh:
            fh.write(out)
    return out


_TAGS = {
    **{t: "shape" for t in ("rectangle", "sphere", "disk", "cylinder", "obj",
                            "ply")},
    **{t: "bsdf" for t in ("diffuse", "twosided", "conductor", "roughconductor",
                           "dielectric", "thindielectric", "plastic",
                           "roughplastic", "null", "mask", "blendbsdf")},
    **{t: "emitter" for t in ("area", "point", "spot", "directional",
                              "constant", "pointbeam", "envmap",
                              "wignertransmitter", "phasedtransmitter",
                              "areatransmitter")},
    **{t: "sensor" for t in ("perspective", "thinlens", "fluxmeter",
                             "radiancemeter", "irradiancemeter",
                             "wignerreceiver", "phasedreceiver",
                             "omnidirectional")},
    **{t: "integrator" for t in ("path", "pathlength", "pathtime",
                                 "pathtimefrequency", "range", "time",
                                 "phase", "direct", "depth", "aov",
                                 "moment")},
    "hdrfilm": "film", "hdradc": "adc",
    "independent": "sampler", "stratified": "sampler",
    "multijitter": "sampler", "ldsampler": "sampler",
}


def _tag_of(t: str) -> str:
    return _TAGS.get(t, t)
