"""Command-line driver — the `mitsuba` CLI equivalent.

Replaces `src/mitsuba/mitsuba.cpp` (342 LoC): loads a scene XML, renders with
a sensor (`-s`) or receives with a receiver (`-r`), writes EXR.  The variant
flag `-m` becomes `--band` (runtime band config, no compile-time variants).

    python -m beifong_tpu scene.xml -o out.exr
    python -m beifong_tpu scene.xml -D spp=1024 -D resx=64 -D resy=64
    python -m beifong_tpu scene.xml -r 0 -o signal.exr      # radar receive
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="beifong_tpu",
        description="TPU-native radar/sonar signal simulator and renderer")
    p.add_argument("scene", help="scene .xml file")
    p.add_argument("-o", "--output", default=None, help="output EXR path")
    p.add_argument("-D", action="append", default=[], metavar="key=value",
                   help="scene parameter substitution (like mitsuba -D)")
    p.add_argument("-s", "--sensor", type=int, default=0,
                   help="sensor index to render with")
    p.add_argument("-r", "--receiver", type=int, default=None,
                   help="receiver index: run receive() instead of render()")
    p.add_argument("--band", default="ultrasound_40k",
                   help="band preset (ultrasound_40k, mmw_94g, auto_77g, "
                        "optical, ...)")
    p.add_argument("--spp", type=int, default=None)
    p.add_argument("--depth", type=int, default=8, help="max path depth")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--pallas", choices=("auto", "on", "off"), default="auto",
                   help="route receive() through the Pallas TPU megakernel "
                        "(auto: when the scene is in the kernel's scope)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from .core.config import band_preset
    from .io.scene_loader import load_xml
    from .io.bitmap import write_exr

    defaults = dict(kv.split("=", 1) for kv in args.D)
    band = band_preset(args.band)
    t0 = time.time()
    scene, meta = load_xml(args.scene, defaults=defaults, band=band)
    print(f"[beifong_tpu] loaded {args.scene}: {len(scene.shapes)} shapes, "
          f"{len(scene.emitters)} emitters, {len(scene.transmitters)} "
          f"transmitters, {len(scene.receivers)} receivers "
          f"({time.time() - t0:.2f}s)")

    spp = args.spp or meta.get("spp") or 64
    out = args.output or "output.exr"
    integ = meta.get("integrator", {"type": "path"})

    if args.receiver is not None:
        from .receive import receive, develop_signal
        import numpy as np
        rx = scene.receivers[args.receiver]
        t0 = time.time()
        use_pallas = {"auto": "auto", "on": True, "off": False}[args.pallas]
        adc, n = receive(scene, receiver=rx, spp=spp, max_depth=args.depth,
                         seed=args.seed, use_pallas=use_pallas)
        sig = develop_signal(adc, n, rx.adc)
        print(f"[beifong_tpu] receive: {n} samples in {time.time() - t0:.2f}s")
        write_exr(out, np.asarray(sig)[..., 0])
        print(f"[beifong_tpu] wrote {out}")
        return 0

    import numpy as np
    if integ.get("type") in ("range", "time", "phase"):
        from .receive import render_binned
        q = {"time": "time", "phase": "phase"}.get(integ["type"], "length")
        bins = int(integ.get("bins", 50))
        if q == "phase":
            bw = 2 * 3.141592653589793 / bins
        else:
            bw = float(integ.get("dr", integ.get("dt", 0.2)))
        t0 = time.time()
        grid, n = render_binned(scene, sensor_idx=args.sensor, n_bins=bins,
                                bin_width=bw, quantity=q, spp=spp,
                                max_depth=args.depth, seed=args.seed)
        print(f"[beifong_tpu] binned render: {n} samples in "
              f"{time.time() - t0:.2f}s")
        w, h = scene.sensors[args.sensor].film_size
        g = np.asarray(grid)
        img = (g[..., 0] / np.maximum(g[..., 2], 1)).reshape(h, w, bins)
        write_exr(out, img.reshape(h, w * bins) if bins > 3 else img)
        print(f"[beifong_tpu] wrote {out} ({bins} bins)")
        return 0

    from .render import render
    from . import film as film_mod
    t0 = time.time()
    film, n = render(scene, sensor_idx=args.sensor, spp=spp,
                     max_depth=args.depth, seed=args.seed)
    img = np.asarray(film_mod.develop(film))
    dt = time.time() - t0
    w, h = scene.sensors[args.sensor].film_size
    rays = w * h * n
    print(f"[beifong_tpu] rendered {w}x{h} @ {n} spp in {dt:.2f}s "
          f"({rays / dt / 1e6:.2f} M primary rays/s)")
    write_exr(out, img)
    print(f"[beifong_tpu] wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
