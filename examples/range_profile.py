"""Film-mode range profile — port of the reference's `trans_rad.py`.

Loads the reference scene XML (time/pathtime integrator, fluxmeter antenna,
spot emitter), runs the binned render, and writes the dB range profile
(reference `python_scripts/trans_rad.py:51-75`).

    python examples/range_profile.py [scene.xml] [out_prefix]
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# honor JAX_PLATFORM_NAME=cpu even though the ambient axon
# sitecustomize pre-imports jax (the env var alone is consumed
# too early to switch backends)
if os.environ.get("JAX_PLATFORM_NAME") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from beifong_tpu.io.scene_loader import load_xml
from beifong_tpu.io.bitmap import write_png
from beifong_tpu.receive import render_binned


def main():
    scene_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/python_scripts/trans_rad.xml"
    out = sys.argv[2] if len(sys.argv) > 2 else "range_profile"

    # trans_rad.xml's 0.5 ns time bins assume light-speed propagation
    # (trans_rad.py:66 converts r = t*3e8), so load in the optical band
    import beifong_tpu as bt
    scene, meta = load_xml(scene_path, defaults={"spp": 4096,
                                                 "resx": 1, "resy": 1},
                           band=bt.band_preset("optical"))
    integ = meta["integrator"]
    if integ.get("type") == "time":
        # 50 x 0.5 ns bins hardcoded in the reference wrapper (time.cpp:118)
        n_bins, bin_w, q = 50, 0.5e-9 * 3e8 / scene.band.c * scene.band.c, "time"
        bin_w = 0.5e-9
    else:
        n_bins = int(integ.get("bins", 50))
        bin_w, q = float(integ.get("dr", 0.2)), "length"

    grid, n = render_binned(scene, n_bins=n_bins, bin_width=bin_w, quantity=q,
                            spp=meta.get("spp") or 4096, max_depth=4)
    prof = np.asarray(grid)[0, :, 0] / max(n, 1)
    db = 10 * np.log10(np.maximum(prof, 1e-30))

    if q == "time":
        axis = (np.arange(n_bins) + 0.5) * bin_w * scene.band.c
    else:
        axis = (np.arange(n_bins) + 0.5) * bin_w
    print("bin  range_m  power_dB")
    for i in range(n_bins):
        print(f"{i:3d} {axis[i]:8.2f} {db[i]:9.2f}")
    np.save(out + ".npy", prof)

    # quick-look PNG: bar-style intensity strip
    img = np.tile((db - db.min()) / max(np.ptp(db), 1e-9), (16, 1))
    write_png(out + ".png", img)
    print(f"wrote {out}.npy / {out}.png (peak at {axis[prof.argmax()]:.2f} m)")


if __name__ == "__main__":
    main()
