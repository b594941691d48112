"""Rotating-radar range-angle scan — port of `animated_trans_rad.py`.

Frame loop rotating the antenna bearing (reference
`animated_trans_rad.py:307-373`: 73 frames x 5 deg, range/pathlength
integrator with dr=0.2, bins=50), assembling a range x angle map in dB
(`:390-418`).

    python examples/rotating_scan.py [n_frames]
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

import beifong_tpu as bt
from beifong_tpu import scene as sc, emitters as em, sensors as sn
from beifong_tpu.bsdf import diffuse
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.core import transform as tf
from beifong_tpu.io.bitmap import write_png
from beifong_tpu.receive import render_binned


def build_frame(angle_deg: float):
    """Radar at origin looking along `angle_deg` in the xy-plane; two targets."""
    s = sc.Scene(band=bt.band_preset("ultrasound_40k"))
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    rot = tf.rotate([0, 0, 1], angle_deg)
    look = tf.compose(np.asarray(rot), tf.look_at([0, 0, 0], [0, -1, 0]))
    s.add(em.spot("txspot", intensity=1.0, cutoff_angle=15.0,
                  to_world=np.asarray(look)))
    s.add(sn.fluxmeter("ant", film_size=(1, 1), spp=1024))
    ant = np.asarray(tf.compose(np.asarray(look), tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=ant, sensor="ant"))
    # targets at (0,-4) and (3,-3)
    t1 = np.asarray(tf.compose(tf.look_at([0, -4, 0], [0, 0, 0]), tf.scale(0.5)))
    s.add(sh.rectangle(to_world=t1, bsdf="mat"))
    t2 = np.asarray(tf.compose(tf.look_at([3, -3, 0], [0, 0, 0]), tf.scale(0.5)))
    s.add(sh.rectangle(to_world=t2, bsdf="mat"))
    return s


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    angles = np.linspace(-45, 45, n_frames)
    n_bins, dr = 50, 0.2   # reference animated_trans_rad.py:39-44
    scan = np.zeros((n_frames, n_bins))
    for i, a in enumerate(angles):
        s = build_frame(float(a))
        grid, n = render_binned(s, n_bins=n_bins, bin_width=dr,
                                quantity="length", spp=2048, max_depth=3,
                                seed=i)
        scan[i] = np.asarray(grid)[0, :, 0] / max(n, 1)
        print(f"frame {i + 1}/{n_frames} angle {a:+.1f} deg "
              f"peak bin {scan[i].argmax()}")
    db = 10 * np.log10(np.maximum(scan, 1e-30))
    img = (db - db.max() + 40) / 40
    write_png("range_angle_scan.png", np.clip(img, 0, 1))
    print("wrote range_angle_scan.png (rows=angle, cols=range)")


if __name__ == "__main__":
    main()
