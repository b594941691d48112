"""Regenerate the committed golden signal vectors + the docs figure.

    python tests/golden/generate.py [name ...]

Writes `tests/golden/<name>.npz` for each config in `configs.CONFIGS` and
the comparison figure `docs/figures/golden_ladder.png` (simulated outputs
with the analytic anchor lines — the analogue of the reference's
`trans_rad.py:66-75` range-profile plot).

Goldens are generated on the CPU backend so CI comparisons are
platform-stable; regenerate ONLY when a deliberate physics change is made,
and say so in the commit message.
"""

from __future__ import annotations

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import configs as cfg_mod


def main(argv):
    here = os.path.dirname(os.path.abspath(__file__))
    names = argv or list(cfg_mod.CONFIGS)
    results = {}
    for name in names:
        arrays, meta = cfg_mod.CONFIGS[name]()
        np.savez(os.path.join(here, name + ".npz"), **arrays,
                 **{f"meta_{k}": np.asarray(v) for k, v in meta.items()})
        results[name] = (arrays, meta)
        print(f"wrote {name}.npz: "
              + ", ".join(f"{k}{v.shape}" for k, v in arrays.items())
              + f"  meta={meta}")
    # figure panels for configs not regenerated load the committed npz
    for name in cfg_mod.CONFIGS:
        path = os.path.join(here, name + ".npz")
        if name not in results and os.path.exists(path):
            z = np.load(path)
            arrays = {k: z[k] for k in z.files if not k.startswith("meta_")}
            meta = {k[5:]: z[k] for k in z.files if k.startswith("meta_")}
            results[name] = (arrays, meta)
    _figure(results, here)
    return 0


def _figure(results, here):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 6, figsize=(25, 3.4))
    if "range_profile" in results:
        prof = results["range_profile"][0]["profile"]
        r = (np.arange(len(prof)) + 0.5) * 0.5e-9 * 3e8
        db = 10 * np.log10(np.maximum(prof / max(prof.max(), 1e-30), 1e-12))
        axes[0].plot(r, db, lw=1.2)
        axes[0].set(title="trans_rad range profile", xlabel="range [m]",
                    ylabel="dB")
    if "fmcw_sonar" in results:
        arrays, meta = results["fmcw_sonar"]
        spec = arrays["spectrum"]
        axes[1].plot(spec / max(spec.max(), 1e-30), lw=1.2)
        axes[1].axvline(meta["expected_beat_bin"], color="r", ls="--",
                        lw=1, label="analytic beat")
        axes[1].set(title="FMCW sonar beat spectrum", xlabel="beat bin")
        axes[1].legend()
    if "pulse_train_range_doppler" in results:
        arrays, meta = results["pulse_train_range_doppler"]
        dop = arrays["doppler"]
        axes[2].stem(np.arange(len(dop)), dop / max(dop.max(), 1e-30))
        axes[2].axvline(meta["expected_doppler_bin"], color="r", ls="--",
                        lw=1, label="analytic 2v/lambda")
        axes[2].set(title="pulse-train Doppler line", xlabel="Doppler bin")
        axes[2].legend()
    if "fmcw_dechirp_chain" in results:
        arrays, meta = results["fmcw_dechirp_chain"]
        mag = np.abs(arrays["rd_map"])
        db = 20 * np.log10(np.maximum(mag / max(mag.max(), 1e-30), 1e-6))
        im = axes[3].imshow(db, aspect="auto", origin="lower", vmin=-50,
                            cmap="viridis")
        axes[3].plot(meta["expected_range_bin"], meta["expected_doppler_bin"],
                     "r+", ms=12, label="analytic cell")
        axes[3].set(title="FMCW dechirp chain RD map", xlabel="range bin",
                    ylabel="Doppler bin")
        axes[3].legend()
        fig.colorbar(im, ax=axes[3], label="dB")
    if "micro_doppler_cpi" in results:
        arrays, meta = results["micro_doppler_cpi"]
        spec = arrays["spectrum"]
        db = 10 * np.log10(np.maximum(spec / max(spec.max(), 1e-30), 1e-12))
        axes[4].stem(np.arange(len(spec)), np.maximum(db, -30))
        for b in np.asarray(meta["comb_bins"]).tolist():
            axes[4].axvline(b, color="r", ls=":", lw=0.7)
        axes[4].set(title="micro-Doppler Bessel comb (64-pulse CPI)",
                    xlabel="Doppler bin", ylabel="dB", ylim=(-30, 2))
    if "mimo_beamform" in results:
        arrays, meta = results["mimo_beamform"]
        az = np.asarray(meta["az_deg"])
        for key, style in (("das", "-"), ("mvdr", "--")):
            y = arrays[key]
            axes[5].plot(az, 10 * np.log10(np.maximum(
                y / max(y.max(), 1e-30), 1e-6)), style, lw=1.2,
                label=key.upper())
        axes[5].axvline(float(meta["az_true_deg"]), color="r", ls=":",
                        lw=1, label="true azimuth")
        axes[5].set(title="MIMO digital beamforming", xlabel="azimuth [deg]",
                    ylabel="dB", ylim=(-40, 2))
        axes[5].legend()
    fig.tight_layout()
    out = os.path.join(here, "..", "..", "docs", "figures")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "golden_ladder.png")
    fig.savefig(path, dpi=110)
    print(f"wrote {path}")


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
