"""Checkpoint / resume of long simulations.

The reference has no true checkpointing (SURVEY.md §5.4) — only SIGHUP
partial-image develop.  Here: film/ADC accumulations are associative, so a
checkpoint is just (accumulator arrays, pass counter, RNG key); resuming
continues accumulation bit-exactly.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _npz_path(path: str) -> str:
    """np.savez appends '.npz' when missing — normalize once so the archive
    and its sidecar always agree regardless of how the caller spelled it."""
    return path if path.endswith(".npz") else path + ".npz"


def save(path: str, accumulators: dict, pass_idx: int, key, meta: dict | None = None):
    """Write accumulators + RNG state to an .npz + sidecar json."""
    path = _npz_path(path)
    arrays = {k: np.asarray(v) for k, v in accumulators.items()}
    arrays["__key"] = np.asarray(jax.random.key_data(key))
    np.savez(path, **arrays)
    side = {"pass_idx": int(pass_idx), "meta": meta or {}}
    with open(path + ".json", "w") as fh:
        json.dump(side, fh)


def load(path: str):
    """Returns (accumulators dict of jnp arrays, pass_idx, key, meta)."""
    import jax.numpy as jnp
    path = _npz_path(path)
    data = np.load(path)
    accs = {k: jnp.asarray(v) for k, v in data.items() if k != "__key"}
    key = jax.random.wrap_key_data(jnp.asarray(data["__key"]))
    side_path = path + ".json"
    if not os.path.exists(side_path):
        raise FileNotFoundError(
            f"checkpoint sidecar missing: {side_path} — refusing to resume "
            "from pass 0 (would duplicate the pass-0 RNG stream)")
    with open(side_path) as fh:
        side = json.load(fh)
    return accs, side["pass_idx"], key, side["meta"]
