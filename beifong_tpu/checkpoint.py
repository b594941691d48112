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


def save(path: str, accumulators: dict, pass_idx: int, key, meta: dict | None = None):
    """Write accumulators + RNG state to an .npz + sidecar json."""
    arrays = {k: np.asarray(v) for k, v in accumulators.items()}
    arrays["__key"] = np.asarray(jax.random.key_data(key))
    np.savez(path, **arrays)
    side = {"pass_idx": int(pass_idx), "meta": meta or {}}
    with open(path + ".json", "w") as fh:
        json.dump(side, fh)


def load(path: str):
    """Returns (accumulators dict of jnp arrays, pass_idx, key, meta)."""
    import jax.numpy as jnp
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    accs = {k: jnp.asarray(v) for k, v in data.items() if k != "__key"}
    key = jax.random.wrap_key_data(jnp.asarray(data["__key"]))
    side_path = (path if path.endswith(".npz") else path + ".npz") + ".json"
    if os.path.exists(side_path):
        with open(side_path) as fh:
            side = json.load(fh)
    else:
        side = {"pass_idx": 0, "meta": {}}
    return accs, side["pass_idx"], key, side["meta"]
