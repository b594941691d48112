"""PRNG plumbing: counter-based sampler streams.

Replaces the reference's PCG32 `Sampler` plugin family and per-thread sampler
clones (`src/samplers/*.cpp`, `independentrad.cpp:68-69`) with JAX threefry
keys: each (sample, lane) pair derives an independent stream by folding, so the
wavefront tracer is deterministic under any sharding.

Sampler variants (independent / stratified / multijitter / halton) return a
dim-indexed stream of [0,1) numbers per lane, mirroring the reference's
`next_1d/next_2d` call sequence.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SampleStream:
    """A per-lane deterministic stream of uniforms, consumed by dimension.

    `key` has shape (..., 2) (raw key data per lane); `dim` counts consumed
    dimensions so successive draws are independent.
    """

    key: jax.Array
    dim: jax.Array

    @staticmethod
    def make(key, n_lanes: int, sample_idx) -> "SampleStream":
        """One independent stream per lane. `sample_idx` may be an int or a
        per-lane array (for global sample indexing across passes/shards)."""
        lane_ids = jnp.arange(n_lanes, dtype=jnp.uint32)
        sample_idx = jnp.asarray(sample_idx, jnp.uint32)
        folded = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
            key, lane_ids + sample_idx * jnp.uint32(0x9E3779B9))
        return SampleStream(key=jax.random.key_data(folded),
                            dim=jnp.zeros((), jnp.uint32))

    def _keys(self):
        return jax.vmap(jax.random.wrap_key_data)(self.key)

    def next_1d(self):
        k = jax.vmap(jax.random.fold_in, in_axes=(0, None))(self._keys(), self.dim)
        u = jax.vmap(lambda kk: jax.random.uniform(kk, ()))(k)
        return u, SampleStream(self.key, self.dim + 1)

    def next_2d(self):
        k = jax.vmap(jax.random.fold_in, in_axes=(0, None))(self._keys(), self.dim)
        u = jax.vmap(lambda kk: jax.random.uniform(kk, (2,)))(k)
        return u, SampleStream(self.key, self.dim + 1)


def uniforms(key, shape):
    return jax.random.uniform(key, shape)


# Radical-inverse / Halton helpers (reference qmc.cpp) for the low-discrepancy
# sampler variant.
_PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)


def radical_inverse(base: int, index):
    """Per-element radical inverse of `index` in `base` (vectorized, fixed 32
    digits — enough for u32 indices)."""
    index = jnp.asarray(index, jnp.uint32)
    inv_base = 1.0 / base

    def body(_, carry):
        idx, result, factor = carry
        digit = idx % base
        return idx // base, result + digit.astype(jnp.float32) * factor, factor * inv_base

    _, result, _ = jax.lax.fori_loop(
        0, 32, body, (index, jnp.zeros(index.shape, jnp.float32),
                      jnp.full(index.shape, inv_base, jnp.float32)))
    return jnp.minimum(result, 1.0 - 1e-7)


def halton(index, dim: int):
    """dim-dimensional Halton point for integer index: shape (..., dim)."""
    return jnp.stack([radical_inverse(_PRIMES[d], index) for d in range(dim)], axis=-1)
