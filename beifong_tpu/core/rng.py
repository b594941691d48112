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


def feistel_permute(x, n_bits: int, key):
    """Hash-based pseudorandom permutation of [0, 2^n_bits) — balanced
    4-round Feistel with cycle walking for odd widths.

    Replaces the reference's per-sampler scrambling (stratified/multijitter
    plugins, `src/samplers/`): gives each dimension an independent
    permutation of the global sample index so strata are filled in random
    order without any precomputed tables.
    """
    x = jnp.asarray(x, jnp.uint32)
    nb = n_bits + (n_bits & 1)          # round up to even for balanced halves
    half = nb // 2
    mask = jnp.uint32((1 << half) - 1)
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)

    def perm_once(v):
        lo = v & mask
        hi = (v >> half) & mask
        for r in range(4):
            f = (lo * jnp.uint32(0x9E3779B9) + kd[r % kd.shape[0]]
                 + jnp.uint32((r * 0x85EBCA6B) & 0xFFFFFFFF))
            f = (f ^ (f >> 15)) * jnp.uint32(0x2C1B3C6D)
            f = (f ^ (f >> 12)) & mask
            hi, lo = lo, hi ^ f
        return (hi << half) | lo

    n = jnp.uint32(1 << n_bits)
    y = perm_once(x)
    if nb != n_bits:
        # cycle walking: re-permute out-of-range values until in range;
        # the walk stays within the permutation's cycles, so this is exact
        for _ in range(32):
            y = jnp.where(y >= n, perm_once(y), y)
    return y


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StratifiedStream:
    """Globally-stratified sampler stream (reference `stratified` /
    `multijitter` plugins re-expressed): for each dimension, the global
    sample index is run through an independent Feistel permutation over the
    (power-of-two) total sample count, then jittered within its stratum —
    every dimension sees a full 1-D stratification of all samples across all
    passes/shards.  2-D draws use a multijittered pair of half-bit strata.
    """

    key: jax.Array                 # raw key data, shape (2,)
    sample_idx: jax.Array          # (n,) global sample indices (uint32)
    dim: jax.Array                 # () consumed dimensions
    n_bits: int = dataclasses.field(metadata=dict(static=True), default=16)

    @staticmethod
    def make(key, n_lanes: int, sample_idx, n_total_log2: int) -> "StratifiedStream":
        lane = jnp.arange(n_lanes, dtype=jnp.uint32)
        base = jnp.asarray(sample_idx, jnp.uint32) * jnp.uint32(n_lanes)
        return StratifiedStream(key=jax.random.key_data(key),
                                sample_idx=(base + lane)
                                & jnp.uint32((1 << n_total_log2) - 1),
                                dim=jnp.zeros((), jnp.uint32),
                                n_bits=n_total_log2)

    def _dim_key(self):
        return jax.random.fold_in(jax.random.wrap_key_data(self.key), self.dim)

    def next_1d(self):
        k = self._dim_key()
        p = feistel_permute(self.sample_idx, self.n_bits, k)
        jit = jax.random.uniform(jax.random.fold_in(k, 1),
                                 self.sample_idx.shape)
        n = jnp.float32(1 << self.n_bits)
        u = (p.astype(jnp.float32) + jit) / n
        return u, dataclasses.replace(self, dim=self.dim + 1)

    def next_2d(self):
        k = self._dim_key()
        p = feistel_permute(self.sample_idx, self.n_bits, k)
        # multijitter: split permuted index bits across the two axes
        hb = self.n_bits // 2
        lb = self.n_bits - hb
        px = p & jnp.uint32((1 << lb) - 1)
        py = p >> lb
        jx = jax.random.uniform(jax.random.fold_in(k, 1), p.shape)
        jy = jax.random.uniform(jax.random.fold_in(k, 2), p.shape)
        u = jnp.stack([(px.astype(jnp.float32) + jx) / jnp.float32(1 << lb),
                       (py.astype(jnp.float32) + jy) / jnp.float32(1 << hb)],
                      axis=-1)
        return u, dataclasses.replace(self, dim=self.dim + 1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HaltonStream:
    """Low-discrepancy stream (reference `ldsampler`): per-dimension scrambled
    Halton radical inverse of the global sample index.

    Each draw advances the prime base with the dimension counter (a *static*
    Python int — streams are only ever consumed in Python-unrolled tracer
    loops, never as scan carries), so successive dimensions use genuinely
    different radical-inverse sequences; a Cranley-Patterson shift per
    dimension decorrelates repeated base reuse beyond the prime table.
    """

    key: jax.Array
    sample_idx: jax.Array
    dim: int = dataclasses.field(metadata=dict(static=True), default=0)

    @staticmethod
    def make(key, n_lanes: int, sample_idx) -> "HaltonStream":
        lane = jnp.arange(n_lanes, dtype=jnp.uint32)
        base = jnp.asarray(sample_idx, jnp.uint32) * jnp.uint32(n_lanes)
        return HaltonStream(key=jax.random.key_data(key),
                            sample_idx=base + lane, dim=0)

    def _shift(self, extra=0):
        k = jax.random.fold_in(jax.random.wrap_key_data(self.key),
                               self.dim * 2 + extra)
        return jax.random.uniform(k, ())

    def next_1d(self):
        u = radical_inverse(_PRIMES[self.dim % len(_PRIMES)], self.sample_idx)
        u = jnp.mod(u + self._shift(), 1.0)
        return u, dataclasses.replace(self, dim=self.dim + 1)

    def next_2d(self):
        bx = _PRIMES[self.dim % len(_PRIMES)]
        by = _PRIMES[(self.dim + 1) % len(_PRIMES)]
        ux = jnp.mod(radical_inverse(bx, self.sample_idx) + self._shift(0), 1.0)
        uy = jnp.mod(radical_inverse(by, self.sample_idx) + self._shift(1), 1.0)
        return jnp.stack([ux, uy], -1), dataclasses.replace(self, dim=self.dim + 2)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OrthogonalStream:
    """Bose orthogonal-array stream (reference `src/samplers/orthogonal.cpp`,
    Jarosz et al. 2019): N = p^2 samples (p prime) with STRENGTH 2 — every
    pair of dimensions j1 != j2 (j < p) sees each of the p x p coarse cells
    exactly once, a guarantee plain stratification/multijitter cannot make.

    Row i -> (a, b) = (i mod p, i div p); column j value (a + j*b) mod p,
    then a per-dimension affine scramble c -> (m*c + s) mod p (m in [1,p),
    a GF(p) bijection, preserves the OA property) and in-cell jitter.
    """

    key: jax.Array
    sample_idx: jax.Array          # (n,) global indices in [0, p^2)
    dim: jax.Array                 # () consumed dimensions
    p: int = dataclasses.field(metadata=dict(static=True), default=331)

    @staticmethod
    def make(key, n_lanes: int, sample_idx, p: int) -> "OrthogonalStream":
        lane = jnp.arange(n_lanes, dtype=jnp.uint32)
        base = jnp.asarray(sample_idx, jnp.uint32) * jnp.uint32(n_lanes)
        return OrthogonalStream(key=jax.random.key_data(key),
                                sample_idx=(base + lane)
                                % jnp.uint32(p * p),
                                dim=jnp.zeros((), jnp.uint32), p=p)

    def _column(self, j_extra):
        p = jnp.uint32(self.p)
        a = self.sample_idx % p
        b = self.sample_idx // p
        j = self.dim + jnp.uint32(j_extra)
        c = (a + (j % p) * b) % p
        k = jax.random.fold_in(jax.random.wrap_key_data(self.key), j)
        m = jax.random.randint(jax.random.fold_in(k, 0), (), 1, self.p,
                               jnp.uint32)
        s = jax.random.randint(jax.random.fold_in(k, 1), (), 0, self.p,
                               jnp.uint32)
        c = (m * c + s) % p
        jit = jax.random.uniform(jax.random.fold_in(k, 2),
                                 self.sample_idx.shape)
        return (c.astype(jnp.float32) + jit) / jnp.float32(self.p)

    def next_1d(self):
        u = self._column(0)
        return u, dataclasses.replace(self, dim=self.dim + 1)

    def next_2d(self):
        u = jnp.stack([self._column(0), self._column(1)], axis=-1)
        return u, dataclasses.replace(self, dim=self.dim + 2)


def _prime_at_least(n: int) -> int:
    """Smallest prime >= n (trial division; n is a host-side sample count)."""
    c = max(int(n), 2)
    while True:
        if all(c % q for q in range(2, int(c ** 0.5) + 1)):
            return c
        c += 1


def make_stream(kind: str, key, n_lanes: int, sample_idx, n_total_log2: int = 20):
    """Sampler factory (reference sampler plugin registry,
    `src/samplers/`): kind in {'independent', 'stratified', 'multijitter',
    'halton', 'ldsampler', 'orthogonal'}."""
    if kind in ('stratified', 'multijitter'):
        return StratifiedStream.make(key, n_lanes, sample_idx, n_total_log2)
    if kind in ('halton', 'ldsampler'):
        return HaltonStream.make(key, n_lanes, sample_idx)
    if kind == 'orthogonal':
        p = _prime_at_least(int(round((1 << n_total_log2) ** 0.5)))
        return OrthogonalStream.make(key, n_lanes, sample_idx, p)
    return SampleStream.make(key, n_lanes, sample_idx)


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
