"""Sampler stream tests: stratification coverage, permutation validity,
Halton low discrepancy."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from beifong_tpu.core.rng import (SampleStream, StratifiedStream, HaltonStream,
                                  feistel_permute, make_stream)


def test_feistel_is_permutation():
    for n_bits in (10, 13):   # even and odd (cycle-walking) widths
        x = jnp.arange(1 << n_bits, dtype=jnp.uint32)
        y = np.asarray(feistel_permute(x, n_bits, jax.random.key(3)))
        assert sorted(y.tolist()) == list(range(1 << n_bits)), n_bits
        y2 = np.asarray(feistel_permute(x, n_bits, jax.random.key(4)))
        assert not np.array_equal(y, y2)


def test_stratified_full_coverage():
    """With n_lanes == 2^k total samples, every 1-D stratum is hit exactly
    once, in every dimension."""
    k = 12
    s = StratifiedStream.make(jax.random.key(0), 1 << k, 0, n_total_log2=k)
    for _ in range(3):
        u, s = s.next_1d()
        strata = np.sort((np.asarray(u) * (1 << k)).astype(int))
        np.testing.assert_array_equal(strata, np.arange(1 << k))


def test_stratified_2d_coverage():
    k = 12
    s = StratifiedStream.make(jax.random.key(1), 1 << k, 0, n_total_log2=k)
    u, s = s.next_2d()
    u = np.asarray(u)
    # multijitter: the (2^6 x 2^6) grid of 2-D strata each hit exactly once
    gx = (u[:, 0] * 64).astype(int)
    gy = (u[:, 1] * 64).astype(int)
    cells = gx * 64 + gy
    assert len(np.unique(cells)) == 1 << k


def test_stratified_variance_reduction():
    """Stratified mean of a smooth integrand has much lower error than
    independent sampling."""
    n, k = 4096, 12
    f = lambda u: jnp.sin(2 * jnp.pi * u) ** 2
    errs_ind, errs_str = [], []
    for seed in range(8):
        si = SampleStream.make(jax.random.key(seed), n, 0)
        u, _ = si.next_1d()
        errs_ind.append(abs(float(f(u).mean()) - 0.5))
        ss = StratifiedStream.make(jax.random.key(seed), n, 0, n_total_log2=k)
        u, _ = ss.next_1d()
        errs_str.append(abs(float(f(u).mean()) - 0.5))
    assert np.mean(errs_str) < np.mean(errs_ind) / 5


def test_halton_low_discrepancy():
    s = HaltonStream.make(jax.random.key(0), 1024, 0)
    u, s = s.next_2d()
    u = np.asarray(u)
    # star discrepancy proxy: max deviation of counts in dyadic boxes
    for frac in (0.25, 0.5):
        cnt = ((u[:, 0] < frac) & (u[:, 1] < frac)).mean()
        assert cnt == pytest.approx(frac * frac, abs=0.01)


def test_make_stream_kinds():
    for kind in ('independent', 'stratified', 'multijitter', 'halton',
                 'ldsampler'):
        s = make_stream(kind, jax.random.key(0), 256, 0, n_total_log2=8)
        u1, s = s.next_1d()
        u2, s = s.next_2d()
        assert u1.shape == (256,) and u2.shape == (256, 2)
        assert 0 <= float(u1.min()) and float(u1.max()) < 1


def test_halton_dims_decorrelated():
    """Successive Halton dimensions advance the prime base: dimensions must
    NOT be shifted copies of one another (ADVICE r1: base-2-everywhere made
    u_d+1 - u_d constant mod 1 for all samples)."""
    s = HaltonStream.make(jax.random.key(2), 1024, 0)
    u0, s = s.next_1d()
    u1, s = s.next_1d()
    d = np.mod(np.asarray(u1) - np.asarray(u0), 1.0)
    assert np.std(d) > 0.05  # a shifted copy would give std == 0
    # 2-D draws use two distinct bases (a proper Halton point set)
    uv, s = s.next_2d()
    duv = np.mod(np.asarray(uv[:, 1]) - np.asarray(uv[:, 0]), 1.0)
    assert np.std(duv) > 0.05


def test_halton_low_discrepancy():
    s = HaltonStream.make(jax.random.key(5), 4096, 0)
    for _ in range(4):
        u, s = s.next_1d()
        err = abs(float(jnp.mean(u)) - 0.5)
        assert err < 0.01  # LDS converges ~1/N, MC ~1/sqrt(N)~0.008


def test_orthogonal_strength2():
    """Bose OA, strength 2 (reference src/samplers/orthogonal.cpp): drawing
    all p^2 samples, every pair of dimensions covers each of the p x p
    coarse cells exactly once, and each 1-D column is p-stratified."""
    from beifong_tpu.core.rng import OrthogonalStream
    p = 7
    s = OrthogonalStream.make(jax.random.key(0), p * p, 0, p)
    cols = []
    for _ in range(4):
        u, s = s.next_1d()
        u = np.asarray(u)
        c = (u * p).astype(int)
        # 1-D: each coarse stratum hit exactly p times
        np.testing.assert_array_equal(np.bincount(c, minlength=p),
                                      np.full(p, p))
        cols.append(c)
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            cells = cols[i] * p + cols[j]
            assert len(np.unique(cells)) == p * p, (i, j)


def test_orthogonal_make_stream():
    s = make_stream('orthogonal', jax.random.key(1), 256, 0, n_total_log2=16)
    u1, s = s.next_1d()
    uv, s = s.next_2d()
    assert u1.shape == (256,) and uv.shape == (256, 2)
    assert 0.0 <= float(u1.min()) and float(uv.max()) < 1.0
    # scramble differs per key
    s2 = make_stream('orthogonal', jax.random.key(2), 256, 0, n_total_log2=16)
    u1b, _ = s2.next_1d()
    assert not np.allclose(np.asarray(u1), np.asarray(u1b))
