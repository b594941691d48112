"""Chi^2-style validation of warp functions against their pdfs.

TPU-native analogue of the reference's `mitsuba.python.chi2.ChiSquareTest`
(`src/python/python/chi2.py`): histogram many warped samples over solid angle
and compare with the numerically integrated pdf.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beifong_tpu.core import warp

N_SAMPLES = 200_000
GRID = (16, 32)  # theta x phi bins


def _sphere_histogram(dirs):
    theta = np.arccos(np.clip(np.asarray(dirs[..., 2]), -1, 1))
    phi = np.mod(np.arctan2(np.asarray(dirs[..., 1]), np.asarray(dirs[..., 0])), 2 * np.pi)
    h, _, _ = np.histogram2d(theta, phi, bins=GRID,
                             range=[[0, np.pi], [0, 2 * np.pi]])
    return h / dirs.shape[0]


def _expected_mass(pdf_fn):
    # Integrate pdf * sin(theta) over each bin with a 4x4 midpoint rule.
    nt, np_ = GRID
    sub = 16  # fine enough to resolve pdf discontinuities (cone edge) in-bin
    t = (np.arange(nt * sub) + 0.5) * (np.pi / (nt * sub))
    p = (np.arange(np_ * sub) + 0.5) * (2 * np.pi / (np_ * sub))
    tt, pp = np.meshgrid(t, p, indexing='ij')
    d = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp), np.cos(tt)], -1)
    pdf = np.asarray(pdf_fn(jnp.asarray(d)))
    vals = pdf * np.sin(tt)
    cell = (np.pi / (nt * sub)) * (2 * np.pi / (np_ * sub))
    mass = vals.reshape(nt, sub, np_, sub).sum(axis=(1, 3)) * cell
    sup = pdf.reshape(nt, sub, np_, sub) > 0
    frac_sup = sup.mean(axis=(1, 3))
    # Bins straddling a support discontinuity can't be integrated accurately
    # by the midpoint rule — mark them for exclusion from the chi^2.
    edge = (frac_sup > 0) & (frac_sup < 1)
    return mass, edge


def _check(warp_fn, pdf_fn, seed=0):
    u = jax.random.uniform(jax.random.key(seed), (N_SAMPLES, 2))
    dirs = warp_fn(u)
    # Sanity: unit vectors
    np.testing.assert_allclose(np.linalg.norm(np.asarray(dirs), axis=-1), 1.0,
                               atol=1e-4)
    h = _sphere_histogram(dirs)
    e, edge = _expected_mass(pdf_fn)
    # Pearson chi^2 over bins with enough expected mass, away from edges
    mask = (e * N_SAMPLES > 10) & ~edge
    chi2 = ((h - e) ** 2 / np.maximum(e, 1e-12) * N_SAMPLES)[mask].sum()
    dof = mask.sum() - 1
    # Generous bound: chi2/dof should be ~1; fail hard if > 2.
    assert chi2 / dof < 2.0, f"chi2/dof = {chi2 / dof:.2f}"
    # Total mass consistency
    assert h.sum() == pytest.approx(1.0, abs=1e-6)
    assert e.sum() == pytest.approx(1.0, abs=2.5e-2)


def test_cosine_hemisphere():
    _check(warp.square_to_cosine_hemisphere, warp.square_to_cosine_hemisphere_pdf)


def test_uniform_hemisphere():
    _check(warp.square_to_uniform_hemisphere, warp.square_to_uniform_hemisphere_pdf)


def test_uniform_sphere():
    _check(warp.square_to_uniform_sphere, warp.square_to_uniform_sphere_pdf)


def test_uniform_cone():
    ct = 0.8
    _check(lambda u: warp.square_to_uniform_cone(u, ct),
           lambda d: warp.square_to_uniform_cone_pdf(d, ct))


def test_beckmann():
    _check(lambda u: warp.square_to_beckmann(u, 0.4),
           lambda d: warp.square_to_beckmann_pdf(d, 0.4))


def test_ggx():
    _check(lambda u: warp.square_to_ggx(u, 0.4),
           lambda d: warp.square_to_ggx_pdf(d, 0.4))


def test_disk_concentric():
    u = jax.random.uniform(jax.random.key(1), (N_SAMPLES, 2))
    p = np.asarray(warp.square_to_uniform_disk_concentric(u))
    r2 = (p ** 2).sum(-1)
    assert r2.max() <= 1.0 + 1e-5
    # Mean radius^2 of uniform disk = 1/2
    assert r2.mean() == pytest.approx(0.5, abs=5e-3)


def test_uniform_triangle():
    u = jax.random.uniform(jax.random.key(2), (N_SAMPLES, 2))
    b = np.asarray(warp.square_to_uniform_triangle(u))
    assert (b >= 0).all() and (b.sum(-1) <= 1 + 1e-6).all()
    # Barycentric mean of uniform triangle = (1/3, 1/3)
    np.testing.assert_allclose(b.mean(0), [1 / 3, 1 / 3], atol=5e-3)
