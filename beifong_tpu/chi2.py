"""Chi-square statistical test harness for sampling routines.

Library version of `mitsuba.python.chi2.ChiSquareTest`
(`src/python/python/chi2.py:6-40`): validates that a sampling routine's
empirical histogram over the sphere (or unit square) matches its pdf via a
Pearson chi^2 test with discontinuity-aware expected-mass integration.

Used by the test suite (tests/test_core_warp.py) and available to users for
validating custom BSDFs / antenna WDF samplers.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .core.quad import gauss_legendre01


@dataclasses.dataclass
class ChiSquareTest:
    """domain: 'sphere' (direction samplers) or 'square' (2-D warps)."""

    sample_fn: callable           # u (n,2) -> points
    pdf_fn: callable              # points -> density
    domain: str = 'sphere'
    sample_count: int = 200_000
    res: tuple = (16, 32)
    sub_res: int = 16
    seed: int = 0
    significance: float = 0.01

    p_value: float = None
    chi2_stat: float = None
    dof: int = None
    messages: str = ""

    def run(self) -> bool:
        u = jax.random.uniform(jax.random.key(self.seed),
                               (self.sample_count, 2))
        pts = np.asarray(self.sample_fn(u))
        if self.domain == 'sphere':
            h = self._hist_sphere(pts)
            e, edge = self._expected_sphere()
        else:
            h = self._hist_square(pts)
            e, edge = self._expected_square()
        mask = (e * self.sample_count > 5) & ~edge
        chi2 = float(((h - e) ** 2 / np.maximum(e, 1e-12)
                      * self.sample_count)[mask].sum())
        dof = int(mask.sum()) - 1
        self.chi2_stat, self.dof = chi2, dof
        # survival function of chi2 via the regularized upper incomplete
        # gamma function (Wilson-Hilferty approx avoids scipy)
        z = ((chi2 / dof) ** (1 / 3) - (1 - 2 / (9 * dof))) / np.sqrt(2 / (9 * dof))
        from math import erfc, sqrt
        self.p_value = 0.5 * erfc(z / sqrt(2))
        ok = self.p_value > self.significance
        self.messages = (f"chi2={chi2:.1f} dof={dof} "
                         f"p={self.p_value:.4f} -> "
                         f"{'ACCEPT' if ok else 'REJECT'}")
        return ok

    # ------------------------------------------------------------------

    def _hist_sphere(self, d):
        nt, np_ = self.res
        theta = np.arccos(np.clip(d[:, 2], -1, 1))
        phi = np.mod(np.arctan2(d[:, 1], d[:, 0]), 2 * np.pi)
        h, _, _ = np.histogram2d(theta, phi, bins=self.res,
                                 range=[[0, np.pi], [0, 2 * np.pi]])
        return h / d.shape[0]

    def _expected_sphere(self):
        # tensor-product Gauss-Legendre per histogram cell (reference
        # integrates expected masses with quad.h rules; sub_res = GL order,
        # exact for per-cell polynomials of degree 2*sub_res-1)
        nt, np_ = self.res
        s = self.sub_res
        xg, wg = gauss_legendre01(s)
        t = (np.add.outer(np.arange(nt), xg)).reshape(-1) * (np.pi / nt)
        p = (np.add.outer(np.arange(np_), xg)).reshape(-1) * (2 * np.pi / np_)
        tt, pp = np.meshgrid(t, p, indexing='ij')
        d = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                      np.cos(tt)], -1)
        pdf = np.asarray(self.pdf_fn(jnp.asarray(d)))
        vals = pdf * np.sin(tt)
        w2 = np.multiply.outer(wg, wg) * (np.pi / nt) * (2 * np.pi / np_)
        mass = (vals.reshape(nt, s, np_, s)
                * w2[None, :, None, :]).sum(axis=(1, 3))
        sup = pdf.reshape(nt, s, np_, s) > 0
        frac = sup.mean(axis=(1, 3))
        return mass, (frac > 0) & (frac < 1)

    def _hist_square(self, p):
        h, _, _ = np.histogram2d(p[:, 0], p[:, 1], bins=self.res,
                                 range=[[0, 1], [0, 1]])
        return h / p.shape[0]

    def _expected_square(self):
        nx, ny = self.res
        s = self.sub_res
        xg, wg = gauss_legendre01(s)
        x = (np.add.outer(np.arange(nx), xg)).reshape(-1) / nx
        y = (np.add.outer(np.arange(ny), xg)).reshape(-1) / ny
        xx, yy = np.meshgrid(x, y, indexing='ij')
        pdf = np.asarray(self.pdf_fn(jnp.asarray(np.stack([xx, yy], -1))))
        w2 = np.multiply.outer(wg, wg) / (nx * ny)
        mass = (pdf.reshape(nx, s, ny, s)
                * w2[None, :, None, :]).sum(axis=(1, 3))
        sup = pdf.reshape(nx, s, ny, s) > 0
        frac = sup.mean(axis=(1, 3))
        return mass, (frac > 0) & (frac < 1)
