"""Heterogeneous (gridded) medium tests: delta tracking vs analytic
homogeneous limit, ratio-tracking transmittance."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from beifong_tpu.media import HeterogeneousMedium


def _uniform_grid(sigma, n=8):
    return np.full((n, n, n), sigma, np.float32)


def test_delta_tracking_matches_homogeneous():
    """A uniform grid must reproduce the exponential free-flight law."""
    sigma = 1.5
    med = HeterogeneousMedium.make(_uniform_grid(sigma),
                                   box_min=(-50, -50, -50),
                                   box_max=(50, 50, 50))
    n = 100_000
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    u = jax.random.uniform(jax.random.key(0), (n, 64))
    t, hit = med.sample_distance(o, d, u, jnp.full((n,), 40.0))
    t = np.asarray(t)
    assert np.asarray(hit).mean() > 0.999
    assert t[np.asarray(hit)].mean() == pytest.approx(1 / sigma, rel=0.02)


def test_delta_tracking_vacuum_region():
    """Half-vacuum grid: rays starting in the vacuum half fly freely until
    the dense half."""
    g = np.zeros((8, 8, 8), np.float32)
    g[4:] = 5.0          # dense for z > 0 (z axis = grid dim 0)
    med = HeterogeneousMedium.make(g, box_min=(-10, -10, -10),
                                   box_max=(10, 10, 10))
    n = 50_000
    o = jnp.tile(jnp.array([[0.0, 0.0, -9.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    u = jax.random.uniform(jax.random.key(1), (n, 128))
    t, hit = med.sample_distance(o, d, u, jnp.full((n,), 19.0))
    t = np.asarray(t)[np.asarray(hit)]
    # no collisions before the boundary at z=0 (t=9)
    assert (t > 8.99).all()
    # mean penetration into the dense half ~ 1/5
    assert (t - 9.0).mean() == pytest.approx(1 / 5.0, rel=0.05)


def test_ratio_tracking_transmittance():
    sigma = 0.7
    med = HeterogeneousMedium.make(_uniform_grid(sigma),
                                   box_min=(-50, -50, -50),
                                   box_max=(50, 50, 50))
    n = 20_000
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (n, 1))
    dist = jnp.full((n,), 2.0)
    tr = med.transmittance(o, d, dist, jax.random.key(2), n_estimates=8,
                          max_steps=64)
    assert float(np.asarray(tr).mean()) == pytest.approx(
        np.exp(-sigma * 2.0), rel=0.03)


def test_sigma_lookup_outside_box_zero():
    med = HeterogeneousMedium.make(_uniform_grid(3.0))
    p = jnp.array([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    s = np.asarray(med.sigma_at(p))
    assert s[0] == pytest.approx(3.0)
    assert s[1] == 0.0


def test_optical_depth_quadrature():
    """Midpoint optical depth: uniform grid gives sigma*dist exactly; a
    two-layer grid gives the layer-weighted integral."""
    sigma = 0.8
    med = HeterogeneousMedium.make(_uniform_grid(sigma),
                                   box_min=(-10, -10, -10),
                                   box_max=(10, 10, 10))
    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    tau = float(np.asarray(med.optical_depth(o, d, jnp.array([8.0])))[0])
    assert tau == pytest.approx(sigma * 8.0, rel=1e-5)
    g = np.zeros((8, 8, 8), np.float32)
    g[4:] = 2.0   # z > 0 half
    med2 = HeterogeneousMedium.make(g, box_min=(-10, -10, -10),
                                    box_max=(10, 10, 10))
    tau2 = float(np.asarray(med2.optical_depth(
        o, d, jnp.array([10.0]), n_samples=64))[0])
    assert tau2 == pytest.approx(2.0 * 5.0, rel=0.05)


def test_radar_receive_with_heterogeneous_medium():
    """The radar chain accepts an ambient HETEROGENEOUS medium: a uniform
    grid attenuates the point-target echo by exp(-sigma * path) exactly
    like the homogeneous medium (regression: this used to crash — the
    chain called the homogeneous transmittance signature)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import test_radar as TR
    from beifong_tpu.media import HomogeneousMedium
    from beifong_tpu.receive import receive, develop_signal

    def run(med):
        s, rx = TR._point_target_scene()
        s.medium = med
        sd = s.compile()
        a, n = receive(s, sd, rx, seed=2, spp=1 << 12, max_depth=1,
                       time_sampling='gate')
        return np.asarray(develop_signal(a, n, rx.adc))[:, 0, 0]

    sigma = 0.05
    hom = run(HomogeneousMedium.make(sigma_t=sigma))
    het = run(HeterogeneousMedium.make(
        _uniform_grid(sigma), box_min=(-20, -20, -20),
        box_max=(20, 20, 20)))
    assert het.sum() > 0
    pk = int(hom.argmax())
    assert int(het.argmax()) == pk
    # same seed, same estimator: uniform grid == homogeneous bit-for-bit
    # up to the quadrature (exact for a uniform grid)
    np.testing.assert_allclose(het, hom, rtol=1e-4)


def test_megakernel_grid3_medium_matches_jnp():
    """Small 3-D sigma grids run IN-KERNEL (VERDICT r4 #7): the (D,H,W)
    grid rides the bitmap texture table as one-hot MXU gathers and the
    segment tau is the same 16-point midpoint quadrature as
    HeterogeneousMedium.optical_depth.  Parity: a half-space absorber
    (sigma on the target side only) must attenuate the kernel echo by the
    same factor as the jnp wavefront, and a uniform grid must match the
    kernel's own homogeneous path bit-for-bit."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import test_radar as TR
    from beifong_tpu.media import HomogeneousMedium
    from beifong_tpu.receive import receive, develop_signal
    from beifong_tpu.integrators.pallas_receive import supported

    def run(med, use_pallas):
        s, rx = TR._point_target_scene()
        s.medium = med
        sd = s.compile()
        if use_pallas:
            why = []
            assert supported(sd, rx, why), why
        a, n = receive(s, sd, rx, seed=2, spp=1 << 12, max_depth=1,
                       time_sampling='gate', use_pallas=use_pallas)
        return np.asarray(develop_signal(a, n, rx.adc))[:, 0, 0]

    sigma = 0.05
    # uniform grid in-kernel == homogeneous in-kernel (quadrature exact)
    hom_k = run(HomogeneousMedium.make(sigma_t=sigma), True)
    het_k = run(HeterogeneousMedium.make(
        np.full((4, 4, 8), sigma, np.float32), box_min=(-20, -20, -20),
        box_max=(20, 20, 20)), True)
    assert het_k.sum() > 0
    np.testing.assert_allclose(het_k, hom_k, rtol=1e-3)

    # non-uniform grid: kernel vs jnp wavefront attenuation RATIO (the
    # two paths use different RNG streams, so compare each against its
    # own vacuum run — the attenuation factor is deterministic)
    g = np.zeros((4, 4, 8), np.float32)
    g[:, :2, :] = 0.08          # absorber on the y<0 half (target side)
    med = lambda: HeterogeneousMedium.make(
        g, box_min=(-20, -20, -20), box_max=(20, 20, 20))
    for up in (True, False):
        vac = run(None, up)
        att = run(med(), up)
        pk = int(vac.argmax())
        r = att[pk] / vac[pk]
        if up:
            r_k = r
        else:
            r_j = r
    assert r_k == pytest.approx(r_j, rel=0.05), (r_k, r_j)
