"""Polarization tests: Malus's law, quarter-wave plates, Fresnel Mueller
matrices, Brewster angle."""

import numpy as np
import pytest
import jax.numpy as jnp

from beifong_tpu import mueller as mu


def test_malus_law():
    """Crossed polarizers: I = I0/2 * cos^2(theta)."""
    s = mu.unpolarized(2.0)
    p0 = mu.linear_polarizer(1.0, 0.0)
    s1 = mu.apply(p0, s)
    assert float(s1[0]) == pytest.approx(1.0)        # half passes
    assert float(mu.degree_of_polarization(s1)) == pytest.approx(1.0)
    for theta in (0.0, np.pi / 6, np.pi / 4, np.pi / 2):
        p1 = mu.linear_polarizer(1.0, theta)
        s2 = mu.apply(p1, s1)
        assert float(s2[0]) == pytest.approx(np.cos(theta) ** 2, abs=1e-6), theta


def test_quarter_wave_circular():
    """Linear @45 deg through a quarter-wave plate at 0 -> circular."""
    s = mu.apply(mu.linear_polarizer(1.0, np.pi / 4), mu.unpolarized(2.0))
    qwp = mu.retarder(np.pi / 2, 0.0)
    s2 = mu.apply(qwp, s)
    assert abs(float(s2[3])) == pytest.approx(float(s2[0]), rel=1e-5)
    assert float(s2[1]) == pytest.approx(0.0, abs=1e-6)


def test_rotator_roundtrip():
    s = jnp.array([1.0, 0.5, 0.2, 0.1])
    r = mu.rotator(jnp.float32(0.7))
    back = mu.apply(mu.rotator(jnp.float32(-0.7)), mu.apply(r, s))
    np.testing.assert_allclose(np.asarray(back), np.asarray(s), atol=1e-6)


def test_fresnel_dielectric_brewster():
    """At Brewster's angle, reflected light is fully polarized (rp = 0)."""
    eta = 1.5
    brewster = np.arctan(eta)
    m = mu.specular_reflection(jnp.float32(np.cos(brewster)), jnp.float32(eta))
    s_out = mu.apply(m, mu.unpolarized(1.0))
    dop = float(mu.degree_of_polarization(s_out))
    assert dop == pytest.approx(1.0, abs=1e-3)
    # off Brewster: partial polarization
    m2 = mu.specular_reflection(jnp.float32(np.cos(0.2)), jnp.float32(eta))
    dop2 = float(mu.degree_of_polarization(mu.apply(m2, mu.unpolarized(1.0))))
    assert dop2 < 0.5


def test_fresnel_conductor_energy():
    """Conductor Mueller matrix S0 row matches scalar Fresnel reflectance."""
    from beifong_tpu.bsdf.eval import fresnel_conductor
    eta, k = 0.2, 3.0
    for ci in (1.0, 0.7, 0.3):
        m = mu.specular_reflection(jnp.float32(ci), jnp.float32(eta),
                                   jnp.float32(k))
        r_mueller = float(mu.apply(m, mu.unpolarized(1.0))[0])
        r_scalar = float(fresnel_conductor(
            jnp.float32(ci), jnp.full((1,), eta), jnp.full((1,), k))[0])
        assert r_mueller == pytest.approx(r_scalar, rel=1e-4), ci
