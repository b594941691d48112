import jax.numpy as jnp
import numpy as np
import pytest

from beifong_tpu.core import math as m


def test_sinc():
    assert float(m.sinc(0.0)) == pytest.approx(1.0)
    x = np.linspace(-10, 10, 101)
    np.testing.assert_allclose(np.asarray(m.sinc(x)),
                               np.sinc(x / np.pi), rtol=2e-5, atol=1e-6)


def test_tri_rect():
    assert float(m.tri(0.0)) == 1.0
    assert float(m.tri(0.25)) == pytest.approx(0.5)
    assert float(m.tri(0.5)) == 0.0
    assert float(m.tri(-0.25)) == pytest.approx(0.5)
    assert float(m.rect(0.49)) == 1.0
    assert float(m.rect(0.51)) == 0.0


def test_wchirp_matches_formula():
    # W(t,f) = 2 a^2 w tri(t/w) sinc(2 pi f w tri(t/w)) — reference math.h:127-131
    t, f, w, a = 0.01, 120.0, 0.09, 1.5
    tw = max(0.0, 1 - 2 * abs(t / w))
    arg = 2 * np.pi * f * w * tw
    expect = 2 * a * a * w * tw * (np.sin(arg) / arg)
    assert float(m.wchirp(t, f, w, a)) == pytest.approx(expect, rel=1e-5)


def test_wchirp_peak_and_negativity():
    # At the chirp centre and zero frequency offset: W = 2 a^2 w.
    assert float(m.wchirp(0.0, 0.0, 0.1, 2.0)) == pytest.approx(2 * 4 * 0.1)
    # WDF of a chirp goes negative off the ridge for some (t, f).
    f = np.linspace(0, 2000.0, 4001)
    vals = np.asarray(m.wchirp(0.02, f, 0.09, 1.0))
    assert vals.min() < 0


def test_fmodulo():
    np.testing.assert_allclose(float(m.fmodulo(5.5, 2.0)), 1.5, rtol=1e-6)
    np.testing.assert_allclose(float(m.fmodulo(-0.5, 2.0)), 1.5, rtol=1e-6)


def test_mis_power_heuristic():
    assert float(m.mis_weight(1.0, 1.0)) == pytest.approx(0.5)
    assert float(m.mis_weight(0.0, 1.0)) == 0.0
    assert float(m.mis_weight(2.0, 1.0)) == pytest.approx(4 / 5)


def test_two_prod_exact():
    a, b = np.float32(123.456789), np.float32(0.00854271)
    p, e = m.two_prod(jnp.float32(a), jnp.float32(b))
    import decimal
    decimal.getcontext().prec = 60
    exact = decimal.Decimal(float(a)) * decimal.Decimal(float(b))
    got = decimal.Decimal(float(p)) + decimal.Decimal(float(e))
    assert abs(float(got - exact)) < 1e-12


def test_wlfrac_accumulation_long_path():
    # 500 segments of ~123.4568 m at lambda=8.5 mm -> ~7.3e6 total cycles;
    # plain f32 has completely aliased by then (ulp ~ 0.5 cycles), the
    # wlfrac accumulator must stay phase-accurate to < 1e-3 cycles.
    seg = np.float32(123.456789)
    lam = np.float32(0.0085)
    inv = m.ds_inv(jnp.float32(lam))
    acc = m.wlfrac_zero(())
    for _ in range(500):
        acc = m.wlfrac_add_dist(acc, jnp.float32(seg), inv)
    import decimal
    decimal.getcontext().prec = 60
    expect = float(500 * decimal.Decimal(float(seg)) / decimal.Decimal(float(lam)) % 1)
    got = float(m.wlfrac_phase(acc)) / (2 * np.pi)
    err = min(abs(got - expect), 1 - abs(got - expect))
    assert err < 1e-3, f"cycle error {err}"


def test_wlfrac_phase_offsets():
    acc = m.wlfrac_zero(())
    acc = m.wlfrac_add_phase(acc, jnp.float32(np.pi))      # half cycle
    acc = m.wlfrac_add_phase(acc, jnp.float32(np.pi / 2))  # quarter
    assert float(m.wlfrac_phase(acc)) == pytest.approx(1.5 * np.pi, rel=1e-5)
    acc = m.wlfrac_add_phase(acc, jnp.float32(np.pi))      # wraps
    assert float(m.wlfrac_phase(acc)) == pytest.approx(0.5 * np.pi, rel=1e-5)


def test_normalize_and_frames():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 0.0, 1.0]])
    n = np.asarray(m.normalize(v))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)
