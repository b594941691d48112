"""Inverse radar rendering: gradients flow through the full signal chain."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import __graft_entry__ as g
from beifong_tpu.autodiff import (select_params, apply_params, value_and_grad,
                                  optimize, Adam, SGD)
from beifong_tpu import film as film_mod
from beifong_tpu.core.rng import SampleStream
from beifong_tpu.radar.endpoints import rx_sample_ray, rx_sample_frequency
from beifong_tpu.integrators.radar_path import radar_receive_trace


def _signal(scene_data, rx, shape_idx, n=2048, seed=0):
    cfg = rx.adc
    stream = SampleStream.make(jax.random.key(seed), n, 0)
    u_t, stream = stream.next_1d()
    t_rx = cfg.sampling_start + u_t * cfg.sampling_time
    u_f, stream = stream.next_1d()
    f_rx, f_w = rx_sample_frequency(rx.receive_type, None, scene_data.band,
                                    t_rx, u_f)
    u_pos, stream = stream.next_2d()
    u_dir, stream = stream.next_2d()
    o, d, w = rx_sample_ray(scene_data, rx, shape_idx, t_rx, u_pos, u_dir)
    adc = film_mod.film_new(cfg.n_time, cfg.n_freq, 1)
    adc, _ = radar_receive_trace(scene_data, stream, o, d, t_rx, f_rx,
                                 w * f_w, adc, cfg, rx.receive_type, None,
                                 jnp.zeros(3), max_depth=2)
    return adc[..., 0]


def test_gradient_through_radar_chain():
    s, rx = g._build_scene(ground=False, rx_kind="omni")
    sd = s.compile()
    shape_idx = s.shape_index_of_endpoint('receiver', rx.id)

    def loss(scene_data):
        return jnp.sum(_signal(scene_data, rx, shape_idx, n=16384, seed=1))

    val, grads = value_and_grad(loss, sd, ['bsdfs.reflectance',
                                           'transmitters.wf.amplitude'])
    assert np.isfinite(val) and val > 0
    g_refl = np.asarray(grads['bsdfs.reflectance'])
    g_amp = np.asarray(grads['transmitters.wf.amplitude'])
    # total received power increases with target reflectance and tx amplitude
    assert g_refl[0, 0] > 0
    assert g_amp > 0
    # signal ~ amplitude^2 -> d(signal)/d(amp) = 2*signal/amp
    assert float(g_amp) == pytest.approx(2 * float(val), rel=1e-3)


def test_optimize_recovers_reflectance():
    """Inverse problem: recover the target reflectance that produced an
    observed signal (reference autodiff.py's optimization loop)."""
    s, rx = g._build_scene(ground=False, rx_kind="omni")
    sd_true = s.compile()
    shape_idx = s.shape_index_of_endpoint('receiver', rx.id)
    # ground truth: reflectance 0.7
    sd_true = apply_params(sd_true, {
        'bsdfs.reflectance': jnp.full_like(sd_true.bsdfs.reflectance, 0.7)})
    target = _signal(sd_true, rx, shape_idx, n=8192, seed=1)

    sd0 = apply_params(sd_true, {
        'bsdfs.reflectance': jnp.full_like(sd_true.bsdfs.reflectance, 0.2)})

    def loss(scene_data):
        sig = _signal(scene_data, rx, shape_idx, n=8192, seed=1)  # same noise
        return jnp.sum((sig - target) ** 2) * 1e12

    sd_opt, hist = optimize(loss, sd0, ['bsdfs.reflectance'],
                            optimizer=Adam(lr=0.1), n_steps=30)
    refl = float(np.asarray(sd_opt.bsdfs.reflectance)[0, 0])
    assert hist[-1] < hist[0] * 1e-2, f"loss did not converge: {hist[:3]}...{hist[-3:]}"
    assert refl == pytest.approx(0.7, abs=0.05)


@pytest.mark.slow
def test_geometry_gradient_no_nan():
    """Gradients through the INTERSECTOR (target position -> path delay ->
    signal) are finite and informative.  Regression: safe_sqrt(max(x,0))
    back-propagated 0*inf = NaN through miss-lane discriminants, so any
    geometry gradient came out NaN."""
    import dataclasses as dc
    from beifong_tpu.geometry.intersect import closest_hit

    s, rx = g._build_scene(ground=False, rx_kind="omni")
    sd = s.compile()

    def with_dy(dy):
        # slide the target (shape row 1): to_world AND the cached inverse
        tw = sd.shapes.to_world.at[1, 1, 3].add(dy)
        to = sd.shapes.to_object.at[1, :3, 3].add(
            -sd.shapes.to_object[1, :3, 1] * dy)
        return dc.replace(sd, shapes=dc.replace(sd.shapes, to_world=tw,
                                                to_object=to))

    o = jnp.asarray(np.tile([[-0.3, 0.0, 0.0]], (64, 1)), jnp.float32)
    dn = np.zeros((64, 3), np.float32)
    dn[:, 1] = -1.0
    dn[:, 0] = np.linspace(-0.1, 0.1, 64)
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    d = jnp.asarray(dn)

    def hit_t_sum(dy):
        si = closest_hit(with_dy(dy).shapes, None, o, d)
        t = si.t
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    grad_t = float(jax.grad(hit_t_sum)(jnp.float32(0.1)))
    assert np.isfinite(grad_t), grad_t
    # moving the target closer (dy > 0 moves +y, toward the sensors at
    # y=0 from y=-4) shortens the hit distances
    assert grad_t < 0.0, grad_t

    # and through the full signal chain: finite, and the data-misfit
    # gradient points back toward the true position
    shape_idx = s.shape_index_of_endpoint('receiver', rx.id)
    obs = _signal(with_dy(0.0), rx, shape_idx, n=16384, seed=1)

    def loss(dy):
        sig = _signal(with_dy(dy), rx, shape_idx, n=16384, seed=1)
        return jnp.mean((sig - obs) ** 2)

    g_dy = float(jax.grad(loss)(jnp.float32(0.05)))
    assert np.isfinite(g_dy), g_dy


def test_sgd_and_adam_steps():
    p = {'x': jnp.array([1.0, 2.0])}
    gr = {'x': jnp.array([0.5, -0.5])}
    sgd = SGD(lr=0.1, momentum=0.9)
    p2 = sgd.step(p, gr)
    np.testing.assert_allclose(np.asarray(p2['x']), [0.95, 2.05])
    adam = Adam(lr=0.1)
    p3 = adam.step(p, gr)
    assert np.all(np.isfinite(np.asarray(p3['x'])))
    np.testing.assert_allclose(np.asarray(p3['x']), [0.9, 2.1], atol=1e-5)


@pytest.mark.slow
def test_render_torch_interop():
    """The reference's `render_torch` (autodiff.py:380): the simulator runs
    inside a torch training loop — torch.autograd gradients match jax.grad,
    and a torch Adam recovers the target reflectance."""
    torch = pytest.importorskip("torch")
    from beifong_tpu.autodiff import render_torch, value_and_grad

    s, rx = g._build_scene(ground=False, rx_kind="omni")
    sd = s.compile()
    shape_idx = s.shape_index_of_endpoint('receiver', rx.id)

    def render_fn(scene_data):
        return _signal(scene_data, rx, shape_idx, n=16384, seed=1)

    sd_true = apply_params(sd, {
        'bsdfs.reflectance': jnp.full_like(sd.bsdfs.reflectance, 0.7)})
    target = torch.from_numpy(np.asarray(render_fn(sd_true)).copy())
    assert float(target.abs().sum()) > 0

    sd0 = apply_params(sd, {
        'bsdfs.reflectance': jnp.full_like(sd.bsdfs.reflectance, 0.2)})
    fn, params = render_torch(sd0, ['bsdfs.reflectance'], render_fn)

    # gradient parity: torch backward == jax.grad of the same scalar loss
    out = fn(params)
    loss_t = ((out - target) ** 2).sum() * 1e12
    loss_t.backward()
    g_torch = params['bsdfs.reflectance'].grad.numpy().copy()

    def loss_j(scene_data):
        sig = render_fn(scene_data)
        return jnp.sum((sig - jnp.asarray(np.asarray(target))) ** 2) * 1e12

    _, g_jax = value_and_grad(loss_j, sd0, ['bsdfs.reflectance'])
    np.testing.assert_allclose(g_torch, np.asarray(g_jax['bsdfs.reflectance']),
                               rtol=1e-4)

    # end-to-end torch optimization loop
    opt = torch.optim.Adam(params.values(), lr=0.1)
    first = None
    for _ in range(25):
        opt.zero_grad()
        loss_t = ((fn(params) - target) ** 2).sum() * 1e12
        if first is None:
            first = float(loss_t)
        loss_t.backward()
        opt.step()
    refl = float(params['bsdfs.reflectance'].detach()[0, 0])
    assert float(loss_t) < first * 0.05
    assert refl == pytest.approx(0.7, abs=0.1)


def test_grad_through_receive_traced_guard():
    """jax.grad straight through receive(): the tracer guard must route
    'auto' to the differentiable jnp wavefront (VERDICT r4 #3 — on TPU
    'auto' would otherwise hand grad a non-differentiable pallas_call),
    and an explicit use_pallas=True under a trace must raise."""
    from beifong_tpu.receive import receive

    s, rx = g._build_scene(ground=False, rx_kind="omni")
    sd = s.compile()

    def loss(scene_data, use_pallas):
        adc, _ = receive(s, scene_data, rx, spp=4096, max_depth=2,
                         seed=3, time_sampling='gate',
                         use_pallas=use_pallas)
        return jnp.sum(adc[..., 0])

    val, grads = value_and_grad(
        lambda p: loss(p, 'auto'), sd, ['bsdfs.reflectance'])
    assert np.isfinite(val) and val > 0
    assert np.asarray(grads['bsdfs.reflectance'])[0, 0] > 0

    with pytest.raises(ValueError, match="trace"):
        value_and_grad(lambda p: loss(p, True), sd, ['bsdfs.reflectance'])


def test_differentiable_receive_hybrid():
    """Kernel-forward/jnp-backward hybrid: the primal equals a plain
    receive() call and the VJP matches jax.grad of the jnp wavefront."""
    from beifong_tpu.autodiff import differentiable_receive
    from beifong_tpu.receive import receive

    s, rx = g._build_scene(ground=False, rx_kind="omni")
    sd = s.compile()
    kw = dict(spp=4096, max_depth=2, seed=5,
              time_sampling='gate')
    f = differentiable_receive(s, sd, rx, **kw)
    params = select_params(sd, ['bsdfs.reflectance'])

    adc = f(params)
    adc_ref, _ = receive(s, sd, rx, use_pallas='auto', **kw)
    np.testing.assert_allclose(np.asarray(adc), np.asarray(adc_ref),
                               rtol=1e-6)

    val, grads = jax.value_and_grad(
        lambda p: jnp.sum(f(p)[..., 0]))(params)
    # reference gradient: plain jnp-wavefront vjp
    def jnp_loss(p):
        adc_j, _ = receive(s, apply_params(sd, p), rx, use_pallas=False,
                           **kw)
        return jnp.sum(adc_j[..., 0])
    val_j, grads_j = jax.value_and_grad(jnp_loss)(params)
    np.testing.assert_allclose(
        np.asarray(grads['bsdfs.reflectance']),
        np.asarray(grads_j['bsdfs.reflectance']), rtol=1e-5)
    assert np.isfinite(float(val)) and float(val) > 0
