"""Differentiable rendering / inverse radar simulation.

Replaces `mitsuba.python.autodiff` (`src/python/python/autodiff.py:121-380`:
`render()`, `SGD`, `Adam`, `render_torch`).  Because the compiled scene is a
pytree of device arrays, the entire signal chain — tracing, WDF antenna
gains, waveform eval, ADC binning, DSP — is differentiable with `jax.grad`
for free; no adjoint machinery is needed.

Typical use: pick optimizable leaves of `SceneData` (reflectance, waveform
parameters, gains, velocities), define a loss on the received signal or
rendered film, and step with the provided optimizers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp


def select_params(scene_data, paths: list[str]):
    """Extract a {path: leaf} dict of optimizable arrays from a SceneData.

    Paths are dotted attribute chains, e.g. 'bsdfs.reflectance',
    'transmitters.wf.f_centre', 'shapes.velocity'.
    """
    out = {}
    for p in paths:
        obj = scene_data
        for k in p.split('.'):
            obj = getattr(obj, k)
        out[p] = obj
    return out


def apply_params(scene_data, params: dict):
    """Return a SceneData with the given leaves replaced (functional)."""
    sd = scene_data
    for path, val in params.items():
        keys = path.split('.')
        sd = _replace_path(sd, keys, val)
    return sd


def _replace_path(obj, keys, val):
    if len(keys) == 1:
        return dataclasses.replace(obj, **{keys[0]: val})
    child = getattr(obj, keys[0])
    return dataclasses.replace(obj, **{keys[0]: _replace_path(child, keys[1:], val)})


def value_and_grad(loss_fn: Callable, scene_data, paths: list[str]):
    """d loss / d params for the selected SceneData leaves.

    loss_fn(scene_data) -> scalar.  Returns (value, grads dict).
    """
    p0 = select_params(scene_data, paths)

    def wrapped(params):
        return loss_fn(apply_params(scene_data, params))

    return jax.value_and_grad(wrapped)(p0)


# ---------------------------------------------------------------------------
# Optimizers (reference autodiff.py SGD:240, Adam:309)
# ---------------------------------------------------------------------------


class SGD:
    """Stochastic gradient descent with optional momentum."""

    def __init__(self, lr: float = 0.1, momentum: float = 0.0):
        self.lr = lr
        self.momentum = momentum
        self.state: dict[str, Any] = {}

    def step(self, params: dict, grads: dict) -> dict:
        out = {}
        for k, g in grads.items():
            if self.momentum > 0:
                v = self.state.get(k, jnp.zeros_like(g))
                v = self.momentum * v + g
                self.state[k] = v
                g = v
            out[k] = params[k] - self.lr * g
        return out


class Adam:
    """Adam (reference `autodiff.py:309`)."""

    def __init__(self, lr: float = 0.05, beta_1: float = 0.9,
                 beta_2: float = 0.999, epsilon: float = 1e-8):
        self.lr, self.b1, self.b2, self.eps = lr, beta_1, beta_2, epsilon
        self.m: dict[str, Any] = {}
        self.v: dict[str, Any] = {}
        self.t = 0

    def step(self, params: dict, grads: dict) -> dict:
        self.t += 1
        out = {}
        for k, g in grads.items():
            m = self.m.get(k, jnp.zeros_like(g))
            v = self.v.get(k, jnp.zeros_like(g))
            m = self.b1 * m + (1 - self.b1) * g
            v = self.b2 * v + (1 - self.b2) * g * g
            self.m[k], self.v[k] = m, v
            mh = m / (1 - self.b1 ** self.t)
            vh = v / (1 - self.b2 ** self.t)
            out[k] = params[k] - self.lr * mh / (jnp.sqrt(vh) + self.eps)
        return out


# ---------------------------------------------------------------------------
# PyTorch interop (reference `render_torch`, autodiff.py:380): expose the
# differentiable signal chain as a torch.autograd.Function so the simulator
# can sit inside a torch training loop / nn.Module pipeline.
# ---------------------------------------------------------------------------


def torch_function(jax_fn: Callable):
    """Wrap `jax_fn(params_dict) -> jax array` as a torch-differentiable
    callable `f({name: torch.Tensor}) -> torch.Tensor`.

    Forward runs under jax (any backend — CPU or TPU); backward replays the
    stored `jax.vjp` and hands the parameter cotangents back to torch.
    Tensors bridge host-side (numpy): torch in this environment is CPU-only
    while jax may hold TPU buffers, so zero-copy dlpack is not generally
    possible — correctness over copy elision.
    """
    import numpy as np
    import torch

    class _Fn(torch.autograd.Function):
        @staticmethod
        def forward(ctx, keys, *tensors):
            params = {k: jnp.asarray(np.asarray(t.detach().cpu()))
                      for k, t in zip(keys, tensors)}
            out, vjp = jax.vjp(jax_fn, params)
            ctx.jax_vjp = vjp
            ctx.keys = keys
            return torch.from_numpy(np.asarray(out).copy())

        @staticmethod
        def backward(ctx, grad_out):
            (gp,) = ctx.jax_vjp(jnp.asarray(np.asarray(grad_out.cpu())))
            grads = tuple(torch.from_numpy(np.asarray(gp[k]).copy())
                          for k in ctx.keys)
            return (None, *grads)

    def call(params: dict):
        keys = tuple(params)
        return _Fn.apply(keys, *(params[k] for k in keys))

    return call


def render_torch(scene_data, paths: list[str], render_fn: Callable):
    """The reference's `render_torch` (autodiff.py:380) for this framework:
    returns (torch_render, params0) where `torch_render({path: tensor})`
    produces a torch tensor of the rendered/received signal, differentiable
    w.r.t. the selected SceneData leaves.

    render_fn(scene_data) -> jax array (e.g. a lambda around `receive` or
    `render`); paths select the optimizable leaves as in `select_params`.
    """
    import numpy as np
    import torch

    def jf(pdict):
        return render_fn(apply_params(scene_data, pdict))

    fn = torch_function(jf)
    params0 = {p: torch.from_numpy(np.asarray(v).copy()).requires_grad_(True)
               for p, v in select_params(scene_data, paths).items()}
    return fn, params0


def differentiable_receive(scene, scene_data, receiver=None, *,
                           forward_pallas: str | bool = 'auto',
                           **receive_kwargs) -> Callable:
    """Kernel-forward / jnp-backward hybrid receive (the TPU answer to the
    reference's `gpu_autodiff_*` variants, `mitsuba.conf:28-31`).

    Returns `f(params_dict) -> adc_grid` usable under `jax.grad`/`jax.jit`:

      * the PRIMAL runs the full `receive()` driver on concrete values via
        `jax.pure_callback` — on TPU with `forward_pallas='auto'` that is
        the Pallas megakernel (~kernel rate), so loss evaluation, line
        searches and previews ride the fast path;
      * the VJP re-traces the differentiable jnp wavefront at the same
        parameters and seed (a different but identically-distributed RNG
        stream than the kernel), so gradients are unbiased estimates of
        the same expectation — the standard two-estimator trick for
        non-differentiable fast forwards.

    `params_dict` maps dotted SceneData paths (as in `select_params`) to
    leaf values.  `receive_kwargs` are forwarded to `receive()` for both
    directions (seed, spp, max_depth, coherent, ...).
    """
    import numpy as np
    from .receive import receive as _receive

    rx = receiver if receiver is not None else scene.receivers[0]
    n_ch = 4 if receive_kwargs.get('polarized') else \
        (2 if receive_kwargs.get('coherent') else 1)
    out_sds = jax.ShapeDtypeStruct(
        (rx.adc.n_time, rx.adc.n_freq, n_ch + 2), jnp.float32)

    def _jnp_forward(params):
        sd = apply_params(scene_data, params)
        adc, _ = _receive(scene, sd, rx, use_pallas=False, **receive_kwargs)
        return adc

    def _fast_forward(params_np):
        p = {k: jnp.asarray(v) for k, v in params_np.items()}
        sd = apply_params(scene_data, p)
        adc, _ = _receive(scene, sd, rx, use_pallas=forward_pallas,
                          **receive_kwargs)
        return np.asarray(adc)

    @jax.custom_vjp
    def f(params):
        return jax.pure_callback(_fast_forward, out_sds, params)

    def f_fwd(params):
        return f(params), params

    def f_bwd(params, ct):
        _, vjp = jax.vjp(_jnp_forward, params)
        return vjp(ct)

    f.defvjp(f_fwd, f_bwd)
    return f


def optimize(loss_fn: Callable, scene_data, paths: list[str], optimizer=None,
             n_steps: int = 50, callback=None):
    """Gradient-descend selected scene parameters against `loss_fn`.

    Returns (optimized SceneData, loss history).
    """
    opt = optimizer or Adam()
    params = select_params(scene_data, paths)

    @jax.jit
    def vg(params):
        return jax.value_and_grad(
            lambda p: loss_fn(apply_params(scene_data, p)))(params)

    history = []
    for i in range(n_steps):
        loss, grads = vg(params)
        params = opt.step(params, grads)
        history.append(float(loss))
        if callback:
            callback(i, float(loss), params)
    return apply_params(scene_data, params), history
