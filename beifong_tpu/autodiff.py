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
