"""Differentiable rendering losses and gradient entry points."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.integrator import render
from .params import set_params


def render_with_params(params, scene, camera, cfg, seed=None):
    """Render after injecting ``params`` — the differentiable forward."""
    scene, camera = set_params(scene, camera, params)
    return render(scene, camera, cfg, seed=seed)


def l2_image_loss(params, scene, camera, cfg, target, seed=None):
    """Mean squared pixel error against a target image f32[H,W,3]."""
    img = render_with_params(params, scene, camera, cfg, seed=seed)
    return jnp.mean((img - target) ** 2)


def loss_and_grad(params, scene, camera, cfg, target, seed=None):
    """(loss, grads) — jit-wrap at the call site with cfg static."""
    return jax.value_and_grad(l2_image_loss)(params, scene, camera, cfg,
                                             target, seed)


def finite_difference_grad(loss_fn, params, key, eps=1e-3, indices=None):
    """Central finite differences of ``loss_fn(params)`` w.r.t. params[key].

    ``indices``: optional list of flat indices to probe (all if None —
    only sane for small parameters). Returns an array shaped like
    params[key] with FD values at the probed entries (0 elsewhere).
    """
    import numpy as np
    base = np.asarray(params[key]).astype(np.float64)
    flat = base.reshape(-1)
    out = np.zeros_like(flat)
    probe = range(flat.size) if indices is None else indices
    for i in probe:
        for sgn in (+1, -1):
            pert = flat.copy()
            pert[i] += sgn * eps
            p = dict(params)
            p[key] = jnp.asarray(pert.reshape(base.shape), jnp.float32)
            val = float(loss_fn(p))
            out[i] += sgn * val
        out[i] /= (2 * eps)
    return out.reshape(base.shape)
