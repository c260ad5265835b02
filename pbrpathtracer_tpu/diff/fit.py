"""Inverse-rendering optimization loop (BASELINE config 5's "fit of
materials+lights"): optax on the differentiable parameter pytree."""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax

from .loss import l2_image_loss
from .params import clip_params, get_params, set_params


@dataclasses.dataclass
class FitResult:
    params: dict
    losses: list
    scene: object
    camera: object


def fit(scene, camera, cfg, target, *, steps=100, lr=2e-2,
        materials=True, textures=False, camera_lens=False,
        sample_offset_per_step=True, optimizer=None, callback=None):
    """Fit selected scene/camera parameters to a target image.

    ``sample_offset_per_step`` re-seeds each step (different MC sample set)
    so the optimizer sees fresh noise — standard stochastic inverse
    rendering practice.
    """
    params = get_params(scene, camera, materials=materials,
                        textures=textures, camera_lens=camera_lens)
    opt = optimizer if optimizer is not None else optax.adam(lr)
    opt_state = opt.init(params)
    target = jnp.asarray(target)

    @jax.jit
    def step(params, opt_state, target, seed):
        loss, grads = jax.value_and_grad(l2_image_loss)(
            params, scene, camera, cfg, target, seed)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = clip_params(params)
        return params, opt_state, loss

    losses = []
    for s in range(steps):
        seed = jnp.uint32(cfg.seed + (s if sample_offset_per_step else 0))
        params, opt_state, loss = step(params, opt_state, target, seed)
        losses.append(float(loss))
        if callback is not None:
            callback(s, losses[-1], params)

    final_scene, final_camera = set_params(scene, camera, params)
    return FitResult(params=params, losses=losses, scene=final_scene,
                     camera=final_camera)
