"""Sharded rendering and training steps.

Strategy: jit + NamedSharding (GSPMD). Every per-lane array in the
integrator is elementwise over the pixel dimension and every scene access is
a gather from replicated arrays, so sharding ``pixel_idx`` (and zeros-init
accumulators) over the ``rays`` axis partitions the whole wavefront with no
resharding; XLA inserts exactly two collectives per training step — the
loss/grad psum — and none for forward renders.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.integrator import render_sample
from ..scene.scene import Camera, Scene
from .mesh import RAYS_AXIS, make_mesh, pad_to_devices, ray_sharding, replicated


def render_sharded(scene: Scene, camera: Camera, cfg, mesh=None, seed=None):
    """Forward render with the pixel wavefront sharded over the mesh.

    Returns f32[H, W, 3] mean radiance (fully addressable on host).
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    n_pix = cfg.width * cfg.height
    n_pad = pad_to_devices(n_pix, n_dev)

    pixel_idx = jnp.arange(n_pad, dtype=jnp.int32)
    # Padding lanes re-trace pixel 0; their results are dropped on reshape.
    pixel_idx = jnp.where(pixel_idx < n_pix, pixel_idx, 0)
    pixel_idx = jax.device_put(pixel_idx, ray_sharding(mesh))

    @partial(jax.jit,
             in_shardings=(replicated(mesh), replicated(mesh),
                           ray_sharding(mesh)),
             out_shardings=NamedSharding(mesh, P()),
             static_argnums=())
    def go(scene, camera, pixel_idx):
        acc = jnp.zeros((n_pad, 3), jnp.float32)

        def body(a, k):
            return a + render_sample(scene, camera, cfg, k,
                                     pixel_idx=pixel_idx, seed=seed), None
        acc, _ = jax.lax.scan(body, acc, jnp.arange(cfg.spp, dtype=jnp.uint32))
        return acc / jnp.float32(cfg.spp)

    img = go(scene, camera, pixel_idx)
    return img[:n_pix].reshape(cfg.height, cfg.width, 3)


def make_train_step(scene_template: Scene, camera_template: Camera, cfg,
                    optimizer, mesh):
    """Build a jitted sharded inverse-rendering step.

    Per-device: render the local pixel shard, local-mean loss vs the target
    shard; the global mean and parameter grads reduce over the rays axis via
    GSPMD-inserted collectives. Params/optimizer state stay replicated.
    """
    from ..diff.params import clip_params, set_params

    n_dev = mesh.devices.size
    n_pix = cfg.width * cfg.height
    assert n_pix % n_dev == 0, "pixel count must divide device count"

    pix_shard = ray_sharding(mesh)
    rep = replicated(mesh)

    def loss_fn(params, scene, camera, pixel_idx, target_flat, seed):
        scene, camera = set_params(scene, camera, params)
        acc = jnp.zeros((n_pix, 3), jnp.float32)

        def body(a, k):
            return a + render_sample(scene, camera, cfg, k,
                                     pixel_idx=pixel_idx, seed=seed), None
        acc, _ = jax.lax.scan(body, acc, jnp.arange(cfg.spp, dtype=jnp.uint32))
        img = acc / jnp.float32(cfg.spp)
        return jnp.mean((img - target_flat) ** 2)

    @partial(jax.jit,
             in_shardings=(rep, rep, rep, rep, pix_shard, pix_shard, None),
             out_shardings=(rep, rep, rep))
    def train_step(params, opt_state, scene, camera, pixel_idx, target_flat,
                   seed):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, scene, camera, pixel_idx, target_flat, seed)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        params = clip_params(params)
        return params, opt_state, loss

    return train_step
