"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4: multi-host
behavior validated without a pod via xla_force_host_platform_device_count)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from pbrpathtracer_tpu.scene.builders import cornell_box
from pbrpathtracer_tpu.scene.scene import Camera
from pbrpathtracer_tpu.engine.config import RenderConfig
from pbrpathtracer_tpu.ops.integrator import render
from pbrpathtracer_tpu.parallel.mesh import make_mesh, ray_sharding, replicated
from pbrpathtracer_tpu.parallel.render import make_train_step, render_sharded
from pbrpathtracer_tpu.diff.params import get_params

CAM = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                  up=(0, 1, 0), fovy=61)


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        devs = jax.devices("cpu")
    assert len(devs) >= n
    return make_mesh(devs[:n])


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_sharded_render_matches_single_device(n_dev):
    scene = cornell_box()
    cfg = RenderConfig(width=16, height=16, max_depth=2, spp=2, seed=4)
    ref = np.asarray(jax.jit(lambda: render(scene, CAM, cfg))())
    img = np.asarray(render_sharded(scene, CAM, cfg, mesh=_mesh(n_dev)))
    # Keyed RNG ⇒ sharding must not change any sample values.
    assert np.allclose(ref, img, atol=1e-5), np.abs(ref - img).max()


def test_sharded_train_step_runs_and_reduces():
    scene = cornell_box()
    cfg = RenderConfig(width=16, height=16, max_depth=2, spp=1, seed=4)
    mesh = _mesh(8)
    params = get_params(scene, CAM, materials=True)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = make_train_step(scene, CAM, cfg, opt, mesh)

    pixel_idx = jax.device_put(jnp.arange(cfg.num_pixels, dtype=jnp.int32),
                               ray_sharding(mesh))
    target = jax.device_put(jnp.zeros((cfg.num_pixels, 3), jnp.float32),
                            ray_sharding(mesh))
    params = jax.device_put(params, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))

    p1, o1, loss1 = step(params, opt_state, scene, CAM, pixel_idx, target,
                         jnp.uint32(0))
    p2, o2, loss2 = step(p1, o1, scene, CAM, pixel_idx, target, jnp.uint32(1))
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    # black target: emission should be driven down
    assert float(jnp.sum(p2["mat.emissive_intensity"])) < float(
        jnp.sum(params["mat.emissive_intensity"]))


def test_train_step_matches_across_device_counts():
    """Gradient psum correctness: replicated params after one step must be
    identical (up to float assoc.) for 1-device and 8-device meshes."""
    scene = cornell_box()
    cfg = RenderConfig(width=8, height=8, max_depth=2, spp=1, seed=4)
    results = []
    for n in (1, 8):
        mesh = _mesh(n)
        params = get_params(scene, CAM, materials=True)
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)
        step = make_train_step(scene, CAM, cfg, opt, mesh)
        pixel_idx = jax.device_put(
            jnp.arange(cfg.num_pixels, dtype=jnp.int32), ray_sharding(mesh))
        target = jax.device_put(
            jnp.full((cfg.num_pixels, 3), 0.25, jnp.float32),
            ray_sharding(mesh))
        params = jax.device_put(params, replicated(mesh))
        opt_state = jax.device_put(opt_state, replicated(mesh))
        p, _, loss = step(params, opt_state, scene, CAM, pixel_idx, target,
                          jnp.uint32(0))
        results.append((float(loss), np.asarray(p["mat.diffuse"])))
    (l1, d1), (l8, d8) = results
    assert abs(l1 - l8) < 1e-5
    assert np.allclose(d1, d8, atol=1e-5)


def test_overlapped_train_step_matches_fused():
    """make_train_step_overlapped (psum pipelined one sample behind the
    backward sweep) must produce the same loss and the same post-step
    params as the fused-psum step, up to float summation order."""
    from pbrpathtracer_tpu.parallel.render import make_train_step_overlapped

    scene = cornell_box()
    cfg = RenderConfig(width=16, height=16, max_depth=2, spp=3, seed=4)
    mesh = _mesh(4)
    params = get_params(scene, CAM, materials=True)
    opt = optax.sgd(1e-2)

    pixel_idx = jax.device_put(jnp.arange(cfg.num_pixels, dtype=jnp.int32),
                               ray_sharding(mesh))
    target = jax.device_put(jnp.full((cfg.num_pixels, 3), 0.3, jnp.float32),
                            ray_sharding(mesh))
    p0 = jax.device_put(params, replicated(mesh))
    o0 = jax.device_put(opt.init(params), replicated(mesh))

    fused = make_train_step(scene, CAM, cfg, opt, mesh)
    over = make_train_step_overlapped(scene, CAM, cfg, opt, mesh)

    pf, _, loss_f = fused(p0, o0, scene, CAM, pixel_idx, target,
                          jnp.uint32(0))
    po, _, loss_o = over(p0, o0, scene, CAM, pixel_idx, target,
                         jnp.uint32(0))
    assert np.isclose(float(loss_f), float(loss_o), rtol=1e-6), \
        (float(loss_f), float(loss_o))
    for k in pf:
        a, b = np.asarray(pf[k]), np.asarray(po[k])
        assert np.allclose(a, b, atol=1e-6), (k, np.abs(a - b).max())
