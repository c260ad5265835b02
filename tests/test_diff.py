"""Differentiable-rendering tests: AD vs finite differences, fit recovery.

Estimator contract (SURVEY.md §7 / diff/params.py): pathwise gradients with
*detached* discrete decisions. AD matches FD for every parameter that does
not feed a discrete branch. The known exception: the max channel of a
material's untextured diffuse drives the Russian-roulette survive
probability (pathtracer.cpp:589), so its FD contains a score-function term
AD deliberately omits — tests therefore probe non-max channels.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrpathtracer_tpu.scene.builders import cornell_box
from pbrpathtracer_tpu.scene.scene import Camera
from pbrpathtracer_tpu.engine.config import RenderConfig
from pbrpathtracer_tpu.ops.integrator import render
from pbrpathtracer_tpu.diff.params import get_params, set_params
from pbrpathtracer_tpu.diff.loss import l2_image_loss, finite_difference_grad
from pbrpathtracer_tpu.diff.fit import fit

CAM = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                  up=(0, 1, 0), fovy=61)


def _setup(w=16, h=16, depth=2, spp=2, seed=3):
    scene = cornell_box()
    cfg = RenderConfig(width=w, height=h, max_depth=depth, spp=spp, seed=seed)
    target = jnp.asarray(
        np.asarray(jax.jit(lambda: render(scene, CAM, cfg))()) * 0.8)
    params = get_params(scene, CAM, materials=True)
    lossf = jax.jit(lambda p: l2_image_loss(p, scene, CAM, cfg, target))
    gradf = jax.jit(jax.grad(
        lambda p: l2_image_loss(p, scene, CAM, cfg, target)))
    return params, lossf, gradf


def _check_fd(lossf, gradf, params, key, indices, eps=2e-3, rtol=5e-3,
              atol=1e-5):
    ad = np.asarray(gradf(params)[key]).reshape(-1)
    fd = finite_difference_grad(lossf, params, key, eps=eps,
                                indices=indices).reshape(-1)
    for i in indices:
        err = abs(ad[i] - fd[i])
        assert err <= rtol * max(abs(fd[i]), abs(ad[i])) + atol, (
            f"{key}[{i}]: AD={ad[i]:.6g} FD={fd[i]:.6g}")


def test_grads_finite_everywhere():
    params, _, gradf = _setup()
    g = gradf(params)
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), f"non-finite grad in {k}"


def test_diffuse_grad_matches_fd_nonmax_channels():
    params, lossf, gradf = _setup()
    # material 1 = red wall diffuse (0.75, 0.25, 0.25): channels g,b are
    # non-max → no RR coupling. flat indices 4, 5.
    _check_fd(lossf, gradf, params, "mat.diffuse", [4, 5])


def test_emissive_and_intensity_grads_match_fd():
    params, lossf, gradf = _setup()
    # light material is index 3: emissive flat indices 9, 10, 11.
    _check_fd(lossf, gradf, params, "mat.emissive", [9, 10, 11], eps=5e-3)
    _check_fd(lossf, gradf, params, "mat.emissive_intensity", [3], eps=5e-3)


def test_specular_grad_zero_without_specular_paths():
    # all-diffuse Cornell (reflectiveness 0): specular gradient must be 0
    params, _, gradf = _setup()
    g = np.asarray(gradf(params)["mat.specular"])
    assert np.abs(g).max() == 0.0


def test_camera_lens_grads_exist():
    scene = cornell_box()
    cam = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                      up=(0, 1, 0), fovy=61, focal_dist=2.0, aperture=0.03)
    cfg = RenderConfig(width=12, height=12, max_depth=2, spp=2, seed=5)
    target = jnp.zeros((12, 12, 3), jnp.float32)
    params = get_params(scene, cam, materials=False, camera_lens=True)
    g = jax.jit(jax.grad(
        lambda p: l2_image_loss(p, scene, cam, cfg, target)))(params)
    assert np.isfinite(float(g["cam.aperture"]))
    assert np.isfinite(float(g["cam.focal_dist"]))
    assert abs(float(g["cam.focal_dist"])) > 0


def test_fit_recovers_perturbed_albedo():
    scene = cornell_box()
    cfg = RenderConfig(width=12, height=12, max_depth=2, spp=2, seed=3)
    target = jax.jit(lambda: render(scene, CAM, cfg))()

    # perturb the red wall's diffuse and fit back
    import dataclasses
    true_diffuse = np.asarray(scene.materials.diffuse)
    perturbed = true_diffuse.copy()
    perturbed[1] = [0.4, 0.5, 0.5]
    scene_p = scene.replace(materials=scene.materials.replace(
        diffuse=jnp.asarray(perturbed)))

    # Fixed-seed fitting: rendering the residual with the target's own MC
    # noise realization makes the loss a clean optimization signal at tiny
    # spp (with per-step reseeding the MC noise floor at 2 spp dwarfs the
    # parameter error).
    res = fit(scene_p, CAM, cfg, target, steps=40, lr=4e-2,
              sample_offset_per_step=False)
    assert res.losses[-1] < res.losses[0] * 0.15, res.losses[::10]
    rec = np.asarray(res.params["mat.diffuse"])[1]
    assert np.abs(rec - true_diffuse[1]).max() < 0.15, rec


def test_fit_checkpoint_resume_bitexact(tmp_path):
    """Optimizer checkpointing (SURVEY.md §5): interrupting a fit at step 3
    and resuming must reproduce the uninterrupted 6-step trajectory
    bit-for-bit — per-step RNG is keyed by the absolute step index."""
    scene = cornell_box()
    cfg = RenderConfig(width=8, height=8, max_depth=2, spp=1, seed=7)
    target = jnp.zeros((8, 8, 3), jnp.float32)
    ckpt = str(tmp_path / "fit.npz")

    full = fit(scene, CAM, cfg, target, steps=6, lr=3e-2)

    fit(scene, CAM, cfg, target, steps=3, lr=3e-2,
        checkpoint_path=ckpt, checkpoint_every=3)
    resumed = fit(scene, CAM, cfg, target, steps=6, lr=3e-2,
                  checkpoint_path=ckpt, resume=True)

    assert len(resumed.losses) == 6
    assert resumed.losses == full.losses
    for k in full.params:
        assert np.array_equal(np.asarray(full.params[k]),
                              np.asarray(resumed.params[k])), k
