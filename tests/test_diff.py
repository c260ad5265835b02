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


def _setup_translucent(w=16, h=16, depth=3, spp=2, seed=3):
    """translucent_scene() + FD harness (BASELINE: per-parameter-class FD;
    the TRANSLUCENT branch is pathtracer.cpp:641-727)."""
    from pbrpathtracer_tpu.scene.builders import translucent_scene
    scene = translucent_scene()
    cfg = RenderConfig(width=w, height=h, max_depth=depth, spp=spp, seed=seed)
    target = jnp.asarray(
        np.asarray(jax.jit(lambda: render(scene, CAM, cfg))()) * 0.8)
    params = get_params(scene, CAM, materials=True)
    lossf = jax.jit(lambda p: l2_image_loss(p, scene, CAM, cfg, target))
    gradf = jax.jit(jax.grad(
        lambda p: l2_image_loss(p, scene, CAM, cfg, target)))
    from pbrpathtracer_tpu.utils.constants import TRANSLUCENT
    glass = int(np.nonzero(
        np.asarray(scene.materials.mat_type) == TRANSLUCENT)[0][0])
    return params, lossf, gradf, glass


def test_translucent_specular_grad_matches_fd():
    """Specular-through-refraction: the glass specular color scales the
    reflect-branch throughput (pathtracer.cpp:677-703) and feeds no
    discrete decision — AD must match FD cleanly."""
    params, lossf, gradf, glass = _setup_translucent()
    idx = [glass * 3 + c for c in range(3)]
    _check_fd(lossf, gradf, params, "mat.specular", idx, eps=2e-3,
              rtol=2e-2)


def test_translucent_ior_grad_matches_fd_stable_lanes():
    """IOR drives the refraction direction and Snell k continuously
    (pathtracer.cpp:656-675, 706-713) AND feeds the discrete Fresnel/TIR
    accept draws. At render level the FD is dominated by draw flips
    (measured: one flip in a ±1e-3 window shifts FD by ~0.5 while the
    continuous chain is ~4e-5) — the boundary term pathwise AD detaches
    by contract. So the continuous chain is FD-checked at SEGMENT level
    on decision-stable lanes: lanes whose outgoing direction stays put
    under ±eps (no branch flip) must have AD == central FD through
    shade_segment's full eta/Snell/refract plumbing."""
    from pbrpathtracer_tpu.scene.builders import translucent_scene
    from pbrpathtracer_tpu.ops import rng
    from pbrpathtracer_tpu.ops.camera import generate_rays
    from pbrpathtracer_tpu.ops.hit import closest_hit
    from pbrpathtracer_tpu.ops.shade import WavefrontState, shade_segment

    scene = translucent_scene()
    cfg = RenderConfig(width=24, height=24, max_depth=3, spp=1, seed=3)
    N = cfg.width * cfg.height
    pix = jnp.arange(N, dtype=jnp.int32)
    seed = jnp.uint32(cfg.seed)
    s0 = jnp.uint32(0)
    stream = rng.bounce_stream(jnp.uint32(0))
    ro, rd = generate_rays(CAM, cfg.width, cfg.height, seed, s0, pix)
    state = WavefrontState.initial(ro, rd, pix)
    hitres = closest_hit(scene, cfg, ro, rd, seed, pix, s0, stream)

    def stub_shadow(p, l, sh_alive=None):
        z = jnp.zeros((N,), jnp.float32)
        return (jnp.zeros((N,), bool), jnp.zeros((N,), jnp.int32), z, z, z)

    probe = jnp.asarray(
        np.random.RandomState(11).normal(size=(N, 3)).astype(np.float32))

    def out_rd(ior_val):
        mats = scene.materials.replace(
            ior=scene.materials.ior.at[6].set(ior_val))
        sc = scene.replace(materials=mats)
        out = shade_segment(sc, cfg, state, *hitres, jnp.uint32(0), s0,
                            seed, stub_shadow)
        return out.rd

    def loss(ior_val, mask):
        return jnp.sum(out_rd(ior_val) * probe * mask[:, None])

    eps = 0.015
    base = float(np.asarray(scene.materials.ior)[6])
    # Lane masks, all frozen at the base point:
    #  * decision-stable: a branch flip jumps rd by O(1); the continuous
    #    chain moves it by ≲ |∂rd/∂ior|·2eps
    rd_lo = np.asarray(out_rd(jnp.float32(base - 2 * eps)))
    rd_hi = np.asarray(out_rd(jnp.float32(base + 2 * eps)))
    stable = (np.linalg.norm(rd_hi - rd_lo, axis=-1) < 0.3)
    #  * k-margin: sqrt(k) at the TIR boundary is continuous but has
    #    unbounded curvature — lanes with |k| < margin poison central FD
    #    with truncation error, not a gradient bug (glass roughness is 0
    #    here so refract_n == n and k is recomputable exactly)
    hit, idx, tt, _, _ = (np.asarray(a) for a in hitres)
    n0 = np.asarray(scene.geom.normal)[idx]
    rdn = np.asarray(rd)
    n_ff = np.where((n0 * rdn).sum(-1, keepdims=True) > 0, -n0, n0)
    cth = np.abs((rdn * n_ff).sum(-1))
    eta = 1.0 / base   # first segment: all lanes outside
    k = 1.0 - eta * eta * (1.0 - cth * cth)
    glass_hit = hit & (np.asarray(scene.geom.mat_id)[idx] == 6)
    k_ok = ~glass_hit | (np.abs(k) > 0.05)
    stable &= k_ok
    assert stable.mean() > 0.85
    assert (glass_hit & stable).sum() > 30  # glass actually probed
    mask = jnp.asarray(stable.astype(np.float32))

    ad = float(jax.grad(lambda i: loss(i, mask))(jnp.float32(base)))

    def fd_at(e):
        # f64 dot over the f32 direction deltas: per-lane rounding is
        # ~1e-7 vs a ~|∂rd/∂ior|·2e signal
        d = (np.asarray(out_rd(jnp.float32(base + e))).astype(np.float64)
             - np.asarray(out_rd(jnp.float32(base - e))).astype(np.float64))
        return float((d * np.asarray(probe, np.float64)
                      * np.asarray(mask, np.float64)[:, None]).sum()
                     / (2 * e))

    fd = (4.0 * fd_at(eps) - fd_at(2 * eps)) / 3.0  # Richardson: O(eps⁴)
    assert abs(ad) > 1e-4   # the continuous chain is alive
    assert abs(ad - fd) <= 0.1 * max(abs(ad), abs(fd)) + 3e-4, (
        f"ior: AD={ad:.6g} FD={fd:.6g}")


def test_translucency_grad_is_detached_score_term():
    """Translucency feeds ONLY the discrete refract-vs-diffuse draw
    (pathtracer.cpp:706: Rand() < translucency) — it has no continuous
    path, so the pathwise estimator's gradient is identically zero by
    the detached-decision contract (diff/params.py docstring). This is a
    DOCUMENTED FLOOR, not a bug: recovering translucency from pixels
    needs a score-function/boundary estimator the framework deliberately
    omits (SURVEY.md §7). The assert pins the contract so an accidental
    continuous coupling (which would be a wrong gradient, not a better
    one) fails loudly."""
    params, _, gradf, glass = _setup_translucent(w=8, h=8)
    g = np.asarray(gradf(params)["mat.translucency"])
    assert np.abs(g).max() == 0.0


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
