"""Live-lane compaction (ops/compaction.py) — exactness and alive-masking
semantics on CPU.

Keyed RNG travels with the lane (pixel id), so compaction is semantically
a no-op: executed segment-by-segment it is BIT-IDENTICAL to the
uncompacted wavefront (pinned below). Under one whole-render jit the
compacted graph differs structurally, and XLA's fusion choices may shift
individual lanes by ULPs (same caveat as changing unroll/remat) — the
jitted comparisons therefore use tight allclose."""

import numpy as np
import jax
import jax.numpy as jnp

from pbrpathtracer_tpu.scene.builders import cornell_box, translucent_scene
from pbrpathtracer_tpu.scene.scene import Camera
from pbrpathtracer_tpu.engine.config import RenderConfig
from pbrpathtracer_tpu.ops.integrator import render_sample

CAM = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                  up=(0, 1, 0), fovy=61)


def _render(scene, cfg):
    return np.asarray(jax.jit(
        lambda: render_sample(scene, CAM, cfg, jnp.uint32(0)))())


def test_compaction_close_cornell():
    scene = cornell_box()
    base = RenderConfig(width=24, height=24, max_depth=4, seed=7,
                        compact_wavefront="off")
    ref = _render(scene, base)
    for mode in ("sort", "gather"):
        img = _render(scene, base.replace(compact_wavefront=mode))
        np.testing.assert_allclose(img, ref, rtol=5e-6, atol=1e-5), mode


def test_compaction_close_translucent_deep():
    scene = translucent_scene()
    base = RenderConfig(width=16, height=16, max_depth=6, seed=3,
                        compact_wavefront="off")
    ref = _render(scene, base)
    for mode in ("sort", "gather"):
        img = _render(scene, base.replace(compact_wavefront=mode))
        np.testing.assert_allclose(img, ref, rtol=5e-6, atol=1e-5), mode


def test_compaction_bitwise_per_segment():
    """Executed segment-at-a-time (one jit per segment, identical graphs),
    the compacted wavefront is BIT-identical to the uncompacted one."""
    from pbrpathtracer_tpu.ops import rng
    from pbrpathtracer_tpu.ops.camera import generate_rays
    from pbrpathtracer_tpu.ops.hit import closest_hit, _select_intersector
    from pbrpathtracer_tpu.ops.shade import WavefrontState, shade_segment
    from pbrpathtracer_tpu.ops.compaction import (compact_gather,
                                                  compact_sort)

    scene = cornell_box()
    W = 12
    cfg = RenderConfig(width=W, height=W, max_depth=3, seed=5)
    n = W * W
    pix = jnp.arange(n, dtype=jnp.int32)
    seed = jnp.uint32(5)
    ifn = _select_intersector(scene, cfg)

    def run(compact_fn):
        ro, rd = generate_rays(CAM, W, W, seed, jnp.uint32(0), pix)
        state = WavefrontState.initial(ro, rd, pix)
        slot = jnp.arange(n, dtype=jnp.int32)
        for seg in range(cfg.resolved_max_segments()):
            if compact_fn is not None:
                state, slot, _ = jax.jit(compact_fn)(state, slot)
            stream = rng.bounce_stream(jnp.uint32(seg))
            h, i, t, u, v = closest_hit(
                scene, cfg, state.ro, state.rd, seed, state.pixel,
                jnp.uint32(0), stream, intersect_fn=ifn, alive=state.alive)

            def st(p, l, sa=None):
                return closest_hit(scene, cfg, p, l, seed, state.pixel,
                                   jnp.uint32(0), stream,
                                   slot_base=rng.SLOT_NEE_OPACITY_BASE,
                                   intersect_fn=ifn, alive=sa)
            state = shade_segment(scene, cfg, state, h, i, t, u, v,
                                  jnp.uint32(seg), jnp.uint32(0), seed, st)
        rad = np.zeros((n, 3), np.float32)
        rad[np.asarray(slot)] = np.asarray(state.radiance)
        return rad

    ref = run(None)
    np.testing.assert_array_equal(run(compact_sort), ref)
    np.testing.assert_array_equal(run(compact_gather), ref)


def test_alive_mask_clean_miss_and_live_exact():
    from pbrpathtracer_tpu.ops.intersect import (intersect_classic,
                                                 intersect_matmul)
    scene = cornell_box()
    rng = np.random.RandomState(0)
    N = 64
    ro = jnp.asarray(rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32))
    rd = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    alive = jnp.asarray(rng.rand(N) < 0.6)

    for fn in (intersect_matmul, intersect_classic):
        h0, i0, t0, u0, v0 = fn(scene.geom, ro, rd)
        h1, i1, t1, u1, v1 = fn(scene.geom, ro, rd, alive=alive)
        a = np.asarray(alive)
        # live lanes bit-exact
        for x0, x1 in zip((h0, i0, t0, u0, v0), (h1, i1, t1, u1, v1)):
            np.testing.assert_array_equal(np.asarray(x0)[a],
                                          np.asarray(x1)[a])
        # dead lanes: clean miss
        assert not np.asarray(h1)[~a].any()
        for x in (i1, t1, u1, v1):
            np.testing.assert_array_equal(np.asarray(x)[~a], 0)


def test_alive_mask_bvh():
    from pbrpathtracer_tpu.accel.traverse import intersect_bvh
    from pbrpathtracer_tpu.scene.scene import with_accel
    scene = with_accel(cornell_box())
    rng = np.random.RandomState(1)
    N = 32
    ro = jnp.asarray(rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32))
    rd = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    alive = jnp.asarray(rng.rand(N) < 0.5)
    h0, i0, t0, u0, v0 = intersect_bvh(scene, ro, rd)
    h1, i1, t1, u1, v1 = intersect_bvh(scene, ro, rd, alive=alive)
    a = np.asarray(alive)
    for x0, x1 in zip((h0, i0, t0, u0, v0), (h1, i1, t1, u1, v1)):
        np.testing.assert_array_equal(np.asarray(x0)[a], np.asarray(x1)[a])
    assert not np.asarray(h1)[~a].any()


def test_compaction_gradients_match():
    """Compaction must not change gradients (sort/gather are linear
    permutations; the scatter-back restores order)."""
    from pbrpathtracer_tpu.diff.params import get_params
    from pbrpathtracer_tpu.diff.loss import l2_image_loss
    scene = cornell_box()
    target = jnp.zeros((16, 16, 3), jnp.float32)
    params = get_params(scene, CAM, materials=True)

    def grads(mode):
        cfg = RenderConfig(width=16, height=16, max_depth=3, seed=2,
                           compact_wavefront=mode)
        return jax.jit(jax.grad(lambda p: l2_image_loss(
            p, scene, CAM, cfg, target, jnp.uint32(0))))(params)

    g0 = grads("off")
    g1 = grads("sort")
    for k in g0:
        np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                   rtol=1e-6, atol=1e-7), k
