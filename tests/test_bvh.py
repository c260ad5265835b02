"""BVH build + traversal: invariants, dense-intersector agreement, renders."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrpathtracer_tpu.scene.builders import cornell_box, cornell_spheres_scene
from pbrpathtracer_tpu.scene.scene import Camera, with_accel
from pbrpathtracer_tpu.engine.config import RenderConfig
from pbrpathtracer_tpu.accel.build import build_bvh, validate_bvh
from pbrpathtracer_tpu.accel.traverse import intersect_bvh
from pbrpathtracer_tpu.ops.intersect import intersect_matmul
from pbrpathtracer_tpu.ops.integrator import render

CAM = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                  up=(0, 1, 0), fovy=61)


def _random_tri_soup(n, seed=0):
    rs = np.random.RandomState(seed)
    c = rs.uniform(-2, 2, (n, 1, 3)).astype(np.float32)
    v = c + rs.uniform(-0.3, 0.3, (n, 3, 3)).astype(np.float32)
    return v[:, 0], v[:, 1], v[:, 2]


@pytest.mark.parametrize("n,leaf", [(1, 4), (7, 2), (100, 8), (1000, 8)])
def test_build_invariants(n, leaf):
    v0, v1, v2 = _random_tri_soup(n)
    bvh = build_bvh(v0, v1, v2, leaf_size=leaf)
    validate_bvh(bvh, n)


def test_bvh_agrees_with_dense_on_soup():
    n = 500
    v0, v1, v2 = _random_tri_soup(n, seed=3)
    from pbrpathtracer_tpu.scene.scene import (pack_geometry, pack_materials,
                                               MaterialSpec, finalize_scene)
    geom = pack_geometry({"v0": v0, "v1": v1, "v2": v2})
    scene = finalize_scene(geom, pack_materials([MaterialSpec()]),
                           accel="always")

    rs = np.random.RandomState(1)
    m = 512
    ro = jnp.asarray(rs.uniform(-3, 3, (m, 3)).astype(np.float32))
    d = rs.normal(size=(m, 3)).astype(np.float32)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    @jax.jit
    def both():
        return (intersect_matmul(scene.geom, ro, rd),
                intersect_bvh(scene, ro, rd))

    (dh, di, dt, du, dv), (bh, bi, bt, bu, bv) = both()
    dh, bh = np.asarray(dh), np.asarray(bh)
    dt, bt = np.asarray(dt), np.asarray(bt)
    di, bi = np.asarray(di), np.asarray(bi)
    assert (dh == bh).mean() > 0.995          # knife-edge ties only
    same = dh & bh
    # distances must agree wherever both hit (even if tri differs on ties)
    assert np.abs(dt[same] - bt[same]).max() < 2e-4
    assert (di[same] == bi[same]).mean() > 0.99


def test_bvh_t_lower():
    v0, v1, v2 = _random_tri_soup(50, seed=5)
    from pbrpathtracer_tpu.scene.scene import (pack_geometry, pack_materials,
                                               MaterialSpec, finalize_scene)
    scene = finalize_scene(pack_geometry({"v0": v0, "v1": v1, "v2": v2}),
                           pack_materials([MaterialSpec()]), accel="always")
    ro = jnp.zeros((1, 3), jnp.float32)
    rd = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    h1, i1, t1, _, _ = jax.jit(lambda: intersect_bvh(scene, ro, rd))()
    if bool(np.asarray(h1)[0]):
        h2, i2, t2, _, _ = jax.jit(lambda: intersect_bvh(
            scene, ro, rd, jnp.asarray(np.asarray(t1))))()
        if bool(np.asarray(h2)[0]):
            assert float(np.asarray(t2)[0]) > float(np.asarray(t1)[0])


def test_render_via_bvh_matches_matmul():
    scene = with_accel(cornell_box())
    cfg_m = RenderConfig(width=12, height=12, max_depth=2, spp=2, seed=7,
                         intersector="matmul")
    cfg_b = cfg_m.replace(intersector="bvh")
    a = np.asarray(jax.jit(lambda: render(scene, CAM, cfg_m))())
    b = np.asarray(jax.jit(lambda: render(scene, CAM, cfg_b))())
    d = np.abs(a - b).max(axis=-1)
    assert (d > 1e-3).mean() <= 0.01, d.max()


def test_auto_selects_bvh_over_threshold():
    from pbrpathtracer_tpu.ops.hit import _select_intersector
    scene = with_accel(cornell_box())
    cfg = RenderConfig(intersector="auto", bvh_threshold=10)
    fn = _select_intersector(scene, cfg)
    assert fn is intersect_bvh
    cfg2 = RenderConfig(intersector="auto", bvh_threshold=4096)
    fn2 = _select_intersector(scene, cfg2)
    assert fn2 is not intersect_bvh


def test_bvh_grad_with_skip_dead():
    """Regression pin: grad through the BVH route WITH the dead-segment
    lax.cond enabled. An earlier JAX version failed MLIR lowering for
    grad-of-cond around the traversal while_loop, and the integrator
    silently disabled the skip on the BVH route as a workaround; this test
    keeps the now-removed workaround from regressing unnoticed."""
    import jax.numpy as jnp
    from pbrpathtracer_tpu.diff.params import get_params
    from pbrpathtracer_tpu.diff.loss import l2_image_loss

    scene = with_accel(cornell_box())
    cfg = RenderConfig(width=8, height=8, max_depth=2, spp=1, seed=1,
                       intersector="bvh", skip_dead_segments=True)
    params = get_params(scene, CAM, materials=True)
    target = jnp.zeros((8, 8, 3), jnp.float32)
    loss, g = jax.jit(lambda p: jax.value_and_grad(l2_image_loss)(
        p, scene, CAM, cfg, target, jnp.uint32(0)))(params)
    assert np.isfinite(float(loss))
    gd = np.asarray(g["mat.diffuse"])
    assert np.isfinite(gd).all() and np.abs(gd).max() > 0
