"""Native (C++ SAH) BVH builder: availability, invariants, closest-hit
agreement with the numpy builder's tree."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrpathtracer_tpu.accel.build import build_bvh, validate_bvh
from pbrpathtracer_tpu.accel.native import build_bvh_native, native_available
from pbrpathtracer_tpu.accel.traverse import intersect_bvh
from pbrpathtracer_tpu.scene.scene import (MaterialSpec, finalize_scene,
                                           pack_geometry, pack_materials)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


def _soup(n, seed=0):
    rs = np.random.RandomState(seed)
    c = rs.uniform(-2, 2, (n, 1, 3)).astype(np.float32)
    v = c + rs.uniform(-0.3, 0.3, (n, 3, 3)).astype(np.float32)
    return v[:, 0], v[:, 1], v[:, 2]


@pytest.mark.parametrize("n", [1, 9, 1000, 20000])
def test_native_invariants(n):
    v0, v1, v2 = _soup(n)
    bvh = build_bvh_native(v0, v1, v2, leaf_size=8)
    validate_bvh(bvh, n)


def test_native_tree_same_hits_as_numpy_tree():
    n = 2000
    v0, v1, v2 = _soup(n, seed=2)
    geom = pack_geometry({"v0": v0, "v1": v1, "v2": v2})
    mats = pack_materials([MaterialSpec()])
    s_np = finalize_scene(geom, mats, accel=None).replace(
        accel=build_bvh(v0, v1, v2))
    s_cc = finalize_scene(geom, mats, accel=None).replace(
        accel=build_bvh_native(v0, v1, v2))

    rs = np.random.RandomState(7)
    m = 256
    ro = jnp.asarray(rs.uniform(-3, 3, (m, 3)).astype(np.float32))
    d = rs.normal(size=(m, 3)).astype(np.float32)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    ah, ai, at, _, _ = jax.jit(lambda: intersect_bvh(s_np, ro, rd))()
    bh, bi, bt, _, _ = jax.jit(lambda: intersect_bvh(s_cc, ro, rd))()
    ah, bh = np.asarray(ah), np.asarray(bh)
    at, bt = np.asarray(at), np.asarray(bt)
    assert (ah == bh).mean() > 0.995
    both = ah & bh
    assert np.abs(at[both] - bt[both]).max() < 2e-4
