"""Intersector unit tests: classic vs matmul agreement, known-geometry hits."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrpathtracer_tpu.scene.builders import cornell_box
from pbrpathtracer_tpu.scene.scene import pack_geometry
from pbrpathtracer_tpu.ops.intersect import intersect_classic, intersect_matmul


def _single_tri_geom():
    return pack_geometry({
        "v0": np.array([[-1, -1, 2]], np.float32),
        "v1": np.array([[1, -1, 2]], np.float32),
        "v2": np.array([[0, 1, 2]], np.float32),
    })


@pytest.mark.parametrize("intersect", [intersect_classic, intersect_matmul])
def test_single_triangle_hit_miss(intersect):
    geom = _single_tri_geom()
    ro = jnp.array([[0, 0, 0], [0, 0, 0], [0, 0, 3], [5, 5, 0]], jnp.float32)
    rd = jnp.array([[0, 0, 1], [0, 0, -1], [0, 0, -1], [0, 0, 1]], jnp.float32)
    hit, idx, t, u, v = jax.jit(lambda: intersect(geom, ro, rd))()
    hit, t = np.asarray(hit), np.asarray(t)
    assert hit.tolist() == [True, False, True, False]
    assert abs(t[0] - 2.0) < 1e-5
    assert abs(t[2] - 1.0) < 1e-5


@pytest.mark.parametrize("intersect", [intersect_classic, intersect_matmul])
def test_t_lower_excludes_near_hits(intersect):
    geom = _single_tri_geom()
    ro = jnp.zeros((1, 3), jnp.float32)
    rd = jnp.array([[0, 0, 1]], jnp.float32)
    hit, _, t, _, _ = jax.jit(
        lambda: intersect(geom, ro, rd, jnp.array([2.5], jnp.float32)))()
    assert not bool(np.asarray(hit)[0])


def test_classic_matmul_agree_on_cornell():
    scene = cornell_box()
    n = 512
    rs = np.random.RandomState(0)
    ro = jnp.asarray(rs.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
                     * np.array([1, 1, 0], np.float32)
                     + np.array([0, 0, 0.1], np.float32))
    d = rs.normal(size=(n, 3)).astype(np.float32)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    @jax.jit
    def both():
        return (intersect_classic(scene.geom, ro, rd),
                intersect_matmul(scene.geom, ro, rd))

    (ch, ci, ct, cu, cv), (mh, mi, mt, mu, mv) = both()
    ch, mh = np.asarray(ch), np.asarray(mh)
    ci, mi = np.asarray(ci), np.asarray(mi)
    ct, mt = np.asarray(ct), np.asarray(mt)
    # Allow a tiny fraction of knife-edge disagreements (shared triangle
    # edges / corner seams flip under different rounding).
    agree = (ch == mh) & ((ci == mi) | ~ch)
    assert agree.mean() > 0.99
    both_hit = ch & mh & (ci == mi)
    assert np.abs(ct[both_hit] - mt[both_hit]).max() < 1e-4


def test_barycentrics_in_range():
    scene = cornell_box()
    n = 256
    rs = np.random.RandomState(1)
    ro = jnp.asarray(np.zeros((n, 3), np.float32) + np.array([0, 0, 0.2], np.float32))
    d = rs.normal(size=(n, 3)).astype(np.float32)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    hit, idx, t, u, v = jax.jit(lambda: intersect_matmul(scene.geom, ro, rd))()
    hit = np.asarray(hit)
    u, v = np.asarray(u)[hit], np.asarray(v)[hit]
    assert hit.any()
    assert (u >= -1e-6).all() and (u <= 1 + 1e-6).all()
    assert (v >= -1e-6).all() and (u + v <= 1 + 1e-5).all()
