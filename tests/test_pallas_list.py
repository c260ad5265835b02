"""Candidate-list Pallas kernel (kernels/intersect_pallas_list.py) —
interpret-mode correctness on CPU.

The list kernel is the TPU hot path for every scene with more than
LIST_KERNEL_MIN_CHUNKS chunks (~2k triangles): BASELINE rungs 3-5. These
tests force that route with >2048-triangle scenes and check parity against
the jnp matmul intersector, plus the two failure modes the advisor flagged:
exactly-flat chunk AABBs being strict-slab-culled, and the t_lower
re-trace contract used by the stochastic-opacity loop.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pbrpathtracer_tpu.ops.intersect import intersect_matmul
from pbrpathtracer_tpu.scene.scene import (MaterialSpec, finalize_scene,
                                           pack_geometry, pack_materials)


def _flat_plane_scene(n_side, y=0.0, extent=4.0, extra_quads=()):
    """Exactly coplanar tessellated plane (+optional stacked flat quads):
    every chunk AND superchunk AABB is flat on the y axis."""
    xs = np.linspace(-extent, extent, n_side + 1, dtype=np.float32)
    v0, v1, v2 = [], [], []
    for i in range(n_side):
        for k in range(n_side):
            a = (xs[i], y, xs[k])
            b = (xs[i + 1], y, xs[k])
            c = (xs[i + 1], y, xs[k + 1])
            d = (xs[i], y, xs[k + 1])
            v0 += [a, a]
            v1 += [b, c]
            v2 += [c, d]
    for (qy, qe) in extra_quads:
        a, b, c, d = ((-qe, qy, -qe), (qe, qy, -qe), (qe, qy, qe),
                      (-qe, qy, qe))
        v0 += [a, a]
        v1 += [b, c]
        v2 += [c, d]
    T = len(v0)
    z2 = np.zeros((T, 2), np.float32)
    geom = pack_geometry({
        "v0": np.asarray(v0, np.float32), "v1": np.asarray(v1, np.float32),
        "v2": np.asarray(v2, np.float32),
        "uv0": z2, "uv1": z2, "uv2": z2,
        "mat_id": np.zeros(T, np.int32),
        "element_id": np.zeros(T, np.int32),
    })
    mats = [MaterialSpec(diffuse=(0.7, 0.7, 0.7))]
    return finalize_scene(geom, pack_materials(mats), None, accel="none")


def _rays(n, seed=0, origin_box=((-2, 1.0, -2), (2, 3.0, 2)), down=True):
    rs = np.random.RandomState(seed)
    lo, hi = np.asarray(origin_box[0]), np.asarray(origin_box[1])
    ro = rs.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    if down:
        d[:, 1] = -np.abs(d[:, 1]) - 2.0  # steep: stay inside the extent
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(d)


def _list_route(scene):
    """Assert the scene actually takes the candidate-list route."""
    from pbrpathtracer_tpu.kernels.intersect_pallas import (
        LIST_KERNEL_MIN_CHUNKS, _pick_chunk)
    T = scene.geom.v0.shape[0]
    t_pad = ((T + 7) // 8) * 8
    chunk = _pick_chunk(t_pad)
    t_pad = ((t_pad + chunk - 1) // chunk) * chunk
    return t_pad // chunk > LIST_KERNEL_MIN_CHUNKS


def _pallas_interpret(scene, ro, rd, t_lower=None):
    from jax.experimental.pallas import tpu as pltpu
    from pbrpathtracer_tpu.kernels.intersect_pallas import intersect_pallas
    with pltpu.force_tpu_interpret_mode():
        return intersect_pallas(scene, ro, rd, t_lower)


def _dense_interpret(scene, ro, rd, t_lower=None, monkey=None):
    """Run intersect_pallas with the list route disabled (dense grid)."""
    from jax.experimental.pallas import tpu as pltpu
    from pbrpathtracer_tpu.kernels import intersect_pallas as K
    old = K.LIST_KERNEL_MIN_CHUNKS
    K.LIST_KERNEL_MIN_CHUNKS = 1 << 30
    try:
        with pltpu.force_tpu_interpret_mode():
            return K.intersect_pallas(scene, ro, rd, t_lower)
    finally:
        K.LIST_KERNEL_MIN_CHUNKS = old


def _assert_parity(scene, ro, rd, t_lower=None, min_hit_frac=0.5):
    """List kernel vs the dense Pallas kernel (same accept/reject math;
    XLA's per-layout FMA contraction makes last-ULP u/v differences —
    measured ≤1e-5 — so the contract is identical decisions + allclose
    values) and vs the matmul intersector (different op order)."""
    ph, pi, pt, pu, pv = _pallas_interpret(scene, ro, rd, t_lower)
    dh, di, dt, du, dv = _dense_interpret(scene, ro, rd, t_lower)
    ph, pi, pt = np.asarray(ph), np.asarray(pi), np.asarray(pt)
    np.testing.assert_array_equal(ph, np.asarray(dh))
    np.testing.assert_array_equal(pi, np.asarray(di))
    np.testing.assert_allclose(pt, np.asarray(dt), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pu), np.asarray(du), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(dv), atol=1e-5)

    tl = jnp.zeros(ro.shape[0], jnp.float32) if t_lower is None else t_lower
    mh, mi, mt, _, _ = intersect_matmul(scene.geom, ro, rd, tl)
    mh, mi, mt = np.asarray(mh), np.asarray(mi), np.asarray(mt)
    assert mh.mean() >= min_hit_frac  # the workload exercises real hits
    np.testing.assert_array_equal(ph, mh)
    both = ph & mh
    agree = pi[both] == mi[both]
    assert agree.mean() > 0.995  # FP-order near-ties may pick either tri
    np.testing.assert_allclose(pt[both][agree], mt[both][agree], atol=1e-4)


def test_list_route_parity_mesh_scene():
    """>4-chunk scene (mesh_scene ~3k tris) routes through the list kernel
    and matches intersect_matmul bit-exactly."""
    from pbrpathtracer_tpu.scene.big_scenes import mesh_scene
    scene = mesh_scene(3000, textured=False, accel="auto")
    assert _list_route(scene)
    ro, rd = _rays(512, seed=1,
                   origin_box=((-4, 0.5, 1.0), (4, 2.5, 12.0)))
    _assert_parity(scene, ro, rd, min_hit_frac=0.4)


def test_flat_chunks_not_culled_list_route():
    """Every chunk/superchunk AABB exactly flat (coplanar ground plane):
    the strict slab test used to cull them all — zero hits, geometry
    silently deleted (ADVICE r2). EPS inflation at build must keep them."""
    scene = _flat_plane_scene(37)  # 2738 tris -> 6 chunks, all flat
    assert _list_route(scene)
    ro, rd = _rays(384, seed=2)
    ph, _, _, _, _ = _pallas_interpret(scene, ro, rd)
    assert np.asarray(ph).mean() > 0.9  # downward rays over the plane
    _assert_parity(scene, ro, rd)


def test_flat_chunk_not_culled_dense_route():
    """Same failure mode on the dense kernel (single flat chunk)."""
    scene = _flat_plane_scene(4)  # 32 tris -> 1 chunk, flat
    assert not _list_route(scene)
    ro, rd = _rays(256, seed=3)
    ph, _, _, _, _ = _pallas_interpret(scene, ro, rd)
    assert np.asarray(ph).mean() > 0.9
    _assert_parity(scene, ro, rd)


def test_t_lower_retrace_list_route():
    """The stochastic-opacity loop re-queries with an exclusive lower
    bound on t; the list kernel must skip the first surface and return
    the one behind it, bit-identical to the matmul intersector."""
    scene = _flat_plane_scene(37, y=0.0, extra_quads=((1.0, 4.0),))
    assert _list_route(scene)
    n = 256
    ro = jnp.asarray(np.tile(np.array([[0.1, 3.0, 0.2]], np.float32),
                             (n, 1))
                     + np.random.RandomState(4).uniform(
                         -1, 1, (n, 3)).astype(np.float32)
                     * np.array([1.0, 0.0, 1.0], np.float32))
    rd = jnp.asarray(np.tile(np.array([[0.0, -1.0, 0.0]], np.float32),
                             (n, 1)))
    # first pass: nearest surface is the y=1 quad (t = 2)
    ph, pi, pt, _, _ = _pallas_interpret(scene, ro, rd)
    assert np.asarray(ph).all()
    np.testing.assert_allclose(np.asarray(pt), 2.0, atol=1e-4)
    # re-trace past it: must find the y=0 plane (t = 3), matching matmul
    t_lower = pt
    _assert_parity(scene, ro, rd, t_lower=t_lower, min_hit_frac=0.9)
    _, _, pt2, _, _ = _pallas_interpret(scene, ro, rd, t_lower)
    np.testing.assert_allclose(np.asarray(pt2), 3.0, atol=1e-4)


def test_parallel_slab_rays():
    """Rays travelling exactly in the plane of flat chunks (rd.y == 0):
    the safe-inverse slab path and MT a≈0 rejection must agree with the
    matmul intersector (no NaN poisoning, no spurious hits)."""
    scene = _flat_plane_scene(37)
    n = 256
    rs = np.random.RandomState(5)
    ro = rs.uniform(-3, 3, (n, 3)).astype(np.float32)
    ro[:, 1] = np.where(np.arange(n) % 2 == 0, 0.0, 0.5)  # half ON the plane
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d[:, 1] = 0.0  # exactly parallel
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ph, pi, pt, pu, pv = _pallas_interpret(scene, jnp.asarray(ro),
                                           jnp.asarray(d))
    mh, mi, mt, mu, mv = intersect_matmul(scene.geom, jnp.asarray(ro),
                                          jnp.asarray(d),
                                          jnp.zeros(n, jnp.float32))
    np.testing.assert_array_equal(np.asarray(ph), np.asarray(mh))
    both = np.asarray(ph) & np.asarray(mh)
    np.testing.assert_array_equal(np.asarray(pi)[both], np.asarray(mi)[both])
