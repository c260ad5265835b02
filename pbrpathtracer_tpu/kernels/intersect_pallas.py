"""Fused Pallas closest-hit kernel with chunk culling.

The jnp intersectors materialize the [N, 4*chunk] Moller-Trumbore test
matrix in HBM between the MXU matmul and the VPU acceptance tests - at
512^2 rays that is gigabytes of traffic per query and ~10x off roofline.
And per-lane BVH walks (accel/traverse.py) are gather-bound: measured
~40x slower than dense brute force on the TPU at 50k triangles.

This kernel is the TPU-native middle path - a "wide BVH" of exactly two
levels, fused in VMEM:

  * triangles are pre-ordered by BVH DFS locality (scene.accel.perm when
    available), so each fixed-size chunk is a tight spatial cluster with a
    precomputed AABB;
  * grid = (ray_tiles, tri_chunks), chunk dim innermost: the per-tile
    best-hit accumulators stay resident in VMEM;
  * per step, every ray in the tile slab-tests the chunk AABB (pruned by
    its current best t); if NO lane can hit, the whole matmul + test block
    is skipped (`pl.when`) - dense lanes, BVH-like work saving;
  * otherwise: R_tile[TILE,16] @ W_chunk[16, 4*CHUNK] on the MXU (the
    bilinear Moller-Trumbore formulation from ops/intersect.py),
    acceptance tests + masked running-min on the VPU.

Winner index/uv extraction avoids per-lane gathers: equality mask against
the tile minimum -> masked column-min. Local (permuted) winner indices are
mapped back to scene triangle ids by one O(N) gather outside the kernel.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.constants import EPS
from ..ops.intersect import triangle_features, ray_features

BIG = np.float32(3.0e38)
MAX_CHUNK = 1024   # max triangles per grid step
# [TILE, 4*CHUNK] f32 intermediate budget. Several derived temporaries of
# this size live simultaneously (u, v, t, masks) - 512K elements (2 MB each)
# keeps the scoped-VMEM total under the 16 MB limit.
ELEM_BUDGET = 512 * 1024
INT_BIG = np.int32(2 ** 31 - 1)


def _pick_chunk(t_pad: int) -> int:
    return min(MAX_CHUNK, t_pad)


def _pick_tile(n_pad: int, chunk: int) -> int:
    # more rays per grid step when chunks are small - grid-step overhead
    # dominates tiny blocks
    tile = ELEM_BUDGET // (4 * chunk)
    tile = max(256, min(4096, (tile // 256) * 256))
    return min(tile, n_pad)


def _kernel(CHUNK, TILE, r_ref, w_ref, box_ref, tl_ref,
            t_ref, i_ref, u_ref, v_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[:] = jnp.full_like(t_ref, BIG)
        i_ref[:] = jnp.zeros_like(i_ref)
        u_ref[:] = jnp.zeros_like(u_ref)
        v_ref[:] = jnp.zeros_like(v_ref)

    R = r_ref[:]                      # [TILE, 16]
    rd = R[:, 0:3]
    ro = R[:, 6:9]

    # ---- chunk culling: slab test vs the cluster AABB, pruned by best t ----
    row = box_ref[pl.ds(j, 1), :]     # [1, 8] dynamic row of the box table
    lo = row[0, 0:3]                  # [3]
    hi = row[0, 4:7]
    ird = 1.0 / rd                    # +/-inf on zero components (IEEE slabs)
    t1 = (lo[None, :] - ro) * ird
    t2 = (hi[None, :] - ro) * ird
    tn = jnp.max(jnp.minimum(t1, t2), axis=1, keepdims=True)   # [TILE,1]
    tf = jnp.min(jnp.maximum(t1, t2), axis=1, keepdims=True)
    can_hit = (tn < tf) & (tf > 0.0) & (tn < t_ref[:])
    any_hit = jnp.any(can_hit)

    @pl.when(any_hit)
    def _():
        W = w_ref[:]                  # [16, 4*CHUNK]
        out = jnp.dot(R, W, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)

        a = out[:, 0:CHUNK]
        u_num = out[:, CHUNK:2 * CHUNK]
        v_num = out[:, 2 * CHUNK:3 * CHUNK]
        t_num = out[:, 3 * CHUNK:4 * CHUNK]

        denom_ok = jnp.abs(a) >= EPS
        f = jnp.where(denom_ok, 1.0 / jnp.where(denom_ok, a, 1.0), 0.0)
        u = u_num * f
        v = v_num * f
        t = t_num * f
        t_lower = tl_ref[:]           # [TILE, 1]
        valid = (denom_ok & (u >= 0.0) & (u <= 1.0)
                 & (v >= 0.0) & (u + v <= 1.0)
                 & (t > EPS) & (t > t_lower) & can_hit)
        t_m = jnp.where(valid, t, BIG)

        # chunk-local winner (ties -> lowest column, matching jnp.argmin)
        t_min = jnp.min(t_m, axis=1, keepdims=True)        # [TILE, 1]
        cols = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 1)
        eq = t_m == t_min
        col_min = jnp.min(jnp.where(eq, cols, INT_BIG), axis=1,
                          keepdims=True)
        win = cols == col_min
        u_win = jnp.sum(jnp.where(win, u, 0.0), axis=1, keepdims=True)
        v_win = jnp.sum(jnp.where(win, v, 0.0), axis=1, keepdims=True)

        better = t_min < t_ref[:]
        t_ref[:] = jnp.where(better, t_min, t_ref[:])
        i_ref[:] = jnp.where(better, col_min + j * CHUNK, i_ref[:])
        u_ref[:] = jnp.where(better, u_win, u_ref[:])
        v_ref[:] = jnp.where(better, v_win, v_ref[:])


@functools.partial(jax.jit, static_argnums=(4,))
def _run(R, W, boxes, t_lower, shapes):
    n_pad, t_pad = shapes
    boxes_shape = boxes.shape
    CHUNK = _pick_chunk(t_pad)
    TILE = _pick_tile(n_pad, CHUNK)
    grid = (n_pad // TILE, t_pad // CHUNK)
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
    ]
    ray_spec = pl.BlockSpec((TILE, 16), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((16, 4 * CHUNK), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    # whole box table resident per step (Mosaic forbids (1, 8) blocks);
    # a few hundred KB of VMEM even at 1M tris
    box_spec = pl.BlockSpec(boxes_shape, lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    tl_spec = pl.BlockSpec((TILE, 1), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TILE, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, CHUNK, TILE),
        grid=grid,
        in_specs=[ray_spec, w_spec, box_spec, tl_spec],
        out_specs=[out_spec, out_spec, out_spec, out_spec],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(R, W, boxes, t_lower)


class _GeomView:
    """Minimal (v0, e1, e2) view for triangle_features."""

    def __init__(self, v0, e1, e2):
        self.v0, self.e1, self.e2 = v0, e1, e2


def intersect_pallas(geom_or_scene, ro, rd, t_lower=None, perm=None):
    """Closest-hit query - same contract as ops.intersect intersectors.

    Accepts a Scene (uses .geom, and .accel.perm as the locality order when
    present) or a bare Geometry. ``perm`` overrides the triangle ordering.
    """
    geom = getattr(geom_or_scene, "geom", geom_or_scene)
    if perm is None:
        accel = getattr(geom_or_scene, "accel", None)
        if accel is not None:
            perm = accel.perm
    N = ro.shape[0]
    T = geom.v0.shape[0]
    if t_lower is None:
        t_lower = jnp.zeros((N,), jnp.float32)

    t_pad = ((T + 127) // 128) * 128
    CHUNK = _pick_chunk(t_pad)
    t_pad = ((t_pad + CHUNK - 1) // CHUNK) * CHUNK
    TILE = _pick_tile(1 << 30, CHUNK)
    n_pad = ((N + TILE - 1) // TILE) * TILE
    n_chunks = t_pad // CHUNK

    if perm is not None:
        perm = jnp.asarray(perm, jnp.int32)
        v0 = geom.v0[perm]
        e1 = geom.e1[perm]
        e2 = geom.e2[perm]
    else:
        v0, e1, e2 = geom.v0, geom.e1, geom.e2

    R = ray_features(ro, rd)                        # [N, 10]
    R = jnp.pad(R, ((0, n_pad - N), (0, 6)))        # -> [n_pad, 16]

    W3 = triangle_features(_GeomView(v0, e1, e2))   # [10, 4, T]
    # pad tris (zero rows -> a = 0 -> miss) and feature dim 10 -> 16
    W3 = jnp.pad(W3, ((0, 6), (0, 0), (0, t_pad - T)))
    # quantity-major flattening to match the kernel's column slices
    W = (W3.reshape(16, 4, n_chunks, CHUNK)
         .transpose(0, 2, 1, 3)
         .reshape(16, n_chunks * 4 * CHUNK))

    # chunk AABBs from the (permuted) triangles; padded slots get inverted
    # boxes so they never enable a chunk by themselves.
    tri_lo = jnp.minimum(jnp.minimum(v0, v0 + e1), v0 + e2)
    tri_hi = jnp.maximum(jnp.maximum(v0, v0 + e1), v0 + e2)
    tri_lo = jnp.concatenate(
        [tri_lo, jnp.full((t_pad - T, 3), BIG)], axis=0)
    tri_hi = jnp.concatenate(
        [tri_hi, jnp.full((t_pad - T, 3), -BIG)], axis=0)
    chunk_lo = jnp.min(tri_lo.reshape(n_chunks, CHUNK, 3), axis=1)
    chunk_hi = jnp.max(tri_hi.reshape(n_chunks, CHUNK, 3), axis=1)
    boxes = jnp.concatenate(
        [chunk_lo, jnp.zeros((n_chunks, 1)), chunk_hi,
         jnp.zeros((n_chunks, 1))], axis=1)         # [n_chunks, 8]

    tl = jnp.pad(t_lower, (0, n_pad - N))[:, None]

    t, i, u, v = _run(R, W, boxes, tl, (n_pad, t_pad))
    t = t[:N, 0]
    i = i[:N, 0]
    u = u[:N, 0]
    v = v[:N, 0]
    hit = (t < BIG) & (i < T)
    i_safe = jnp.where(hit, i, 0)
    if perm is not None:
        i_safe = perm[i_safe]                        # back to scene ids
    return hit, jnp.where(hit, i_safe, 0), jnp.where(hit, t, 0.0), u, v
