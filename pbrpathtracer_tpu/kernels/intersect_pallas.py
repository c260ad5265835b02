"""Fused Pallas closest-hit kernel with chunk culling.

The jnp intersectors materialize the [N, 4*chunk] Moller-Trumbore test
matrix in HBM between the compute and the acceptance tests - at 512^2
rays that is gigabytes of traffic per query and ~10x off roofline. And
per-lane BVH walks (accel/traverse.py) are gather-bound: measured ~40x
slower than dense brute force on the TPU at 50k triangles.

This kernel is the TPU-native middle path - a "wide BVH" of exactly two
levels, fused in VMEM:

  * triangles are pre-ordered by BVH DFS locality (scene.accel.perm when
    available), so each fixed-size chunk is a tight spatial cluster with a
    precomputed AABB;
  * grid = (ray_tiles, tri_chunks), chunk dim innermost: the per-tile
    best-hit accumulators stay resident in VMEM;
  * per step, every ray in the tile slab-tests the chunk AABB (pruned by
    its current best t); if NO lane can hit, the whole test block is
    skipped (`pl.when`) - dense lanes, BVH-like work saving;
  * otherwise: classic Moller-Trumbore evaluated directly on the VPU as
    broadcast [CHUNK, TILE] f32 arithmetic, followed by acceptance tests
    and a masked running-min.

Layout is everything on TPU, so this kernel puts the RAY dimension on
LANES (minor) and the triangle dimension on SUBLANES:

  * rays ship as one dense [8, N] block (rd, ro, t_lower rows) - a
    [N, 8] block would waste 15/16 of every (8,128) DMA tile;
  * outputs are [8, N] rows (t, u, v / winner id) - dense, vs [N, 1]
    columns which pad 128x;
  * triangle components [CHUNK, 1] broadcast along lanes, ray components
    [1, TILE] along sublanes - both hardware-native splats;
  * the winner reduction (min + masked iota-min) runs across SUBLANES,
    the fast reduction axis, producing lane-dense [1, TILE] rows;
  * triangle padding granularity is 8 (sublanes), not 128 (lanes): a
    36-triangle Cornell box pads to 40, not 128 - 3.2x less wasted work
    on small scenes.

Measured against alternatives on-chip (512^2 rays, Cornell): ray-major
layout 12 ms, bilinear MXU form 17 ms (K=10 of 128 leaves 92% of the
systolic array idle and f32-exact needs 6 bf16 passes), this kernel
~3 ms, bit-exact vs the jnp classic intersector. The matmul form remains
in ops/intersect.py as the XLA-fusion fallback for non-TPU backends.

Replaces the reference's recursive BVH walk + scalar Moller-Trumbore
(pathtracer.cpp:373-492) as the TPU hot path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.constants import EPS

BIG = np.float32(3.0e38)
MAX_CHUNK = 512    # max triangles per grid step (cull granularity)
# TILE*CHUNK pair-block budget. At 256K f32 elements the ~16 live
# [CHUNK, TILE] temporaries (h, s, q, numerators, u/v/t, masks) total
# ~16 MB — nominally the whole 16 MB/core VMEM, but several temporaries
# are i1 masks and Mosaic's liveness analysis frees the cross-product
# terms before the acceptance tests, so the measured peak fits with room
# for the accumulators + triangle rows (validated on-chip: bit-exact vs
# the jnp intersectors at this setting). If a Mosaic update regresses
# liveness, drop this to 192K first.
PAIR_BUDGET = 256 * 1024
INT_BIG = np.int32(2 ** 31 - 1)
# Scenes with more chunks than this route to the candidate-list kernel
# (intersect_pallas_list.py); small scenes keep the dense grid, whose
# single-chunk case has no list/DMA bookkeeping at all.
LIST_KERNEL_MIN_CHUNKS = 4
# List route only: sort query rays by (dead-last, direction octant,
# origin Morton) before tiling. Two effects, both measured on the 50k-tri
# rung-3 scene: (a) dead lanes pack into trailing tiles whose candidate
# count is 0 (a segment-3 query with 8% lanes live cost 206 ms unsorted —
# every tile still walked its candidates for a lane or two); (b) live
# bounce rays regain tile coherence, shrinking each tile's candidate
# union. Costs one argsort + [N,6]-gather/[N,5]-scatter per query
# (~28 ms at 512² — why the integrator instead sorts the WHOLE wavefront
# once per segment with the same key, ops/compaction.coherence_key, and
# this stays off by default: it serves direct intersect_pallas callers
# whose rays arrive unsorted).
SORT_RAYS = False


def _spread3(x):
    """Interleave 8-bit x into every 3rd bit (Morton spread, i32)."""
    x = x & 0xFF
    x = (x | (x << 8)) & 0x00F00F
    x = (x | (x << 4)) & 0x0C30C3
    x = (x | (x << 2)) & 0x249249
    return x


def _ray_sort_key(ro, rd, alive, bbox_lo, bbox_hi):
    """i32 sort key: dead rays last; live rays by (octant, origin Morton)."""
    oct_ = ((rd[:, 0] > 0).astype(jnp.int32)
            | ((rd[:, 1] > 0).astype(jnp.int32) << 1)
            | ((rd[:, 2] > 0).astype(jnp.int32) << 2))
    scale = 255.0 / jnp.maximum(bbox_hi - bbox_lo, 1e-6)
    q = jnp.clip((ro - bbox_lo) * scale, 0.0, 255.0).astype(jnp.int32)
    morton = ((_spread3(q[:, 0]) << 2) | (_spread3(q[:, 1]) << 1)
              | _spread3(q[:, 2]))
    key = (oct_ << 24) | morton
    if alive is None:
        return key
    return jnp.where(alive, key, INT_BIG)


def _pick_chunk(t_pad: int) -> int:
    return min(MAX_CHUNK, t_pad)


def _pick_tile(n_pad: int, chunk: int) -> int:
    tile = PAIR_BUDGET // chunk
    tile = max(256, min(8192, (tile // 256) * 256))
    return min(tile, n_pad)


def _kernel(CHUNK, TILE, r_ref, w_ref, box_ref, of_ref, oi_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        of_ref[:] = jnp.full_like(of_ref, BIG)
        of_ref[1:3, :] = jnp.zeros_like(of_ref[1:3, :])
        oi_ref[:] = jnp.zeros_like(oi_ref)

    R = r_ref[:]                      # [8, TILE]: rd(3), ro(3), t_lower, alive
    rd3 = R[0:3, :]
    ro3 = R[3:6, :]
    alive_row = R[7:8, :] > 0.0       # [1, TILE] live-lane gate

    # ---- chunk culling: slab test vs the cluster AABB, pruned by best t ----
    row = box_ref[pl.ds(j, 1), :]     # [1, 8] dynamic row of the box table
    lo = row[0, 0:3]                  # [3]
    hi = row[0, 4:7]
    # NaN-robust slabs: a literal 1/rd gives (lo-ro)*inf = NaN when rd==0
    # AND the origin sits exactly on the slab plane, which would wrongly
    # cull the chunk. Clamping |rd| >= TINY keeps every product finite-or-inf
    # (never 0*inf) with identical accept/reject decisions otherwise.
    TINY = np.float32(1e-30)
    rd_safe = jnp.where(jnp.abs(rd3) < TINY,
                        jnp.where(rd3 < 0.0, -TINY, TINY), rd3)
    ird = 1.0 / rd_safe
    t1 = (lo[:, None] - ro3) * ird
    t2 = (hi[:, None] - ro3) * ird
    tn = jnp.max(jnp.minimum(t1, t2), axis=0, keepdims=True)   # [1, TILE]
    tf = jnp.min(jnp.maximum(t1, t2), axis=0, keepdims=True)
    t_best = of_ref[0:1, :]
    # Dead lanes never enable a chunk: with live lanes compacted to a
    # prefix (ops/compaction.py) trailing all-dead tiles skip every
    # Möller–Trumbore block below.
    can_hit = (tn < tf) & (tf > 0.0) & (tn < t_best) & alive_row
    any_hit = jnp.any(can_hit)

    @pl.when(any_hit)
    def _():
        Wb = w_ref[:]                 # [CHUNK, 16] SoA triangle columns
        v0x, v0y, v0z = Wb[:, 0:1], Wb[:, 1:2], Wb[:, 2:3]   # [CHUNK, 1]
        e1x, e1y, e1z = Wb[:, 3:4], Wb[:, 4:5], Wb[:, 5:6]
        e2x, e2y, e2z = Wb[:, 6:7], Wb[:, 7:8], Wb[:, 8:9]
        rdx, rdy, rdz = R[0:1, :], R[1:2, :], R[2:3, :]      # [1, TILE]
        rox, roy, roz = R[3:4, :], R[4:5, :], R[5:6, :]
        tl = R[6:7, :]

        # Classic Moller-Trumbore (pathtracer.cpp:373-409 operation order),
        # broadcast to the [CHUNK, TILE] pair block on the VPU.
        hx = rdy * e2z - rdz * e2y
        hy = rdz * e2x - rdx * e2z
        hz = rdx * e2y - rdy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        sx = rox - v0x
        sy = roy - v0y
        sz = roz - v0z
        u_num = sx * hx + sy * hy + sz * hz
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v_num = rdx * qx + rdy * qy + rdz * qz
        t_num = e2x * qx + e2y * qy + e2z * qz

        denom_ok = jnp.abs(a) >= EPS
        f = jnp.where(denom_ok, 1.0 / jnp.where(denom_ok, a, 1.0), 0.0)
        u = u_num * f
        v = v_num * f
        t = t_num * f
        valid = (denom_ok & (u >= 0.0) & (u <= 1.0)
                 & (v >= 0.0) & (u + v <= 1.0)
                 & (t > EPS) & (t > tl) & can_hit)
        t_m = jnp.where(valid, t, BIG)

        # chunk-local winner via sublane reductions (ties -> lowest row,
        # matching jnp.argmin)
        t_min = jnp.min(t_m, axis=0, keepdims=True)          # [1, TILE]
        rows = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 0)
        row_min = jnp.min(jnp.where(t_m == t_min, rows, INT_BIG), axis=0,
                          keepdims=True)
        win = rows == row_min
        u_win = jnp.sum(jnp.where(win, u, 0.0), axis=0, keepdims=True)
        v_win = jnp.sum(jnp.where(win, v, 0.0), axis=0, keepdims=True)

        better = t_min < t_best
        of_ref[0:1, :] = jnp.where(better, t_min, t_best)
        of_ref[1:2, :] = jnp.where(better, u_win, of_ref[1:2, :])
        of_ref[2:3, :] = jnp.where(better, v_win, of_ref[2:3, :])
        oi_ref[0:1, :] = jnp.where(better, row_min + j * CHUNK,
                                   oi_ref[0:1, :])


@functools.partial(jax.jit, static_argnums=(3,))
def _run(R, W, boxes, shapes):
    n_pad, t_pad = shapes
    boxes_shape = boxes.shape
    CHUNK = _pick_chunk(t_pad)
    TILE = _pick_tile(n_pad, CHUNK)
    grid = (n_pad // TILE, t_pad // CHUNK)
    out_shape = [
        jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((8, n_pad), jnp.int32),
    ]
    ray_spec = pl.BlockSpec((8, TILE), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((CHUNK, 16), lambda i, j: (j, 0),
                          memory_space=pltpu.VMEM)
    # whole box table resident per step (Mosaic forbids (1, 8) blocks);
    # a few hundred KB of VMEM even at 1M tris
    box_spec = pl.BlockSpec(boxes_shape, lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((8, TILE), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, CHUNK, TILE),
        grid=grid,
        in_specs=[ray_spec, w_spec, box_spec],
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(R, W, boxes)


def intersect_pallas(geom_or_scene, ro, rd, t_lower=None, perm=None,
                     alive=None):
    """Closest-hit query - same contract as ops.intersect intersectors.

    Accepts a Scene (uses .geom, and .accel.perm as the locality order when
    present) or a bare Geometry. ``perm`` overrides the triangle ordering.
    ``alive`` rides the spare row of the ray block; dead lanes are culled
    before the pair tests and report a clean miss (intersect.mask_dead
    contract) - with compaction, trailing dead tiles cost ~nothing.
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
    alive_f = (jnp.ones((N,), jnp.float32) if alive is None
               else alive.astype(jnp.float32))

    # triangle dim lives on sublanes: pad granularity 8, then to CHUNK
    t_pad = ((T + 7) // 8) * 8
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

    # dense [8, n_pad] ray block: rd(3), ro(3), t_lower, alive
    R = jnp.concatenate([rd.T, ro.T, t_lower[None, :],
                         alive_f[None, :]], axis=0)
    R = jnp.pad(R, ((0, 0), (0, n_pad - N)))  # pad lanes: alive row 0 = dead

    # [t_pad, 16] triangle SoA columns: v0(3), e1(3), e2(3), pad. Padded
    # tris have zero edges -> a = 0 -> |a| < EPS -> miss.
    tri9 = jnp.concatenate([v0, e1, e2], axis=1)     # [T, 9]
    W = jnp.pad(tri9, ((0, t_pad - T), (0, 7)))      # [t_pad, 16]

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
    # Inflate by EPS: the kernels' strict slab test (tn < tf) culls
    # exactly-flat boxes (a coplanar axis-aligned chunk — ground plane,
    # quad light — has lo==hi on one axis, so tn==tf). The reference
    # guards the same case by inflating degenerate AABBs before its
    # strict test (AABB::Check, mesh.cpp:32-45). Inflation only makes
    # culling conservative — acceptance is Möller–Trumbore on triangles.
    # Padded chunks stay inverted (BIG∓EPS), never self-enabling.
    chunk_lo = chunk_lo - EPS
    chunk_hi = chunk_hi + EPS
    boxes = jnp.concatenate(
        [chunk_lo, jnp.zeros((n_chunks, 1)), chunk_hi,
         jnp.zeros((n_chunks, 1))], axis=1)          # [n_chunks, 8]

    if n_chunks > LIST_KERNEL_MIN_CHUNKS:
        # Large scene: candidate-list kernel — near-to-far sorted
        # candidate walk with early exit, per-chunk box-gated DMA, and
        # SUB_CHUNK(128)-masked pair blocks inside surviving chunks
        # (the dense grid is O(tiles x chunks); see intersect_pallas_list).
        from .intersect_pallas_list import (LIST_TILE, SUB_CHUNK, MAX_SUPER,
                                            build_tile_lists,
                                            run_list_kernel)
        order = None
        if SORT_RAYS:
            # scene bbox from the (pad-inert) chunk boxes
            bbox_lo = jnp.min(chunk_lo, axis=0)
            bbox_hi = jnp.max(chunk_hi, axis=0)
            key = _ray_sort_key(ro, rd, alive, bbox_lo, bbox_hi)
            order = jnp.argsort(key)
            ro = ro[order]
            rd = rd[order]
            t_lower = t_lower[order]
            alive_f = alive_f[order]
            if alive is not None:
                alive = alive[order]
        if LIST_TILE != TILE:
            TILE = LIST_TILE
            n_pad = ((N + TILE - 1) // TILE) * TILE
            R = jnp.concatenate([rd.T, ro.T, t_lower[None, :],
                                 alive_f[None, :]], axis=0)
            R = jnp.pad(R, ((0, 0), (0, n_pad - N)))
        # sub-boxes at SUB_CHUNK granularity (t_pad is a multiple of
        # CHUNK, CHUNK a multiple of SUB_CHUNK)
        n_sub = t_pad // SUB_CHUNK
        sub_lo = jnp.min(tri_lo.reshape(n_sub, SUB_CHUNK, 3), axis=1) - EPS
        sub_hi = jnp.max(tri_hi.reshape(n_sub, SUB_CHUNK, 3), axis=1) + EPS
        subboxes = jnp.concatenate(
            [sub_lo, jnp.zeros((n_sub, 1)), sub_hi,
             jnp.zeros((n_sub, 1))], axis=1)         # [n_sub, 8]
        ro_pad = jnp.pad(ro, ((0, n_pad - N), (0, 0)))
        rd_pad = jnp.pad(rd, ((0, n_pad - N), (0, 0)),
                         constant_values=1.0)  # pad rays masked in the cull
        group = (n_chunks + MAX_SUPER - 1) // MAX_SUPER
        lists, keys = build_tile_lists(ro_pad, rd_pad, chunk_lo, chunk_hi,
                                       TILE, group, n_valid=N,
                                       alive=None if alive is None else alive)
        # transposed layouts (see intersect_pallas_list docstring):
        # rays as [n_pad, 8] columns, triangles as [16, t_pad] planes
        Rt = jnp.concatenate(
            [rd, ro, t_lower[:, None], alive_f[:, None]], axis=1)
        Rt = jnp.pad(Rt, ((0, n_pad - N), (0, 0)))
        Wp = W.T                                     # [16, t_pad]
        oft, oit = run_list_kernel(Rt, Wp, boxes, subboxes, lists, keys,
                                   (n_pad, t_pad, CHUNK, TILE))
        t, u, v = oft[:N, 0], oft[:N, 1], oft[:N, 2]
        i = oit[:N, 0]
        if order is not None:
            # scatter results back to the caller's lane order
            def unsort(x):
                return jnp.zeros_like(x).at[order].set(x)
            t, u, v, i = unsort(t), unsort(u), unsort(v), unsort(i)
    else:
        of, oi = _run(R, W, boxes, (n_pad, t_pad))
        t = of[0, :N]
        u = of[1, :N]
        v = of[2, :N]
        i = oi[0, :N]
    hit = (t < BIG) & (i < T)
    i_safe = jnp.where(hit, i, 0)
    if perm is not None:
        i_safe = perm[i_safe]                        # back to scene ids
    return hit, jnp.where(hit, i_safe, 0), jnp.where(hit, t, 0.0), u, v
