"""Candidate-list Pallas closest-hit kernel for large scenes.

The dense chunk-culled kernel (intersect_pallas.py) visits every
(ray_tile, tri_chunk) grid cell: `pl.when` skips the Moller-Trumbore
compute for culled chunks but NOT the grid step or the chunk-block DMA.
At 1M triangles x 1M rays that is 4.2M grid steps (~0.5 us each,
measured 2.27 s/query on a v5e chip) and 128 GB of triangle streaming
per query - O(rays x tris), exactly the scaling the reference's BVH
exists to avoid (mesh.cpp:169-211, doc/Results.pdf "O(n) -> O(log n)").

This kernel makes the sparsity structural instead of predicated:

  1. a cheap jnp pre-pass slab-tests every ray against ~128 SUPERCHUNK
     AABBs (groups of consecutive BVH-DFS-ordered chunks) and ORs the
     verdicts over each ray tile, producing a per-tile list of candidate
     chunk ids plus a count;
  2. the kernel grid is 1-D over ray tiles; each tile DMAs its list row
     into SMEM, then runs a dynamic `fori_loop` over ONLY its candidate
     chunks, double-buffering the triangle blocks from HBM with
     `pltpu.make_async_copy`;
  3. inside the loop the per-chunk exact slab test (pruned by the live
     best-t) still gates the Moller-Trumbore pair block with `pl.when`.

Non-candidate chunks cost nothing: no grid step, no DMA, no slab test.
For coherent tiles (primary rays, shadow rays to a compact light) the
inner trip count is a few percent of n_chunks; fully divergent tiles
degrade gracefully to the dense kernel's work.

Layout differs from the dense kernel out of necessity: manual DMA lane
slices must be 128-aligned, so triangles live on LANES here - W ships as
16 field-plane rows [16, t_pad] and a chunk is the aligned lane slice
[:, cid*CHUNK : +CHUNK]. Rays therefore sit on SUBLANES ([TILE, 1]
columns of a [TILE, 8] block) and the winner reduction runs across
lanes. Rays-on-lanes was the dense kernel's win because its *pipelined*
BlockSpec fetches tolerate a 16-wide minor dim; a manual `.at[]` DMA
does not.

Same accept/reject math as the dense kernel, bit-identical results.
Interpret-mode parity vs the jnp matmul intersector (>4-chunk scenes,
degenerate flat-AABB chunks, t_lower re-trace) is asserted in
tests/test_pallas_list.py; the wrapper in intersect_pallas.py routes
scenes with more than LIST_KERNEL_MIN_CHUNKS chunks here.
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
INT_BIG = np.int32(2 ** 31 - 1)
TINY = np.float32(1e-30)
MAX_SUPER = 128   # superchunk count target for the jnp cull pre-pass


def _safe_inv(rd3):
    """NaN-robust 1/rd for slab tests (see intersect_pallas.py:102)."""
    rd_safe = jnp.where(jnp.abs(rd3) < TINY,
                        jnp.where(rd3 < 0.0, -TINY, TINY), rd3)
    return 1.0 / rd_safe


def build_tile_lists(ro, rd, chunk_lo, chunk_hi, tile, group, n_valid=None,
                     alive=None):
    """Per-ray-tile candidate chunk lists via superchunk slab culling.

    Args:
      ro, rd: f32[N, 3] rays (N padded to a multiple of ``tile``).
      chunk_lo/hi: f32[n_chunks, 3] chunk AABBs (padded chunks inverted;
        real chunks pre-inflated by EPS — see intersect_pallas.py).
      tile: rays per tile (static).
      group: chunks per superchunk (static).
      n_valid: number of real rays; pad rows beyond it are masked out of
        the per-tile OR (a pad ray near the scene would otherwise enable
        spurious candidate chunks for the last partial tile).
      alive: optional bool[n_valid] live-lane mask — dead lanes never
        enable candidate chunks, so all-dead tiles get count = 0 and the
        kernel's per-tile loop body never runs for them.

    Returns:
      lists i32[n_tiles, L]: row = [count, id0, id1, ...pad] with L =
      1 + n_chunks rounded up to 128 lanes (manual-DMA alignment),
      candidate ids ascending (BVH DFS order), padding arbitrary.
    """
    n_chunks = chunk_lo.shape[0]
    n_super = (n_chunks + group - 1) // group
    pad = n_super * group - n_chunks
    slo = jnp.concatenate(
        [chunk_lo, jnp.full((pad, 3), BIG, chunk_lo.dtype)], axis=0)
    shi = jnp.concatenate(
        [chunk_hi, jnp.full((pad, 3), -BIG, chunk_hi.dtype)], axis=0)
    super_lo = jnp.min(slo.reshape(n_super, group, 3), axis=1)
    super_hi = jnp.max(shi.reshape(n_super, group, 3), axis=1)

    n_pad = ro.shape[0]
    n_tiles = n_pad // tile
    if n_valid is None:
        n_valid = n_pad

    def tile_verdict(args):
        """[tile, 3] rays + [tile] validity -> [n_super] per-tile OR.

        Per-axis accumulation: peak temporary is [tile, n_super] (not
        [tile, n_super, 3]), and lax.map's batching below bounds the
        live batch — at 1M rays x 128 superchunks the naive broadcast
        was ~1.6 GB per temporary, competing with the wavefront buffers
        at exactly the scene sizes this kernel targets.
        """
        ro_b, rd_b, valid_b = args
        ird = _safe_inv(rd_b)
        tn = jnp.full((ro_b.shape[0], n_super), -BIG, jnp.float32)
        tf = jnp.full((ro_b.shape[0], n_super), BIG, jnp.float32)
        for ax in range(3):
            t1 = (super_lo[None, :, ax] - ro_b[:, None, ax]) * ird[:, None, ax]
            t2 = (super_hi[None, :, ax] - ro_b[:, None, ax]) * ird[:, None, ax]
            tn = jnp.maximum(tn, jnp.minimum(t1, t2))
            tf = jnp.minimum(tf, jnp.maximum(t1, t2))
        can = (tn < tf) & (tf > 0.0) & valid_b[:, None]
        return jnp.any(can, axis=0)

    valid = jnp.arange(n_pad, dtype=jnp.int32) < n_valid
    if alive is not None:
        valid = valid & jnp.pad(alive, (0, n_pad - alive.shape[0]))
    # bound the live [batch, tile, n_super] block to ~64M f32 (256 MB)
    batch = max(1, min(n_tiles, (1 << 26) // max(tile * n_super, 1)))
    tile_can = jax.lax.map(
        tile_verdict,
        (ro.reshape(n_tiles, tile, 3), rd.reshape(n_tiles, tile, 3),
         valid.reshape(n_tiles, tile)),
        batch_size=batch)                                   # [n_tiles, n_super]
    # expand superchunk verdicts to chunk granularity, drop padded chunks
    cand = jnp.repeat(tile_can, group, axis=1)[:, :n_chunks]

    counts = jnp.sum(cand, axis=1).astype(jnp.int32)        # [n_tiles]
    # stable argsort of ~cand puts candidate chunk ids first, ascending
    order = jnp.argsort(~cand, axis=1, stable=True).astype(jnp.int32)
    row = jnp.concatenate([counts[:, None], order], axis=1)
    # The kernel DMAs per-tile rows as 1-D slices of the flattened array;
    # Mosaic tiles 1-D i32 memrefs at (1024), so both the row width and
    # the slice offsets must be 1024-aligned (128 was enough for the lane
    # rule but not for the 1-D tiling — Mosaic rejected 128-slices of a
    # (1024)-tiled buffer).
    lpad = (-row.shape[1]) % 1024
    return jnp.pad(row, ((0, 0), (0, lpad)))


def _kernel(CHUNK, TILE, L, r_ref, lists_ref, boxes_ref, w_ref,
            of_ref, oi_ref, list_smem, wbuf, lsem, wsems):
    # outputs live per tile: initialize before the candidate loop.
    # of columns: t(BIG), u(0), v(0); oi column 0: winner id.
    of_ref[:] = jnp.full_like(of_ref, BIG)
    of_ref[:, 1:3] = jnp.zeros_like(of_ref[:, 1:3])
    oi_ref[:] = jnp.zeros_like(oi_ref)

    i = pl.program_id(0)
    # lists ship FLATTENED 1-D: a [1, L] row slice of a (8,128)-tiled 2-D
    # memref is misaligned on dim 0 for some shapes (Mosaic: "slice shape
    # along dimension 0 must be aligned to tiling (8)" — hit at the
    # 1M-triangle rung). 1-D i32 memrefs tile at (1024), so rows are
    # padded to 1024 and slices land on 1024-aligned offsets.
    off = pl.multiple_of(i * L, 1024)
    ldma = pltpu.make_async_copy(lists_ref.at[pl.ds(off, L)], list_smem,
                                 lsem)
    ldma.start()
    ldma.wait()
    count = list_smem[0]

    R = r_ref[:]                      # [TILE, 8]: rd(3), ro(3), t_lower
    rdc = R[:, 0:3]                   # [TILE, 3]
    roc = R[:, 3:6]
    irdc = _safe_inv(rdc)

    def chunk_dma(slot, j):
        cid = list_smem[1 + j]
        off = pl.multiple_of(cid * CHUNK, 128)
        return pltpu.make_async_copy(
            w_ref.at[:, pl.ds(off, CHUNK)], wbuf.at[slot], wsems.at[slot])

    @pl.when(count > 0)
    def _():
        chunk_dma(0, 0).start()

        def body(j, carry):
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < count)
            def _():
                chunk_dma(1 - slot, j + 1).start()

            chunk_dma(slot, j).wait()
            cid = list_smem[1 + j]

            # exact per-ray slab test vs this chunk, pruned by best t
            row = boxes_ref[pl.ds(cid, 1), :]        # [1, 8]
            t1 = (row[:, 0:3] - roc) * irdc          # [TILE, 3]
            t2 = (row[:, 4:7] - roc) * irdc
            tn = jnp.max(jnp.minimum(t1, t2), axis=1, keepdims=True)
            tf = jnp.min(jnp.maximum(t1, t2), axis=1, keepdims=True)
            t_best = of_ref[:, 0:1]                  # [TILE, 1]
            can_hit = ((tn < tf) & (tf > 0.0) & (tn < t_best)
                       & (R[:, 7:8] > 0.0))          # dead-lane gate

            @pl.when(jnp.any(can_hit))
            def _():
                Wb = wbuf[slot]       # [16, CHUNK] triangle field planes
                v0x, v0y, v0z = Wb[0:1, :], Wb[1:2, :], Wb[2:3, :]
                e1x, e1y, e1z = Wb[3:4, :], Wb[4:5, :], Wb[5:6, :]
                e2x, e2y, e2z = Wb[6:7, :], Wb[7:8, :], Wb[8:9, :]
                rdx, rdy, rdz = R[:, 0:1], R[:, 1:2], R[:, 2:3]
                rox, roy, roz = R[:, 3:4], R[:, 4:5], R[:, 5:6]
                tl = R[:, 6:7]

                # Moller-Trumbore, identical operation order to the dense
                # kernel (pathtracer.cpp:373-409 parity); pair block is
                # [TILE, CHUNK]: rays broadcast along lanes, tris along
                # sublanes.
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
                f = jnp.where(denom_ok,
                              1.0 / jnp.where(denom_ok, a, 1.0), 0.0)
                u = u_num * f
                v = v_num * f
                t = t_num * f
                valid = (denom_ok & (u >= 0.0) & (u <= 1.0)
                         & (v >= 0.0) & (u + v <= 1.0)
                         & (t > EPS) & (t > tl) & can_hit)
                t_m = jnp.where(valid, t, BIG)

                # chunk-local winner across LANES (ties -> lowest column,
                # matching jnp.argmin)
                t_min = jnp.min(t_m, axis=1, keepdims=True)   # [TILE, 1]
                cols = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 1)
                col_min = jnp.min(jnp.where(t_m == t_min, cols, INT_BIG),
                                  axis=1, keepdims=True)
                win = cols == col_min
                u_win = jnp.sum(jnp.where(win, u, 0.0), axis=1,
                                keepdims=True)
                v_win = jnp.sum(jnp.where(win, v, 0.0), axis=1,
                                keepdims=True)

                better = t_min < t_best
                of_ref[:, 0:1] = jnp.where(better, t_min, t_best)
                of_ref[:, 1:2] = jnp.where(better, u_win, of_ref[:, 1:2])
                of_ref[:, 2:3] = jnp.where(better, v_win, of_ref[:, 2:3])
                oi_ref[:, 0:1] = jnp.where(better, col_min + cid * CHUNK,
                                           oi_ref[:, 0:1])
            return carry

        jax.lax.fori_loop(0, count, body, None)


@functools.partial(jax.jit, static_argnums=(4, 5))
def run_list_kernel(R, W, boxes, lists, shapes, interpret=False):
    """R f32[n_pad, 8] (rd, ro, t_lower cols), W f32[16, t_pad] field
    planes, boxes f32[n_chunks, 8], lists i32[n_tiles, L]
    -> (of f32[n_pad, 8] (t, u, v cols), oi i32[n_pad, 8]).
    """
    n_pad, t_pad, CHUNK, TILE = shapes
    # The candidate-list row lives in SMEM (a few hundred KB/core); an
    # oversized scene would otherwise die inside Mosaic with an opaque
    # allocation error. 16K ids = 8M triangles at CHUNK=512.
    if lists.shape[1] > 16384:
        raise ValueError(
            f"candidate list width {lists.shape[1]} exceeds the SMEM "
            f"budget (16384 int32): scene has too many {CHUNK}-triangle "
            "chunks. Raise MAX_CHUNK or tile the candidate list.")
    grid = (n_pad // TILE,)
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, 8), jnp.int32),
    ]
    ray_spec = pl.BlockSpec((TILE, 8), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    lists_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    box_spec = pl.BlockSpec(boxes.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    out_spec = pl.BlockSpec((TILE, 8), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    L = lists.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel, CHUNK, TILE, L),
        grid=grid,
        in_specs=[ray_spec, lists_spec, box_spec, w_spec],
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((L,), jnp.int32),
            pltpu.VMEM((2, 16, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(R, lists.reshape(-1), boxes, W)
