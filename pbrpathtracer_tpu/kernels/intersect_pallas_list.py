"""Candidate-list Pallas closest-hit kernel for large scenes.

The dense chunk-culled kernel (intersect_pallas.py) visits every
(ray_tile, tri_chunk) grid cell: `pl.when` skips the Moller-Trumbore
compute for culled chunks but NOT the grid step or the chunk-block DMA.
At 1M triangles x 1M rays that is 4.2M grid steps (~0.5 us each,
measured 2.27 s/query on a v5e chip) and 128 GB of triangle streaming
per query - O(rays x tris), exactly the scaling the reference's BVH
exists to avoid (mesh.cpp:169-211, doc/Results.pdf "O(n) -> O(log n)").

This kernel makes the sparsity structural instead of predicated, and
(since r5) walks candidates NEAR-TO-FAR with an early exit — the TPU
equivalent of ordered BVH traversal:

  1. a cheap jnp pre-pass slab-tests every ray against ~128 SUPERCHUNK
     AABBs (groups of consecutive BVH-DFS-ordered chunks), ORs the
     verdicts over each ray tile, and records each superchunk's ENTRY
     DISTANCE (min over the tile's rays of max(t_near, 0)); per tile it
     emits the candidate chunk ids sorted ascending by that entry
     distance, plus the distances themselves;
  2. the kernel grid is 1-D over ray tiles; each tile DMAs its id row
     and key row into SMEM, then runs a `lax.while_loop` over its
     candidates that BREAKS once the next candidate's entry distance
     exceeds every live lane's current best hit (sorted order makes the
     break exact: no later candidate can improve any lane);
  3. per candidate, an exact per-ray slab test against the chunk AABB
     (pruned by each lane's best t) gates BOTH the triangle-block DMA
     and the Moller-Trumbore pair block — failed chunks cost one
     [TILE, 1]-wide box test, no HBM traffic (r4 prefetched every
     candidate's block; at 128-triangle chunks the blind prefetch
     streamed 4x more bytes than the survivors need).

Candidates stay at LIST_CHUNK = 512 triangles; inside a surviving
chunk, four SUB_CHUNK = 128 sub-boxes gate four [TILE, 128] pair
blocks individually. Measured on-chip (50k tris, 512^2 primary rays):
only ~2 of 18 candidate chunks per tile survive the exact per-ray box
test, so the pair blocks of survivors dominate (75 of 79 ms) — finer
CANDIDATES (128-tri chunks, r5 first attempt) made the walk 73
candidates long and the ~1.5 us/iteration loop overhead cost more than
the pair savings (measured 120 ms vs 79 ms); finer MASKING inside the
surviving block keeps the walk short and still divides the pair
volume.

Winner updates tie-break on GLOBAL triangle id ((t, id) lexicographic
min), making the result independent of candidate visit order and
bit-identical to the dense kernel's ascending-id scan and the jnp
argmin intersectors.

Layout (unchanged from r4): manual DMA lane slices must be 128-aligned,
so triangles live on LANES - W ships as 16 field-plane rows [16, t_pad]
and a chunk is the aligned lane slice [:, cid*CHUNK : +CHUNK]. Rays sit
on SUBLANES ([TILE, 1] columns of a [TILE, 8] block) and the winner
reduction runs across lanes. Candidate id/key rows ship flattened 1-D
(i32 ids, f32 keys), rows padded to 1024 so every slice offset lands on
the (1024) 1-D tiling boundary.

Same accept/reject math as the dense kernel. Interpret-mode parity vs
the jnp matmul intersector (>4-chunk scenes, degenerate flat-AABB
chunks, t_lower re-trace) is asserted in tests/test_pallas_list.py; the
wrapper in intersect_pallas.py routes scenes with more than
LIST_KERNEL_MIN_CHUNKS dense chunks here.
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
MAX_SUPER = 128    # superchunk count target for the jnp cull pre-pass
LIST_CHUNK = 512   # triangles per candidate chunk (DMA/walk granularity)
SUB_CHUNK = 128    # sub-box mask granularity inside a surviving chunk
LIST_TILE = 512    # rays per tile
# A/B toggles (read at trace time; benchmarks flip them to isolate the
# cost/benefit of each mechanism — production default is both on)
EARLY_BREAK = True   # while_loop break once keys exceed every live best-t
SUB_MASK = True      # SUB_CHUNK box-masked pair blocks inside a chunk


def _safe_inv(rd3):
    """NaN-robust 1/rd for slab tests (see intersect_pallas.py:102)."""
    rd_safe = jnp.where(jnp.abs(rd3) < TINY,
                        jnp.where(rd3 < 0.0, -TINY, TINY), rd3)
    return 1.0 / rd_safe


def build_tile_lists(ro, rd, chunk_lo, chunk_hi, tile, group, n_valid=None,
                     alive=None):
    """Per-ray-tile candidate chunk lists via superchunk slab culling,
    sorted near-to-far by the superchunk entry distance.

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

    Returns (lists, keys):
      lists i32[n_tiles, L]: row = [count, id0, id1, ...pad] with L =
        1 + n_chunks rounded up to 1024 (1-D memref tiling alignment),
        candidate ids ascending by entry distance (ties: ascending id —
        stable sort over the BVH DFS order);
      keys f32[n_tiles, L]: row = [0, key0, key1, ...BIG] aligned with
        lists — key_j = min over the tile's valid rays of max(tn, 0)
        for candidate j's superchunk (a lower bound on any hit t in the
        chunk, since the superchunk box contains the chunk box).
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
        """[tile, 3] rays + [tile] validity -> ([n_super] OR verdicts,
        [n_super] entry keys).

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
        # entry key: a lower bound on any hit t inside the superchunk for
        # ANY of this tile's rays (clamped at 0 — origins inside the box)
        key = jnp.min(jnp.where(can, jnp.maximum(tn, 0.0), BIG), axis=0)
        return jnp.any(can, axis=0), key

    valid = jnp.arange(n_pad, dtype=jnp.int32) < n_valid
    if alive is not None:
        valid = valid & jnp.pad(alive, (0, n_pad - alive.shape[0]))
    # bound the live [batch, tile, n_super] block to ~64M f32 (256 MB)
    batch = max(1, min(n_tiles, (1 << 26) // max(tile * n_super, 1)))
    tile_can, tile_key = jax.lax.map(
        tile_verdict,
        (ro.reshape(n_tiles, tile, 3), rd.reshape(n_tiles, tile, 3),
         valid.reshape(n_tiles, tile)),
        batch_size=batch)                       # [n_tiles, n_super] each
    # expand superchunk verdicts/keys to chunk granularity, drop padding
    cand = jnp.repeat(tile_can, group, axis=1)[:, :n_chunks]
    ckey = jnp.repeat(tile_key, group, axis=1)[:, :n_chunks]

    counts = jnp.sum(cand, axis=1).astype(jnp.int32)        # [n_tiles]
    # near-to-far candidate order: stable argsort over (masked) entry
    # keys puts candidates first (non-candidates get +BIG), ascending by
    # distance, ties by chunk id (= BVH DFS order)
    masked = jnp.where(cand, ckey, BIG)
    order = jnp.argsort(masked, axis=1, stable=True).astype(jnp.int32)
    skey = jnp.take_along_axis(masked, order, axis=1)
    ids_row = jnp.concatenate([counts[:, None], order], axis=1)
    key_row = jnp.concatenate(
        [jnp.zeros((n_tiles, 1), jnp.float32), skey], axis=1)
    # The kernel DMAs per-tile rows as 1-D slices of the flattened
    # arrays; Mosaic tiles 1-D 4-byte memrefs at (1024), so both the row
    # width and the slice offsets must be 1024-aligned.
    lpad = (-ids_row.shape[1]) % 1024
    return (jnp.pad(ids_row, ((0, 0), (0, lpad))),
            jnp.pad(key_row, ((0, 0), (0, lpad)), constant_values=BIG))


def _kernel(CHUNK, TILE, L, r_ref, lists_ref, keys_ref, boxes_ref, sub_ref,
            w_ref, of_ref, oi_ref, list_smem, keys_smem, wbuf, lsem, ksem,
            wsem):
    # outputs live per tile: initialize before the candidate loop.
    # of columns: t(BIG), u(0), v(0); oi column 0: winner id.
    of_ref[:] = jnp.full_like(of_ref, BIG)
    of_ref[:, 1:3] = jnp.zeros_like(of_ref[:, 1:3])
    oi_ref[:] = jnp.zeros_like(oi_ref)

    i = pl.program_id(0)
    # id/key rows ship FLATTENED 1-D: a [1, L] row slice of a (8,128)-
    # tiled 2-D memref is misaligned on dim 0 for some shapes (Mosaic:
    # "slice shape along dimension 0 must be aligned to tiling (8)" —
    # hit at the 1M-triangle rung). 1-D 4-byte memrefs tile at (1024),
    # so rows are padded to 1024 and slices land on aligned offsets.
    off = pl.multiple_of(i * L, 1024)
    ldma = pltpu.make_async_copy(lists_ref.at[pl.ds(off, L)], list_smem,
                                 lsem)
    kdma = pltpu.make_async_copy(keys_ref.at[pl.ds(off, L)], keys_smem,
                                 ksem)
    ldma.start()
    kdma.start()
    ldma.wait()
    kdma.wait()
    count = list_smem[0]

    R = r_ref[:]                      # [TILE, 8]: rd(3), ro(3), t_lower
    rdc = R[:, 0:3]                   # [TILE, 3]
    roc = R[:, 3:6]
    irdc = _safe_inv(rdc)
    live_col = R[:, 7:8] > 0.0        # [TILE, 1] live-lane gate

    def live_t_max():
        """Largest best-t over live lanes (-BIG when all dead): once the
        next candidate's entry key exceeds this, no lane can improve."""
        return jnp.max(jnp.where(live_col, of_ref[:, 0:1], -BIG))

    def cond(j):
        if not EARLY_BREAK:
            return j < count
        return jnp.logical_and(j < count, keys_smem[1 + j] <= live_t_max())

    def body(j):
        cid = list_smem[1 + j]

        # exact per-ray slab test vs this chunk, pruned by best t
        row = boxes_ref[pl.ds(cid, 1), :]        # [1, 8]
        t1 = (row[:, 0:3] - roc) * irdc          # [TILE, 3]
        t2 = (row[:, 4:7] - roc) * irdc
        tn = jnp.max(jnp.minimum(t1, t2), axis=1, keepdims=True)
        tf = jnp.min(jnp.maximum(t1, t2), axis=1, keepdims=True)
        t_best = of_ref[:, 0:1]                  # [TILE, 1]
        can_hit = ((tn < tf) & (tf > 0.0) & (tn < t_best) & live_col)

        # DMA only chunks that survive the box test: the blind r4
        # prefetch streamed every candidate's block from HBM.
        @pl.when(jnp.any(can_hit))
        def _():
            off = pl.multiple_of(cid * CHUNK, 128)
            dma = pltpu.make_async_copy(
                w_ref.at[:, pl.ds(off, CHUNK)], wbuf, wsem)
            dma.start()
            dma.wait()
            Wb = wbuf[:]          # [16, CHUNK] triangle field planes
            rdx, rdy, rdz = R[:, 0:1], R[:, 1:2], R[:, 2:3]
            rox, roy, roz = R[:, 3:4], R[:, 4:5], R[:, 5:6]
            tl = R[:, 6:7]
            SUB = SUB_CHUNK if SUB_MASK else CHUNK
            NSUB = CHUNK // SUB

            for s in range(NSUB):
                # sub-box slab test (re-reads best t: earlier sub-blocks
                # of this chunk may have tightened it)
                if SUB_MASK:
                    srow = sub_ref[pl.ds(cid * NSUB + s, 1), :]  # [1, 8]
                else:
                    srow = boxes_ref[pl.ds(cid, 1), :]
                st1 = (srow[:, 0:3] - roc) * irdc             # [TILE, 3]
                st2 = (srow[:, 4:7] - roc) * irdc
                stn = jnp.max(jnp.minimum(st1, st2), axis=1,
                              keepdims=True)
                stf = jnp.min(jnp.maximum(st1, st2), axis=1,
                              keepdims=True)
                t_b = of_ref[:, 0:1]
                can_s = ((stn < stf) & (stf > 0.0) & (stn < t_b)
                         & live_col)

                @pl.when(jnp.any(can_s))
                def _(s=s, can_s=can_s, t_b=t_b):
                    lo = s * SUB
                    hi = lo + SUB
                    v0x, v0y, v0z = (Wb[0:1, lo:hi], Wb[1:2, lo:hi],
                                     Wb[2:3, lo:hi])
                    e1x, e1y, e1z = (Wb[3:4, lo:hi], Wb[4:5, lo:hi],
                                     Wb[5:6, lo:hi])
                    e2x, e2y, e2z = (Wb[6:7, lo:hi], Wb[7:8, lo:hi],
                                     Wb[8:9, lo:hi])

                    # Moller-Trumbore, identical operation order to the
                    # dense kernel (pathtracer.cpp:373-409 parity); pair
                    # block is [TILE, SUB_CHUNK]: rays broadcast along
                    # lanes, tris along sublanes.
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
                             & (t > EPS) & (t > tl) & can_s)
                    t_m = jnp.where(valid, t, BIG)

                    # sub-block winner across LANES (ties -> lowest
                    # column, matching jnp.argmin)
                    t_min = jnp.min(t_m, axis=1, keepdims=True)
                    cols = jax.lax.broadcasted_iota(jnp.int32, t_m.shape,
                                                    1)
                    col_min = jnp.min(jnp.where(t_m == t_min, cols,
                                                INT_BIG),
                                      axis=1, keepdims=True)
                    win = cols == col_min
                    u_win = jnp.sum(jnp.where(win, u, 0.0), axis=1,
                                    keepdims=True)
                    v_win = jnp.sum(jnp.where(win, v, 0.0), axis=1,
                                    keepdims=True)

                    # (t, global id) lexicographic min: candidates are
                    # visited in entry-distance order, so exact-t ties
                    # across chunks must resolve by id to stay
                    # bit-identical to the dense kernel's ascending-id
                    # scan (and the jnp argmin).
                    gid = col_min + cid * CHUNK + lo
                    gid_best = oi_ref[:, 0:1]
                    better = (t_min < t_b) | ((t_min == t_b)
                                              & (gid < gid_best))
                    of_ref[:, 0:1] = jnp.where(better, t_min, t_b)
                    of_ref[:, 1:2] = jnp.where(better, u_win,
                                               of_ref[:, 1:2])
                    of_ref[:, 2:3] = jnp.where(better, v_win,
                                               of_ref[:, 2:3])
                    oi_ref[:, 0:1] = jnp.where(better, gid, gid_best)
        return j + 1

    jax.lax.while_loop(cond, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnums=(6, 7))
def run_list_kernel(R, W, boxes, subboxes, lists, keys, shapes,
                    interpret=False):
    """R f32[n_pad, 8] (rd, ro, t_lower, alive cols), W f32[16, t_pad]
    field planes, boxes f32[n_chunks, 8], subboxes
    f32[n_chunks*(CHUNK//SUB_CHUNK), 8], lists i32[n_tiles, L],
    keys f32[n_tiles, L] -> (of f32[n_pad, 8] (t, u, v cols),
    oi i32[n_pad, 8]).
    """
    n_pad, t_pad, CHUNK, TILE = shapes
    # The candidate-list rows live in SMEM (a few hundred KB/core); an
    # oversized scene would otherwise die inside Mosaic with an opaque
    # allocation error. 16K ids+keys = 2M triangles at CHUNK=128.
    if lists.shape[1] > 16384:
        raise ValueError(
            f"candidate list width {lists.shape[1]} exceeds the SMEM "
            f"budget (16384 int32): scene has too many {CHUNK}-triangle "
            "chunks. Raise LIST_CHUNK or tile the candidate list.")
    grid = (n_pad // TILE,)
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, 8), jnp.int32),
    ]
    ray_spec = pl.BlockSpec((TILE, 8), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    box_spec = pl.BlockSpec(boxes.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    sub_spec = pl.BlockSpec(subboxes.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    out_spec = pl.BlockSpec((TILE, 8), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    L = lists.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel, CHUNK, TILE, L),
        grid=grid,
        in_specs=[ray_spec, flat_spec, flat_spec, box_spec, sub_spec,
                  w_spec],
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((L,), jnp.int32),
            pltpu.SMEM((L,), jnp.float32),
            pltpu.VMEM((16, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(R, lists.reshape(-1), keys.reshape(-1), boxes, subboxes, W)
