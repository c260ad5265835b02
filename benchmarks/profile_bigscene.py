#!/usr/bin/env python
"""Stage-level breakdown of the large-scene closest-hit path (VERDICT r5
task #1): where does a rung-3 (50k-tri) / rung-5 (1M-tri) query spend its
time?  Measures, on the real chip:

  * full render_sample forward (one 1-spp pass)
  * one closest_hit query on primary rays
  * build_tile_lists (the jnp cull pre-pass) alone
  * run_list_kernel alone (given prebuilt lists)
  * candidate-count statistics (how much does the cull actually cull?)

Usage: python benchmarks/profile_bigscene.py [--tris 50000] [--size 512]
"""

import argparse
import json
import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def devtime(fn, reps=8):
    import jax
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    jax.block_until_ready(outs[-1])
    t1 = time.perf_counter()
    outs = [fn() for _ in range(2 * reps)]
    jax.block_until_ready(outs[-1])
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=50_000)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--depth", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from pbrpathtracer_tpu.scene.big_scenes import mesh_scene, mesh_scene_camera
    from pbrpathtracer_tpu.engine.config import RenderConfig
    from pbrpathtracer_tpu.ops.integrator import render_sample
    from pbrpathtracer_tpu.ops.camera import generate_rays
    from pbrpathtracer_tpu.kernels.intersect_pallas import intersect_pallas
    from pbrpathtracer_tpu.kernels import intersect_pallas_list as ipl

    scene = mesh_scene(args.tris, accel="always")
    cam = mesh_scene_camera()
    cfg = RenderConfig(width=args.size, height=args.size,
                       max_depth=args.depth, spp=1)
    n_pix = args.size * args.size
    out = {"tris": scene.num_triangles, "size": args.size,
           "depth": args.depth, "device": str(jax.devices()[0])}

    # --- full forward sample ------------------------------------------------
    fwd = jax.jit(lambda s: jnp.sum(render_sample(scene, cam, cfg,
                                                  jnp.uint32(0), seed=s)))
    t = devtime(lambda: fwd(jnp.uint32(1)))
    out["t_render_sample_ms"] = round(t * 1e3, 3)
    out["paths_per_s_sample"] = round(n_pix / t, 1)

    # --- one closest-hit query on primary rays ------------------------------
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    ro, rd = jax.jit(lambda: generate_rays(cam, args.size, args.size,
                                           jnp.uint32(0), jnp.uint32(0),
                                           pix))()
    q = jax.jit(lambda ro, rd: intersect_pallas(scene, ro, rd))
    t = devtime(lambda: q(ro, rd))
    out["t_query_primary_ms"] = round(t * 1e3, 3)

    # --- decomposition: list build vs kernel --------------------------------
    geom = scene.geom
    perm = scene.accel.perm
    T = geom.v0.shape[0]
    CHUNK = ipl.LIST_CHUNK
    t_pad = ((T + CHUNK - 1) // CHUNK) * CHUNK
    TILE = ipl.LIST_TILE
    n_pad = ((n_pix + TILE - 1) // TILE) * TILE
    n_chunks = t_pad // CHUNK
    out["n_chunks"] = n_chunks
    out["chunk"] = CHUNK
    out["tile"] = TILE

    v0 = geom.v0[perm]
    e1 = geom.e1[perm]
    e2 = geom.e2[perm]
    tri_lo = jnp.minimum(jnp.minimum(v0, v0 + e1), v0 + e2)
    tri_hi = jnp.maximum(jnp.maximum(v0, v0 + e1), v0 + e2)
    BIG = np.float32(3e38)
    tri_lo = jnp.concatenate([tri_lo, jnp.full((t_pad - T, 3), BIG)], axis=0)
    tri_hi = jnp.concatenate([tri_hi, jnp.full((t_pad - T, 3), -BIG)], axis=0)
    chunk_lo = jnp.min(tri_lo.reshape(n_chunks, CHUNK, 3), axis=1) - 1e-4
    chunk_hi = jnp.max(tri_hi.reshape(n_chunks, CHUNK, 3), axis=1) + 1e-4

    ro_pad = jnp.pad(ro, ((0, n_pad - n_pix), (0, 0)))
    rd_pad = jnp.pad(rd, ((0, n_pad - n_pix), (0, 0)), constant_values=1.0)
    group = (n_chunks + ipl.MAX_SUPER - 1) // ipl.MAX_SUPER
    build = jax.jit(lambda ro, rd: ipl.build_tile_lists(
        ro, rd, chunk_lo, chunk_hi, TILE, group, n_valid=n_pix))
    t = devtime(lambda: build(ro_pad, rd_pad))
    out["t_build_lists_ms"] = round(t * 1e3, 3)

    lists, keys = build(ro_pad, rd_pad)
    counts = np.asarray(lists[:, 0])
    out["cand_counts"] = {
        "mean": round(float(counts.mean()), 1),
        "p50": int(np.percentile(counts, 50)),
        "p90": int(np.percentile(counts, 90)),
        "max": int(counts.max()),
        "n_chunks": n_chunks,
        "mean_frac": round(float(counts.mean()) / n_chunks, 3),
    }

    tri9 = jnp.concatenate([v0, e1, e2], axis=1)
    W = jnp.pad(tri9, ((0, t_pad - T), (0, 7)))
    Wp = W.T
    boxes = jnp.concatenate(
        [chunk_lo, jnp.zeros((n_chunks, 1)), chunk_hi,
         jnp.zeros((n_chunks, 1))], axis=1)
    n_sub = t_pad // ipl.SUB_CHUNK
    sub_lo = jnp.min(tri_lo.reshape(n_sub, ipl.SUB_CHUNK, 3), axis=1) - 1e-4
    sub_hi = jnp.max(tri_hi.reshape(n_sub, ipl.SUB_CHUNK, 3), axis=1) + 1e-4
    subboxes = jnp.concatenate(
        [sub_lo, jnp.zeros((n_sub, 1)), sub_hi,
         jnp.zeros((n_sub, 1))], axis=1)
    tl = jnp.zeros((n_pix,), jnp.float32)
    Rt = jnp.concatenate([rd, ro, tl[:, None],
                          jnp.ones((n_pix, 1), jnp.float32)], axis=1)
    Rt = jnp.pad(Rt, ((0, n_pad - n_pix), (0, 0)))
    kern = jax.jit(lambda Rt, lists, keys: ipl.run_list_kernel(
        Rt, Wp, boxes, subboxes, lists, keys, (n_pad, t_pad, CHUNK, TILE)))
    t = devtime(lambda: kern(Rt, lists, keys))
    out["t_list_kernel_ms"] = round(t * 1e3, 3)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
