#!/usr/bin/env python
"""Round-4 on-chip evidence runner — ONE process, all measurements.

The tunneled v5e worker destabilizes under repeated client churn, so every
piece of round-4 TPU evidence runs sequentially inside this single client:

  1. dense-kernel CHUNK/PAIR_BUDGET sweep (flagship Cornell),
  2. BASELINE ladder rungs 3-4 (50k-tri texture grads, translucent+DOF),
  3. candidate-list kernel ON-CHIP bit-exactness + timing vs the matmul
     intersector on a >2k-tri scene (Mosaic/DMA, not interpret mode —
     VERDICT r3 missing #2),
  4. full-pipeline ON-CHIP oracle parity at 64² depth 4 with opacity +
     normal + roughness textures engaged (VERDICT r3 weak #6),
  5. deep translucent workload (depth 8) with wavefront compaction
     on/off (VERDICT r3 next #6 + weak #5),
  6. the r2-era graph (hit_vjp="winner", rolled scan, "hits" remat) under
    the canonical queued-slope timing — the forward-regression
    explanation (VERDICT r3 next #4),
  7. ladder rung 5 (1M-tri sharded render + fit) last: the heaviest and
     historically the one that crashes the worker.

Each section appends one JSON line to R4_EVIDENCE.jsonl (flushed
immediately) and is individually fenced — a worker crash mid-run keeps
everything already recorded. Ladder lines are also mirrored to
LADDER_r04.json.
"""

import json
import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "R4_EVIDENCE.jsonl")
LADDER_OUT = os.path.join(REPO, "LADDER_r04.json")


def emit(section, payload):
    line = json.dumps({"section": section, **payload})
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def fenced(section, fn):
    t0 = time.time()
    try:
        payload = fn() or {}
        payload["status"] = "ok"
    except Exception as e:  # noqa: BLE001 — record and continue
        payload = {"status": "fail", "error": f"{type(e).__name__}: {e}"}
    payload["seconds"] = round(time.time() - t0, 1)
    emit(section, payload)


def devtime(f, args_of, reps):
    import jax
    out = f(*args_of(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [f(*args_of(i)) for i in range(reps)]
    jax.block_until_ready(outs[-1])
    t1 = time.perf_counter()
    outs = [f(*args_of(i)) for i in range(2 * reps)]
    jax.block_until_ready(outs[-1])
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / reps


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    jax.block_until_ready(jax.jit(lambda a: a @ a)(jnp.ones((256, 256))))
    emit("health", {"status": "ok", "warmup_s": round(time.time() - t0, 1),
                    "device": str(jax.devices()[0])})

    from pbrpathtracer_tpu.scene.builders import (cornell_box,
                                                  translucent_scene)
    from pbrpathtracer_tpu.scene.scene import Camera
    from pbrpathtracer_tpu.engine.config import RenderConfig
    from pbrpathtracer_tpu.ops.camera import generate_rays
    from pbrpathtracer_tpu.ops.integrator import render_sample

    cam = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                      up=(0, 1, 0), fovy=61)

    # ---- 1. dense-kernel parameter sweep --------------------------------
    def sweep():
        import pbrpathtracer_tpu.kernels.intersect_pallas as ip
        scene = cornell_box()
        N = 512 * 512
        pix = jnp.arange(N, dtype=jnp.int32)
        ro, rd = generate_rays(cam, 512, 512, jnp.uint32(0), jnp.uint32(0),
                               pix)
        jax.block_until_ready((ro, rd))
        orig = (ip.MAX_CHUNK, ip.PAIR_BUDGET, ip.LIST_KERNEL_MIN_CHUNKS)
        rows = {}
        ref = None
        try:
            ip.LIST_KERNEL_MIN_CHUNKS = 1 << 30
            for max_chunk in (8, 16, 32, 40):
                for budget in (128 * 1024, 256 * 1024, 512 * 1024):
                    ip.MAX_CHUNK = max_chunk
                    ip.PAIR_BUDGET = budget
                    f = jax.jit(
                        lambda ro, rd: ip.intersect_pallas(scene, ro, rd))
                    out = f(ro, rd)
                    jax.block_until_ready(out)
                    cur = [np.asarray(x) for x in out]
                    if ref is None:
                        ref = cur
                    elif not all(np.array_equal(a, b)
                                 for a, b in zip(cur, ref)):
                        rows[f"c{max_chunk}_b{budget//1024}K"] = "MISMATCH"
                        continue
                    t = devtime(f, lambda i: (ro, rd), 24)
                    rows[f"c{max_chunk}_b{budget//1024}K"] = round(t * 1e3, 3)
        finally:
            ip.MAX_CHUNK, ip.PAIR_BUDGET, ip.LIST_KERNEL_MIN_CHUNKS = orig
        return {"query_ms_by_config": rows,
                "note": "512^2 cornell closest-hit, dense kernel forced"}
    fenced("kernel_sweep", sweep)

    # ---- 2. ladder rungs 3-4 -------------------------------------------
    def ladder(rungs):
        import contextlib
        import importlib.util
        import io
        spec = importlib.util.spec_from_file_location(
            "ladder_mod", os.path.join(REPO, "benchmarks", "ladder.py"))
        ladder_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ladder_mod)
        buf = io.StringIO()
        argv = sys.argv
        sys.argv = ["ladder.py", "--rungs", rungs]
        try:
            with contextlib.redirect_stdout(buf):
                ladder_mod.main()
        finally:
            sys.argv = argv
        lines = [json.loads(l) for l in buf.getvalue().splitlines()
                 if l.strip().startswith("{")]
        with open(LADDER_OUT, "a") as f:
            for l in lines:
                f.write(json.dumps(l) + "\n")
        for l in lines:
            if l.get("status") != "ok":
                raise RuntimeError(f"rung {l.get('rung')}: "
                                   f"{l.get('error', 'failed')}")
        return {"rungs": lines}
    fenced("ladder_3_4", lambda: ladder("3,4"))

    # ---- 3. list-kernel on-chip bit-exactness ---------------------------
    def list_onchip():
        from pbrpathtracer_tpu.kernels.intersect_pallas import (
            LIST_KERNEL_MIN_CHUNKS, MAX_CHUNK, intersect_pallas)
        from pbrpathtracer_tpu.ops.intersect import intersect_matmul
        from pbrpathtracer_tpu.scene.big_scenes import (mesh_scene,
                                                        mesh_scene_camera)
        scene = mesh_scene(20_000, accel="always")
        t_pad = ((scene.num_triangles + 7) // 8) * 8
        n_chunks = -(-t_pad // MAX_CHUNK)
        assert n_chunks > LIST_KERNEL_MIN_CHUNKS, "list kernel not engaged"
        mcam = mesh_scene_camera()
        N = 256 * 256
        pix = jnp.arange(N, dtype=jnp.int32)
        ro, rd = generate_rays(mcam, 256, 256, jnp.uint32(0), jnp.uint32(0),
                               pix)
        f_list = jax.jit(lambda ro, rd: intersect_pallas(scene, ro, rd))
        f_mm = jax.jit(
            lambda ro, rd: intersect_matmul(scene.geom, ro, rd))
        a = f_list(ro, rd)
        b = f_mm(ro, rd)
        jax.block_until_ready((a, b))
        exact = {}
        for name, x, y in zip(("hit", "idx", "t", "u", "v"), a, b):
            exact[name] = bool(np.array_equal(np.asarray(x), np.asarray(y)))
        t_list = devtime(f_list, lambda i: (ro, rd), 12)
        t_mm = devtime(f_mm, lambda i: (ro, rd), 6)
        return {"tris": int(scene.num_triangles),
                "rays": N,
                "bit_exact": exact,
                "all_exact": all(exact.values()),
                "t_list_ms": round(t_list * 1e3, 3),
                "t_matmul_ms": round(t_mm * 1e3, 3),
                "speedup": round(t_mm / t_list, 2)}
    fenced("list_kernel_onchip", list_onchip)

    # ---- 4. on-chip oracle parity, textures engaged ---------------------
    def oracle_onchip():
        sys.path.insert(0, os.path.join(REPO, "tests"))
        from test_deep_stress import curtained_cornell
        from pbrpathtracer_tpu.oracle.cpu_oracle import Oracle
        from pbrpathtracer_tpu.ops.integrator import render
        scene = curtained_cornell()
        cfg = RenderConfig(width=64, height=64, max_depth=4, spp=1, seed=7)
        img = np.asarray(jax.jit(lambda: render(scene, cam, cfg))())
        oimg = Oracle(scene, cam, cfg).render()
        d = np.abs(img - oimg).max(axis=-1)
        tol = 1e-3
        outliers = float((d > tol).mean())
        inlier_mean = float(d[d <= tol].mean())
        assert outliers <= 0.02, f"{outliers:.3%} pixels differ > {tol}"
        assert inlier_mean < 1e-4
        return {"config": "64x64 depth4 curtained_cornell (opacity+normal+"
                          "roughness textures)",
                "outlier_frac_gt_1e-3": outliers,
                "inlier_mean_err": inlier_mean,
                "tolerance": "outliers<=2% (knife-edge ties), inliers<1e-4"}
    fenced("oracle_parity_onchip", oracle_onchip)

    # ---- 5. deep translucent workload, compaction A/B -------------------
    def deep():
        scene = translucent_scene()
        dcam = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                           up=(0, 1, 0), fovy=61, focal_dist=2.2,
                           aperture=0.04)
        out = {}
        occ = None
        for mode in ("off", "sort", "gather"):
            cfg = RenderConfig(width=512, height=512, max_depth=8, spp=1,
                               seed=0, compact_wavefront=mode)
            segs = cfg.resolved_max_segments()
            f = jax.jit(lambda s, cfg=cfg: jnp.sum(
                render_sample(scene, dcam, cfg, jnp.uint32(0), seed=s)))
            t = devtime(f, lambda i: (jnp.uint32(i),), 12)
            out[f"t_fwd_ms_{mode}"] = round(t * 1e3, 3)
        # occupancy for the ray accounting
        from pbrpathtracer_tpu.utils.observability import wavefront_occupancy
        try:
            occ = [int(x) for x in wavefront_occupancy(scene, dcam, cfg)]
        except Exception:
            occ = None
        if occ is not None:
            out["live_per_segment"] = occ
            rays = 2 * sum(occ)
            out["rays_per_s_best"] = round(
                rays / (min(out["t_fwd_ms_sort"], out["t_fwd_ms_gather"],
                            out["t_fwd_ms_off"]) / 1e3), 1)
        out["segments"] = segs
        return out
    fenced("deep_translucent", deep)

    # ---- 6. forward-regression note: r2-era graph, canonical timing -----
    def fwd_regression():
        scene = cornell_box()
        out = {}
        for name, kw in (
            ("r2_era", dict(hit_vjp="winner", unroll_segments=1,
                            remat_segments="hits")),
            ("r4_default", {}),
        ):
            cfg = RenderConfig(width=512, height=512, max_depth=4, spp=1,
                               seed=0, **kw)
            f = jax.jit(lambda s, cfg=cfg: jnp.sum(
                render_sample(scene, cam, cfg, jnp.uint32(0), seed=s)))
            out[f"t_fwd_ms_{name}"] = round(
                devtime(f, lambda i: (jnp.uint32(i),), 24) * 1e3, 3)
        return out
    fenced("fwd_regression_note", fwd_regression)

    # ---- 7. ladder rung 5 (heaviest, last) ------------------------------
    fenced("ladder_5", lambda: ladder("5"))


if __name__ == "__main__":
    main()
