#!/usr/bin/env python
"""Round-4 on-chip evidence runner — crash-resilient orchestration.

The tunneled v5e worker dies stochastically (~1%/multi-second dispatch or
compile — reproduced: identical 64-dispatch sequences pass or kill the
worker on different runs), so the orchestrator runs every section as its
OWN subprocess, gated on a worker-liveness probe (a hung connect to a dead
worker never unblocks inside a process, so the probe runs out-of-process
with a timeout and the section only launches once a fresh client
succeeds). Failed sections are retried once after the worker returns.

Sections (``--section NAME`` runs one in-process):

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


PROBE = ("import warnings; warnings.filterwarnings('ignore');"
         "import jax, jax.numpy as jnp;"
         "jax.block_until_ready(jax.jit(lambda a: a @ a)"
         "(jnp.ones((128, 128))))")


def wait_for_worker(max_probes=40, sleep_s=45):
    """Block until a fresh client can run a tiny jitted matmul."""
    import subprocess
    for i in range(1, max_probes + 1):
        try:
            r = subprocess.run([sys.executable, "-c", PROBE], timeout=150,
                               capture_output=True)
            if r.returncode == 0:
                return i
        except subprocess.TimeoutExpired:
            pass   # hung probe counts as a failed probe, keep waiting
        time.sleep(sleep_s)
    raise RuntimeError("worker never came back")


SECTIONS = ["kernel_sweep", "ladder_3", "ladder_4", "list_kernel_onchip",
            "oracle_parity_onchip", "deep_translucent",
            "fwd_regression_note", "ladder_5"]


def orchestrate():
    import subprocess
    done = set()
    if os.path.exists(OUT):
        for line in open(OUT):
            try:
                d = json.loads(line)
            except Exception:
                continue
            if d.get("status") == "ok":
                done.add(d.get("section"))
    for section in SECTIONS:
        if section in done:
            print(f"[orchestrator] {section}: already ok, skipping",
                  flush=True)
            continue
        attempts = 8 if section in ("ladder_3", "ladder_5") else 2
        for attempt in range(1, attempts + 1):
            probes = wait_for_worker()
            print(f"[orchestrator] {section} attempt {attempt} "
                  f"(worker up after {probes} probes)", flush=True)
            try:
                r = subprocess.run(
                    [sys.executable, "-u", os.path.abspath(__file__),
                     "--section", section], timeout=3600)
                rc = r.returncode
            except subprocess.TimeoutExpired:
                rc = "timeout"   # hung section = failed attempt, retry
            ok = False
            if os.path.exists(OUT):
                lines = [json.loads(l) for l in open(OUT)]
                ok = any(d.get("section") == section
                         and d.get("status") == "ok" for d in lines)
            if ok:
                break
            print(f"[orchestrator] {section} attempt {attempt} failed "
                  f"(rc={rc})", flush=True)


def run_section(name):
    import numpy as np
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    jax.block_until_ready(jax.jit(lambda a: a @ a)(jnp.ones((256, 256))))

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
            fns = {}
            for max_chunk in (8, 16, 40):
                ip.MAX_CHUNK = max_chunk
                ip.PAIR_BUDGET = 256 * 1024
                f = jax.jit(
                    lambda ro, rd: ip.intersect_pallas(scene, ro, rd))
                out = f(ro, rd)
                jax.block_until_ready(out)
                cur = [np.asarray(x) for x in out]
                if ref is None:
                    ref = cur
                elif not all(np.array_equal(a, b)
                             for a, b in zip(cur, ref)):
                    rows[f"c{max_chunk}"] = "MISMATCH"
                    continue
                fns[max_chunk] = f
            # interleaved trials, median-of-5 per config (single-trial
            # queued slopes on a 0.5 ms kernel are ±0.2 ms on this tunnel)
            trials = {k: [] for k in fns}
            for _ in range(5):
                for k, f in fns.items():
                    trials[k].append(devtime(f, lambda i: (ro, rd), 48))
            for k, ts in trials.items():
                rows[f"c{k}"] = round(float(np.median(ts)) * 1e3, 3)
        finally:
            ip.MAX_CHUNK, ip.PAIR_BUDGET, ip.LIST_KERNEL_MIN_CHUNKS = orig
        return {"query_ms_by_config": rows,
                "note": "512^2 cornell closest-hit, dense kernel forced; "
                        "median of 5 interleaved queued-slope trials"}
    if name == "kernel_sweep":
        fenced("kernel_sweep", sweep)
        return

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
    def ladder3_resumable():
        """Rung 3 with per-sample checkpointing: the tunneled worker dies
        stochastically (~1% per multi-second dispatch), so the 64-sample
        render accumulates through a host-side .npz checkpoint and each
        orchestrator retry RESUMES instead of restarting. Keyed RNG makes
        the resumed accumulation identical to an uninterrupted run."""
        from pbrpathtracer_tpu.scene.big_scenes import (mesh_scene,
                                                        mesh_scene_camera)
        from pbrpathtracer_tpu.ops.integrator import _accum_chunk
        ckpt = "/tmp/r4_rung3_ckpt.npz"
        scene = mesh_scene(50_000, accel="always")
        mcam = mesh_scene_camera()
        spp, size = 64, 512
        cfg = RenderConfig(width=size, height=size, max_depth=3, spp=spp)
        if os.path.exists(ckpt):
            d = np.load(ckpt)
            accum = jnp.asarray(d["accum"])
            s_start = int(d["s"])
            spent = float(d["spent"])
        else:
            accum = jnp.zeros((size * size, 3), jnp.float32)
            s_start, spent = 0, 0.0
        t0 = time.time()
        for s in range(s_start, spp):
            accum = _accum_chunk(scene, mcam, cfg, accum, 1,
                                 jnp.uint32(s), jnp.uint32(cfg.seed))
            jax.block_until_ready(accum)
            np.savez(ckpt, accum=np.asarray(accum), s=s + 1,
                     spent=spent + time.time() - t0)
        render_s = spent + time.time() - t0
        img = np.asarray(accum).reshape(size, size, 3) / spp
        assert np.isfinite(img).all() and img.max() > 0.05

        # texture grads at full resolution (one fwd+bwd dispatch)
        from pbrpathtracer_tpu import grad_render
        tcfg = cfg.replace(spp=1)
        target = jnp.zeros((size, size, 3), jnp.float32)
        loss, g = grad_render(scene, mcam, tcfg, target, materials=False,
                              textures=True)
        gt = np.asarray(g["tex.data"])
        assert np.isfinite(gt).all() and np.abs(gt).max() > 0

        # FD probe of the top-3 texels (BASELINE config 3 contract)
        from pbrpathtracer_tpu.diff.loss import (l2_image_loss,
                                                 finite_difference_grad)
        from pbrpathtracer_tpu.diff.params import get_params
        fcfg = RenderConfig(width=64, height=64, max_depth=2, spp=1, seed=5)
        ftarget = jnp.zeros((64, 64, 3), jnp.float32)
        params = get_params(scene, mcam, materials=False, textures=True)
        lossf = jax.jit(lambda p: l2_image_loss(p, scene, mcam, fcfg,
                                                ftarget))
        adt = np.asarray(jax.jit(jax.grad(lambda p: l2_image_loss(
            p, scene, mcam, fcfg, ftarget)))(params)["tex.data"])
        flat = np.abs(adt).reshape(-1)
        top = np.argsort(flat)[-3:].tolist()
        fd = finite_difference_grad(lossf, params, "tex.data", eps=5e-3,
                                    indices=top).reshape(-1)
        texel_checks = {}
        for i in top:
            ad_i, fd_i = float(adt.reshape(-1)[i]), float(fd[i])
            rel = abs(ad_i - fd_i) / max(abs(fd_i), 1e-12)
            assert ad_i != 0.0 and rel < 0.01, (i, ad_i, fd_i, rel)
            texel_checks[str(i)] = {"ad": ad_i, "fd": fd_i, "rel": rel}
        result = {"rung": "3-mesh50k-texgrads", "status": "ok",
                  "seconds": round(render_s, 2),
                  "tris": int(scene.num_triangles),
                  "mean": float(img.mean()),
                  "render_s_total": round(render_s, 2),
                  "paths_per_s": round(size * size * spp / render_s, 1),
                  "resumed_from_sample": s_start,
                  "texel_fd_checks": texel_checks}
        with open(LADDER_OUT, "a") as f:
            f.write(json.dumps(result) + "\n")
        os.remove(ckpt)
        return result

    if name == "ladder_3":
        fenced("ladder_3", ladder3_resumable)
        return
    if name == "ladder_4":
        fenced("ladder_4", lambda: ladder("4"))
        return

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
        from pbrpathtracer_tpu.ops.intersect import intersect_classic
        f_list = jax.jit(lambda ro, rd: intersect_pallas(scene, ro, rd))
        f_mm = jax.jit(
            lambda ro, rd: intersect_matmul(scene.geom, ro, rd))
        f_cl = jax.jit(
            lambda ro, rd: intersect_classic(scene.geom, ro, rd))
        a = f_list(ro, rd)
        b = f_mm(ro, rd)
        c = f_cl(ro, rd)
        jax.block_until_ready((a, b, c))
        # The list kernel replicates the CLASSIC Möller–Trumbore operation
        # order → bit-exact vs classic; the matmul (bilinear MXU) route
        # computes the same quantities through different arithmetic →
        # same discrete winners, t/u/v equal to f32 round-off.
        exact_cl = {}
        for nm, x, y in zip(("hit", "idx", "t", "u", "v"), a, c):
            exact_cl[nm] = bool(np.array_equal(np.asarray(x),
                                               np.asarray(y)))
        assert all(exact_cl.values()), f"vs classic not bit-exact: {exact_cl}"
        assert bool(np.array_equal(np.asarray(a[0]), np.asarray(b[0])))
        assert bool(np.array_equal(np.asarray(a[1]), np.asarray(b[1])))
        t_err = float(np.abs(np.asarray(a[2]) - np.asarray(b[2])).max())
        assert t_err < 1e-4, t_err
        t_list = devtime(f_list, lambda i: (ro, rd), 12)
        t_mm = devtime(f_mm, lambda i: (ro, rd), 6)
        return {"tris": int(scene.num_triangles),
                "rays": N,
                "bit_exact_vs_classic": exact_cl,
                "winners_exact_vs_matmul": True,
                "t_max_err_vs_matmul": t_err,
                "t_list_ms": round(t_list * 1e3, 3),
                "t_matmul_ms": round(t_mm * 1e3, 3),
                "speedup": round(t_mm / t_list, 2)}
    if name == "list_kernel_onchip":
        fenced("list_kernel_onchip", list_onchip)
        return

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
    if name == "oracle_parity_onchip":
        fenced("oracle_parity_onchip", oracle_onchip)
        return

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
    if name == "deep_translucent":
        fenced("deep_translucent", deep)
        return

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
    if name == "fwd_regression_note":
        fenced("fwd_regression_note", fwd_regression)
        return

    # ---- 7. ladder rung 5 (heaviest, last; resumable) -------------------
    def ladder5_resumable():
        """Rung 5 (1M-tri sharded render + short inverse fit) with
        per-sample checkpointing like rung 3. spp is 32 instead of
        BASELINE's 256: per-sample cost is constant so rays/s is
        representative, and the flaky tunneled worker makes every extra
        multi-second dispatch a ~few-% crash risk (recorded honestly)."""
        from pbrpathtracer_tpu.scene.big_scenes import (mesh_scene,
                                                        mesh_scene_camera)
        from pbrpathtracer_tpu.ops.integrator import _accum_chunk
        ckpt = "/tmp/r4_rung5_ckpt.npz"
        scene = mesh_scene(1_000_000, accel="always")
        mcam = mesh_scene_camera()
        spp, size = 32, 1024
        cfg = RenderConfig(width=size, height=size, max_depth=3, spp=spp)
        if os.path.exists(ckpt):
            d = np.load(ckpt)
            accum = jnp.asarray(d["accum"])
            s_start = int(d["s"])
            spent = float(d["spent"])
        else:
            accum = jnp.zeros((size * size, 3), jnp.float32)
            s_start, spent = 0, 0.0
        t0 = time.time()
        for s in range(s_start, spp):
            accum = _accum_chunk(scene, mcam, cfg, accum, 1,
                                 jnp.uint32(s), jnp.uint32(cfg.seed))
            jax.block_until_ready(accum)
            np.savez(ckpt, accum=np.asarray(accum), s=s + 1,
                     spent=spent + time.time() - t0)
        render_s = spent + time.time() - t0
        img = np.asarray(accum).reshape(size, size, 3) / spp
        assert np.isfinite(img).all()

        # short sharded inverse-rendering fit (BASELINE config 5)
        import optax
        from pbrpathtracer_tpu.parallel.mesh import (make_mesh,
                                                     ray_sharding,
                                                     replicated)
        from pbrpathtracer_tpu.parallel.render import make_train_step
        from pbrpathtracer_tpu.diff.params import get_params
        mesh = make_mesh(jax.devices())
        fcfg = RenderConfig(width=256, height=256, max_depth=2, spp=1)
        params = get_params(scene, mcam, materials=True)
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)
        step = make_train_step(scene, mcam, fcfg, opt, mesh)
        pixel_idx = jax.device_put(
            jnp.arange(fcfg.num_pixels, dtype=jnp.int32),
            ray_sharding(mesh))
        ftarget = jax.device_put(
            jnp.full((fcfg.num_pixels, 3), 0.2, jnp.float32),
            ray_sharding(mesh))
        params = jax.device_put(params, replicated(mesh))
        opt_state = jax.device_put(opt_state, replicated(mesh))
        losses = []
        for s in range(2):
            params, opt_state, l = step(params, opt_state, scene, mcam,
                                        pixel_idx, ftarget, jnp.uint32(s))
            losses.append(float(l))
        assert all(np.isfinite(losses))
        result = {"rung": "5-million-sharded", "status": "ok",
                  "seconds": round(render_s, 2),
                  "tris": int(scene.num_triangles),
                  "mean": float(img.mean()),
                  "spp": spp,
                  "spp_note": "BASELINE says 256; recorded at 32 "
                              "(per-sample cost constant; flaky worker)",
                  "render_s_total": round(render_s, 2),
                  "paths_per_s": round(size * size * spp / render_s, 1),
                  "resumed_from_sample": s_start,
                  "fit_losses": losses}
        with open(LADDER_OUT, "a") as f:
            f.write(json.dumps(result) + "\n")
        os.remove(ckpt)
        return result

    if name == "ladder_5":
        fenced("ladder_5", ladder5_resumable)
        return
    raise SystemExit(f"unknown section {name}")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default=None)
    args = ap.parse_args()
    if args.section:
        run_section(args.section)
    else:
        orchestrate()
