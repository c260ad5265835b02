#!/usr/bin/env python
"""BASELINE.json integration ladder — runs the five configs end-to-end and
reports one JSON line per rung. Heavier rungs scale down via --quick.

  1. Cornell box 128² @ 4spp depth 3            (forward + oracle-checked elsewhere)
  2. Cornell + glossy/metal spheres 256² @ 16spp, grads wrt roughness/albedo
  3. ~50k-tri textured mesh scene 512² @ 64spp (BVH), texture grads
  4. translucent + DOF camera 512², lens grads
  5. ~1M-tri scene 1024² @ 256spp sharded, short inverse-rendering fit
"""

import argparse
import json
import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")

# Runnable from anywhere: put the repo root on sys.path (also covered by
# `pip install -e .` via pyproject.toml).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_rung(name, fn):
    t0 = time.time()
    try:
        extras = fn() or {}
        status = "ok"
    except Exception as e:  # pragma: no cover
        extras = {"error": f"{type(e).__name__}: {e}"}
        status = "fail"
    print(json.dumps({"rung": name, "status": status,
                      "seconds": round(time.time() - t0, 2), **extras}),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="scaled-down spp/resolution for smoke runs")
    ap.add_argument("--rungs", default="1,2,3,4,5")
    args = ap.parse_args()
    quick = args.quick
    rungs = set(int(r) for r in args.rungs.split(","))

    import numpy as np
    import jax
    import jax.numpy as jnp
    from pbrpathtracer_tpu import (builders, Camera, RenderConfig, render,
                                   grad_render, fit)
    from pbrpathtracer_tpu.scene.big_scenes import (mesh_scene,
                                                    mesh_scene_camera,
                                                    million_tri_scene)

    cam = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                      up=(0, 1, 0), fovy=61)

    if 1 in rungs:
        def rung1():
            scene = builders.cornell_box()
            cfg = RenderConfig(width=128, height=128, max_depth=3, spp=4)
            img = np.asarray(render(scene, cam, cfg))
            assert np.isfinite(img).all() and img.max() > 0.1
            return {"mean": float(img.mean())}
        run_rung("1-cornell-128", rung1)

    if 2 in rungs:
        def rung2():
            scene = builders.cornell_spheres_scene()
            spp = 4 if quick else 16
            cfg = RenderConfig(width=256, height=256, max_depth=3, spp=spp)
            target = jnp.zeros((256, 256, 3), jnp.float32)
            loss, g = grad_render(scene, cam, cfg, target)
            gr = np.asarray(g["mat.roughness"])
            ga = np.asarray(g["mat.diffuse"])
            assert np.isfinite(gr).all() and np.isfinite(ga).all()
            return {"loss": float(loss),
                    "grad_roughness_norm": float(np.abs(gr).sum()),
                    "tris": scene.num_triangles}
        run_rung("2-spheres-grads", rung2)

    if 3 in rungs:
        def rung3():
            scene = mesh_scene(50_000, accel="always")
            mcam = mesh_scene_camera()
            spp = 2 if quick else 64
            size = 256 if quick else 512
            cfg = RenderConfig(width=size, height=size, max_depth=3, spp=spp)
            img = np.asarray(render(scene, mcam, cfg))
            assert np.isfinite(img).all() and img.max() > 0.05
            tcfg = cfg.replace(spp=1)
            target = jnp.zeros((size, size, 3), jnp.float32)
            loss, g = grad_render(scene, mcam, tcfg, target, materials=False,
                                  textures=True)
            gt = np.asarray(g["tex.data"])
            assert np.isfinite(gt).all() and np.abs(gt).max() > 0
            return {"tris": scene.num_triangles, "mean": float(img.mean()),
                    "tex_grad_nonzero": True}
        run_rung("3-mesh50k-texgrads", rung3)

    if 4 in rungs:
        def rung4():
            scene = builders.translucent_scene()
            dcam = Camera.make(pos=(0.013, 0.021, 0.217),
                               dir=(0.02, -0.03, 1), up=(0, 1, 0), fovy=61,
                               focal_dist=2.2, aperture=0.04)
            spp = 2 if quick else 16
            size = 256 if quick else 512
            cfg = RenderConfig(width=size, height=size, max_depth=4, spp=spp)
            img = np.asarray(render(scene, dcam, cfg))
            target = jnp.asarray(img * 0.9)
            loss, g = grad_render(scene, dcam, cfg.replace(spp=1), target,
                                  materials=True, camera_lens=True)
            assert np.isfinite(float(g["cam.aperture"]))
            assert np.isfinite(float(g["cam.focal_dist"]))
            return {"mean": float(img.mean()),
                    "lens_grads": [float(g["cam.aperture"]),
                                   float(g["cam.focal_dist"])]}
        run_rung("4-translucent-dof", rung4)

    if 5 in rungs:
        def rung5():
            n = 200_000 if quick else 1_000_000
            scene = mesh_scene(n, accel="always")
            mcam = mesh_scene_camera()
            size = 128 if quick else 1024
            spp = 1 if quick else 256
            cfg = RenderConfig(width=size, height=size, max_depth=3, spp=spp)
            from pbrpathtracer_tpu.parallel.mesh import make_mesh
            from pbrpathtracer_tpu.parallel.render import render_sharded
            import jax
            devs = jax.devices()
            mesh = make_mesh(devs)
            img = np.asarray(render_sharded(scene, mcam, cfg, mesh=mesh))
            assert np.isfinite(img).all()
            return {"tris": scene.num_triangles, "devices": len(devs),
                    "mean": float(img.mean())}
        run_rung("5-million-sharded", rung5)


if __name__ == "__main__":
    main()
