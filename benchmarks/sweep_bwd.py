#!/usr/bin/env python
"""On-chip fwd+bwd timing sweep over backward-path config variants.

Measures the full flagship fwd+bwd (512^2 Cornell depth 4) under
combinations of remat policy / skip_dead / custom_hit_vjp, plus the
XLA cost-analysis HBM bytes for each variant, to locate the residual
traffic the roofline readout flags. Device-side rep timing as in
profile_stages.py.
"""

import argparse
import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pbrpathtracer_tpu.scene.builders import cornell_box
    from pbrpathtracer_tpu.scene.scene import Camera
    from pbrpathtracer_tpu.engine.config import RenderConfig
    from pbrpathtracer_tpu.diff.params import get_params
    from pbrpathtracer_tpu.diff.loss import l2_image_loss
    from pbrpathtracer_tpu.utils import roofline

    scene = cornell_box()
    camera = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                         up=(0, 1, 0), fovy=61)
    W = H = args.size
    base = RenderConfig(width=W, height=H, max_depth=4, spp=1)
    params = get_params(scene, camera, materials=True)
    target = jnp.zeros((H, W, 3), jnp.float32)
    R = args.reps

    def devtime(cfg):
        def step(c):
            loss, g = jax.value_and_grad(l2_image_loss)(
                params, scene, camera, cfg, target, c.astype(jnp.uint32))
            gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
            return (loss + gsum) * 1e-30

        def make(n):
            @jax.jit
            def run(c0):
                def body(c, _):
                    return step(c), None
                c, _ = jax.lax.scan(body, c0, None, length=n)
                return c
            return run
        r1, r2 = make(R), make(2 * R)
        r1(jnp.float32(0)).block_until_ready()
        r2(jnp.float32(0)).block_until_ready()
        t0 = time.perf_counter()
        r1(jnp.float32(0)).block_until_ready()
        t1 = time.perf_counter()
        r2(jnp.float32(0)).block_until_ready()
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / R

    def costs(cfg):
        fb = jax.jit(lambda p, s: jax.value_and_grad(l2_image_loss)(
            p, scene, camera, cfg, target, s))
        return roofline.xla_costs(fb.lower(params, jnp.uint32(0)).compile())

    variants = [
        ("hits+skip (current)", dict()),
        ("all", dict(remat_segments="all")),
        ("off", dict(remat_segments="off")),
        ("hits noskip", dict(skip_dead_segments=False)),
        ("all noskip", dict(remat_segments="all", skip_dead_segments=False)),
        ("hits winner-vjp", dict(hit_vjp="winner")),
        ("hits autodiff", dict(hit_vjp="autodiff")),
    ]
    if args.variants:
        keep = set(args.variants.split(";"))
        variants = [v for v in variants if v[0] in keep]

    for name, kw in variants:
        cfg = base.replace(**kw)
        try:
            b, f = costs(cfg)
            t = devtime(cfg)
            print(f"{name:24s} t={t*1e3:8.3f} ms  bytes={b/1e9:6.2f} GB  "
                  f"flops={f/1e9:7.2f} G", flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
