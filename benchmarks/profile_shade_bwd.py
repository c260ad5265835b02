#!/usr/bin/env python
"""Decompose shade_segment's reverse pass (the 3.4 ms/segment from
profile_bwd.py) by ablating the gradient surface and the shading features.

All timings differentiate wrt the MATERIAL params through set_params +
build_tri_pack, exactly like the fit path — earlier micro-benchmarks that
differentiated wrt ray origins only let XLA dead-code-eliminate the whole
params chain and measured noise.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--reps", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pbrpathtracer_tpu.scene.builders import cornell_box
    from pbrpathtracer_tpu.scene.scene import Camera
    from pbrpathtracer_tpu.engine.config import RenderConfig
    from pbrpathtracer_tpu.ops import rng
    from pbrpathtracer_tpu.ops.camera import generate_rays
    from pbrpathtracer_tpu.ops.hit import closest_hit, _select_intersector
    from pbrpathtracer_tpu.ops.shade import WavefrontState, shade_segment
    from pbrpathtracer_tpu.diff.params import get_params, set_params

    scene = cornell_box()
    camera = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                         up=(0, 1, 0), fovy=61)
    W = H = args.size
    cfg = RenderConfig(width=W, height=H, max_depth=4, spp=1)
    n_pix = W * H
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    seed = jnp.uint32(0)
    s0 = jnp.uint32(0)
    R = args.reps
    N = n_pix

    print(f"device={jax.devices()[0]} rays={N} reps={R}")

    def devtime(stage_fn, *inputs, reps=R):
        def make(runs):
            @jax.jit
            def run(inputs):
                def body(carry, _):
                    out = stage_fn(carry * 1e-30, *inputs)
                    red = sum(jnp.sum(jnp.asarray(o, jnp.float32))
                              for o in jax.tree_util.tree_leaves(out))
                    return red * 1e-30, None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=runs)
                return c
            return run
        r1, r2 = make(reps), make(2 * reps)
        r1(inputs).block_until_ready()
        r2(inputs).block_until_ready()
        t0 = time.perf_counter(); r1(inputs).block_until_ready()
        t1 = time.perf_counter(); r2(inputs).block_until_ready()
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / reps

    @jax.jit
    def setup():
        ro, rd = generate_rays(camera, W, H, seed, s0, pix)
        state = WavefrontState.initial(ro, rd, pix)
        intersect_fn = _select_intersector(scene, cfg)
        hitres = closest_hit(scene, cfg, state.ro, state.rd, seed, pix, s0,
                             rng.bounce_stream(jnp.uint32(0)),
                             intersect_fn=intersect_fn)
        return state, hitres

    state, hitres = setup()
    jax.block_until_ready((state, hitres))
    hit, idx, t, u, v = hitres
    params = get_params(scene, camera, materials=True)

    def stub_shadow(p, l):
        z = jnp.zeros((N,), jnp.float32)
        return (jnp.zeros((N,), bool), jnp.zeros((N,), jnp.int32), z, z, z)

    def bench(label, use_scene, grad_keys=None, fwd_only=False):
        ps = {k: pv for k, pv in params.items()
              if grad_keys is None or k in grad_keys}
        rest = {k: pv for k, pv in params.items() if k not in ps}

        def loss_of(psub, eps):
            sc, cam = set_params(use_scene, camera, {**psub, **rest})
            st = state.replace(ro=state.ro + eps)
            out = shade_segment(sc, cfg, st, hit, idx, t, u, v,
                                jnp.uint32(0), s0, seed, stub_shadow)
            return (jnp.sum(out.radiance) + jnp.sum(out.rd)
                    + jnp.sum(out.throughput))

        if fwd_only:
            def st_fn(eps):
                return loss_of(ps, eps)
        else:
            def st_fn(eps):
                return jax.grad(loss_of)(ps, eps)
        tt = devtime(st_fn)
        print(f"{label:44s} {tt*1e3:7.3f} ms")
        return tt

    import argparse as _a
    which = os.environ.get("ABLATE", "fwd,all,diffuse,rough,nonee").split(",")
    if "fwd" in which:
        bench("shade fwd only", scene, fwd_only=True)
    if "all" in which:
        bench("fwd+bwd wrt ALL material params", scene)
    if "diffuse" in which:
        bench("fwd+bwd wrt diffuse only", scene, ("mat.diffuse",))
    if "emissive" in which:
        bench("fwd+bwd wrt emissive(+int) only", scene,
              ("mat.emissive", "mat.emissive_intensity"))
    if "rough" in which:
        bench("fwd+bwd wrt roughness only", scene, ("mat.roughness",))
    if "ior" in which:
        bench("fwd+bwd wrt ior only", scene, ("mat.ior",))
    if "spec" in which:
        bench("fwd+bwd wrt specular+reflectiveness", scene,
              ("mat.specular", "mat.reflectiveness"))
    if "nonee" in which:
        scene_nl = scene.replace(lights=jnp.zeros((0,), jnp.int32))
        bench("fwd+bwd ALL, no lights (no NEE)", scene_nl)


if __name__ == "__main__":
    main()
