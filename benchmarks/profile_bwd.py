#!/usr/bin/env python
"""Backward-pass decomposition on the device.

fwd+bwd is ~9x fwd on the chip (profile_stages.py). This script isolates
where the backward time goes:

  * vjp of shade_segment alone (stub shadow), wrt (state, tri-pack inputs)
  * vjp of closest_hit with the winner-only custom VJP, wrt (ro, rd)
  * fwd+bwd through k in {1,2,3} segments -> per-segment slope
  * full fwd+bwd for reference

Device-side rep loops (see profile_stages.py) cancel the ~40 ms dispatch
RTT of the tunneled chip.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pbrpathtracer_tpu.scene.builders import cornell_box
    from pbrpathtracer_tpu.scene.scene import Camera
    from pbrpathtracer_tpu.engine.config import RenderConfig
    from pbrpathtracer_tpu.ops.integrator import render_sample
    from pbrpathtracer_tpu.ops import rng
    from pbrpathtracer_tpu.ops.camera import generate_rays
    from pbrpathtracer_tpu.ops.hit import closest_hit, _select_intersector
    from pbrpathtracer_tpu.ops.shade import WavefrontState, shade_segment
    from pbrpathtracer_tpu.ops.intersect_vjp import with_custom_vjp
    from pbrpathtracer_tpu.diff.params import get_params, set_params

    scene = cornell_box()
    camera = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                         up=(0, 1, 0), fovy=61)
    W = H = args.size
    cfg = RenderConfig(width=W, height=H, max_depth=args.depth, spp=1)
    n_pix = W * H
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    seed = jnp.uint32(0)
    s0 = jnp.uint32(0)
    R = args.reps

    print(f"device={jax.devices()[0]} rays={n_pix} reps={R}")

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
    def seg0_state():
        ro, rd = generate_rays(camera, W, H, seed, s0, pix)
        return WavefrontState.initial(ro, rd, pix)

    state = seg0_state()
    jax.block_until_ready(state)
    stream = rng.bounce_stream(jnp.uint32(0))
    intersect_fn = _select_intersector(scene, cfg)
    # Stage 2 profiles the WINNER custom VJP specifically, so wrap
    # unconditionally: the raw intersector either has no reverse rule
    # (pallas/BVH) or would silently measure the O(N*T) autodiff replay
    # (matmul) under the default hit_vjp="recompute".
    intersect_vjp = with_custom_vjp(intersect_fn)

    @jax.jit
    def hit0(ro, rd):
        return closest_hit(scene, cfg, ro, rd, seed, pix, s0, stream,
                           intersect_fn=intersect_vjp)
    hit_res = hit0(state.ro, state.rd)
    jax.block_until_ready(hit_res)
    N = n_pix
    params = get_params(scene, camera, materials=True)

    # ---- 1. shade-only fwd+bwd (stub shadow) ------------------------------
    def stub_shadow(p, l, sh_alive=None):
        z = jnp.zeros((N,), jnp.float32)
        return (jnp.zeros((N,), bool), jnp.zeros((N,), jnp.int32), z, z, z)

    def st_shade_bwd(eps, state, hitres, params):
        hit, idx, t, u, v = hitres

        def loss(params, ro):
            sc, cam = set_params(scene, camera, params)
            st = state.replace(ro=ro + eps)
            out = shade_segment(sc, cfg, st, hit, idx, t, u, v,
                                jnp.uint32(0), s0, seed, stub_shadow)
            return jnp.sum(out.radiance) + jnp.sum(out.rd) \
                + jnp.sum(out.throughput)
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(params, state.ro)
        return l, g

    t_shade_bwd = devtime(st_shade_bwd, state, hit_res, params)

    # ---- 2. closest-hit fwd+bwd (winner-only custom VJP) -------------------
    def st_hit_bwd(eps, ro, rd):
        def loss(ro, rd):
            h, i, t, u, v = closest_hit(scene, cfg, ro + eps, rd, seed, pix,
                                        s0, stream,
                                        intersect_fn=intersect_vjp)
            return jnp.sum(t) + jnp.sum(u) + jnp.sum(v)
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(ro, rd)
        return l, g

    t_hit_bwd = devtime(st_hit_bwd, state.ro, state.rd)

    # ---- 3. k-segment fwd+bwd slope ----------------------------------------
    def make_ksegs(k):
        kcfg = cfg.replace(max_segments=k)

        def st(eps, params):
            def loss(params):
                sc, cam = set_params(scene, camera, params)
                img = render_sample(sc, cam, kcfg, s0,
                                    seed=jnp.uint32(0)
                                    + eps.astype(jnp.uint32))
                return jnp.sum(img)
            l, g = jax.value_and_grad(loss)(params)
            return l, g
        return st

    t_seg = {}
    for k in (1, 2, 3):
        t_seg[k] = devtime(make_ksegs(k), params, reps=max(4, R // 2))

    # ---- 4. full fwd+bwd ----------------------------------------------------
    t_full = devtime(make_ksegs(cfg.resolved_max_segments()), params,
                     reps=max(4, R // 2))

    ms = lambda t: f"{t*1e3:8.3f} ms"
    print(f"shade-only fwd+bwd (1 seg, stub) {ms(t_shade_bwd)}")
    print(f"hit-only fwd+bwd (winner vjp)    {ms(t_hit_bwd)}")
    for k in (1, 2, 3):
        print(f"render fwd+bwd k={k} segs        {ms(t_seg[k])}")
    print(f"  slope per segment              {ms((t_seg[3] - t_seg[1]) / 2)}")
    print(f"render fwd+bwd full ({cfg.resolved_max_segments()} segs)   "
          f"{ms(t_full)}")


if __name__ == "__main__":
    main()
