#!/usr/bin/env python
"""Stage-level timing decomposition of one wavefront pass on the device.

The chip is reached through a tunnel with ~40 ms per-dispatch RTT, so
host-side rep loops measure dispatch, not compute. Every stage here is
timed with a DEVICE-SIDE rep loop: lax.scan over R iterations inside one
jit, with the carry threaded into the inputs (breaks CSE, forces R real
executions), so one dispatch covers R runs and per-run time is exact.

Used to locate the roofline gap (VERDICT round-1 item 2). Run on the chip.
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
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--scene", default="cornell",
                    choices=["cornell", "mesh50k", "mesh1m"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbrpathtracer_tpu.scene.builders import cornell_box
    from pbrpathtracer_tpu.scene.scene import Camera
    from pbrpathtracer_tpu.engine.config import RenderConfig
    from pbrpathtracer_tpu.ops.integrator import render_sample
    from pbrpathtracer_tpu.ops import rng, shadepack as sp
    from pbrpathtracer_tpu.ops.camera import generate_rays
    from pbrpathtracer_tpu.ops.hit import closest_hit, _select_intersector
    from pbrpathtracer_tpu.ops.shade import WavefrontState, shade_segment

    if args.scene == "cornell":
        scene = cornell_box()
        camera = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                             up=(0, 1, 0), fovy=61)
    else:
        from pbrpathtracer_tpu.scene.big_scenes import (mesh_scene,
                                                        mesh_scene_camera)
        n = 50_000 if args.scene == "mesh50k" else 1_000_000
        scene = mesh_scene(n, accel="always")
        camera = mesh_scene_camera()

    W = H = args.size
    cfg = RenderConfig(width=W, height=H, max_depth=args.depth, spp=1)
    n_pix = W * H
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    seed = jnp.uint32(0)
    s0 = jnp.uint32(0)
    R = args.reps

    print(f"device={jax.devices()[0]} scene={args.scene} "
          f"tris={scene.num_triangles} rays={n_pix} reps={R}")

    def devtime(stage_fn, *inputs, reps=R):
        """Per-run seconds of stage_fn(*inputs) via a device-side rep scan.

        stage_fn must accept (eps, *inputs) where eps is a f32 scalar that
        it folds into its inputs (to defeat CSE) and must return a scalar
        or array whose sum feeds the next carry.
        """
        @jax.jit
        def run(inputs):
            def body(carry, _):
                out = stage_fn(carry * 1e-30, *inputs)
                red = sum(jnp.sum(jnp.asarray(o, jnp.float32))
                          for o in jax.tree_util.tree_leaves(out))
                return red * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
            return c

        run(inputs).block_until_ready()  # compile
        t0 = time.perf_counter()
        run(inputs).block_until_ready()
        t1 = time.perf_counter()
        # one-dispatch overhead cancels via a second, longer run
        @jax.jit
        def run2(inputs):
            def body(carry, _):
                out = stage_fn(carry * 1e-30, *inputs)
                red = sum(jnp.sum(jnp.asarray(o, jnp.float32))
                          for o in jax.tree_util.tree_leaves(out))
                return red * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=2 * reps)
            return c
        run2(inputs).block_until_ready()
        t2 = time.perf_counter()
        run2(inputs).block_until_ready()
        t3 = time.perf_counter()
        return ((t3 - t2) - (t1 - t0)) / reps

    # representative state: after camera raygen (all lanes live)
    @jax.jit
    def seg0_state():
        ro, rd = generate_rays(camera, W, H, seed, s0, pix)
        return WavefrontState.initial(ro, rd, pix)

    state = seg0_state()
    jax.block_until_ready(state)
    stream = rng.bounce_stream(jnp.uint32(0))
    intersect_fn = _select_intersector(scene, cfg)

    @jax.jit
    def hit0(ro, rd):
        return closest_hit(scene, cfg, ro, rd, seed, pix, s0, stream,
                           intersect_fn=intersect_fn)
    hit_res = hit0(state.ro, state.rd)
    jax.block_until_ready(hit_res)

    N = n_pix

    # --- stages -----------------------------------------------------------
    def st_hit(eps, ro, rd):
        return closest_hit(scene, cfg, ro + eps, rd, seed, pix, s0, stream,
                           intersect_fn=intersect_fn)

    def stub_shadow(p, l, sh_alive=None):
        z = jnp.zeros((N,), jnp.float32)
        return (jnp.zeros((N,), bool), jnp.zeros((N,), jnp.int32), z, z, z)

    def st_shade_stub(eps, state, hitres):
        hit, idx, t, u, v = hitres
        st = state.replace(ro=state.ro + eps)
        out = shade_segment(scene, cfg, st, hit, idx, t + eps, u, v,
                            jnp.uint32(0), s0, seed, stub_shadow)
        return out.radiance, out.rd, out.throughput

    def st_shade_real(eps, state, hitres):
        hit, idx, t, u, v = hitres
        st = state.replace(ro=state.ro + eps)

        def shadow_trace(p, l, sh_alive=None):
            return closest_hit(scene, cfg, p, l, seed, pix, s0, stream,
                               slot_base=rng.SLOT_NEE_OPACITY_BASE,
                               intersect_fn=intersect_fn)
        out = shade_segment(scene, cfg, st, hit, idx, t + eps, u, v,
                            jnp.uint32(0), s0, seed, shadow_trace)
        return out.radiance, out.rd, out.throughput

    def st_gather(eps, idx):
        i = jnp.clip(idx + eps.astype(jnp.int32), 0, scene.num_triangles - 1)
        return sp.gather_fields(sp.build_tri_pack(scene), i, sp.TRI_FIELDS)

    def st_rng(eps, pixf):
        p = pixf + eps.astype(jnp.int32)
        a = rng.rand_slots4(seed, p, s0, stream, rng.SLOT_RR // 4)
        b = rng.rand_slots4(seed, p, s0, stream,
                            rng.SLOT_REFRACT_CONE_W // 4)
        c = rng.rand_slots4(seed, p, s0, stream, rng.SLOT_TRANSLUCENCY // 4)
        return a, b, c

    def st_full(eps, _):
        return render_sample(scene, camera, cfg, s0,
                             seed=jnp.uint32(0) + eps.astype(jnp.uint32))

    from pbrpathtracer_tpu.diff.params import get_params
    from pbrpathtracer_tpu.diff.loss import l2_image_loss
    params = get_params(scene, camera, materials=True)
    target = jnp.zeros((H, W, 3), jnp.float32)

    def st_fwdbwd(eps, _):
        l, g = jax.value_and_grad(l2_image_loss)(
            params, scene, camera, cfg, target,
            jnp.uint32(0) + eps.astype(jnp.uint32))
        return l, g

    reps_heavy = max(4, R // 4)
    t_hit = devtime(st_hit, state.ro, state.rd)
    t_shade_stub = devtime(st_shade_stub, state, hit_res)
    t_shade_real = devtime(st_shade_real, state, hit_res)
    t_gather = devtime(st_gather, hit_res[1])
    t_rng = devtime(st_rng, pix)
    t_full = devtime(st_full, jnp.float32(0), reps=reps_heavy)
    t_fb = devtime(st_fwdbwd, jnp.float32(0), reps=reps_heavy)

    n_segs = cfg.resolved_max_segments()
    ms = lambda t: f"{t*1e3:8.3f} ms"
    print(f"closest_hit (bounce query)      {ms(t_hit)}")
    print(f"shade_segment (stub shadow)     {ms(t_shade_stub)}")
    print(f"shade_segment (real shadow)     {ms(t_shade_real)}")
    print(f"  -> shadow-query share         {ms(t_shade_real - t_shade_stub)}")
    print(f"gather_fields(tri_pack)         {ms(t_gather)}")
    print(f"rng 3x rand_slots4              {ms(t_rng)}")
    print(f"one segment (hit+shade)         {ms(t_hit + t_shade_real)}")
    print(f"x {n_segs} segments             {ms((t_hit + t_shade_real) * n_segs)}")
    print(f"render_sample fwd (device)      {ms(t_full)}")
    print(f"fwd+bwd (device)                {ms(t_fb)}")


if __name__ == "__main__":
    main()
