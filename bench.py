#!/usr/bin/env python
"""Benchmark: forward+backward rays/s per chip on the flagship workload.

BASELINE.json metric: "rays/s/chip fwd+bwd at 1spp bounce-4".

Timing is DEVICE-SIDE: the step runs inside a `lax.scan` rep loop within a
single dispatch, and per-rep time comes from differencing an R-rep and a
2R-rep program. This cancels the per-dispatch RTT of the tunneled chip
(~40 ms here — 6x the actual 512² forward pass), which host-side loops
would otherwise measure instead of compute. Production renders amortize
dispatch the same way (progressive passes run back-to-back).

Speed-of-light: `utils/roofline.py` prices the compiled program's HBM
traffic (XLA cost analysis) and VPU/MXU FLOPs (XLA counters + the Pallas
pair-block arithmetic XLA can't see) at TPU v5e peak rates;
``fraction_of_roofline`` in the output is measured-vs-that-bound.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so this
remains the ratio against a documented estimate of the reference OpenMP
CPU tracer on a 16-core desktop: ~5e6 ray queries/s (Möller–Trumbore +
BVH, ~13 threads, pathtracer.cpp:768).

Ray accounting: per sample and segment, one bounce closest-hit query and
one NEE shadow query per *live* lane; dead-lane slots are not credited.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time
import warnings

warnings.filterwarnings("ignore")

REFERENCE_CPU_RAYS_PER_S = 5.0e6  # documented estimate, see module docstring

WIDTH = HEIGHT = 512
DEPTH = 4
SPP = 1


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pbrpathtracer_tpu.scene.builders import cornell_box
    from pbrpathtracer_tpu.scene.scene import Camera
    from pbrpathtracer_tpu.engine.config import RenderConfig
    from pbrpathtracer_tpu.ops.integrator import render_sample
    from pbrpathtracer_tpu.ops import rng
    from pbrpathtracer_tpu.ops.camera import generate_rays
    from pbrpathtracer_tpu.ops.hit import closest_hit, _resolve_intersector_name
    from pbrpathtracer_tpu.ops.shade import WavefrontState, shade_segment
    from pbrpathtracer_tpu.diff.params import get_params
    from pbrpathtracer_tpu.diff.loss import l2_image_loss
    from pbrpathtracer_tpu.utils import roofline

    scene = cornell_box()
    camera = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                         up=(0, 1, 0), fovy=61)
    cfg = RenderConfig(width=WIDTH, height=HEIGHT, max_depth=DEPTH, spp=SPP,
                       seed=0)
    n_pix = WIDTH * HEIGHT

    # --- instrument live-lane occupancy to count issued rays ---------------
    @jax.jit
    def occupancy():
        pix = jnp.arange(n_pix, dtype=jnp.int32)
        seed = jnp.uint32(0)
        ro, rd = generate_rays(camera, WIDTH, HEIGHT, seed, jnp.uint32(0), pix)
        state = WavefrontState.initial(ro, rd, pix)
        counts = []
        for seg in range(cfg.resolved_max_segments()):
            counts.append(jnp.sum(state.alive))
            stream = rng.bounce_stream(jnp.uint32(seg))
            hit, idx, t, u, v = closest_hit(scene, cfg, state.ro, state.rd,
                                            seed, pix, jnp.uint32(0), stream)

            def shadow_trace(p, l):
                return closest_hit(scene, cfg, p, l, seed, pix, jnp.uint32(0),
                                   stream,
                                   slot_base=rng.SLOT_NEE_OPACITY_BASE)
            state = shade_segment(scene, cfg, state, hit, idx, t, u, v,
                                  jnp.uint32(seg), jnp.uint32(0), seed,
                                  shadow_trace)
        return jnp.stack(counts)

    live = np.asarray(occupancy())
    rays_per_sample = int(live.sum()) * 2  # bounce + shadow query per live lane
    live_segments = int((live > 0).sum())  # skip_dead skips the rest

    # --- device-side rep timing --------------------------------------------
    def devtime(step, reps):
        """Per-rep seconds of step(carry) via R vs 2R device-side scans."""
        def make(n):
            @jax.jit
            def run(c0):
                def body(c, _):
                    return step(c), None
                c, _ = jax.lax.scan(body, c0, None, length=n)
                return c
            return run
        r1, r2 = make(reps), make(2 * reps)
        r1(jnp.float32(0)).block_until_ready()
        r2(jnp.float32(0)).block_until_ready()
        t0 = time.perf_counter()
        r1(jnp.float32(0)).block_until_ready()
        t1 = time.perf_counter()
        r2(jnp.float32(0)).block_until_ready()
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / reps

    def fwd_step(c):
        img = render_sample(scene, camera, cfg, jnp.uint32(0),
                            seed=c.astype(jnp.uint32))
        return jnp.sum(img) * 1e-30

    params = get_params(scene, camera, materials=True)
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32)

    def fwdbwd_step(c):
        loss, g = jax.value_and_grad(l2_image_loss)(
            params, scene, camera, cfg, target, c.astype(jnp.uint32))
        gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return (loss + gsum) * 1e-30

    t_fwd = devtime(fwd_step, reps=12)
    t_fwdbwd = devtime(fwdbwd_step, reps=6)

    # --- roofline (speed-of-light) readout ---------------------------------
    fwd_jit = jax.jit(lambda s: render_sample(scene, camera, cfg,
                                              jnp.uint32(0), seed=s))
    bytes_fwd, flops_fwd = roofline.xla_costs(
        fwd_jit.lower(jnp.uint32(0)).compile())
    fb_jit = jax.jit(lambda p, s: jax.value_and_grad(l2_image_loss)(
        p, scene, camera, cfg, target, s))
    bytes_fb, flops_fb = roofline.xla_costs(
        fb_jit.lower(params, jnp.uint32(0)).compile())

    # Pallas pair-block flops XLA can't see (TPU route only): two queries
    # per live segment, every lane x padded-tri pair.
    t_pad = ((scene.num_triangles + 7) // 8) * 8
    if _resolve_intersector_name(scene, cfg) == "pallas":
        pf = roofline.pallas_pair_flops(n_pix, t_pad, 2 * live_segments)
    else:
        pf = 0.0
    rl_fwd = roofline.build(bytes_fwd, flops_fwd, pf)
    # backward re-runs the two forward queries + their winner-VJP pullbacks
    # (ops/intersect_vjp.py) — approximated as 2x the forward pallas work.
    rl_fb = roofline.build(bytes_fb, flops_fb, 2 * pf)

    rays_fwd = rays_per_sample / t_fwd
    rays_fwdbwd = rays_per_sample / t_fwdbwd
    value = rays_fwdbwd

    print(json.dumps({
        "metric": "rays_per_s_per_chip_fwd_bwd",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / REFERENCE_CPU_RAYS_PER_S, 3),
        "extras": {
            "rays_per_s_fwd": round(rays_fwd, 1),
            "paths_per_s_fwd": round(n_pix * SPP / t_fwd, 1),
            "t_fwd_ms": round(t_fwd * 1e3, 3),
            "t_fwdbwd_ms": round(t_fwdbwd * 1e3, 3),
            "timing": "device-side rep scan (dispatch RTT cancelled)",
            "roofline_fwd": rl_fwd.as_dict(t_fwd),
            "roofline_fwdbwd": rl_fb.as_dict(t_fwdbwd),
            "live_per_segment": live.tolist(),
            "config": f"{WIDTH}x{HEIGHT}@{SPP}spp depth{DEPTH} cornell",
            "device": str(jax.devices()[0]),
            "vs_baseline_is_estimate": True,  # ref publishes no numbers;
            # the headline perf readout is fraction_of_roofline above
            "baseline_assumption": "ref CPU ~5e6 rays/s (16-core OpenMP)",
        },
    }))


if __name__ == "__main__":
    main()
