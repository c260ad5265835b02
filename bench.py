#!/usr/bin/env python
"""Benchmark: forward+backward rays/s per chip on the flagship workload.

BASELINE.json metric: "rays/s/chip fwd+bwd at 1spp bounce-4". The reference
publishes no numbers (BASELINE.md), so ``vs_baseline`` is the ratio against a
documented estimate of the reference OpenMP CPU tracer on a 16-core desktop:
~5e6 ray queries/s (Möller–Trumbore + BVH, ~13 threads, pathtracer.cpp:768).

Ray accounting: the wavefront issues, per sample and segment, one bounce
closest-hit query and one NEE shadow query per *live* lane. We instrument
one pass for per-segment live-lane counts and convert measured wall time to
issued-ray throughput.

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
    from pbrpathtracer_tpu.ops.hit import closest_hit
    from pbrpathtracer_tpu.ops.shade import WavefrontState, shade_segment
    from pbrpathtracer_tpu.diff.params import get_params
    from pbrpathtracer_tpu.diff.loss import l2_image_loss

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
    # NOTE: the dense wavefront computes dead lanes too (until all die), so
    # issued-ray throughput understates device work; it is the honest
    # apples-to-apples number vs a CPU tracer.

    # --- forward ----------------------------------------------------------
    fwd = jax.jit(lambda s: render_sample(scene, camera, cfg, jnp.uint32(0),
                                          seed=s))
    fwd(jnp.uint32(0)).block_until_ready()
    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        fwd(jnp.uint32(i)).block_until_ready()
    t_fwd = (time.perf_counter() - t0) / reps

    # --- forward + backward ----------------------------------------------
    params = get_params(scene, camera, materials=True)
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32)
    fwdbwd = jax.jit(lambda p, s: jax.value_and_grad(l2_image_loss)(
        p, scene, camera, cfg, target, s))
    fwdbwd(params, jnp.uint32(0))[0].block_until_ready()
    t0 = time.perf_counter()
    for i in range(reps):
        fwdbwd(params, jnp.uint32(i))[0].block_until_ready()
    t_fwdbwd = (time.perf_counter() - t0) / reps

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
            "t_fwd_s": round(t_fwd, 4),
            "t_fwdbwd_s": round(t_fwdbwd, 4),
            "live_per_segment": live.tolist(),
            "config": f"{WIDTH}x{HEIGHT}@{SPP}spp depth{DEPTH} cornell",
            "device": str(jax.devices()[0]),
            "baseline_assumption": "ref CPU ~5e6 rays/s (16-core OpenMP)",
        },
    }))


if __name__ == "__main__":
    main()
