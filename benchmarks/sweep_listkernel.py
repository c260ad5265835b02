#!/usr/bin/env python
"""List-kernel A/B sweep (r5): isolates the cost/benefit of each
traversal mechanism on the rung-3 scene, on-chip.

Measures, for 512² primary rays over mesh_scene(50k):
  * scanline vs block pixel layout;
  * EARLY_BREAK and SUB_MASK toggles (4 combos, bit-identity asserted);
  * per-tile fixed cost via forced candidate counts (K-sweep);
  * candidate-count statistics.

r5 results (TPU v5e, recorded in R5_EVIDENCE.jsonl): blocked layout
103 -> 40 ms/query; all四 toggle combos within noise at 40 ms (the cost
is per-candidate fixed overhead + first-surviving-chunk pair blocks);
K-sweep: K=0 5.2 ms (pure per-tile floor), +~5 ms for the first
candidate, ~2.5-3.5 ms per further candidate.

Usage: python benchmarks/sweep_listkernel.py [--tris 50000]
"""

import argparse
import json
import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=50_000)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from pbrpathtracer_tpu.scene.big_scenes import mesh_scene, mesh_scene_camera
    from pbrpathtracer_tpu.kernels import intersect_pallas_list as ipl
    from pbrpathtracer_tpu.kernels import intersect_pallas as ipk
    from pbrpathtracer_tpu.ops.camera import generate_rays
    from pbrpathtracer_tpu.ops.integrator import block_pixel_order

    scene = mesh_scene(args.tris, accel="always")
    cam = mesh_scene_camera()
    n = args.size * args.size
    out = {"tris": scene.num_triangles, "size": args.size,
           "device": str(jax.devices()[0])}

    def rays(order):
        pix = (jnp.asarray(block_pixel_order(args.size, args.size))
               if order == "block" else jnp.arange(n, dtype=jnp.int32))
        return jax.jit(lambda: generate_rays(
            cam, args.size, args.size, jnp.uint32(0), jnp.uint32(0), pix))()

    def timeq(ro, rd):
        q = jax.jit(lambda a, b: ipk.intersect_pallas(scene, a, b))
        o = q(ro, rd)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(8):
            o = q(ro, rd)
        jax.block_until_ready(o)
        return round((time.perf_counter() - t0) / 8 * 1e3, 2), o

    ro_s, rd_s = rays("scan")
    ro_b, rd_b = rays("block")
    out["query_ms_scanline"], _ = timeq(ro_s, rd_s)
    out["query_ms_block"], base = timeq(ro_b, rd_b)

    combos = {}
    for eb in (True, False):
        for sm in (True, False):
            ipl.EARLY_BREAK, ipl.SUB_MASK = eb, sm
            t, o = timeq(ro_b, rd_b)
            combos[f"break={int(eb)},sub={int(sm)}"] = t
            assert np.array_equal(np.asarray(base[1]), np.asarray(o[1])), \
                "toggle changed results"
    ipl.EARLY_BREAK = ipl.SUB_MASK = True
    out["query_ms_by_toggles"] = combos
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
