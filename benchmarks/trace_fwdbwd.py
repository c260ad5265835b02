#!/usr/bin/env python
"""Capture a device profile of the flagship fwd+bwd step and print the
top HLO ops by self-time (xprof xplane -> hlo_op_stats). Locates where
the backward milliseconds actually go, op by op."""

import glob
import os
import sys
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from pbrpathtracer_tpu.scene.builders import cornell_box
    from pbrpathtracer_tpu.scene.scene import Camera
    from pbrpathtracer_tpu.engine.config import RenderConfig
    from pbrpathtracer_tpu.diff.params import get_params
    from pbrpathtracer_tpu.diff.loss import l2_image_loss

    scene = cornell_box()
    camera = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                         up=(0, 1, 0), fovy=61)
    cfg = RenderConfig(width=512, height=512, max_depth=4, spp=1)
    params = get_params(scene, camera, materials=True)
    target = jnp.zeros((512, 512, 3), jnp.float32)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(l2_image_loss)(
            p, scene, camera, cfg, target, s)
        return loss, g

    out = step(params, jnp.uint32(0))
    jax.block_until_ready(out)

    logdir = "/tmp/ptx_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for i in range(3):
            out = step(params, jnp.uint32(i))
        jax.block_until_ready(out)

    pbs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", pbs)
    if not pbs:
        return

    from xprof.convert import raw_to_tool_data as rtd
    for tool in ("hlo_op_stats", "framework_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data(pbs, tool, {})
            fn = f"/tmp/{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(fn, mode) as f:
                f.write(data)
            print(f"wrote {fn} ({len(data)} bytes)")
        except Exception as e:
            print(f"{tool}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
