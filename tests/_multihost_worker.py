"""Worker process for tests/test_multihost.py.

Usage: python _multihost_worker.py <process_id> <num_processes> <port> <outdir>

Joins a localhost jax.distributed job on the CPU backend (4 virtual devices
per process), builds the ("host","device") mesh, renders the Cornell box
multihost, runs one sharded train step, and writes results to
<outdir>/p<process_id>.npz for the parent test to compare.
"""

import os
import sys


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from pbrpathtracer_tpu.dist import multihost as mh
    mh.initialize(coordinator_address=f"localhost:{port}",
                  num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    import optax
    from pbrpathtracer_tpu.scene.builders import cornell_box
    from pbrpathtracer_tpu.scene.scene import Camera
    from pbrpathtracer_tpu.engine.config import RenderConfig
    from pbrpathtracer_tpu.diff.params import get_params
    from pbrpathtracer_tpu.parallel.mesh import pad_to_devices

    scene = cornell_box()
    cam = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                      up=(0, 1, 0), fovy=61)
    cfg = RenderConfig(width=16, height=16, max_depth=2, spp=2, seed=4)

    mesh = mh.host_device_mesh()
    assert mesh.devices.shape == (nproc, 4), mesh.devices.shape

    # ---- forward render, gathered everywhere ----
    img = mh.render_multihost(scene, cam, cfg, mesh=mesh)

    # ---- one sharded train step ----
    params = get_params(scene, cam, materials=True)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = mh.make_train_step_multihost(scene, cam, cfg.replace(spp=1), opt,
                                        mesh=mesh)
    shard = mh.wavefront_sharding(mesh)
    rep = mh.replicated(mesh)
    n_pad = pad_to_devices(cfg.num_pixels, mesh.devices.size)

    from functools import partial

    @partial(jax.jit, out_shardings=(shard, shard))
    def make_inputs():
        idx = jnp.arange(n_pad, dtype=jnp.int32)
        idx = jnp.where(idx < cfg.num_pixels, idx, 0)
        tgt = jnp.full((n_pad, 3), 0.25, jnp.float32)
        return idx, tgt

    pixel_idx, target = make_inputs()
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    new_params, _, loss = step(params, opt_state, scene, cam, pixel_idx,
                               target, jnp.uint32(0))

    np.savez(os.path.join(outdir, f"p{pid}.npz"),
             img=np.asarray(img),
             loss=float(loss),
             diffuse=np.asarray(new_params["mat.diffuse"]))
    print(f"worker {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
