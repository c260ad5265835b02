"""Multi-host layer test: two real OS processes joined via
jax.distributed over localhost (each with 4 virtual CPU devices) must
produce the SAME image, bit-for-bit, as a single-process render — the
keyed counter-based RNG makes sharding placement-invariant (SURVEY.md
§2.2 communication-backend row; replaces the reference's single-process
shared-memory threading, main.cpp:3666-3677)."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

from pbrpathtracer_tpu.scene.builders import cornell_box
from pbrpathtracer_tpu.scene.scene import Camera
from pbrpathtracer_tpu.engine.config import RenderConfig
from pbrpathtracer_tpu.ops.integrator import render

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mh"))
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), outdir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    return {pid: np.load(os.path.join(outdir, f"p{pid}.npz"))
            for pid in range(2)}


def test_multihost_render_bitexact_vs_single_process(worker_results):
    scene = cornell_box()
    cam = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                      up=(0, 1, 0), fovy=61)
    cfg = RenderConfig(width=16, height=16, max_depth=2, spp=2, seed=4)
    ref = np.asarray(jax.jit(lambda: render(scene, cam, cfg))())
    img0 = worker_results[0]["img"]
    assert img0.shape == ref.shape
    assert np.allclose(ref, img0, atol=1e-5), np.abs(ref - img0).max()


def test_multihost_processes_agree(worker_results):
    """The allgathered image and the psum'd train step must be identical on
    every process (replicated state never diverges)."""
    a, b = worker_results[0], worker_results[1]
    assert np.array_equal(a["img"], b["img"])
    assert a["loss"] == b["loss"]
    assert np.array_equal(a["diffuse"], b["diffuse"])


def test_multihost_train_step_loss_finite(worker_results):
    assert np.isfinite(worker_results[0]["loss"])
