"""Render-session lifecycle: start/pause/resume/stop/restart, target-sample
auto-pause, checkpoint/resume seed-exactness, metrics."""

import numpy as np
import jax
import pytest

from pbrpathtracer_tpu.engine.config import RenderConfig
from pbrpathtracer_tpu.engine.session import RenderSession, RenderState
from pbrpathtracer_tpu.scene.builders import cornell_box
from pbrpathtracer_tpu.scene.scene import Camera
from pbrpathtracer_tpu.ops.integrator import render

CAM = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                  up=(0, 1, 0), fovy=61)
CFG = RenderConfig(width=8, height=8, max_depth=2, spp=1, seed=7)


def _session():
    return RenderSession(scene=cornell_box(), camera=CAM, cfg=CFG)


def test_progressive_matches_batch_render():
    s = _session()
    s.start()
    s.step(4)
    assert s.samples == 4
    scene = cornell_box()
    batch = np.asarray(jax.jit(
        lambda: render(scene, CAM, CFG.replace(spp=4)))())
    assert np.allclose(s.image(), batch, atol=1e-6)


def test_pause_resume_seed_exact():
    a = _session()
    a.start()
    a.step(2)
    a.pause()
    assert a.state == RenderState.PAUSED
    assert a.step(5) == 0          # paused: no passes run
    a.resume()
    a.step(2)

    b = _session()
    b.start()
    b.step(4)
    assert np.array_equal(a.image(), b.image())


def test_target_samples_auto_pause():
    s = _session()
    s.target_samples = 3
    s.start()
    ran = s.step(10)
    assert ran == 3
    assert s.state == RenderState.PAUSED
    assert s.samples == 3


def test_stop_then_restart_resets():
    s = _session()
    s.start()
    s.step(2)
    s.stop()
    assert s.state == RenderState.STOPPED
    s.restart()
    assert s.samples == 0
    s.step(1)
    assert s.samples == 1


def test_checkpoint_roundtrip(tmp_path):
    a = _session()
    a.start()
    a.step(3)
    ckpt = str(tmp_path / "render.npz")
    a.save_checkpoint(ckpt)

    b = RenderSession(scene=cornell_box(), camera=CAM, cfg=CFG)
    b.load_checkpoint(ckpt)
    assert b.samples == 3
    b.step(2)

    a.step(2)
    assert np.array_equal(a.image(), b.image())


def test_metrics():
    s = _session()
    s.start()
    s.step(2)
    m = s.metrics()
    assert m["samples"] == 2
    assert m["triangles"] == 36
    assert m["elapsed_s"] > 0
    assert m["avg_time_per_sample_s"] > 0
    assert m["state"] == "rendering"


def test_async_run_with_cancel():
    s = _session()
    s.target_samples = 50
    s.start()
    s.run_async(passes_per_chunk=1)
    import time
    time.sleep(1.0)
    s.pause()       # cooperative cancel between passes
    s.wait()
    paused_at = s.samples
    assert 0 < paused_at
    assert s.state in (RenderState.PAUSED,)


def test_image_u8_tonemap():
    s = _session()
    s.start()
    s.step(1)
    u8 = s.image_u8()
    assert u8.dtype == np.uint8 and u8.shape == (8, 8, 3)
    expect = (np.clip(s.image(), 0, 1) * 255).astype(np.uint8)
    assert np.array_equal(u8, expect)
