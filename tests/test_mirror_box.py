"""Segment-cap stress vs the reference's unbounded specular recursion.

The reference bounds mirror chains only by Russian roulette (specular
bounces refund the iter budget, pathtracer.cpp:625,701,711); the wavefront
truncates at cfg.max_segments. These tests quantify the truncation bias on
a mirror box (reflectiveness 1, roughness 0 walls) and pin down that
suggest_max_segments() bounds the energy deficit below its tolerance.
"""

import numpy as np
import jax
import pytest

from pbrpathtracer_tpu.scene.builders import mirror_box_scene
from pbrpathtracer_tpu.scene.scene import Camera
from pbrpathtracer_tpu.engine.config import RenderConfig, suggest_max_segments
from pbrpathtracer_tpu.ops.integrator import render

CAM = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                  up=(0, 1, 0), fovy=61)


def _mean_radiance(scene, cfg):
    img = np.asarray(jax.jit(lambda: render(scene, CAM, cfg))())
    return img, float(img.mean())


def test_suggested_cap_bounds_truncation_bias():
    """Render at the suggested cap vs an effectively-unbounded cap (64):
    the mean energy deficit must be below the tolerance the cap was sized
    for. The default 2·depth+2 cap is also measured to document how much
    tail it loses on this adversarial scene."""
    scene = mirror_box_scene(spec_level=0.9, diffuse_level=0.9)
    base = RenderConfig(width=16, height=16, max_depth=2, spp=4, seed=11)

    tol = 1e-3
    s_auto = suggest_max_segments(scene, base.max_depth, tol=tol)
    assert s_auto > base.resolved_max_segments()  # adversarial scene ⇒ bigger cap

    img_ref, m_ref = _mean_radiance(scene, base.replace(max_segments=64))
    img_auto, m_auto = _mean_radiance(scene, base.replace(max_segments=s_auto))
    img_def, m_def = _mean_radiance(scene, base)

    # Truncation only removes energy; same seeds ⇒ identical paths up to
    # the cap, so the difference is exactly the lost tail.
    assert m_ref >= m_auto >= m_def - 1e-7
    deficit_auto = m_ref - m_auto
    deficit_default = m_ref - m_def
    assert deficit_auto < tol, (deficit_auto, s_auto)
    # the default cap must show a *measurable* deficit here, proving the
    # scene actually stresses the tail (guards against a vacuous test)
    assert deficit_default > deficit_auto


def test_suggest_max_segments_diffuse_scene_keeps_default():
    from pbrpathtracer_tpu.scene.builders import cornell_box
    scene = cornell_box()
    assert suggest_max_segments(scene, 3) == 8  # no specular chains ⇒ 2d+2


def test_with_auto_segments_plumbs_through():
    scene = mirror_box_scene()
    cfg = RenderConfig(width=8, height=8, max_depth=2).with_auto_segments(scene)
    assert cfg.max_segments == suggest_max_segments(scene, 2)
