"""Preview renderer + pick buffer + observability helpers."""

import numpy as np
import jax
import jax.numpy as jnp

from pbrpathtracer_tpu.scene.builders import cornell_box
from pbrpathtracer_tpu.scene.scene import Camera
from pbrpathtracer_tpu.engine.config import RenderConfig
from pbrpathtracer_tpu.ops.preview import preview_render, pick
from pbrpathtracer_tpu.utils.observability import (auto_resolution,
                                                   rays_per_sample,
                                                   wavefront_occupancy,
                                                   StatusText)

CAM = Camera.make(pos=(0.013, 0.021, 0.217), dir=(0.02, -0.03, 1),
                  up=(0, 1, 0), fovy=61)


def test_preview_color_and_ids():
    scene = cornell_box()
    color, oid, eid = jax.jit(
        lambda: preview_render(scene, CAM, 32, 32))()
    color, oid, eid = np.asarray(color), np.asarray(oid), np.asarray(eid)
    assert color.shape == (32, 32, 3)
    assert np.isfinite(color).all() and color.max() > 0.05
    # closed box: everything hits; element ids in range
    assert (oid == 0).all()
    assert eid.min() >= 0 and eid.max() <= 5
    # center pixels see the back wall / boxes, top sees ceiling-ish ids
    assert eid[16, 16] in range(6)


def test_pick_matches_id_buffer():
    scene = cornell_box()
    _, oid, eid = jax.jit(lambda: preview_render(scene, CAM, 16, 16))()
    o, e = pick(oid, eid, 8, 8)
    assert o == int(np.asarray(oid)[8, 8])
    assert e == int(np.asarray(eid)[8, 8])


def test_preview_highlight_tints():
    scene = cornell_box()
    plain, oid, eid = jax.jit(lambda: preview_render(scene, CAM, 16, 16))()
    target = (0, int(np.asarray(eid)[8, 8]))
    tinted, _, _ = jax.jit(
        lambda: preview_render(scene, CAM, 16, 16, selected=target))()
    assert not np.allclose(np.asarray(plain), np.asarray(tinted))


def test_wavefront_occupancy_monotone():
    scene = cornell_box()
    cfg = RenderConfig(width=8, height=8, max_depth=2, spp=1, seed=1)
    occ = wavefront_occupancy(scene, CAM, cfg)
    assert occ[0] == 64
    assert (np.diff(occ) <= 0).all()      # lanes only die
    assert rays_per_sample(occ) == 2 * occ.sum()


def test_auto_resolution():
    w, h = auto_resolution(1024, 768, 1024 / 768)
    assert (w, h) == (1024, 768)
    w, h = auto_resolution(1024, 768, 2.0)
    assert abs(w / h - 2.0) < 0.05
    assert abs(w * h - 1024 * 768) / (1024 * 768) < 0.05


def test_status_text_ttl():
    st = StatusText(ttl_s=0.05)
    st.set("hello")
    assert st.get() == "hello"
    import time
    time.sleep(0.08)
    assert st.get() == ""


def test_preview_blended_transparency():
    """Reference preview draws translucent elements alpha-blended over the
    opaque pass (main.cpp:2934-2955; alpha from shaders.h:151-164). The
    depth-peeled preview must let the back wall show through the glass box
    of translucent_scene — and highlighted translucent elements must draw
    opaque (the pass gate at main.cpp:2924-2945)."""
    from pbrpathtracer_tpu.scene.builders import translucent_scene
    scene = translucent_scene()
    assert scene.has_translucent
    color, oid, eid = jax.jit(lambda: preview_render(scene, CAM, 48, 48))()
    color, eid = np.asarray(color), np.asarray(eid)
    assert np.isfinite(color).all()

    # pick buffer still reports the front-most (glass) surface
    glass = eid == 6
    assert glass.any(), "glass box not visible in the preview"

    # an identical scene with the box forced OPAQUE must differ behind the
    # glass (blending lets the wall color through; opaque does not)
    import jax.numpy as jnp
    opaque_mats = scene.materials.replace(
        mat_type=jnp.zeros_like(scene.materials.mat_type))
    from pbrpathtracer_tpu.scene.scene import finalize_scene
    opaque_scene = finalize_scene(scene.geom, opaque_mats, scene.textures)
    color_op = np.asarray(jax.jit(
        lambda: preview_render(opaque_scene, CAM, 48, 48))()[0])
    assert not np.allclose(color[glass], color_op[glass]), \
        "translucent element rendered identically to opaque"

    # highlighted translucent element draws opaque: matches the opaque
    # render's geometry contribution more than the blended one does
    color_hl = np.asarray(jax.jit(lambda: preview_render(
        scene, CAM, 48, 48, highlight=(0, 6)))()[0])
    assert not np.allclose(color_hl[glass], color[glass])
