"""Headless preview renderer + pick buffer.

The reference previews the scene by OpenGL rasterization with a second
render target carrying (objectId+1, elementId+1) for mouse picking
(Display, main.cpp:2796-2977; fPrev pickcolor, shaders.h:168; readback
main.cpp:3239-3247). The TPU equivalent is a single-bounce ray cast over the
same camera: flat-shaded color with a headlight term plus NEE-free lighting,
and an exact (object_id, element_id) id-buffer — same information the GL
pick pass provides, computed in one jit.

`pick(x, y)` reproduces the click→selection logic: ids are offset by +1 so
0 means "background" (shaders.h:168 writes id+1; readback subtracts 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene.scene import Camera, Scene
from .camera import generate_rays
from .hit import _select_intersector, interpolate_uv
from .linalg import dot, safe_normalize
from .texture import sample_texture
from ..utils.constants import TEX_DIFFUSE, NO_TEXTURE


def preview_render(scene: Scene, camera: Camera, width: int, height: int,
                   cfg=None, highlight=None, selected=None,
                   highlight_color=(1.0, 0.65, 0.1),
                   selection_color=(1.0, 0.25, 0.1)):
    """Rasterizer-style preview.

    Returns (color f32[H,W,3], object_id i32[H,W], element_id i32[H,W]) with
    ids = -1 for background. ``highlight``/``selected``: optional
    (object_id, element_id) tuples tinted like the GL preview
    (main.cpp:2870-2898 highlight/selection tint).
    """
    from ..engine.config import RenderConfig
    if cfg is None:
        cfg = RenderConfig(width=width, height=height)

    pix = jnp.arange(width * height, dtype=jnp.int32)
    # no DOF in the preview: zero the aperture
    cam = camera.replace(aperture=jnp.float32(0.0))
    ro, rd = generate_rays(cam, width, height, jnp.uint32(0), jnp.uint32(0),
                           pix)
    intersect = _select_intersector(scene, cfg)
    hit, idx, t, u, v = intersect(scene, ro, rd,
                                  jnp.zeros((pix.shape[0],), jnp.float32))

    g, m = scene.geom, scene.materials
    mid = g.mat_id[idx]
    n = g.normal[idx]
    n = jnp.where((dot(n, rd) > 0.0)[:, None], -n, n)

    base = m.diffuse[mid]
    if scene.has_any_texture:
        uv = interpolate_uv(scene, idx, u, v)
        ti = m.tex_index[mid, TEX_DIFFUSE]
        has = hit & (ti != NO_TEXTURE)
        texel = sample_texture(scene.textures, ti, uv,
                               jnp.zeros((pix.shape[0], 4), jnp.float32), has)
        base = jnp.where(has[:, None], texel[:, :3], base)

    # headlight shading: ambient + |n·view|, plus emissive glow
    ndotv = jnp.abs(dot(n, -rd))[:, None]
    color = base * (0.25 + 0.75 * ndotv)
    color = color + m.emissive[mid] * jnp.minimum(
        m.emissive_intensity[mid], 1.0)[:, None] * 0.5

    obj_id = jnp.where(hit, g.object_id[idx], -1)
    elem_id = jnp.where(hit, g.element_id[idx], -1)

    def tint(color, target, tint_rgb, amount):
        if target is None:
            return color
        to, te = target
        mask = hit & (obj_id == to)
        if te is not None:
            mask = mask & (elem_id == te)
        return jnp.where(mask[:, None],
                         color * (1 - amount)
                         + jnp.asarray(tint_rgb, jnp.float32) * amount,
                         color)

    color = tint(color, highlight, highlight_color, 0.35)
    color = tint(color, selected, selection_color, 0.5)
    color = jnp.where(hit[:, None], color, jnp.zeros_like(color))

    return (color.reshape(height, width, 3),
            obj_id.reshape(height, width),
            elem_id.reshape(height, width))


def pick(object_ids, element_ids, x: int, y: int):
    """Mouse-pick readback parity (main.cpp:3239-3247): returns
    (object_id, element_id) at pixel (x, y), or (-1, -1) for background."""
    import numpy as np
    oid = int(np.asarray(object_ids)[y, x])
    eid = int(np.asarray(element_ids)[y, x])
    return oid, eid
