"""Public headless API — replaces the reference's ImGui/GLFW UI surface
(north star: "the ImGui/GLFW UI is replaced by a headless render+grad API").

    render(scene, camera, cfg)            -> f32[H,W,3]
    grad_render(scene, camera, cfg, ...)  -> (loss, grads)
    fit(scene, camera, cfg, target, ...)  -> FitResult
    RenderSession                         -> progressive/pause/resume/export
    EditorScene / load_pts / save_pts     -> scene authoring + persistence
"""

from __future__ import annotations

from functools import partial

import jax

from .engine.config import RenderConfig
from .engine.session import RenderSession, RenderState
from .scene.scene import Camera, Scene, MaterialSpec
from .scene.editor import EditorScene
from .scene.pts import load_pts, save_pts, get_resolution_from_scene_file
from .scene import builders
from .diff.fit import fit
from .diff.loss import l2_image_loss, loss_and_grad
from .diff.params import get_params, set_params
from .io.png import export_png


def render(scene: Scene, camera: Camera, cfg: RenderConfig, seed=None):
    """Jitted forward render → f32[H,W,3] mean radiance."""
    from .ops.integrator import render as _render
    return _jit_render(scene, camera, cfg, seed)


@partial(jax.jit, static_argnums=(2,))
def _jit_render(scene, camera, cfg, seed):
    from .ops.integrator import render as _render
    return _render(scene, camera, cfg, seed=seed)


def grad_render(scene: Scene, camera: Camera, cfg: RenderConfig, target,
                materials=True, textures=False, camera_lens=False, seed=None):
    """(loss, grads-dict) of the L2 pixel loss against ``target``."""
    params = get_params(scene, camera, materials=materials, textures=textures,
                        camera_lens=camera_lens)
    return _jit_grad(params, scene, camera, cfg, target, seed)


@partial(jax.jit, static_argnums=(3,))
def _jit_grad(params, scene, camera, cfg, target, seed):
    return jax.value_and_grad(l2_image_loss)(params, scene, camera, cfg,
                                             target, seed)


def render_pts(pts_path: str, cfg: RenderConfig | None = None, spp=None,
               seed=None):
    """Load a .pts scene and render it; returns (image, editor, settings)."""
    editor, settings = load_pts(pts_path)
    if settings["missing_objects"]:
        raise FileNotFoundError(
            f"missing OBJ assets: {settings['missing_objects']} "
            f"(use EditorScene.redirect + load_pts(editor=...))")
    if cfg is None:
        cfg = RenderConfig(width=settings["width"],
                           height=settings["height"],
                           max_depth=settings["trace_depth"])
    if spp is not None:
        cfg = cfg.replace(spp=spp)
    scene = editor.build_scene()
    camera = editor.tracer_camera()
    return render(scene, camera, cfg, seed=seed), editor, settings


__all__ = [
    "Camera", "EditorScene", "MaterialSpec", "RenderConfig", "RenderSession",
    "RenderState", "Scene", "builders", "export_png", "fit",
    "get_resolution_from_scene_file", "get_params", "grad_render",
    "l2_image_loss", "load_pts", "loss_and_grad", "render", "render_pts",
    "save_pts", "set_params",
]
