"""Differentiable-parameter extraction/injection.

The blueprint's inverse-rendering surface (BASELINE.json north star): pixel
losses differentiate w.r.t. material params (albedo/roughness/metallic/IOR,
specular, emissive + intensity, translucency), textures, lights (via
emissive), and the camera lens (aperture, focal distance). This module turns
a (Scene, Camera) pair into an optimizable pytree and back.

Discrete decisions inside the renderer (lobe choice, RR, light pick,
opacity tests, Fresnel accept) are comparisons — they contribute no gradient
path, which is exactly the detached-decision estimator SURVEY.md §7
prescribes; the continuous shading chain carries pathwise gradients.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..scene.scene import Camera, Scene

# Material fields that participate in optimization.
MATERIAL_FIELDS = (
    "diffuse", "specular", "emissive", "emissive_intensity",
    "roughness", "reflectiveness", "translucency", "ior",
)
CAMERA_FIELDS = ("aperture", "focal_dist")


def get_params(scene: Scene, camera: Camera,
               materials: bool = True, textures: bool = False,
               camera_lens: bool = False) -> dict:
    """Extract the selected differentiable leaves as a flat dict pytree."""
    params = {}
    if materials:
        for f in MATERIAL_FIELDS:
            params[f"mat.{f}"] = getattr(scene.materials, f)
    if textures:
        params["tex.data"] = scene.textures.data
    if camera_lens:
        for f in CAMERA_FIELDS:
            params[f"cam.{f}"] = getattr(camera, f)
    return params


def set_params(scene: Scene, camera: Camera, params: dict):
    """Inject a params dict back into (scene, camera). Returns new pytrees."""
    mat_updates = {k.split(".", 1)[1]: v for k, v in params.items()
                   if k.startswith("mat.")}
    if mat_updates:
        scene = scene.replace(materials=scene.materials.replace(**mat_updates))
    if "tex.data" in params:
        scene = scene.replace(
            textures=scene.textures.replace(data=params["tex.data"]))
    cam_updates = {k.split(".", 1)[1]: v for k, v in params.items()
                   if k.startswith("cam.")}
    if cam_updates:
        camera = camera.replace(**cam_updates)
    return scene, camera


def clip_params(params: dict) -> dict:
    """Project parameters back into their physical ranges after an optimizer
    step (mirrors the GUI editor's slider ranges, main.cpp:1580-2223)."""
    out = dict(params)
    for k, v in params.items():
        if k in ("mat.diffuse", "mat.specular", "mat.emissive"):
            out[k] = jnp.clip(v, 0.0, 1.0)
        elif k in ("mat.roughness", "mat.reflectiveness", "mat.translucency"):
            out[k] = jnp.clip(v, 0.0, 1.0)
        elif k == "mat.emissive_intensity":
            out[k] = jnp.maximum(v, 0.0)
        elif k == "mat.ior":
            out[k] = jnp.clip(v, 1.0, 3.0)
        elif k == "tex.data":
            out[k] = jnp.clip(v, 0.0, 1.0)
        elif k == "cam.aperture":
            out[k] = jnp.maximum(v, 0.0)
        elif k == "cam.focal_dist":
            out[k] = jnp.maximum(v, 1e-3)
    return out
