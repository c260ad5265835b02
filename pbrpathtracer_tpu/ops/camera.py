"""Camera ray generation with thin-lens depth of field.

Replicates RenderFrame's image-plane setup and per-pixel primary-ray
construction (pathtracer.cpp:756-791) exactly:

* image plane at ``pos + dir * focal``; height ``2 f tan(fovy/2)``;
* rays start at the *top-left corner* of each pixel — no half-pixel centering
  and no sub-pixel jitter (so, like the reference, sampling provides no AA);
* thin-lens DOF: focal point along the pinhole ray at ``focal_dist``; lens
  offset = uniform disc sample * aperture in the (right, up) plane.

Pixel index convention: pixel p = row * width + col with row 0 at the TOP of
the image (the reference iterates rows top-down and flips into its GL buffer
at pathtracer.cpp:796; its PNG export flips back, so top-down is the
user-visible orientation).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..scene.scene import Camera
from . import rng


def generate_rays(camera: Camera, width: int, height: int, seed, sample_idx,
                  pixel_idx=None):
    """Primary rays for one sample pass.

    Args:
      camera: Camera pytree.
      width/height: static image resolution.
      seed, sample_idx: RNG key components (sample_idx = absolute sample
        counter so progressive passes use fresh lens samples).
      pixel_idx: optional i32[N] subset of pixel indices (for sharded /
        tiled rendering); defaults to all pixels.

    Returns:
      (ro f32[N,3], rd f32[N,3]) ray origins and normalized directions.
    """
    f32 = jnp.float32
    if pixel_idx is None:
        pixel_idx = jnp.arange(width * height, dtype=jnp.int32)
    row = pixel_idx // width
    col = pixel_idx % width

    # Image plane frame (pathtracer.cpp:756-766)
    img_center = camera.pos + camera.dir * camera.focal
    img_height = 2.0 * camera.focal * jnp.tan((camera.fovy / 2.0) * f32(np.pi) / 180.0)
    aspect = f32(width) / f32(height)
    img_width = img_height * aspect
    dx = img_width / f32(width)
    dy = img_height / f32(height)
    cam_right = jnp.cross(camera.up, camera.dir)
    cam_right = cam_right / jnp.linalg.norm(cam_right)

    top_left = (img_center - cam_right * (img_width * 0.5)
                + camera.up * (img_height * 0.5))

    # Pixel corner (no 0.5 offset — parity with pathtracer.cpp:782,814)
    pixel = (top_left[None, :]
             - camera.up[None, :] * (row.astype(f32) * dy)[:, None]
             + cam_right[None, :] * (col.astype(f32) * dx)[:, None])

    rd = pixel - camera.pos[None, :]
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    # Thin-lens DOF (pathtracer.cpp:787-791; SampleCircle :734-739).
    # Slots 0-1 share one pcg4d group — a single hash for both lens draws.
    u_angle, u_radius, _, _ = rng.rand_slots4(
        seed, pixel_idx, sample_idx, rng.STREAM_CAMERA,
        rng.SLOT_LENS_ANGLE // 4)
    angle = u_angle * f32(2.0 * np.pi)
    radius = jnp.sqrt(u_radius)
    disc = jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1) * radius[:, None]

    focal_point = camera.pos[None, :] + rd * camera.focal_dist
    ro = (camera.pos[None, :]
          + cam_right[None, :] * (disc[:, 0:1] * camera.aperture)
          + camera.up[None, :] * (disc[:, 1:2] * camera.aperture))
    rd = focal_point - ro
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd
