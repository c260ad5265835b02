"""Texture fetch: nearest-neighbor, repeat wrap — parity with Image::tex2D
(image.cpp:63-86): ``u = fmod(uv, 1)`` with negative wrap, integer-truncated
texel coords, no filtering, no mips.

Forward sampling is non-differentiable in uv (nearest) but differentiable in
the texel *values* — gradients scatter-add into the fetched texel, exactly the
VJP the blueprint prescribes (SURVEY.md §7 hard-part 5). jnp advanced-indexing
gathers give that VJP for free.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.scene import Textures


def texel_coords(textures: Textures, tex_idx, uv):
    """Wrap uv and truncate to integer texel coords for texture ``tex_idx``.

    Args:
      tex_idx: i32[N] texture-stack indices (must be valid; callers mask).
      uv: f32[N,2].
    Returns:
      (x i32[N], y i32[N]) clamped into the texture's true extent.
    """
    wh = textures.size[tex_idx]          # i32[N,2] (w, h)
    w = wh[:, 0].astype(jnp.float32)
    h = wh[:, 1].astype(jnp.float32)
    u = jnp.mod(uv[:, 0], 1.0)
    v = jnp.mod(uv[:, 1], 1.0)
    # jnp.mod already returns non-negative for positive divisor (unlike C
    # fmod), matching the reference's post-fmod negative fixup
    # (image.cpp:68-74).
    x = (w * u).astype(jnp.int32)
    y = (h * v).astype(jnp.int32)
    x = jnp.clip(x, 0, wh[:, 0] - 1)
    y = jnp.clip(y, 0, wh[:, 1] - 1)
    return x, y


def sample_texture(textures: Textures, tex_idx, uv, fallback, mask):
    """Fetch RGBA for each lane; lanes with ``mask==False`` get ``fallback``.

    Args:
      tex_idx: i32[N]; entries where mask is False may be any valid index.
      uv: f32[N,2]; fallback: f32[N,4] or f32[N,C]; mask: bool[N].
    Returns f32[N,4].
    """
    safe_idx = jnp.where(mask, tex_idx, 0)
    x, y = texel_coords(textures, safe_idx, uv)
    texel = textures.data[safe_idx, y, x]      # f32[N,4] gather
    return jnp.where(mask[:, None], texel, fallback)
