"""PNG export — parity with ExportAt (main.cpp:760-811): writes the
3-channel byte buffer (the reference flips its GL-bottom-up buffer
vertically; our images are already top-down so the user-visible result is
identical), auto-naming ``scene_YYYYMMDD_H_M_S.png``."""

from __future__ import annotations

import datetime
import os

import numpy as np


def tonemap_to_u8(mean_radiance: np.ndarray) -> np.ndarray:
    """clamp to [0,1], ×255, truncate — pathtracer.cpp:802-812 (no gamma)."""
    res = np.clip(np.asarray(mean_radiance), 0.0, 1.0)
    return (res * 255.0).astype(np.uint8)


def auto_filename(directory: str = ".", now=None) -> str:
    """scene_YYYYMMDD_H_M_S.png (main.cpp:783-809 — note: hour/min/sec are
    NOT zero-padded in the reference; parity preserved)."""
    t = now if now is not None else datetime.datetime.now()
    name = f"scene_{t.year}{t.month:02d}{t.day:02d}_{t.hour}_{t.minute}_{t.second}.png"
    return os.path.join(directory, name)


def export_png(path_or_dir: str, image, samples: int | None = None):
    """Export a render to PNG.

    ``image``: f32[H,W,3] mean radiance (or accumulation buffer with
    ``samples`` given). If ``path_or_dir`` is a directory, an auto filename
    is generated. Returns the written path.
    """
    from PIL import Image

    img = np.asarray(image)
    if samples is not None:
        img = img / float(samples)
    u8 = tonemap_to_u8(img)
    path = (auto_filename(path_or_dir) if os.path.isdir(path_or_dir)
            else path_or_dir)
    Image.fromarray(u8, "RGB").save(path)
    return path
