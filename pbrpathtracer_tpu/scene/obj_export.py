"""Wavefront OBJ export — the inverse of scene/obj_loader.py.

Writes triangle soup such that importing the file through EITHER loader —
this repo's ``load_object_triangles`` or the reference's
``PathTracer::LoadObject`` (pathtracer.cpp:41-145) — reproduces the input
world-space triangles bit-for-bit (up to float round-trip): both loaders
negate X on vertices/normals and flip V on texcoords at import, so the
exporter pre-applies the inverse (negate X, flip V) when writing.

Used by benchmarks/ref_baseline.py to hand the exact same scene to the
compiled reference binary and to this framework, and available as a
user-facing export path (the reference app has no OBJ export; this is a
strict addition).
"""

from __future__ import annotations

import numpy as np


def export_obj(path: str, v0, v1, v2, uv0=None, uv1=None, uv2=None,
               element_id=None, element_names=None) -> str:
    """Write world-space triangles to ``path`` as OBJ.

    Args:
      v0, v1, v2: f32[T, 3] world-space triangle vertices.
      uv0..uv2: optional f32[T, 2] texcoords (written V-flipped).
      element_id: optional i32[T] element ids; each distinct id becomes a
        ``g`` group (→ one tinyobj shape / one element on import).
      element_names: optional list of names per element id.

    Returns the path written.
    """
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    T = v0.shape[0]
    has_uv = uv0 is not None
    if element_id is None:
        element_id = np.zeros(T, np.int32)
    element_id = np.asarray(element_id)

    with open(path, "w") as f:
        f.write("# exported by pbrpathtracer_tpu.scene.obj_export\n")
        # vertex block: 3 verts per triangle, X negated (import un-negates)
        for tri in range(T):
            for p in (v0[tri], v1[tri], v2[tri]):
                f.write(f"v {-p[0]:.9g} {p[1]:.9g} {p[2]:.9g}\n")
        if has_uv:
            uvs = (np.asarray(uv0, np.float32), np.asarray(uv1, np.float32),
                   np.asarray(uv2, np.float32))
            for tri in range(T):
                for uv in (uvs[0][tri], uvs[1][tri], uvs[2][tri]):
                    f.write(f"vt {uv[0]:.9g} {1.0 - uv[1]:.9g}\n")
        # faces grouped by element id (ascending, contiguous runs assumed
        # not required — faces are emitted per group)
        for eid in np.unique(element_id):
            name = (element_names[int(eid)] if element_names is not None
                    else f"element{int(eid)}")
            f.write(f"g {name}\n")
            for tri in np.nonzero(element_id == eid)[0]:
                a, b, c = 3 * int(tri) + 1, 3 * int(tri) + 2, 3 * int(tri) + 3
                if has_uv:
                    f.write(f"f {a}/{a} {b}/{b} {c}/{c}\n")
                else:
                    f.write(f"f {a} {b} {c}\n")
    return path


def export_scene_obj(path: str, scene, element_id=None) -> str:
    """Export a Scene's geometry (element_id defaults to geom.element_id)."""
    g = scene.geom
    v0 = np.asarray(g.v0)
    v1 = v0 + np.asarray(g.e1)
    v2 = v0 + np.asarray(g.e2)
    eid = (np.asarray(g.element_id) if element_id is None
           else np.asarray(element_id))
    return export_obj(path, v0, v1, v2, np.asarray(g.uv0), np.asarray(g.uv1),
                      np.asarray(g.uv2), element_id=eid)
