"""Wavefront OBJ loader — feature parity with PathTracer::LoadObject
(pathtracer.cpp:41-145) without tinyobjloader:

* vertices/normals are **X-negated** on import and the model matrix is baked
  into world space (positions w=1, normals w=0 — pathtracer.cpp:74-83);
* texcoords flip V: uv = (tc.u, 1 - tc.v) (pathtracer.cpp:87-88);
* shapes split on `o`/`g` statements become *elements* (tinyobj semantics);
* faces with ≠3 vertices are fan-triangulated (tinyobj's default
  triangulation; the reference then skips non-tris, :66-67);
* per-face smoothing flag from `s` groups (≠0 ⇒ smoothing,
  pathtracer.cpp:131-135);
* per-triangle TBN via Triangle::Init semantics (scene.compute_tbn).

Deviation (documented): when an OBJ has smoothing groups but *no* vertex
normals, the reference tracer interpolates zero normals (NaN); we generate
area-weighted smooth normals per smoothing group instead — matching the
previewer's behavior (previewer.cpp:84-294), which is what users actually
see.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from .scene import Geometry, pack_geometry


@dataclass
class ObjShape:
    """One element (tinyobj 'shape'): triangle indices into the flat arrays."""
    name: str = ""
    # per-triangle: 3 vertex ids, 3 texcoord ids (-1 none), 3 normal ids (-1)
    faces: list = field(default_factory=list)        # [(v,v,v),(t,t,t),(n,n,n), smooth)]


@dataclass
class ObjData:
    positions: np.ndarray        # f32[V,3] (already X-negated)
    texcoords: np.ndarray        # f32[T,2] (already V-flipped)
    normals: np.ndarray          # f32[N,3] (already X-negated)
    shapes: list = field(default_factory=list)

    @property
    def num_triangles(self):
        return sum(len(s.faces) for s in self.shapes)


def _resolve(idx: int, count: int) -> int:
    """OBJ 1-based / negative-relative index → 0-based."""
    if idx > 0:
        return idx - 1
    if idx < 0:
        return count + idx
    return -1


def parse_obj(path: str) -> ObjData:
    positions, texcoords, normals = [], [], []
    shapes = [ObjShape(name="")]
    smoothing = 0

    with open(path, "r", errors="replace") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            if tag == "v" and len(parts) >= 4:
                # X negation at import (pathtracer.cpp:74)
                positions.append((-float(parts[1]), float(parts[2]),
                                  float(parts[3])))
            elif tag == "vt" and len(parts) >= 3:
                # V flip at import (pathtracer.cpp:87-88)
                texcoords.append((float(parts[1]), 1.0 - float(parts[2])))
            elif tag == "vn" and len(parts) >= 4:
                normals.append((-float(parts[1]), float(parts[2]),
                                float(parts[3])))
            elif tag in ("o", "g"):
                name = " ".join(parts[1:]) if len(parts) > 1 else ""
                if shapes[-1].faces:
                    shapes.append(ObjShape(name=name))
                else:
                    shapes[-1].name = name
            elif tag == "s":
                val = parts[1].lower() if len(parts) > 1 else "0"
                smoothing = 0 if val in ("0", "off") else (
                    int(val) if val.isdigit() else 1)
            elif tag == "f" and len(parts) >= 4:
                corners = []
                for p in parts[1:]:
                    comp = p.split("/")
                    vi = _resolve(int(comp[0]), len(positions))
                    ti = _resolve(int(comp[1]), len(texcoords)) \
                        if len(comp) > 1 and comp[1] else -1
                    ni = _resolve(int(comp[2]), len(normals)) \
                        if len(comp) > 2 and comp[2] else -1
                    corners.append((vi, ti, ni))
                for k in range(1, len(corners) - 1):   # fan triangulation
                    a, b, c = corners[0], corners[k], corners[k + 1]
                    shapes[-1].faces.append((
                        (a[0], b[0], c[0]), (a[1], b[1], c[1]),
                        (a[2], b[2], c[2]), smoothing))

    shapes = [s for s in shapes if s.faces]
    if not shapes:
        shapes = [ObjShape(name="")]
    return ObjData(
        positions=np.asarray(positions, np.float32).reshape(-1, 3),
        texcoords=np.asarray(texcoords, np.float32).reshape(-1, 2),
        normals=np.asarray(normals, np.float32).reshape(-1, 3),
        shapes=shapes,
    )


def _generate_smooth_normals(obj: ObjData):
    """Area-weighted vertex normals for shapes that smooth without normals,
    accumulated per (shape, smoothing-group id).

    The reference re-shapes each element by smoothing-group id and smooths
    within the group only (previewer.cpp:84-294, the per-group re-shape
    loop): two adjacent groups sharing a vertex keep distinct normals
    across the group boundary. Returns {(shape_idx, group_id): f32[V,3]}.
    """
    groups: dict = {}
    for si, shape in enumerate(obj.shapes):
        for (vi, ti, ni, smooth) in shape.faces:
            if not smooth:
                continue
            vn = groups.get((si, smooth))
            if vn is None:
                vn = groups[(si, smooth)] = np.zeros_like(obj.positions)
            p0, p1, p2 = (obj.positions[vi[0]], obj.positions[vi[1]],
                          obj.positions[vi[2]])
            fn = np.cross(p1 - p0, p2 - p0)   # area-weighted
            for v in vi:
                vn[v] += fn
    for key, vn in groups.items():
        norms = np.linalg.norm(vn, axis=-1, keepdims=True)
        groups[key] = np.where(norms > 0, vn / np.maximum(norms, 1e-30), vn)
    return groups


def object_name_from_path(path: str) -> str:
    """Name derivation parity (pathtracer.cpp:49-55): basename sans ext,
    forward-slash separators only."""
    start = path.rfind("/") + 1
    if start > len(path) - 1:
        start = 0
    end = path.rfind(".")
    if end == -1:
        end = len(path) - 1
    return path[start:end]


def load_object_triangles(path: str, model_matrix=None,
                          object_id: int = 0) -> dict:
    """Parse an OBJ and return host triangle arrays (pack_geometry input)
    with the model matrix baked in.

    Returns dict with keys v0..v2, n0..n2, uv0..uv2, smoothing, mat_key
    (list of (object_id, element_id)), element names.
    """
    obj = parse_obj(path)
    M = np.asarray(model_matrix, np.float32) if model_matrix is not None \
        else np.eye(4, dtype=np.float32)

    need_generated = (obj.normals.shape[0] == 0 and any(
        f[3] for s in obj.shapes for f in s.faces))
    gen_vn = _generate_smooth_normals(obj) if need_generated else None

    T = obj.num_triangles
    v = np.zeros((3, T, 3), np.float32)
    n = np.zeros((3, T, 3), np.float32)
    uv = np.zeros((3, T, 2), np.float32)
    smooth = np.zeros(T, bool)
    elem_id = np.zeros(T, np.int32)
    names = []

    t = 0
    for ei, shape in enumerate(obj.shapes):
        names.append(shape.name)
        for (vi, ti, ni, sm) in shape.faces:
            for c in range(3):
                p = obj.positions[vi[c]]
                v[c, t] = (M @ np.array([p[0], p[1], p[2], 1.0],
                                        np.float32))[:3]
                if ni[c] >= 0 and obj.normals.shape[0]:
                    nn = obj.normals[ni[c]]
                    n[c, t] = (M @ np.array([nn[0], nn[1], nn[2], 0.0],
                                            np.float32))[:3]
                elif gen_vn is not None and sm:
                    nn = gen_vn[(ei, sm)][vi[c]]   # this face's group only
                    n[c, t] = (M @ np.array([nn[0], nn[1], nn[2], 0.0],
                                            np.float32))[:3]
                if ti[c] >= 0 and obj.texcoords.shape[0]:
                    uv[c, t] = obj.texcoords[ti[c]]
            smooth[t] = bool(sm)
            elem_id[t] = ei
            t += 1

    return {
        "v0": v[0], "v1": v[1], "v2": v[2],
        "n0": n[0], "n1": n[1], "n2": n[2],
        "uv0": uv[0], "uv1": uv[1], "uv2": uv[2],
        "smoothing": smooth,
        "element_id": elem_id,
        "object_id": np.full(T, object_id, np.int32),
        "element_names": names,
        "object_name": object_name_from_path(path.replace("\\", "/")),
    }
