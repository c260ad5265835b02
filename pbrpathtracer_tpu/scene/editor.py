"""Editor scene model — the headless equivalent of the reference Previewer
(previewer.{h,cpp}): objects with TRS transforms and named elements carrying
materials + six texture paths, a rotatable camera, selection state, and the
push-bridge that (re)builds the tracer's flat Scene arrays.

API parity map (reference → here):
  Previewer::LoadObject (previewer.cpp:296+)        → EditorScene.load_object
  Set{Location,Rotation,Scale,ScaleDirect} (:676-768) → same names (snake_case)
  SetMaterial / Set*TextureForElement (:553-674)    → set_material / set_texture
  SetName object/element (:943-975)                 → rename_object/rename_element
  DeleteObject / ReplaceObject (:977-1038)          → delete_object / replace_object
  SendObjectsToPathTracer (:770-817)                → build_scene()
  SetPathTracerCamera (:924-930, aperture=focal/F)  → tracer_camera()
  RotateCamera (:883-901)                           → rotate_camera
  missing-asset redirection (main.cpp:441-604)      → scan_missing_assets/redirect
"""

from __future__ import annotations

import dataclasses
import math
import os
from dataclasses import dataclass, field

import numpy as np

from ..utils.constants import NUM_TEX_SLOTS, TEX_SLOT_NAMES, OPAQUE
from .obj_loader import load_object_triangles, object_name_from_path
from .scene import (MaterialSpec, Scene, finalize_scene, pack_geometry,
                    pack_materials, pack_textures, Camera)
from .texture_io import TextureCache


def _rotate(M, angle, axis):
    """glm::rotate(M, angle, axis) — right-multiplied axis rotation."""
    x, y, z = axis
    c, s = math.cos(angle), math.sin(angle)
    t = 1.0 - c
    R = np.array([
        [c + x * x * t, x * y * t - z * s, x * z * t + y * s, 0],
        [y * x * t + z * s, c + y * y * t, y * z * t - x * s, 0],
        [z * x * t - y * s, z * y * t + x * s, c + z * z * t, 0],
        [0, 0, 0, 1]], np.float32)
    return (M @ R).astype(np.float32)


def _translate(v):
    M = np.eye(4, dtype=np.float32)
    M[:3, 3] = v
    return M


def _scale(M, v):
    S = np.diag([v[0], v[1], v[2], 1.0]).astype(np.float32)
    return (M @ S).astype(np.float32)


@dataclass
class EditorElement:
    """PreviewerLoader::Element (previewer.h:16-66): name, material, texture
    paths per slot (empty string = none)."""
    name: str = ""
    material: MaterialSpec = field(default_factory=MaterialSpec)
    texture_paths: list = field(default_factory=lambda: [""] * NUM_TEX_SLOTS)


@dataclass
class EditorObject:
    """PreviewerLoader::Object (previewer.h:68-153): TRS → model matrix M
    (tracer space) and the X-mirrored Mpreview (GL preview space)."""
    name: str = ""
    filename: str = ""
    elements: list = field(default_factory=list)
    location: tuple = (0.0, 0.0, 0.0)
    rotation: tuple = (0.0, 0.0, 0.0)
    scale: tuple = (1.0, 1.0, 1.0)
    scale_locked: bool = True

    def matrix(self) -> np.ndarray:
        """M = T · Rx · Ry · Rz · S (previewer.h:104-111)."""
        M = _translate(self.location)
        M = _rotate(M, self.rotation[0], (1, 0, 0))
        M = _rotate(M, self.rotation[1], (0, 1, 0))
        M = _rotate(M, self.rotation[2], (0, 0, 1))
        return _scale(M, self.scale)

    def matrix_preview(self) -> np.ndarray:
        """Mpreview: −x location, −y/−z rotation (previewer.h:113-121)."""
        loc = (-self.location[0], self.location[1], self.location[2])
        rot = (self.rotation[0], -self.rotation[1], -self.rotation[2])
        M = _translate(loc)
        M = _rotate(M, rot[0], (1, 0, 0))
        M = _rotate(M, rot[1], (0, 1, 0))
        M = _rotate(M, rot[2], (0, 0, 1))
        return _scale(M, self.scale)


class EditorScene:
    """Mutable editing session; build_scene() snapshots to tracer arrays."""

    def __init__(self):
        self.objects: list[EditorObject] = []
        # camera state (previewer.cpp:8-16 defaults)
        self.cam_pos = np.array([0.0, 0.0, -10.0], np.float32)
        self.cam_dir = np.array([0.0, 0.0, 1.0], np.float32)
        self.cam_up = np.array([0.0, 1.0, 0.0], np.float32)
        self.cam_rot = np.zeros(3, np.float32)
        self.cam_focal = 0.05
        self.cam_fovy = 70.0
        self.cam_focal_dist = 5.0
        self.cam_f = 32.0
        # selection/highlight state (previewer element flags)
        self.selected: tuple | None = None      # (obj_id, elem_id) or None
        self.highlighted: tuple | None = None
        # missing-asset redirection map: original path → replacement
        self.redirects: dict[str, str] = {}

    # -- objects ----------------------------------------------------------
    def load_object(self, filename: str, obj_id: int | None = None) -> bool:
        """Load (or reload at ``obj_id``) an OBJ; returns success."""
        path = self.redirects.get(filename, filename)
        if not os.path.isfile(path):
            return False
        try:
            tris = load_object_triangles(path)
        except Exception:
            return False
        obj = EditorObject(
            name=tris["object_name"], filename=filename,
            elements=[EditorElement(name=n) for n in tris["element_names"]])
        if obj_id is None or obj_id >= len(self.objects):
            self.objects.append(obj)
        else:
            # replace geometry, keep TRS (ReplaceObject, previewer.cpp:1006)
            old = self.objects[obj_id]
            obj.location, obj.rotation, obj.scale = (
                old.location, old.rotation, old.scale)
            self.objects[obj_id] = obj
        return True

    def delete_object(self, obj_id: int):
        del self.objects[obj_id]
        self.selected = None
        self.highlighted = None

    def replace_object(self, obj_id: int, filename: str) -> bool:
        return self.load_object(filename, obj_id)

    def rename_object(self, obj_id: int, name: str):
        self.objects[obj_id].name = name

    def rename_element(self, obj_id: int, elem_id: int, name: str):
        self.objects[obj_id].elements[elem_id].name = name

    # -- transforms -------------------------------------------------------
    def set_location(self, obj_id: int, v):
        self.objects[obj_id].location = tuple(float(x) for x in v)

    def set_rotation(self, obj_id: int, v):
        self.objects[obj_id].rotation = tuple(float(x) for x in v)

    def set_scale(self, obj_id: int, v):
        """Locked-aspect scaling (previewer.cpp:714-750): with the lock on, a
        change to one axis rescales the others proportionally."""
        obj = self.objects[obj_id]
        old = obj.scale
        v = [float(x) for x in v]
        if obj.scale_locked:
            for i in range(3):
                if abs(v[i] - old[i]) > 1e-12 and old[i] != 0:
                    ratio = v[i] / old[i]
                    v = [s * ratio for s in old]
                    v[i] = old[i] * ratio
                    break
        v = [max(x, 0.001) for x in v]     # min clamp (previewer.cpp:752-766)
        obj.scale = tuple(v)

    def set_scale_direct(self, obj_id: int, v):
        """SetScaleDirect (previewer.cpp:752-768): no aspect lock."""
        self.objects[obj_id].scale = tuple(max(float(x), 0.001) for x in v)

    # -- materials & textures ---------------------------------------------
    def set_material(self, obj_id: int, elem_id: int, material: MaterialSpec):
        self.objects[obj_id].elements[elem_id].material = material

    def get_material(self, obj_id: int, elem_id: int) -> MaterialSpec:
        return self.objects[obj_id].elements[elem_id].material

    def set_texture(self, obj_id: int, elem_id: int, slot, path: str):
        """slot: index 0-5 or name in TEX_SLOT_NAMES."""
        if isinstance(slot, str):
            slot = TEX_SLOT_NAMES.index(slot)
        self.objects[obj_id].elements[elem_id].texture_paths[slot] = path

    # -- selection (scene-tree / mouse-picking parity) --------------------
    def select(self, obj_id: int | None, elem_id: int | None = None):
        self.selected = None if obj_id is None else (obj_id, elem_id)

    def highlight(self, obj_id: int | None, elem_id: int | None = None):
        self.highlighted = None if obj_id is None else (obj_id, elem_id)

    # -- camera -----------------------------------------------------------
    def set_camera(self, pos, dir=None, up=None):
        self.cam_pos = np.asarray(pos, np.float32)
        if dir is not None:
            d = np.asarray(dir, np.float32)
            self.cam_dir = d / np.linalg.norm(d)
        if up is not None:
            u = np.asarray(up, np.float32)
            self.cam_up = u / np.linalg.norm(u)

    def rotate_camera(self, rotation):
        """RotateCamera (previewer.cpp:883-901): components wrapped into
        [0, 360) then used as *radians* in Rz·Ry·Rx — quirk preserved."""
        r = [math.fmod(float(a), 360.0) for a in rotation]
        r = [a + 360.0 if a < 0 else a for a in r]
        self.cam_rot = np.asarray(r, np.float32)
        M = _rotate(_rotate(_rotate(np.eye(4, dtype=np.float32),
                                    r[2], (0, 0, 1)),
                            r[1], (0, 1, 0)),
                    r[0], (1, 0, 0))
        d = (M @ np.array([0, 0, 1, 1], np.float32))[:3]
        u = (M @ np.array([0, 1, 0, 1], np.float32))[:3]
        self.cam_dir = d / np.linalg.norm(d)
        self.cam_up = u / np.linalg.norm(u)

    def set_camera_f(self, f_number: float):
        self.cam_f = float(f_number)

    def set_camera_focal_dist(self, dist: float):
        self.cam_focal_dist = float(dist)

    def move_camera(self, forward=0.0, right=0.0, dt=1.0, speed=1.0):
        """WASD-style fly navigation (Idle, main.cpp:2987-3018): displacement
        = speed² · dt along view/right axes."""
        step = speed * speed * dt
        right_axis = np.cross(self.cam_up, self.cam_dir)
        right_axis = right_axis / np.linalg.norm(right_axis)
        self.cam_pos = (self.cam_pos + self.cam_dir * (forward * step)
                        + right_axis * (right * step)).astype(np.float32)

    # -- missing assets ----------------------------------------------------
    def scan_missing_assets(self, filenames) -> list:
        """Pre-scan pass (LoadObjectPathsFromSceneFile, main.cpp:441-604):
        returns the paths that fail to resolve."""
        missing = []
        for f in filenames:
            p = self.redirects.get(f, f)
            if not os.path.isfile(p):
                missing.append(f)
        return missing

    def redirect(self, original: str, replacement: str):
        """Asset redirection (GuiRedirObjectsWindow, main.cpp:2540-2636)."""
        self.redirects[original] = replacement

    # -- bridge to tracer (SendObjectsToPathTracer) ------------------------
    def build_scene(self) -> Scene:
        """Re-load every OBJ with its baked model matrix, snapshot materials
        and textures, build light list (previewer.cpp:770-817 + BuildBVH)."""
        cache = TextureCache()
        parts = []
        materials = []
        mat_table = {}     # (obj_id, elem_id) -> material row
        for oi, obj in enumerate(self.objects):
            path = self.redirects.get(obj.filename, obj.filename)
            tris = load_object_triangles(path, obj.matrix(), object_id=oi)
            n_elem = len(tris["element_names"])
            # material rows for this object's elements
            for ei in range(n_elem):
                elem = (obj.elements[ei] if ei < len(obj.elements)
                        else EditorElement())
                spec = elem.material
                tex_idx = [cache.add(p) if p else -1
                           for p in elem.texture_paths]
                row = len(materials)
                materials.append(dataclasses.replace(
                    spec, tex_index=tuple(tex_idx)))
                mat_table[(oi, ei)] = row
            mat_id = np.array([mat_table[(oi, int(e))]
                               for e in tris["element_id"]], np.int32)
            tris["mat_id"] = mat_id
            parts.append(tris)

        if not parts:
            # empty scene: a single degenerate triangle keeps shapes valid
            geom = pack_geometry({
                "v0": np.zeros((1, 3), np.float32),
                "v1": np.zeros((1, 3), np.float32),
                "v2": np.zeros((1, 3), np.float32)})
            return finalize_scene(geom, pack_materials([MaterialSpec()]))

        keys = ["v0", "v1", "v2", "n0", "n1", "n2", "uv0", "uv1", "uv2",
                "smoothing", "mat_id", "object_id", "element_id"]
        merged = {k: np.concatenate([p[k] for p in parts]) for k in keys}
        geom = pack_geometry(merged)
        textures = pack_textures(cache.images)
        return finalize_scene(geom, pack_materials(materials), textures)

    def tracer_camera(self) -> Camera:
        """SetPathTracerCamera (previewer.cpp:924-930):
        aperture = focal / F."""
        return Camera.make(
            pos=self.cam_pos, dir=self.cam_dir, up=self.cam_up,
            focal=self.cam_focal, fovy=self.cam_fovy,
            focal_dist=self.cam_focal_dist,
            aperture=self.cam_focal / self.cam_f)

    def triangle_count(self) -> int:
        """Status-bar triangle counter (previewer.cpp:932-941)."""
        total = 0
        for obj in self.objects:
            path = self.redirects.get(obj.filename, obj.filename)
            try:
                from .obj_loader import parse_obj
                total += parse_obj(path).num_triangles
            except OSError:
                pass
        return total
