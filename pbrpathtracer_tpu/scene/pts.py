""".pts scene-file persistence — format parity with the reference
(main.cpp: LoadScene :261-438, SaveAt :646-699, CompareVersions :203-228,
GetResolutionFromSceneFile :230-259).

Text format, version "2.1.0", minimum readable "2.0.0":

    Path Tracer Scene File
    Version=2.1.0
    <traceDepth>
    <wRender> <hRender>
    <autoRes 0|1>
    <cam pos x y z>
    <cam rot x y z>
    <focalDist>
    <F>
    <numObjects>
    per object: filename / name / loc xyz / rot xyz / scale xyz / numElements
      per element: name / diffuse3 / specular3 / emissive3 / emissiveIntensity
                   / type / roughness / reflectiveness / translucency / ior
                   / 6 texture-path lines (diffuse normal emissive roughness
                     metallic opacity; empty = none)

Known reference asymmetry (SURVEY.md §2): the reference's SaveAt omits
``translucency`` and writes only the normal-texture line, so its own saves
don't round-trip. ``save_pts`` writes the full loadable form by default;
``compat_quirk=True`` reproduces the reference's lossy output byte-for-byte
shape-wise for parity testing.
"""

from __future__ import annotations

import dataclasses
import io
import os

from ..utils.constants import NUM_TEX_SLOTS
from .scene import MaterialSpec
from .editor import EditorScene, EditorObject, EditorElement

HEADER = "Path Tracer Scene File"
VERSION = "2.1.0"
MIN_VERSION = "2.0.0"


def compare_versions(a: str, b: str) -> int:
    """CompareVersions (main.cpp:203-228): numeric, dot-separated."""
    pa = [int(x) for x in a.split(".") if x.strip().isdigit()]
    pb = [int(x) for x in b.split(".") if x.strip().isdigit()]
    for i in range(max(len(pa), len(pb))):
        va = pa[i] if i < len(pa) else 0
        vb = pb[i] if i < len(pb) else 0
        if va != vb:
            return -1 if va < vb else 1
    return 0


class PtsError(ValueError):
    pass


class _Tok:
    """Mimics C++ ``operator>>`` (whitespace tokens) mixed with getline.

    ``rest`` is the unconsumed tail of the current line (None = no current
    line). After ``operator>>`` the newline is NOT consumed, so a following
    getline returns the (possibly empty) remainder of that line — exactly
    the C++ interop the reference's parser relies on (main.cpp:320,406).
    """

    def __init__(self, text: str):
        self.lines = text.split("\n")
        self.li = 0
        self.rest: str | None = None

    def getline(self) -> str:
        if self.rest is not None:
            r, self.rest = self.rest, None
            return r
        if self.li >= len(self.lines):
            raise PtsError("unexpected EOF")
        line = self.lines[self.li]
        self.li += 1
        return line.rstrip("\r")

    def token(self) -> str:
        while True:
            if self.rest is not None and self.rest.strip():
                parts = self.rest.strip().split(None, 1)
                self.rest = parts[1] if len(parts) > 1 else ""
                return parts[0]
            if self.li >= len(self.lines):
                raise PtsError("unexpected EOF")
            self.rest = self.lines[self.li].rstrip("\r")
            self.li += 1

    def f(self) -> float:
        return float(self.token())

    def i(self) -> int:
        return int(self.token())


def load_pts(path: str, editor: EditorScene | None = None,
             load_objects: bool = True):
    """Parse a .pts file.

    Returns (editor, settings) where settings = dict(trace_depth, width,
    height, auto_res). When ``load_objects`` the OBJ files are parsed into
    the editor (missing files are recorded, not fatal — redirection flow)."""
    with open(path, "r", errors="replace") as fh:
        text = fh.read()
    tok = _Tok(text)
    if tok.getline() != HEADER:
        raise PtsError("not a Path Tracer Scene File")
    vline = tok.getline()
    version = vline.split("=", 1)[1] if "=" in vline else ""
    if compare_versions(version, MIN_VERSION) < 0:
        raise PtsError(f"file version {version} < minimum {MIN_VERSION}")

    editor = editor if editor is not None else EditorScene()
    settings = {}
    settings["trace_depth"] = tok.i()
    settings["width"] = tok.i()
    settings["height"] = tok.i()
    settings["auto_res"] = bool(tok.i())

    pos = (tok.f(), tok.f(), tok.f())
    rot = (tok.f(), tok.f(), tok.f())
    editor.set_camera(pos)
    editor.rotate_camera(rot)
    editor.set_camera_focal_dist(tok.f())
    editor.set_camera_f(tok.f())

    n_objs = tok.i()
    tok.getline()       # consume EOL after the count (main.cpp:320)
    missing = []
    for i in range(n_objs):
        filename = tok.getline()
        ok = editor.load_object(filename) if load_objects else False
        if load_objects and not ok:
            missing.append(filename)
            # placeholder keeps indices aligned (redirection flow re-loads)
            editor.objects.append(EditorObject(filename=filename))
        name = tok.getline()
        editor.objects[i].name = name
        editor.set_location(i, (tok.f(), tok.f(), tok.f()))
        editor.set_rotation(i, (tok.f(), tok.f(), tok.f()))
        editor.set_scale_direct(i, (tok.f(), tok.f(), tok.f()))
        n_elems = tok.i()
        tok.getline()
        for j in range(n_elems):
            ename = tok.getline()
            m = MaterialSpec()
            diffuse = (tok.f(), tok.f(), tok.f())
            specular = (tok.f(), tok.f(), tok.f())
            emissive = (tok.f(), tok.f(), tok.f())
            intensity = tok.f()
            mtype = tok.i()
            rough = tok.f()
            refl = tok.f()
            transl = tok.f()
            ior = tok.f()
            m = dataclasses.replace(
                m, diffuse=diffuse, specular=specular, emissive=emissive,
                emissive_intensity=intensity, mat_type=mtype,
                roughness=rough, reflectiveness=refl, translucency=transl,
                ior=ior)
            tok.getline()   # consume EOL (main.cpp:406)
            tex_paths = [tok.getline() for _ in range(NUM_TEX_SLOTS)]
            while len(editor.objects[i].elements) <= j:
                editor.objects[i].elements.append(EditorElement())
            editor.objects[i].elements[j].name = ename
            editor.objects[i].elements[j].material = m
            editor.objects[i].elements[j].texture_paths = [
                p if p.strip() else "" for p in tex_paths]
    settings["missing_objects"] = missing
    return editor, settings


def save_pts(path: str, editor: EditorScene, settings: dict | None = None,
             compat_quirk: bool = False):
    """Write a .pts file (SaveAt, main.cpp:646-699).

    Default: full-fidelity loadable form. ``compat_quirk``: reproduce the
    reference 2.1.0 writer's omissions (no translucency, normal-tex only)."""
    s = settings or {}
    out = io.StringIO()
    w = out.write
    w(f"{HEADER}\nVersion={VERSION}\n")
    w(f"{s.get('trace_depth', 3)}\n")
    w(f"{s.get('width', 1024)} {s.get('height', 768)}\n")
    w(f"{int(s.get('auto_res', True))}\n")
    p = editor.cam_pos
    w(f"{_g(p[0])} {_g(p[1])} {_g(p[2])}\n")
    r = editor.cam_rot
    w(f"{_g(r[0])} {_g(r[1])} {_g(r[2])}\n")
    w(f"{_g(editor.cam_focal_dist)}\n{_g(editor.cam_f)}\n")
    w(f"{len(editor.objects)}\n")
    for obj in editor.objects:
        w(f"{obj.filename}\n{obj.name}\n")
        for v in (obj.location, obj.rotation, obj.scale):
            w(f"{_g(v[0])} {_g(v[1])} {_g(v[2])}\n")
        w(f"{len(obj.elements)}\n")
        for el in obj.elements:
            m = el.material
            w(f"{el.name}\n")
            for v in (m.diffuse, m.specular, m.emissive):
                w(f"{_g(v[0])} {_g(v[1])} {_g(v[2])}\n")
            w(f"{_g(m.emissive_intensity)}\n{int(m.mat_type)}\n")
            w(f"{_g(m.roughness)}\n{_g(m.reflectiveness)}\n")
            if compat_quirk:
                # reference SaveAt:688-691 — translucency dropped, only the
                # normal texture path saved
                w(f"{_g(m.ior)}\n")
                w(f"{el.texture_paths[1]}\n")
            else:
                w(f"{_g(m.translucency)}\n{_g(m.ior)}\n")
                for t in el.texture_paths:
                    w(f"{t}\n")
    with open(path, "w") as fh:
        fh.write(out.getvalue())


def _g(x: float) -> str:
    """C++ default ostream float formatting (6 significant digits)."""
    return f"{float(x):g}"


def get_resolution_from_scene_file(path: str):
    """GetResolutionFromSceneFile (main.cpp:230-259): header + version gate,
    then (depth), w, h. Returns (w, h) or None."""
    try:
        with open(path, "r", errors="replace") as fh:
            text = fh.read()
        tok = _Tok(text)
        if tok.getline() != HEADER:
            return None
        vline = tok.getline()
        version = vline.split("=", 1)[1] if "=" in vline else ""
        if compare_versions(version, MIN_VERSION) < 0:
            return None
        tok.i()   # trace depth
        return (tok.i(), tok.i())
    except (OSError, PtsError, ValueError):
        return None
