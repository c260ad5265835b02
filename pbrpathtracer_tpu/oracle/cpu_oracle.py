"""Reference-faithful CPU oracle.

A scalar (per-path) numpy re-implementation of the reference's recursive
renderer — RenderFrame/Trace/Hit/DirectIllumimation semantics transcribed
from /root/reference/PathTracing/src/pathtracer.cpp:373-817 — but consuming
the SAME keyed counter RNG as the JAX wavefront renderer (ops/rng.py) and
the same statically-bounded opacity/segment caps.

Purpose (SURVEY.md §4): the reference has no tests and its own RNG is a
data-race, so parity is *defined* against this oracle: identical keys ⇒
identical decision trees ⇒ the wavefront image must match this one up to
float-associativity noise. Tests in tests/ assert that.

This module intentionally mirrors branch-by-branch the C++ control flow
(including its biased estimators and quirks) rather than sharing code with
the vectorized renderer — two independent implementations is the point.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops import rng
from ..utils.constants import (
    EPS, FLT_EPSILON, OPAQUE,
    TEX_DIFFUSE, TEX_NORMAL, TEX_EMISSIVE, TEX_ROUGHNESS, TEX_METALLIC,
    TEX_OPACITY, NO_TEXTURE,
)


def _np(x):
    return np.asarray(x)


@dataclasses.dataclass
class OracleScene:
    """Numpy mirror of the Scene pytree."""
    v0: np.ndarray
    e1: np.ndarray
    e2: np.ndarray
    n0: np.ndarray
    n1: np.ndarray
    n2: np.ndarray
    uv0: np.ndarray
    uv1: np.ndarray
    uv2: np.ndarray
    normal: np.ndarray
    tangent: np.ndarray
    bitangent: np.ndarray
    smoothing: np.ndarray
    mat_id: np.ndarray
    mat_type: np.ndarray
    diffuse: np.ndarray
    specular: np.ndarray
    emissive: np.ndarray
    emissive_intensity: np.ndarray
    roughness: np.ndarray
    reflectiveness: np.ndarray
    translucency: np.ndarray
    ior: np.ndarray
    tex_index: np.ndarray
    tex_data: np.ndarray
    tex_size: np.ndarray
    lights: np.ndarray

    @classmethod
    def from_scene(cls, scene):
        g, m, t = scene.geom, scene.materials, scene.textures
        return cls(
            v0=_np(g.v0), e1=_np(g.e1), e2=_np(g.e2),
            n0=_np(g.n0), n1=_np(g.n1), n2=_np(g.n2),
            uv0=_np(g.uv0), uv1=_np(g.uv1), uv2=_np(g.uv2),
            normal=_np(g.normal), tangent=_np(g.tangent),
            bitangent=_np(g.bitangent),
            smoothing=_np(g.smoothing), mat_id=_np(g.mat_id),
            mat_type=_np(m.mat_type), diffuse=_np(m.diffuse),
            specular=_np(m.specular), emissive=_np(m.emissive),
            emissive_intensity=_np(m.emissive_intensity),
            roughness=_np(m.roughness),
            reflectiveness=_np(m.reflectiveness),
            translucency=_np(m.translucency), ior=_np(m.ior),
            tex_index=_np(m.tex_index), tex_data=_np(t.data),
            tex_size=_np(t.size), lights=_np(scene.lights),
        )


def _normalize(v):
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


class Oracle:
    def __init__(self, scene, camera, cfg):
        self.s = OracleScene.from_scene(scene)
        self.cam_pos = _np(camera.pos).astype(np.float32)
        self.cam_dir = _np(camera.dir).astype(np.float32)
        self.cam_up = _np(camera.up).astype(np.float32)
        self.cam_focal = float(camera.focal)
        self.cam_fovy = float(camera.fovy)
        self.cam_focal_dist = float(camera.focal_dist)
        self.cam_aperture = float(camera.aperture)
        self.cfg = cfg
        self.seed = np.uint32(cfg.seed)

    # -- RNG ---------------------------------------------------------------
    def _rand(self, pixel, sample, stream, slot):
        return float(rng.rand_slot(self.seed, np.uint32(pixel),
                                   np.uint32(sample), np.uint32(stream),
                                   np.uint32(slot)))

    # -- texturing (image.cpp:63-86) --------------------------------------
    def _tex2d(self, tex_idx, uv):
        w, h = self.s.tex_size[tex_idx]
        u = np.float32(uv[0]) % np.float32(1.0)
        v = np.float32(uv[1]) % np.float32(1.0)
        x = min(int(np.float32(w) * u), w - 1)
        y = min(int(np.float32(h) * v), h - 1)
        return self.s.tex_data[tex_idx, y, x]

    # -- intersection (pathtracer.cpp:373-409) -----------------------------
    def _closest(self, ro, rd, t_lower):
        s = self.s
        h = np.cross(np.broadcast_to(rd, s.e2.shape), s.e2)
        a = np.sum(s.e1 * h, axis=-1)
        denom_ok = np.abs(a) >= EPS
        with np.errstate(divide="ignore", invalid="ignore"):
            f = np.where(denom_ok, 1.0 / np.where(denom_ok, a, 1.0), 0.0)
        sv = ro - s.v0
        u = f * np.sum(sv * h, axis=-1)
        q = np.cross(sv, s.e1)
        v = f * np.sum(rd * q, axis=-1)
        t = f * np.sum(s.e2 * q, axis=-1)
        valid = (denom_ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
                 & (t > EPS) & (t > t_lower))
        if not valid.any():
            return None
        t_m = np.where(valid, t, np.float32(3e38))
        i = int(np.argmin(t_m))
        return i, float(t_m[i]), float(u[i]), float(v[i])

    def _hit_query(self, ro, rd, pixel, sample, stream, slot_base):
        """Closest hit with stochastic alpha (matches ops/hit.closest_hit)."""
        s = self.s
        t_lower = 0.0
        cand = self._closest(ro, rd, t_lower)
        for attempt in range(self.cfg.opacity_attempts):
            if cand is None:
                return None
            i, t, u, v = cand
            otex = s.tex_index[s.mat_id[i], TEX_OPACITY]
            if otex == NO_TEXTURE:
                return cand
            if attempt == self.cfg.opacity_attempts - 1:
                return cand
            uv = self._uv(i, u, v)
            opacity = float(self._tex2d(otex, uv)[0])
            draw = self._rand(pixel, sample, stream, slot_base + attempt)
            if draw < opacity:
                return cand
            t_lower = t
            cand = self._closest(ro, rd, t_lower)
        return cand

    def _uv(self, i, u, v):
        s = self.s
        return ((1.0 - u - v) * s.uv0[i] + u * s.uv1[i] + v * s.uv2[i])

    # -- sampling helpers --------------------------------------------------
    def _cone(self, basis, last_axis, nx, thresh, w, theta):
        e0 = (np.array([1.0, 0, 0], np.float32) if abs(nx) < thresh
              else np.array([1.0, 1, 1], np.float32))
        u = _normalize(np.cross(e0, basis))
        v = _normalize(np.cross(u, basis))
        ang = 2.0 * np.pi * theta
        d = (w * np.cos(ang) * u + w * np.sin(ang) * v
             + np.sqrt(max(1.0 - w * w, 0.0)) * last_axis)
        return _normalize(d)

    # -- NEE (pathtracer.cpp:504-531) --------------------------------------
    def _direct(self, p, n, diffuse, pixel, sample, stream):
        s = self.s
        L = len(s.lights)
        if L == 0:
            return np.zeros(3, np.float32)
        u_pick = self._rand(pixel, sample, stream, rng.SLOT_NEE_LIGHT)
        lid = min(max(int(np.floor(u_pick * L)), 0), L - 1)
        ltri = int(s.lights[lid])
        lv0 = s.v0[ltri]
        lv1 = lv0 + s.e1[ltri]
        lv2 = lv0 + s.e2[ltri]
        su = np.sqrt(self._rand(pixel, sample, stream, rng.SLOT_NEE_U))
        sv = self._rand(pixel, sample, stream, rng.SLOT_NEE_V)
        vlight = ((1.0 - su) * lv0 + su * (1.0 - sv) * lv1 + su * sv * lv2)
        l = _normalize(vlight - p)
        cos_n = float(np.dot(n, l))
        if cos_n <= 0.0:
            return np.zeros(3, np.float32)
        hit = self._hit_query(p, l, pixel, sample, stream,
                              rng.SLOT_NEE_OPACITY_BASE)
        if hit is not None and hit[0] != ltri:
            return np.zeros(3, np.float32)
        lmid = s.mat_id[ltri]
        lcolor = s.emissive[lmid] * s.emissive_intensity[lmid]
        contrib = lcolor * diffuse * cos_n
        if self.cfg.nee_physical:
            cr = np.cross(s.e1[ltri], s.e2[ltri])
            area = 0.5 * np.linalg.norm(cr)
            r2 = max(float(np.sum((vlight - p) ** 2)), 1e-12)
            cos_l = abs(float(np.dot(_normalize(cr), l)))
            contrib = contrib * (L * area * cos_l / r2) / np.pi
        return contrib

    # -- Trace (pathtracer.cpp:545-732) ------------------------------------
    def _trace(self, ro, rd, depth, itr, inside, seg, pixel, sample):
        cfg = self.cfg
        if seg >= cfg.resolved_max_segments():
            return np.zeros(3, np.float32)
        s = self.s
        stream = rng.bounce_stream(seg)
        hit = self._hit_query(ro, rd, pixel, sample, stream,
                              rng.SLOT_OPACITY_BASE)
        if hit is None:
            return np.zeros(3, np.float32)
        i, t, bu, bv = hit
        mid = s.mat_id[i]
        p = ro + rd * t
        uv = self._uv(i, bu, bv)
        n = s.normal[i]
        if s.smoothing[i]:
            n = _normalize((1.0 - bu - bv) * s.n0[i] + bu * s.n1[i]
                           + bv * s.n2[i])
        ntex = s.tex_index[mid, TEX_NORMAL]
        if ntex != NO_TEXTURE:
            nt = self._tex2d(ntex, uv)[:3] * 2.0 - 1.0
            if nt[2] <= 0.0:
                nt = np.array([nt[0], nt[1], EPS], np.float32)
            nt = _normalize(nt)
            n = _normalize(nt[0] * s.tangent[i] + nt[1] * s.bitangent[i]
                           + nt[2] * n)
        if np.dot(n, rd) > 0.0:
            n = -n
        p = p + n * EPS

        if itr >= cfg.max_depth:
            return np.zeros(3, np.float32)

        diffuse = s.diffuse[mid].copy()
        dtex = s.tex_index[mid, TEX_DIFFUSE]
        if dtex != NO_TEXTURE:
            diffuse = self._tex2d(dtex, uv)[:3]
        emiss = s.emissive[mid].copy()
        etex = s.tex_index[mid, TEX_EMISSIVE]
        if etex != NO_TEXTURE:
            emiss = self._tex2d(etex, uv)[:3]
        roughness = float(s.roughness[mid])
        rtex = s.tex_index[mid, TEX_ROUGHNESS]
        if rtex != NO_TEXTURE:
            roughness = float(self._tex2d(rtex, uv)[0])
        reflectiveness = float(s.reflectiveness[mid])
        mtex = s.tex_index[mid, TEX_METALLIC]
        if mtex != NO_TEXTURE:
            reflectiveness = float(self._tex2d(mtex, uv)[0])

        depth += 1
        itr += 1
        prob = min(0.95, float(np.max(s.diffuse[mid])))  # untextured diffuse
        rr_w = 1.0
        if depth >= cfg.max_depth:
            if self._rand(pixel, sample, stream, rng.SLOT_RR) > prob:
                return np.zeros(3, np.float32)
            if cfg.rr_reweight:
                rr_w = 1.0 / max(prob, 1e-6)

        r = rd - 2.0 * np.dot(rd, n) * n
        emitted = emiss * s.emissive_intensity[mid]
        w_l = self._rand(pixel, sample, stream, rng.SLOT_LOBE_W)
        th_l = self._rand(pixel, sample, stream, rng.SLOT_LOBE_THETA)

        def spec_lobe():
            if roughness == 1.0:
                return self._cone(n, n, n[0], 1.0 - EPS, w_l, th_l)
            if roughness == 0.0:
                return r
            return self._cone(r, r, n[0], 1.0 - FLT_EPSILON,
                              w_l * roughness, th_l)

        if s.mat_type[mid] == OPAQUE:
            u_sel = self._rand(pixel, sample, stream, rng.SLOT_LOBE_SELECT)
            if u_sel < reflectiveness:
                d = spec_lobe()
                rec = self._trace(p, d, depth, itr - 1, inside, seg + 1,
                                  pixel, sample)
                return rr_w * (emitted + rec * s.specular[mid])
            d = self._cone(n, n, n[0], 1.0 - EPS, w_l, th_l)
            nee = self._direct(p, n, diffuse, pixel, sample, stream)
            rec = self._trace(p, d, depth, itr, inside, seg + 1,
                              pixel, sample)
            return rr_w * (emitted + nee + rec * diffuse)

        # TRANSLUCENT (pathtracer.cpp:641-727)
        refract_n = n
        if roughness != 0.0:
            w_rc = self._rand(pixel, sample, stream, rng.SLOT_REFRACT_CONE_W)
            th_rc = self._rand(pixel, sample, stream,
                               rng.SLOT_REFRACT_CONE_THETA)
            refract_n = self._cone(r, n, n[0], 1.0 - FLT_EPSILON,
                                   w_rc * roughness, th_rc)
        ior = float(s.ior[mid])
        eta = ior if inside else 1.0 / ior
        r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
        c = abs(float(np.dot(rd, refract_n)))
        k = 1.0 - eta * eta * (1.0 - c * c)
        refract = False
        if k >= 0.0:
            re = r0 + (1.0 - r0) * (1.0 - c) * (1.0 - c)
            if self._rand(pixel, sample, stream, rng.SLOT_FRESNEL) < re:
                refract = False
            elif (self._rand(pixel, sample, stream, rng.SLOT_REFLECTIVENESS)
                  < reflectiveness):
                refract = False
            else:
                refract = True
        if not refract:
            d = spec_lobe()
            rec = self._trace(p, d, depth, itr - 1, inside, seg + 1,
                              pixel, sample)
            return rr_w * (emitted + rec * s.specular[mid])
        if (self._rand(pixel, sample, stream, rng.SLOT_TRANSLUCENCY)
                < float(s.translucency[mid])):
            d = _normalize(eta * rd
                           - (eta * np.dot(n, rd) + np.sqrt(k)) * refract_n)
            rec = self._trace(p - n * EPS * 2.0, d, depth, itr - 1,
                              not inside, seg + 1, pixel, sample)
            return rr_w * (emitted + rec * diffuse)
        d = self._cone(n, n, n[0], 1.0 - EPS, w_l, th_l)
        nee = self._direct(p, n, diffuse, pixel, sample, stream)
        rec = self._trace(p, d, depth, itr, inside, seg + 1, pixel, sample)
        return rr_w * (emitted + nee + rec * diffuse)

    # -- RenderFrame (pathtracer.cpp:741-817) ------------------------------
    def render_sample(self, sample_idx):
        cfg = self.cfg
        W, H = cfg.width, cfg.height
        img = np.zeros((H, W, 3), np.float32)

        img_center = self.cam_pos + self.cam_dir * self.cam_focal
        img_h = 2.0 * self.cam_focal * np.tan((self.cam_fovy / 2.0)
                                              * np.pi / 180.0)
        aspect = W / H
        img_w = img_h * aspect
        dx, dy = img_w / W, img_h / H
        cam_right = _normalize(np.cross(self.cam_up, self.cam_dir))
        top_left = (img_center - cam_right * (img_w * 0.5)
                    + self.cam_up * (img_h * 0.5))

        for row in range(H):
            for col in range(W):
                pixel = row * W + col
                pix = (top_left - self.cam_up * (row * dy)
                       + cam_right * (col * dx))
                rd = _normalize(pix - self.cam_pos)
                # thin-lens DOF (pathtracer.cpp:787-791)
                u_a = self._rand(pixel, sample_idx, rng.STREAM_CAMERA,
                                 rng.SLOT_LENS_ANGLE)
                u_r = self._rand(pixel, sample_idx, rng.STREAM_CAMERA,
                                 rng.SLOT_LENS_RADIUS)
                ang = u_a * 2.0 * np.pi
                rad = np.sqrt(u_r)
                off = np.array([np.cos(ang), np.sin(ang)]) * rad \
                    * self.cam_aperture
                focal_pt = self.cam_pos + rd * self.cam_focal_dist
                ro = self.cam_pos + cam_right * off[0] + self.cam_up * off[1]
                rd = _normalize(focal_pt - ro)
                img[row, col] = self._trace(
                    ro.astype(np.float32), rd.astype(np.float32),
                    0, 0, False, 0, pixel, sample_idx)
        return img

    def render(self, spp=None):
        spp = spp if spp is not None else self.cfg.spp
        acc = np.zeros((self.cfg.height, self.cfg.width, 3), np.float32)
        for k in range(spp):
            acc += self.render_sample(k)
        return acc / spp
