"""Render configuration — replaces the reference's GUI-state globals
(main.cpp:78-136: trace depth, resolution, auto-res, target samples, camera
F / focal-dist, nav speed) with an explicit static dataclass. Static fields
participate in jit specialization (shapes / loop bounds / feature gates)."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    # Image (main.cpp:50-51 defaults 1024x768; depth default pathtracer.cpp:15)
    width: int = 1024
    height: int = 768
    max_depth: int = 3          # trace depth, GUI range 1-10 (main.cpp:1463-1512)
    spp: int = 1                # samples per render_step pass (reference: 1/pass)
    seed: int = 0

    # Wavefront loop bound. The reference's specular/refraction bounces refund
    # the ``iter`` depth budget (pathtracer.cpp:625,701,711) so specular chains
    # are bounded only by Russian roulette; a fixed cap replaces the unbounded
    # recursion (SURVEY.md §7 hard-part 1). The oracle uses the same cap, so
    # parity is exact by construction.
    max_segments: int | None = None

    # Stochastic-opacity re-trace attempts per hit query (Hit,
    # pathtracer.cpp:469-476 restarts traversal on alpha rejection; unbounded
    # there, statically bounded here).
    opacity_attempts: int = 4

    # Estimator-parity flags (SURVEY.md §7 hard-part 6). False reproduces the
    # reference's biased estimators exactly; True enables the corrected ones.
    rr_reweight: bool = False     # divide by survive-prob after RR (ref omits: pathtracer.cpp:588-594)
    nee_physical: bool = False    # area-pdf/r^2/num-lights weighting (ref omits: pathtracer.cpp:528-530)
    # Opaque specular lobe model: "reference" = the cone around the mirror
    # direction (pathtracer.cpp:606-623); "ggx" = importance-sampled GGX
    # microfacet (ops/ggx.py) — smooth roughness gradients for inverse
    # rendering. Diffuse/NEE/RR/translucent semantics are unchanged.
    brdf: str = "reference"

    # Intersector selection: "auto" picks brute-force matmul for small scenes
    # and the BVH wavefront for large ones.
    intersector: str = "auto"    # auto | pallas | matmul | classic | bvh
    bvh_threshold: int = 4096     # tri count above which auto uses the BVH
    use_pallas: bool = True       # let auto route through Pallas on TPU
    # How hit queries participate in reverse-mode AD:
    #   "recompute" (default) — the intersectors are stop-gradient'd (their
    #     discrete argmin detaches anyway) and shade recomputes (t, u, v)
    #     for the *winning* triangle in closed form, straight-through so the
    #     forward values stay bit-exact. Gradients flow to (ro, rd) AND to
    #     the winner's geometry through the shading pack. Crucially the
    #     opaque query (Pallas custom-call / BVH while_loop) is dead code in
    #     the backward, so jax.checkpoint's recompute elides it instead of
    #     re-running it per segment (measured ~33 ms -> see BENCH_r03).
    #   "winner" — custom VJP wrapper (ops/intersect_vjp.py): O(N) closed
    #     -form pullback to (ro, rd) only; custom_vjp is opaque to remat
    #     DCE, so the query re-runs inside the backward.
    #   "autodiff" — differentiate the raw intersector (matmul/classic
    #     only; the BVH while_loop has no reverse rule). Debug/baseline.
    hit_vjp: str = "recompute"
    # Rematerialization of the bounce-segment body under reverse AD:
    #   "auto" (default) — "off" when the segment loop is unrolled (XLA
    #   fuses residuals in place; measured 21.9 ms vs 32.0 ms with "hits"
    #   at 512² Cornell depth-4 on TPU), "hits" under lax.scan (the stash
    #   machinery makes full residuals 2x slower there);
    #   "hits" — recompute shading in the backward pass but keep the
    #   closest-hit query outputs as residuals (cheap [N] rows; skips
    #   re-running the intersection kernels);
    #   "all" — plain jax.checkpoint (recompute everything);
    #   "off" — stash all residuals (XLA default).
    remat_segments: str = "auto"

    # Segment-loop unrolling: "auto" fully unrolls on TPU when
    # rays x segments fits the residual budget (the dynamic_slice /
    # dynamic_update_slice residual-stash traffic of a rolled scan was
    # ~9 ms/step of the 36 ms fwd+bwd at 512² Cornell), else keeps the
    # rolled lax.scan (CPU tests, huge wavefronts). An int forces a factor.
    unroll_segments: int | str = "auto"
    # rays x segments ceiling for auto-unroll (10M lanes x ~100 B of live
    # residuals per lane ≈ 1 GB HBM — comfortable on a 16 GB chip).
    unroll_budget_lanes: int = 16 * 1024 * 1024
    # Forward-only hint: set by entry points that can never be
    # differentiated (session progressive passes, the chunked-dispatch
    # render loop). Drops the spp multiplier from the unroll budget —
    # forward renders stash no residuals, so multi-spp forward passes on
    # small scenes keep the measured-faster fully-unrolled segment loop.
    forward_only: bool = False

    # Watchdog-safe dispatch sizing for un-jitted render(): max samples per
    # device dispatch (None = auto from dispatch_pair_budget). The tunneled
    # v5e kills dispatches in the minutes range; ~25 s dispatches survive.
    max_spp_per_dispatch: int | None = None
    # Auto budget: (rays x padded tris) pair tests per dispatch. One 512^2
    # sample at 50k tris is 1.31e10 pairs and measures ~2.5 s on the v5e
    # (~5e9 dense-equivalent pairs/s). The tunneled worker kills long
    # dispatches and is flaky even at ~8 s (measured: 22 one-sample
    # ~2.5 s dispatches ran 64-in-a-row stable; 3-sample ~8 s dispatches
    # crashed the worker mid-run twice), so the budget targets ~2-3 s.
    # It is an upper bound: the list kernel's culling makes big scenes
    # cheaper than their dense pair count. Cornell-sized scenes stay
    # single-dispatch into the thousands of spp.
    dispatch_pair_budget: float = 1.5e10

    # Live-lane wavefront compaction (ops/compaction.py): reorder lanes
    # each segment; the Pallas intersectors then skip whole dead tiles.
    # "off" | "auto" | "sort" (one variadic stable sort of the state) |
    # "gather" (perm sort + per-column gathers). Semantically exact
    # either way (keyed RNG travels with the lane; ops/compaction.py on
    # the ULP caveat under whole-render jit). Auto is SCENE-DEPENDENT
    # (both measured on-chip):
    #   * small scenes (dense kernel route): OFF — 512² translucent
    #     depth-8: off 23.5 ms vs sort 52.7 ms (R4_EVIDENCE); in-kernel
    #     alive masking already skips dead-lane work there.
    #   * list-route scenes (> bvh_threshold tris): SORT with the
    #     (dead, octant, Morton) coherence key — the list kernel's
    #     per-tile candidate sets shrink with tile footprint, and
    #     scattered dead lanes otherwise keep every tile walking its
    #     candidates (r5: 50k-tri segment-1..3 bounce queries 164-255 ms
    #     unsorted vs 66-163 ms sorted; one ~3 ms state sort per segment
    #     amortizes over the segment's bounce+shadow+opacity queries).
    compact_wavefront: str = "auto"

    # Wavefront pixel ordering: "auto" | "block" | "scan". "block" lays
    # lanes out in 64x8-pixel blocks instead of scanline order, so each
    # 512-lane kernel tile covers a COMPACT image rectangle rather than a
    # full image row — the candidate-list kernel's per-tile chunk sets
    # (union over the tile's rays) shrink with the tile's spatial
    # footprint. Pure lane permutation: per-pixel results are bit-exact
    # (RNG is keyed by pixel id, not lane position); costs one [N,3]
    # gather at the end of the sample. "auto" = block on TPU for scenes
    # past bvh_threshold (where the list kernel is the hot path).
    pixel_order: str = "auto"

    # Structurally skip bounce segments once every lane is dead (lax.cond).
    # Big win for renders with dead tails (all routes, incl. BVH — the old
    # cond-around-while_loop MLIR lowering bug is fixed on this JAX
    # version; regression-pinned in tests/test_bvh.py).
    skip_dead_segments: bool = True

    def resolved_max_segments(self) -> int:
        if self.max_segments is not None:
            return self.max_segments
        return 2 * self.max_depth + 2

    def resolved_unroll(self, n_rays: int) -> int:
        """Segment-loop unroll factor for an n_rays wavefront.

        The auto budget counts residual lanes across the WHOLE differentiated
        program: under grad of a multi-sample loss, render_accumulate scans
        over spp and the unrolled remat-"off" residual stash multiplies by
        spp — so spp participates in the budget (high-spp gradient workloads
        fall back to the rolled scan + "hits" remat instead of OOMing).
        Forward-only paths (cfg.forward_only) stash no residuals and use
        the pure n_rays*segs budget."""
        if self.unroll_segments != "auto":
            return int(self.unroll_segments)
        import jax
        segs = self.resolved_max_segments()
        spp_factor = 1 if self.forward_only else max(self.spp, 1)
        if (jax.default_backend() == "tpu"
                and n_rays * segs * spp_factor <= self.unroll_budget_lanes):
            return segs
        return 1

    def resolved_pixel_order(self, scene) -> str:
        """Resolve pixel_order to "block"/"scan" for this scene."""
        if self.pixel_order != "auto":
            if self.pixel_order not in ("block", "scan"):
                raise ValueError(f"unknown pixel_order {self.pixel_order!r}")
            return self.pixel_order
        import jax
        if (jax.default_backend() == "tpu" and scene is not None
                and scene.num_triangles > self.bvh_threshold):
            return "block"
        return "scan"

    def resolved_compact(self, n_rays: int, scene=None) -> str:
        """Resolve compact_wavefront to a concrete mode ("off"/"sort"/
        "gather") for this wavefront (see compact_wavefront docstring
        for the measured scene-dependent auto policy)."""
        mode = self.compact_wavefront
        if mode == "auto":
            import jax
            if (jax.default_backend() == "tpu" and scene is not None
                    and scene.num_triangles > self.bvh_threshold):
                return "sort"
            return "off"
        if mode not in ("off", "sort", "gather"):
            raise ValueError(f"unknown compact_wavefront {mode!r}")
        return mode

    def resolved_remat(self, unroll: int, scene=None) -> str:
        """Remat policy given the resolved unroll factor (and the scene).

        "off" (stash all residuals) is only safe for SMALL scenes: the
        fully-unrolled flagship measured fastest with it (21.9 vs 32.0 ms),
        but the stash grows with every unfused intermediate — at 512²
        rays x 50k textured triangles the XLA:TPU compiler reported a
        79 GB HBM allocation (ladder rung 3's "TPU worker crashed"), where
        "hits" remat keeps residuals to the per-query output rows. Auto
        therefore picks "off" only when the segment loop is unrolled AND
        the scene is small (≤ bvh_threshold triangles), else "hits"."""
        if self.remat_segments != "auto":
            return self.remat_segments
        small_scene = (scene is not None
                       and scene.num_triangles <= self.bvh_threshold)
        if unroll >= self.resolved_max_segments() and small_scene:
            return "off"
        return "hits"

    def with_auto_segments(self, scene, tol: float = 1e-3) -> "RenderConfig":
        """Replace max_segments with suggest_max_segments(scene, ...)."""
        return self.replace(max_segments=suggest_max_segments(
            scene, self.max_depth, tol=tol))

    @property
    def num_pixels(self) -> int:
        return self.width * self.height

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


def suggest_max_segments(scene, max_depth: int, tol: float = 1e-3,
                         hard_cap: int = 128) -> int:
    """Auto-size the wavefront segment cap from RR survival statistics.

    The reference's specular/refraction bounces refund the iter budget, so
    mirror chains are bounded only by Russian roulette: once depth ≥
    max_depth every further bounce survives with p = min(0.95,
    max(diffuse)) and multiplies throughput by the specular (≤ s_max)
    color (pathtracer.cpp:588-594, 625). The expected radiance left in a
    path truncated after k RR-gated segments is therefore ≤ (p·s_max)^k
    relative to its throughput at RR onset. This picks the smallest cap
    whose bound is below ``tol`` (never below the 2·depth+2 default).
    """
    import numpy as np
    d = np.asarray(scene.materials.diffuse)
    s = np.asarray(scene.materials.specular)
    refl = np.asarray(scene.materials.reflectiveness)
    transl = np.asarray(scene.materials.translucency)
    # only materials that can extend a specular/refraction chain matter
    chain = (refl > 0) | (transl > 0)
    if not chain.any():
        return 2 * max_depth + 2
    p = min(0.95, float(d[chain].max(initial=0.0)))
    s_max = min(1.0, float(s[chain].max(initial=0.0)))
    q = p * s_max
    base = 2 * max_depth + 2
    if q <= 0.0:
        return base
    if q >= 1.0:
        return hard_cap
    import math
    k = math.ceil(math.log(tol) / math.log(q))
    return min(hard_cap, max(base, max_depth + k))
