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

    # Intersector selection: "auto" picks brute-force matmul for small scenes
    # and the BVH wavefront for large ones.
    intersector: str = "auto"    # auto | pallas | matmul | classic | bvh
    bvh_threshold: int = 4096     # tri count above which auto uses the BVH
    use_pallas: bool = True       # let auto route through Pallas on TPU
    # Winner-only custom VJP for hit queries (ops/intersect_vjp.py): O(N)
    # backward instead of replaying the O(N*T) query; required for
    # differentiating through the BVH walk (while_loop has no reverse rule).
    custom_hit_vjp: bool = True
    # Structurally skip bounce segments once every lane is dead (lax.cond).
    # Big win for forward renders with dead tails. The BVH path ignores it:
    # lax.cond around a while_loop trips an MLIR constant-lowering bug under
    # grad on this JAX version (see ops/integrator.py).
    skip_dead_segments: bool = True

    def resolved_max_segments(self) -> int:
        if self.max_segments is not None:
            return self.max_segments
        return 2 * self.max_depth + 2

    @property
    def num_pixels(self) -> int:
        return self.width * self.height

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)
