"""Live-lane wavefront compaction (SURVEY §7: "wavefront compaction
replaces per-pixel OpenMP loops"; VERDICT r3 weak #5).

After a few bounce segments a growing fraction of lanes is dead (miss /
Russian roulette / iter budget) but still pays the full intersect+shade
cost: the flagship's live-per-segment profile decays 100% → 60% before the
all-dead tail, and deep/translucent workloads (segment cap 2·depth+2 or
RR-derived, engine/config.suggest_max_segments) spend most segments under
50% occupancy. Compaction reorders lanes so the live ones are a contiguous
prefix; the Pallas intersectors then skip whole ray tiles past the live
count (`n_live` tile gate), and on deep workloads most of the query cost
vanishes.

Keyed RNG makes this exact: every random draw is keyed by (seed,
state.pixel, sample, stream, slot), all of which travel with the lane —
executed segment-by-segment a compacted render is BIT-IDENTICAL to the
uncompacted one (tests/test_compaction.py pins this). Under one
whole-render jit, XLA's fusion choices on the structurally different
graph may shift lanes by ULPs, exactly as changing unroll/remat does.

TPU cost model: the state is ~17 [N]-rows laid out lanes-minor, so the
permutation is data movement along the lane dimension. Two formulations:

  * "sort": one stable variadic `lax.sort` keyed by the dead flag
    co-sorts every state column in a single fused op;
  * "gather": compute the permutation with one small sort over (flag,
    iota), then `x[perm]` every column (XLA fuses the gathers).

Both are shape-static and jit-safe. Which wins is chip-dependent; the
integrator takes cfg.compact_wavefront ∈ {"off", "auto", "sort",
"gather"} and benchmarks/profile_compaction.py measures on-chip.

Integer payloads ride the sort as their own operands (no float packing),
so pixel ids are exact at any resolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _state_columns(state, slot):
    """Flatten (state, slot) into a list of [N] / [N,3] arrays + rebuild."""
    cols = [state.ro, state.rd, state.throughput, state.radiance,
            state.alive, state.inside, state.itr, state.depth, state.pixel,
            slot]

    def rebuild(vals):
        (ro, rd, tp, rad, alive, inside, itr, depth, pixel, slot) = vals
        return state.replace(ro=ro, rd=rd, throughput=tp, radiance=rad,
                             alive=alive, inside=inside, itr=itr,
                             depth=depth, pixel=pixel), slot
    return cols, rebuild


def compact_sort(state, slot):
    """Stable variadic sort by the dead flag: live lanes first.

    Returns (state, slot, n_live)."""
    cols, rebuild = _state_columns(state, slot)
    key = (~state.alive).astype(jnp.int32)
    n_live = jnp.sum(state.alive.astype(jnp.int32))
    # lax.sort co-sorts operands; 2-D columns sort along axis 0 only if
    # given per-column — split [N,3] into scalars to keep one variadic op.
    flat = []
    splits = []
    for c in cols:
        if c.ndim == 2:
            for j in range(c.shape[1]):
                flat.append(c[:, j])
            splits.append(c.shape[1])
        else:
            flat.append(c)
            splits.append(0)
    out = jax.lax.sort((key, *flat), num_keys=1, is_stable=True)[1:]
    vals = []
    it = iter(out)
    for c, s in zip(cols, splits):
        if s:
            vals.append(jnp.stack([next(it) for _ in range(s)], axis=1))
        else:
            vals.append(next(it))
    st, sl = rebuild(vals)
    return st, sl, n_live


def compact_gather(state, slot):
    """Permutation via (flag, iota) sort + per-column gathers."""
    key = (~state.alive).astype(jnp.int32)
    n_live = jnp.sum(state.alive.astype(jnp.int32))
    iota = jnp.arange(key.shape[0], dtype=jnp.int32)
    _, perm = jax.lax.sort((key, iota), num_keys=1, is_stable=True)
    cols, rebuild = _state_columns(state, slot)
    st, sl = rebuild([c[perm] for c in cols])
    return st, sl, n_live


def scatter_to_slots(values, slot):
    """Undo the lane reordering: values[i] lands at its original lane
    ``slot[i]`` (slots are a permutation of arange)."""
    out = jnp.zeros_like(values)
    return out.at[slot].set(values)
