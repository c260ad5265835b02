"""Fused pack-gather kernel: ``table[idx]`` transposed to fields-on-sublanes
with NO HBM one-hot materialization.

ops/shadepack.py feeds every shading attribute through one wide row fetch
``rows[W, N] = table^T @ onehot(idx)``. The XLA formulation materializes the
``onehot`` as an f32[T, N] HBM buffer per use — for the 512² Cornell
flagship that is ~38 MB written+read per matmul, ~150 MB per segment
counting the backward's mirrored product: the single largest avoidable HBM
stream in the fwd+bwd step (utils/roofline.py canonical accounting).

This kernel keeps the one-hot in VMEM only:

  * grid over ray tiles; the whole ``table`` [T, W] rides in VMEM (T is
    gated small — the XLA one-hot path was already gated to
    T ≤ MATMUL_SCATTER_MAX_T = 256);
  * per tile: build onehot [T, TILE] = (iota_T == idx_tile) IN VMEM, then
    one MXU product table^T[W, T] @ onehot → [W, TILE];
  * HBM traffic: the ids in, the field rows out. Nothing else.

f32-exact: each output element sums exactly one product ``value × 1.0``
(precision=HIGHEST keeps the value's full mantissa through the MXU).

The backward is the mirrored contraction accumulated across tiles in a
VMEM scratch: d_table^T[W, T] += cot_tile[W, TILE] @ onehot^T — the grid's
last step writes the accumulator out once. Same zero-extra-HBM property.

Used by shadepack.gather_fields on the TPU backend; the XLA one-hot matmul
remains the non-TPU / interpret fallback. Replaces the reference's per-hit
pointer chasing (pathtracer.cpp:549-584) at the memory-system level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the [T, TILE] one-hot block (f32).
_ONEHOT_VMEM = 4 * 1024 * 1024
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_tile(t_pad: int, n_pad: int) -> int:
    tile = _ONEHOT_VMEM // (4 * t_pad)
    tile = max(_LANE, min(8192, (tile // _LANE) * _LANE))
    return min(tile, n_pad)


def _fwd_kernel(idx_ref, tab_ref, out_ref):
    ids = idx_ref[:]                                   # [1, TILE] i32
    T = tab_ref.shape[0]
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (T, ids.shape[1]), 0)
    onehot = (rows_t == ids).astype(jnp.float32)       # [T, TILE] VMEM only
    out_ref[:] = jax.lax.dot_general(
        tab_ref[:], onehot,
        dimension_numbers=(((0,), (0,)), ((), ())),    # [W, TILE]
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _bwd_kernel(idx_ref, cot_ref, dtab_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ids = idx_ref[:]                                   # [1, TILE]
    T = acc_ref.shape[0]
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (T, ids.shape[1]), 0)
    onehot = (rows_t == ids).astype(jnp.float32)       # [T, TILE]
    # d_table[T, W] += onehot [T, TILE] @ cot^T [TILE, W]
    acc_ref[:] += jax.lax.dot_general(
        onehot, cot_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dtab_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnums=(2,))
def _run_fwd(idx2, tab, shapes):
    n_pad, t_pad, w_pad, tile, interpret = shapes
    grid = (n_pad // tile,)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_pad, w_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((w_pad, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((w_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(idx2, tab)


@functools.partial(jax.jit, static_argnums=(2,))
def _run_bwd(idx2, cot, shapes):
    n_pad, t_pad, w_pad, tile, interpret = shapes
    grid = (n_pad // tile,)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_pad, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_pad, w_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, w_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((t_pad, w_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(idx2, cot)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_t(table, idx, interpret=False):
    """``table[idx]`` transposed: returns f32[W, N] fields-on-sublanes rows.

    ``table`` f32[T, W] with T small (VMEM-resident), ``idx`` i32[N] with
    every value in [0, T). Out-of-range ids produce zero rows (matching the
    one-hot matmul's semantics). Reverse-mode differentiable w.r.t.
    ``table`` (d_idx = None).
    """
    return _gather_fwd_impl(table, idx, interpret)


def _gather_fwd_impl(table, idx, interpret):
    T, W = table.shape
    N = idx.shape[0]
    t_pad = _round_up(max(T, 8), 8)
    w_pad = _round_up(max(W, 8), 8)
    tile = _pick_tile(t_pad, 1 << 30)
    n_pad = _round_up(N, tile)
    tab = jnp.pad(table, ((0, t_pad - T), (0, w_pad - W)))
    idx2 = jnp.pad(idx, (0, n_pad - N),
                   constant_values=-1).reshape(1, n_pad)
    out = _run_fwd(idx2, tab, (n_pad, t_pad, w_pad, tile, interpret))
    return out[:W, :N]


def _gather_fwd(table, idx, interpret):
    return _gather_fwd_impl(table, idx, interpret), (idx, table.shape)


def _gather_bwd(interpret, res, cot):
    idx, (T, W) = res
    N = idx.shape[0]
    t_pad = _round_up(max(T, 8), 8)
    w_pad = _round_up(max(W, 8), 8)
    tile = _pick_tile(t_pad, 1 << 30)
    n_pad = _round_up(N, tile)
    cot_p = jnp.pad(cot, ((0, w_pad - W), (0, n_pad - N)))
    idx2 = jnp.pad(idx, (0, n_pad - N),
                   constant_values=-1).reshape(1, n_pad)
    dtab = _run_bwd(idx2, cot_p, (n_pad, t_pad, w_pad, tile, interpret))
    return dtab[:T, :W], None


gather_rows_t.defvjp(_gather_fwd, _gather_bwd)
