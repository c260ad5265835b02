"""Pack-gather Pallas kernel (kernels/packgather_pallas.py) —
interpret-mode correctness on CPU.

The kernel replaces shadepack's XLA one-hot matmul on TPU (the one-hot
stays in VMEM). These tests pin: forward exactness vs a plain row gather,
backward exactness vs the scatter-add cotangent, non-aligned T/W/N
padding, and composition through _split_concat_vjp (the gather_fields
field splitter)."""

import numpy as np
import jax
import jax.numpy as jnp

from pbrpathtracer_tpu.kernels.packgather_pallas import gather_rows_t
from pbrpathtracer_tpu.ops import shadepack as sp


def _ref_rows_t(table, idx):
    return np.asarray(table)[np.asarray(idx)].T  # [W, N]


def test_forward_exact_vs_row_gather():
    rng = np.random.RandomState(0)
    T, W, N = 36, 55, 1000
    table = jnp.asarray(rng.randn(T, W).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, T, N).astype(np.int32))
    out = np.asarray(gather_rows_t(table, idx, True))
    assert out.shape == (W, N)
    np.testing.assert_array_equal(out, _ref_rows_t(table, idx))


def test_forward_tiny_and_unaligned():
    rng = np.random.RandomState(1)
    for (T, W, N) in [(2, 13, 7), (9, 8, 129), (256, 55, 300)]:
        table = jnp.asarray(rng.randn(T, W).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, T, N).astype(np.int32))
        out = np.asarray(gather_rows_t(table, idx, True))
        np.testing.assert_array_equal(out, _ref_rows_t(table, idx))


def test_backward_exact_vs_scatter_add():
    rng = np.random.RandomState(2)
    T, W, N = 36, 55, 500
    table = jnp.asarray(rng.randn(T, W).astype(np.float32))
    idx_np = rng.randint(0, T, N).astype(np.int32)
    idx = jnp.asarray(idx_np)
    cot = rng.randn(W, N).astype(np.float32)

    def loss(tab):
        return jnp.sum(gather_rows_t(tab, idx, True) * cot)

    g = np.asarray(jax.grad(loss)(table))
    ref = np.zeros((T, W), np.float64)
    for n in range(N):
        ref[idx_np[n]] += cot[:, n]
    # each row accumulates float adds; the kernel's MXU accumulation at
    # HIGHEST is f32-exact per product, sums match to f32 round-off
    np.testing.assert_allclose(g, ref, rtol=1e-6, atol=1e-5)


def test_split_concat_vjp_roundtrip():
    rng = np.random.RandomState(3)
    T, N = 12, 64
    W = sp.TRI_PACK_WIDTH
    table = jnp.asarray(rng.randn(T, W).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, T, N).astype(np.int32))

    rows = gather_rows_t(table, idx, True)
    fields = sp._split_concat_vjp(rows, sp.TRI_FIELDS)
    ref_fields = sp._split_sublane(jnp.asarray(_ref_rows_t(table, idx)),
                                   sp.TRI_FIELDS)
    for a, b in zip(fields, ref_fields):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # gradient flows through split + kernel back to the table
    def loss(tab):
        fs = sp._split_concat_vjp(gather_rows_t(tab, idx, True),
                                  sp.TRI_FIELDS)
        return sum(jnp.sum(f * (i + 1)) for i, f in enumerate(fs))

    def loss_ref(tab):
        fs = sp._split_sublane(tab[idx].T, sp.TRI_FIELDS)
        return sum(jnp.sum(f * (i + 1)) for i, f in enumerate(fs))

    g = np.asarray(jax.grad(loss)(table))
    gr = np.asarray(jax.grad(loss_ref)(table))
    np.testing.assert_allclose(g, gr, rtol=1e-6, atol=1e-5)
