"""RNG: numpy/jnp bit-parity, determinism, distribution sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from pbrpathtracer_tpu.ops import rng


def test_numpy_jnp_bit_parity():
    px = np.arange(4096, dtype=np.uint32)
    a = rng.rand_slot(np.uint32(7), px, np.uint32(3), np.uint32(2), np.uint32(5))
    b = np.asarray(jax.jit(
        lambda: rng.rand_slot(jnp.uint32(7), jnp.asarray(px), jnp.uint32(3),
                              jnp.uint32(2), 5))())
    assert np.array_equal(a, b)


def test_traced_vs_const_parity():
    px = jnp.arange(256, dtype=jnp.int32)
    const = np.asarray(jax.jit(
        lambda: rng.rand_slot(jnp.uint32(1), px, jnp.uint32(9), jnp.uint32(4), 13))())
    traced = np.asarray(jax.jit(
        lambda s: rng.rand_slot(jnp.uint32(1), px, s, jnp.uint32(4), 13))(
            jnp.uint32(9)))
    assert np.array_equal(const, traced)


def test_range_and_distribution():
    px = np.arange(1 << 16, dtype=np.uint32)
    u = rng.rand_uniform(np.uint32(0), px, np.uint32(0), np.uint32(0))
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 5e-3
    assert abs(np.var(u) - 1 / 12) < 5e-3
    # no obvious correlation between adjacent keys
    assert abs(np.corrcoef(u[:-1], u[1:])[0, 1]) < 0.02


def test_keys_decorrelated_across_slots():
    px = np.arange(8192, dtype=np.uint32)
    a = rng.rand_slot(np.uint32(0), px, np.uint32(0), np.uint32(1), 4)
    b = rng.rand_slot(np.uint32(0), px, np.uint32(0), np.uint32(1), 5)
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.02


def test_seed_changes_stream():
    px = np.arange(128, dtype=np.uint32)
    a = rng.rand_slot(np.uint32(0), px, np.uint32(0), np.uint32(1), 4)
    b = rng.rand_slot(np.uint32(1), px, np.uint32(0), np.uint32(1), 4)
    assert not np.array_equal(a, b)
