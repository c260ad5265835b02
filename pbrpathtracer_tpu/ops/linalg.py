"""Small vector helpers shared by shading and the integrator. All operate on
f32[N,3] batches. ``safe_normalize`` guards the zero-vector case so reverse-mode
gradients stay finite (jnp.where-NaN pitfall)."""

import jax.numpy as jnp

TINY = 1e-20


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def safe_normalize(v):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, TINY)


def reflect(rd, n):
    """glm::reflect: rd - 2 dot(rd, n) n."""
    return rd - 2.0 * dot(rd, n)[..., None] * n


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))
