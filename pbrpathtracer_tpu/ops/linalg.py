"""Small vector helpers shared by shading and the integrator. All operate on
f32[N,3] batches.

Gradient safety: reverse-mode through `sqrt(0)` or `norm(0)` produces
inf/NaN that `jnp.where` cannot mask out (the classic where-grad pitfall), so
`safe_sqrt` uses the double-where construction and `safe_normalize` a
regularized norm — forward results change by O(1e-20), gradients stay finite.
"""

import jax
import jax.numpy as jnp

# Norm² floor: must stay comfortably inside f32 range through the VJP
# (rsqrt' ~ n2^(-3/2): 1e-12 → 1e18, finite; 1e-20 would overflow to inf and
# poison gradients as inf·0 = NaN).
TINY = 1e-12


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def safe_normalize(v):
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(n2, TINY))


def reflect(rd, n):
    """glm::reflect: rd - 2 dot(rd, n) n."""
    return rd - 2.0 * dot(rd, n)[..., None] * n


def safe_sqrt(x):
    """sqrt(max(x, 0)) with a finite gradient at x <= 0 (double-where)."""
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)
