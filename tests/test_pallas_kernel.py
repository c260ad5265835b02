"""Pallas intersect kernel — interpret-mode correctness on CPU (the compiled
path runs on TPU; bit-equality vs the jnp matmul intersector is asserted in
the TPU drive, see .claude/skills/verify)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pbrpathtracer_tpu.scene.builders import cornell_box
from pbrpathtracer_tpu.ops.intersect import intersect_matmul


def test_pallas_interpret_matches_matmul(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu
    from pbrpathtracer_tpu.kernels import intersect_pallas as K

    scene = cornell_box()
    rs = np.random.RandomState(0)
    n = 512
    ro = jnp.asarray(rs.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
                     + np.array([0, 0, 0.3], np.float32))
    d = rs.normal(size=(n, 3)).astype(np.float32)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    with pltpu.force_tpu_interpret_mode():
        ph, pi, pt, pu, pv = K.intersect_pallas(scene.geom, ro, rd)
    mh, mi, mt, mu, mv = jax.jit(
        lambda: intersect_matmul(scene.geom, ro, rd))()

    ph, mh = np.asarray(ph), np.asarray(mh)
    pi, mi = np.asarray(pi), np.asarray(mi)
    pt, mt = np.asarray(pt), np.asarray(mt)
    assert (ph == mh).mean() > 0.998
    both = ph & mh
    assert both.any()
    agree = (pi == mi)[both].mean()
    assert agree > 0.99, agree
    same = both & (pi == mi)
    assert np.abs(pt[same] - mt[same]).max() < 1e-4
