"""Golden-image regression net (benchmarks/goldens.py): CPU renders must
match the committed TPU-rendered goldens within Monte-Carlo + float-
reassociation tolerance.

Catches cross-round image drift from kernel/integrator rewrites: the RNG
is keyed (pixel, sample, bounce), so both backends draw the same
estimator samples — only ULP-level accumulation differences and the rare
decision flip (hit tie, RR edge) separate the images. Cheap configs only
(the full five-scene net runs in benchmarks/goldens.py check mode on the
chip); rung-1/2/4 cover the dense kernel, integrator, GGX and
translucent paths without multi-minute CPU renders.
"""

import os

import numpy as np
import pytest

from benchmarks import goldens as G

NAMES = ["rung1_cornell", "rung2_spheres", "rung4_translucent"]


@pytest.mark.parametrize("name", NAMES)
def test_golden(name):
    path = os.path.join(G.GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"no golden recorded for {name}")
    mean, var, _cfg = G.render_one(name, G._configs()[name])
    rep = G.compare(mean, var, np.load(path))
    assert rep["ok"], rep
