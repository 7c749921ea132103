"""Deck-driven pure-ALE problem type (ref: src/ale/4C_ale_dyn.cpp)."""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

DECK = """
problem: {type: ale}
ale_dynamic:
  method: %(method)s
  timestep: 0.5
  numstep: 2
  tolres: 1e-12
  maxiter: 600
functions:
  1: "t*(0.08*x + 0.02*y)"
geometry:
  generator: {kind: box, nx: 3, ny: 3, nz: 3, cell: hex8, mat: 1, name: ale}
materials:
  1: {type: stvenantkirchhoff, youngs: 1.0, nue: 0.0, density: 1.0}
conditions:
  dirichlet:
    - {nodes: xmin, onoff: [1, 1, 1], val: [1, 0, 0], funct: [1, 0, 0]}
    - {nodes: xmax, onoff: [1, 1, 1], val: [1, 0, 0], funct: [1, 0, 0]}
    - {nodes: ymin, onoff: [1, 1, 1], val: [1, 0, 0], funct: [1, 0, 0]}
    - {nodes: ymax, onoff: [1, 1, 1], val: [1, 0, 0], funct: [1, 0, 0]}
    - {nodes: zmin, onoff: [1, 1, 1], val: [1, 0, 0], funct: [1, 0, 0]}
    - {nodes: zmax, onoff: [1, 1, 1], val: [1, 0, 0], funct: [1, 0, 0]}
"""


@pytest.mark.minimal
@pytest.mark.parametrize("method", ["laplace", "elastic"])
def test_ale_linear_patch(method):
    """A linear boundary motion must be reproduced exactly in the interior
    by BOTH smoothing operators (linear fields are harmonic AND produce
    constant strain -> zero elastic residual on the uniform mesh)."""
    res = driver.run(dm.load(DECK % {"method": method}))
    st = res.states["ale"]
    d = np.asarray(st["d"])
    X = np.asarray(res.fields["ale"].f.disc.coords)
    want = 1.0 * (0.08 * X[:, 0] + 0.02 * X[:, 1])  # t = 1.0
    assert np.abs(d[:, 0] - want).max() < 1e-7
    assert np.abs(d[:, 1:]).max() < 1e-8


@pytest.mark.minimal
def test_ale_requires_full_onoff():
    bad = DECK % {"method": "laplace"}
    bad = bad.replace("onoff: [1, 1, 1]", "onoff: [1, 0, 0]")
    with pytest.raises(ValueError, match="all mesh-displacement"):
        driver.run(dm.load(bad))
