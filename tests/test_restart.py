"""Checkpoint/restart: identical-trajectory tests.

Mirror of the reference's RESTART_STEP CI semantics (re-run the tail of a
simulation from a checkpoint and hit identical results; ref:
cmake/functions/four_c_testing_functions.cmake:119-151).
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver


def _solid_deck(tmp_path, numstep, restart=0, interval=2):
    return dm.load(
        f"""
problem: {{type: structure, restart: {restart}}}
structural_dynamic:
  dynamictype: genalpha
  rho_inf: 0.9
  kinem: nonlinear
  timestep: 0.05
  numstep: {numstep}
  tolres: 1e-9
  toldisp: 1e-9
io: {{restart_interval: {interval}, output_dir: "{tmp_path}"}}
solver: {{method: cg, precond: block_jacobi}}
materials:
  1: {{type: neohooke, youngs: 1000.0, nue: 0.3, density: 1.0}}
geometry:
  generator: {{kind: box, nx: 3, ny: 2, nz: 2, cell: hex8, mat: 1}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,1,1], val: [0,0,0]}}
  neumann:
    - {{faces: xmax, onoff: [0,0,1], val: [0,0,20.0]}}
"""
    )


def test_restart_identical_trajectory(tmp_path):
    d = str(tmp_path)
    res_full = driver.run(_solid_deck(d, 6, interval=2))
    # re-run the tail of the SAME deck from the step-4 checkpoint
    # (the reference's RESTART_STEP flow: identical input + restart=N)
    res_tail = driver.run(_solid_deck(d, 6, restart=4, interval=2))

    for key in ("d", "v", "a"):
        a = np.asarray(res_full.states["structure"][key])
        b = np.asarray(res_tail.states["structure"][key])
        assert np.array_equal(a, b), f"restart trajectory differs in {key}"
    assert int(res_tail.states["structure"]["step"]) == 6


def test_restart_refuses_modified_deck(tmp_path):
    d = str(tmp_path)
    driver.run(_solid_deck(d, 2, interval=1))
    deck2 = _solid_deck(d, 4, restart=2, interval=1)
    deck2.raw["materials"][1]["youngs"] = 999.0  # tamper -> different hash
    with pytest.raises(ValueError, match="restart refused"):
        driver.run(deck2)


def test_restart_scatra(tmp_path):
    d = str(tmp_path)
    base = f"""
problem: {{type: scatra}}
scatra_dynamic: {{dynamictype: onesteptheta, theta: 0.5, timestep: 0.02, numstep: NS, initialfield_funct: 1}}
io: {{restart_interval: 5, output_dir: "{d}"}}
solver: {{method: cg, precond: jacobi}}
materials:
  1: {{type: scatra, diffusivity: 1.0, reacoeff: 2.0}}
functions:
  1: "1"
geometry:
  generator: {{kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 1, name: scatra}}
conditions: {{}}
"""
    res_full = driver.run(dm.load(base.replace("NS", "10")))
    deck_tail = dm.load(base.replace("NS", "10"))
    deck_tail.problem["restart"] = 5
    # same raw deck -> same hash: restart allowed even though problem dict
    # was modified post-load (matches CLI --restart flow)
    res_tail = driver.run(deck_tail)
    a = np.asarray(res_full.states["scatra"]["phi"])
    b = np.asarray(res_tail.states["scatra"]["phi"])
    assert np.array_equal(a, b)
