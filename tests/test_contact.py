"""Penalty contact tests: two-block compression (contact patch test) and
separation (inactive contact stays force-free).

Oracle analog of the reference's contact patch-test decks
(ref: tests/input_files/contact2D/3D_*.dat semantics).
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

E_MOD = 1000.0
PEN = 1e5
GAP0 = 0.01
PUSH = -0.05  # prescribed top displacement


def _two_block_deck(push=PUSH):
    """Lower block [0,1]^3, upper block [0,1]x[0,1]x[1.01,2.01]."""
    return dm.load(f"""
problem: {{type: structure}}
structural_dynamic:
  dynamictype: statics
  kinem: nonlinear
  numstep: 4
  timestep: 0.25
  maxiter: 40
  tolres: 1e-7
  toldisp: 1e-8
  linesearch: true
  divercont: halve_step
solver: {{method: gmres, precond: block_jacobi, maxiter: 3000, gmres_restart: 100}}
materials:
  1: {{type: stvenantkirchhoff, youngs: {E_MOD}, nue: 0.0}}
functions:
  1: "t"
geometry:
  generator:
    - {{kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 1, name: structure}}
    - {{kind: box, nx: 3, ny: 3, nz: 2, cell: hex8, mat: 1, name: structure,
        lo: [0, 0, {1 + GAP0}], hi: [1, 1, {2 + GAP0}], prefix: up_}}
conditions:
  dirichlet:
    - {{nodes: zmin, onoff: [1,1,1], val: [0,0,0]}}
    - {{nodes: up_zmax, onoff: [1,1,1], val: [0,0,{push}], funct: [0,0,1]}}
  contact:
    - {{slave: up_zmin, master: zmax, penalty: {PEN}}}
"""
    )


def test_contact_patch_two_blocks():
    """Flat-on-flat: after closing the 0.01 gap, both blocks carry a uniform
    uniaxial stress; compression is shared per stiffness (equal here).

    nue=0: sigma = E * eps, eps_each = (|push| - gap)/2 per unit-height block
    (plus the small penalty penetration sigma/pen).
    """
    res = driver.run(_two_block_deck())
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    X = f.disc.coords

    # interface force balance: total force through zmax of lower block
    eps_each = (abs(PUSH) - GAP0) / 2.0
    sigma = E_MOD * eps_each  # ~ 20
    # displacement of the lower block's top face ~ -eps_each (uniform strain)
    lower_top = f.disc.node_sets["zmax"]
    uz_top = d[lower_top, 2]
    # penalty penetration correction: g_pen = sigma/pen
    assert uz_top.std() < 2e-3
    assert uz_top.mean() == pytest.approx(-eps_each, rel=0.08)
    # upper block bottom face sits at the lower top minus penetration
    upper_bot = f.disc.node_sets["up_zmin"]
    pen_depth = (X[upper_bot, 2] + d[upper_bot, 2]).mean() - (
        X[lower_top, 2] + uz_top
    ).mean()
    assert abs(float(pen_depth)) < 3 * sigma / PEN + 1e-4

    # stress in both blocks ~ sigma (check via strain of upper block)
    up_top = f.disc.node_sets["up_zmax"]
    uz_up_top = d[up_top, 2].mean()
    eps_upper = (uz_up_top - d[upper_bot, 2].mean()) / 1.0
    assert -eps_upper * E_MOD == pytest.approx(sigma, rel=0.1)


def test_contact_inactive_when_separated():
    """Pushing down less than the gap -> no contact, upper block moves
    rigidly, lower block stays undeformed."""
    res = driver.run(_two_block_deck(push=-0.005))
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    lower = f.disc.node_sets["zmax"]
    assert np.abs(d[lower]).max() < 1e-10
    upper_bot = f.disc.node_sets["up_zmin"]
    assert np.allclose(d[upper_bot, 2], -0.005, atol=1e-8)
