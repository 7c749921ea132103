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


def test_contact_uzawa_zero_gap():
    """Augmented-Lagrange (Uzawa): the multiplier takes over the contact
    pressure, so the converged penetration is (much) smaller than the pure
    penalty penetration sigma/pen (ref: LagrangeStrategy semantics — exact
    non-penetration at convergence)."""
    deck = dm.load(f"""
problem: {{type: structure}}
structural_dynamic:
  dynamictype: statics
  kinem: nonlinear
  numstep: 4
  timestep: 0.25
  maxiter: 40
  tolres: 1e-8
  toldisp: 1e-9
  linesearch: true
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
    - {{nodes: up_zmax, onoff: [1,1,1], val: [0,0,{PUSH}], funct: [0,0,1]}}
  contact:
    - {{slave: up_zmin, master: zmax, penalty: 2000.0, strategy: uzawa,
        uzawa_max_iter: 10, uzawa_tol: 1e-6}}
""")
    res = driver.run(deck)
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    X = f.disc.coords
    eps_each = (abs(PUSH) - GAP0) / 2.0
    sigma = E_MOD * eps_each  # ~ 20

    lower_top = f.disc.node_sets["zmax"]
    upper_bot = f.disc.node_sets["up_zmin"]
    pen_depth = (X[lower_top, 2] + d[lower_top, 2]).mean() - (
        X[upper_bot, 2] + d[upper_bot, 2]
    ).mean()
    # pure penalty at pen=2000 would penetrate sigma/pen = 1e-2; the
    # multiplier must cut that by >= 10x
    assert abs(float(pen_depth)) < 0.1 * sigma / 2000.0 + 2e-4
    # multiplier approximates the contact pressure (integral = sigma * area)
    lam = np.asarray(res.states["structure"]["con"][0]["lam"])
    assert lam.sum() == pytest.approx(sigma * 1.0, rel=0.15)
    # compression still shared between the blocks
    uz_top = d[lower_top, 2]
    assert uz_top.mean() == pytest.approx(-eps_each, rel=0.1)


def _friction_deck(mu, push_z=-0.02, push_x=0.05):
    """One block on a rigid-ish base: press down (step 1-2), drag sideways
    (steps 3-6)."""
    return dm.load(f"""
problem: {{type: structure}}
structural_dynamic:
  dynamictype: statics
  kinem: nonlinear
  numstep: 6
  timestep: 1.0
  maxiter: 40
  tolres: 1e-7
  toldisp: 1e-8
  linesearch: true
solver: {{method: gmres, precond: block_jacobi, maxiter: 3000, gmres_restart: 100}}
materials:
  1: {{type: stvenantkirchhoff, youngs: {E_MOD}, nue: 0.0}}
functions:
  1: "min(t/2, 1)"
  2: "max(0, (t-2)/4)"
geometry:
  generator:
    - {{kind: box, nx: 3, ny: 3, nz: 1, cell: hex8, mat: 1, name: structure,
        lo: [-0.5, -0.5, -0.3], hi: [1.5, 1.5, 0.0]}}
    - {{kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 1, name: structure,
        lo: [0, 0, 0.002], hi: [1, 1, 1.002], prefix: up_}}
conditions:
  dirichlet:
    - {{nodes: zmin, onoff: [1,1,1], val: [0,0,0]}}
    - {{nodes: up_zmax, onoff: [1,1,1], val: [{push_x},0,{push_z}],
        funct: [2,0,1]}}
  contact:
    - {{slave: up_zmin, master: zmax, penalty: 1e4, penalty_t: 1e4,
        friction_mu: {mu}}}
""")


def test_contact_friction_stick():
    """High mu: the base of the upper block sticks — its bottom moves far
    less than its top (the block shears)."""
    res = driver.run(_friction_deck(mu=2.0))
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    f = res.fields["structure"].f
    bot = f.disc.node_sets["up_zmin"]
    top = f.disc.node_sets["up_zmax"]
    ux_bot = d[bot, 0].mean()
    ux_top = d[top, 0].mean()
    assert ux_top == pytest.approx(0.05, abs=1e-6)
    # stick: bottom stays near its footprint (elastic tangential penalty
    # deflection only, bounded by the traction / pen_t)
    assert abs(ux_bot) < 0.25 * ux_top


def test_contact_friction_slip():
    """Low mu: the upper block slides — bottom follows the top almost
    rigidly, and the tangential traction is capped at mu * p_n."""
    res = driver.run(_friction_deck(mu=0.05))
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    f = res.fields["structure"].f
    bot = f.disc.node_sets["up_zmin"]
    top = f.disc.node_sets["up_zmax"]
    ux_bot = d[bot, 0].mean()
    ux_top = d[top, 0].mean()
    # slip: bottom travels with the block (>= 60% of the top motion)
    assert ux_bot > 0.6 * ux_top
    # friction cone: |t_t| <= mu * p_n (+small tolerance) node by node
    con = res.states["structure"]["con"][0]
    lam_pen = np.asarray(con["tt"])
    # reconstruct p_n from the final geometry via the force balance instead:
    # the traction history magnitude must not exceed mu * (pen * |gap|) scale
    # — use the capped invariant directly
    tt_norm = np.linalg.norm(lam_pen, axis=1)
    # normal pressure ~ E * eps_z; eps_z ~ (0.02 - 0.002) / 1.0 capped by gap
    p_est = E_MOD * (0.02 - 0.002)
    assert tt_norm.max() <= 0.05 * p_est * 3.0 + 1e-6


def test_contact_nitsche_consistent_traction():
    """Nitsche (theta=0 skew variant): the consistent boundary stress
    -sigma_nn carries the contact pressure, so at a stabilization where
    pure penalty penetrates sigma/gamma = 1e-2, the Nitsche penetration
    must be an order of magnitude smaller (ref: NitscheStrategy,
    4C_contact_nitsche_strategy.*)."""
    deck = dm.load(f"""
problem: {{type: structure}}
structural_dynamic:
  dynamictype: statics
  kinem: nonlinear
  numstep: 4
  timestep: 0.25
  maxiter: 40
  tolres: 1e-8
  toldisp: 1e-9
  linesearch: true
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
    - {{nodes: up_zmax, onoff: [1,1,1], val: [0,0,{PUSH}], funct: [0,0,1]}}
  contact:
    - {{slave: up_zmin, master: zmax, penalty: 2000.0, strategy: nitsche}}
""")
    res = driver.run(deck)
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    X = f.disc.coords
    eps_each = (abs(PUSH) - GAP0) / 2.0
    sigma = E_MOD * eps_each  # ~ 20

    lower_top = f.disc.node_sets["zmax"]
    upper_bot = f.disc.node_sets["up_zmin"]
    pen_depth = (X[lower_top, 2] + d[lower_top, 2]).mean() - (
        X[upper_bot, 2] + d[upper_bot, 2]
    ).mean()
    assert abs(float(pen_depth)) < 0.15 * sigma / 2000.0 + 2e-4
    # compression shared between the blocks as in the patch test
    assert d[lower_top, 2].mean() == pytest.approx(-eps_each, rel=0.1)


def test_contact_archard_wear():
    """Sliding under load accumulates Archard wear w = k_w * p_n * slip on
    the slave nodes; the worn surface unloads (ref: src/contact wear,
    4C_contact_wear_* — wear increments from frictional slip)."""
    import re

    deck_slide = _friction_deck(mu=0.05)
    # rebuild the same deck with a wear coefficient
    kw = 2e-4
    cc = deck_slide.conditions["structure"]["contact"][0]
    from dataclasses import replace

    deck_slide.conditions["structure"]["contact"][0] = replace(
        cc, wear_coeff=kw)
    res = driver.run(deck_slide)

    con = res.states["structure"]["con"][0]
    w = np.asarray(con["w"])
    assert np.all(w >= 0.0)
    assert w.max() > 0.0, "sliding must produce wear"

    # Archard consistency: total wear ~ k_w * sum(p_n * slip); slip ~ the
    # prescribed drag minus elastic deformation.  Check the order of
    # magnitude (nodal p ~ pen*penetration, slip per step bounded by drag)
    assert w.max() < kw * 1e4 * 0.05  # < k_w * (max force) * (total drag)

    # no-slip case: stick (huge mu) accrues (almost) no wear
    deck_stick = _friction_deck(mu=2.0)
    cc2 = deck_stick.conditions["structure"]["contact"][0]
    deck_stick.conditions["structure"]["contact"][0] = replace(
        cc2, wear_coeff=kw)
    res2 = driver.run(deck_stick)
    w2 = np.asarray(res2.states["structure"]["con"][0]["w"])
    assert w2.max() <= 0.05 * max(w.max(), 1e-30)
