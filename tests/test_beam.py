"""Timoshenko beam tests vs closed-form solutions.

Oracle analog of the reference's beam3 regression decks
(ref: tests/input_files/beam3r_*.dat).
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

E = 1000.0
NU = 0.3
G = E / (2 * (1 + NU))
A = 0.01
I = 8.333e-6  # 0.1^4/12 square section
L = 2.0
P = 0.1


def _beam_deck(load, shear_area=0.0, n=8):
    onoff, val = load
    return dm.load(f"""
problem: {{type: structure}}
structural_dynamic: {{dynamictype: statics, numstep: 1, tolres: 1e-10, toldisp: 1e-11, maxiter: 30}}
solver: {{method: cg, precond: jacobi, maxiter: 4000}}
materials:
  1: {{type: beam_elastic, youngs: {E}, nue: {NU}, area: {A}, iyy: {I}, izz: {I},
       torsion_j: {2 * I}, shear_area: {shear_area}, density: 1.0}}
geometry:
  generator: {{kind: line, n: {n}, p0: [0,0,0], p1: [{L},0,0]}}
conditions:
  dirichlet:
    - {{nodes: start, onoff: [1,1,1,1,1,1], val: [0,0,0,0,0,0]}}
  point_neumann:
    - {{nodes: end, onoff: {onoff}, val: {val}}}
""")


def test_cantilever_tip_deflection_eb():
    """Euler-Bernoulli: w = P L^3 / (3 E I)."""
    res = driver.run(_beam_deck(([0, 1, 0, 0, 0, 0], [0, P, 0, 0, 0, 0])))
    tip = res.query("structure", "dispy", 8)
    exact = P * L**3 / (3 * E * I)
    assert tip == pytest.approx(exact, rel=1e-9)


def test_cantilever_tip_deflection_timoshenko():
    """Shear-deformable: w = P L^3/(3EI) + P L/(G As)."""
    As = 5.0 / 6.0 * A
    res = driver.run(_beam_deck(([0, 0, 1, 0, 0, 0], [0, 0, P, 0, 0, 0]),
                                shear_area=As))
    tip = res.query("structure", "dispz", 8)
    exact = P * L**3 / (3 * E * I) + P * L / (G * As)
    assert tip == pytest.approx(exact, rel=1e-9)


def test_axial_and_torsion():
    """u = N L / (E A); twist = T L / (G J)."""
    res = driver.run(_beam_deck(([1, 0, 0, 1, 0, 0], [P, 0, 0, P, 0, 0])))
    u = res.query("structure", "dispx", 8)
    tw = res.query("structure", "rotx", 8)
    assert u == pytest.approx(P * L / (E * A), rel=1e-10)
    assert tw == pytest.approx(P * L / (G * 2 * I), rel=1e-10)


def test_beam_dynamics_energy_bounded():
    """Gen-alpha free vibration after a tip kick stays bounded."""
    deck = dm.load(f"""
problem: {{type: structure}}
structural_dynamic:
  dynamictype: genalpha
  rho_inf: 0.9
  timestep: 0.05
  numstep: 20
  tolres: 1e-9
  toldisp: 1e-10
solver: {{method: cg, precond: jacobi}}
materials:
  1: {{type: beam_elastic, youngs: {E}, nue: {NU}, area: {A}, iyy: {I}, izz: {I},
       torsion_j: {2 * I}, density: 10.0}}
functions:
  1: "max(0, 1 - t*10)"
geometry:
  generator: {{kind: line, n: 6, p0: [0,0,0], p1: [{L},0,0]}}
conditions:
  dirichlet:
    - {{nodes: start, onoff: [1,1,1,1,1,1], val: [0,0,0,0,0,0]}}
  point_neumann:
    - {{nodes: end, onoff: [0,1,0,0,0,0], val: [0,{P},0,0,0,0], funct: [0,1,0,0,0,0]}}
""")
    res = driver.run(deck)
    d = np.asarray(res.states["structure"]["d"])
    assert np.isfinite(d).all()
    tip = res.query("structure", "dispy", 6)
    wstat = P * L**3 / (3 * E * I)
    assert abs(tip) < 3 * wstat
