"""Reissner-Mindlin (MITC4) shell element tests.

Oracles mirror the reference's shell verification style (ref: src/shell7p
decks): cantilever plate bending against Timoshenko beam theory, and
absence of shear locking in the thin limit.
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver


def _cantilever_deck(h, P, nx=16, ny=2, L=10.0):
    n_tip = ny + 1
    return dm.load(f"""
problem: {{type: structure}}
structural_dynamic: {{dynamictype: statics, kinem: linear, numstep: 1,
                     timestep: 1.0, maxiter: 10, tolres: 1e-9, toldisp: 1e-9, normcombi: or}}
solver: {{method: gmres, precond: jacobi, maxiter: 2000, gmres_restart: 100}}
functions:
  1: "t"
materials:
  1: {{type: shell_elastic, youngs: 1.0e6, nue: 0.0, thickness: {h}}}
geometry:
  generator:
    - {{kind: sheet, nx: {nx}, ny: {ny}, origin: [0, 0, 0],
        u: [{L}, 0, 0], v: [0, 1, 0], cell: quad4, mat: 1, name: structure}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,1,1,1,1,1], val: [0,0,0,0,0,0]}}
  point_neumann:
    - {{nodes: xmax, onoff: [0,0,1,0,0,0], val: [0,0,{P / n_tip}],
        funct: [0,0,1]}}
""")


def _tip_w(res):
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 6)
    return d[f.disc.node_sets["xmax"], 2].mean()


def test_shell_cantilever_matches_beam_theory():
    E, L, b, h, P = 1.0e6, 10.0, 1.0, 0.1, 1.0
    I = b * h**3 / 12.0
    G = E / 2.0
    w_ref = P * L**3 / (3 * E * I) + P * L / (5.0 / 6.0 * G * b * h)
    res = driver.run(_cantilever_deck(h, P))
    w = _tip_w(res)
    assert abs(w - w_ref) / w_ref < 0.03, (w, w_ref)


def test_shell_no_shear_locking_thin_limit():
    """L/h = 1000: a shear-locking bilinear quad would be orders of
    magnitude too stiff; MITC4 must stay within a few % of beam theory."""
    E, L, b, h = 1.0e6, 10.0, 1.0, 0.01
    I = b * h**3 / 12.0
    P = 3 * E * I / L**3  # -> w_ref ~ 1
    w_ref = 1.0 + P * L / (5.0 / 6.0 * (E / 2) * b * h)
    res = driver.run(_cantilever_deck(h, P))
    w = _tip_w(res)
    assert abs(w - w_ref) / w_ref < 0.05, (w, w_ref)


def test_shell_membrane_patch():
    """In-plane uniaxial pull -> plane-stress exact solution (membrane part
    of the shell is the standard bilinear quad)."""
    res = driver.run(dm.load("""
problem: {type: structure}
structural_dynamic: {dynamictype: statics, kinem: linear, numstep: 1,
                     timestep: 1.0, maxiter: 10, tolres: 1e-10, toldisp: 1e-9, normcombi: or}
solver: {method: gmres, precond: jacobi, maxiter: 2000, gmres_restart: 100}
functions:
  1: "t"
materials:
  1: {type: shell_elastic, youngs: 1000.0, nue: 0.3, thickness: 0.1}
geometry:
  generator:
    - {kind: sheet, nx: 4, ny: 4, origin: [0, 0, 0],
       u: [1, 0, 0], v: [0, 1, 0], cell: quad4, mat: 1, name: structure}
conditions:
  dirichlet:
    - {nodes: xmin, onoff: [1,0,0,0,0,0], val: [0,0,0,0,0,0]}
    - {nodes: [0], onoff: [0,1,1,0,0,0], val: [0,0,0,0,0,0]}
    - {nodes: xmax, onoff: [1,0,0,0,0,0], val: [0.01], funct: [1]}
"""))
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 6)
    x = np.asarray(f.disc.coords)
    # u_x = 0.01 x, u_y = -nue * 0.01 * y (up to rigid y-shift); exact strain
    assert np.allclose(d[:, 0], 0.01 * x[:, 0], atol=1e-8)
    eyy = np.polyfit(x[:, 1], d[:, 1], 1)[0]
    assert abs(eyy + 0.3 * 0.01) < 1e-6
