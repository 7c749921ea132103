"""Membrane element tests (2D elements in 3D, plane stress, no bending).

Oracles: (1) rigid-body motion produces zero internal force (exact
geometric nonlinearity of the curvilinear kinematics); (2) uniaxial
stretch of a flat sheet reproduces the plane-stress lateral contraction
nue_eff = nue; (3) the force scales linearly with thickness.
(ref: src/membrane — 4C_membrane_evaluate.cpp plane-stress membranes.)
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

E_MOD = 100.0
NUE = 0.3


def _kernel(u_fn, thickness=0.02):
    import jax.numpy as jnp

    from fourc_tpu.core.cells import get_cell
    from fourc_tpu.materials import make_material
    from fourc_tpu.ops import membrane as mops

    cell = get_cell("quad4")
    mat = make_material({"type": "membrane", "youngs": E_MOD, "nue": NUE,
                         "thickness": thickness})
    X = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
    u = np.asarray([u_fn(x) for x in X])
    f = mops.internal_force(jnp.asarray(X[None]), jnp.asarray(u[None]),
                            cell, mat, thickness)
    return np.asarray(f)[0]


def test_membrane_rigid_motion_force_free():
    th = 0.4
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1.0]])
    R2 = np.array([[1, 0, 0],
                   [0, np.cos(th), -np.sin(th)],
                   [0, np.sin(th), np.cos(th)]])
    Rot = R2 @ R
    f = _kernel(lambda x: Rot @ x + np.array([0.3, -0.2, 0.5]) - x)
    assert np.abs(f).max() < 1e-12


def test_membrane_thickness_scaling():
    f1 = _kernel(lambda x: np.array([0.05 * x[0], 0, 0]), thickness=0.02)
    f2 = _kernel(lambda x: np.array([0.05 * x[0], 0, 0]), thickness=0.04)
    assert np.allclose(2 * f1, f2, rtol=1e-12)


def test_membrane_plane_stress_contraction():
    """Sheet stretched by 5% in x; free lateral edges contract by ~nue*eps
    (plane stress)."""
    deck = dm.load(f"""
problem: {{type: structure}}
structural_dynamic:
  dynamictype: statics
  kinem: nonlinear
  numstep: 2
  timestep: 0.5
  maxiter: 30
  tolres: 1e-10
  toldisp: 1e-12
solver: {{method: gmres, precond: block_jacobi, maxiter: 2000, gmres_restart: 100}}
materials:
  1: {{type: membrane, youngs: {E_MOD}, nue: {NUE}, thickness: 0.01}}
functions:
  1: "t"
geometry:
  generator:
    - {{kind: sheet, nx: 6, ny: 6, origin: [0, 0, 0], u: [1, 0, 0],
        v: [0, 1, 0], cell: quad4, mat: 1, name: structure}}
conditions:
  dirichlet:
    - {{nodes: all, onoff: [0,0,1], val: [0,0,0]}}
    - {{nodes: xmin, onoff: [1,0,0], val: [0,0,0]}}
    - {{nodes: xmax, onoff: [1,0,0], val: [0.05,0,0], funct: [1,0,0]}}
    - {{nodes: [0], onoff: [0,1,0], val: [0,0,0]}}
""")
    res = driver.run(deck)
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    X = np.asarray(f.disc.coords)
    # lateral contraction at the free edges, measured at mid-span
    mid = np.where((np.abs(X[:, 0] - 0.5) < 1e-9))[0]
    width = (X[mid, 1].max() + d[mid, 1][np.argmax(X[mid, 1])]) - (
        X[mid, 1].min() + d[mid, 1][np.argmin(X[mid, 1])])
    eps_y = width - 1.0
    # finite-strain SVK plane stress: eps_y ~ -nue * eps_x (moderate strain)
    assert eps_y == pytest.approx(-NUE * 0.05, rel=0.12)
    # no out-of-plane motion
    assert np.abs(d[:, 2]).max() < 1e-10
