"""Kirchhoff (shear-free) geometrically exact beam tests — beam3k
counterpart (torsion-free Hermite variant).

Oracles:
- small-load cantilever: Euler-Bernoulli tip deflection P L^3 / 3EI
  EXACTLY in the shear-free limit (the Hermite cubic represents the
  static EB solution for a tip load exactly)
- large deflection: matches the Simo-Reissner element in its Kirchhoff
  limit (shear stiffness >> bending) within discretization error
- objectivity: rigid rotation of the whole beam is energy/force-free

ref: src/beam3/4C_beam3_kirchhoff.{hpp,cpp}
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

E = 1.0e7
A = 0.01
I = 8.333e-6
L = 2.0


def _deck(formulation, P, n=10, numstep=5, shear_area=A):
    return dm.load(f"""
problem: {{type: structure}}
structural_dynamic:
  dynamictype: statics
  numstep: {numstep}
  timestep: {1.0 / numstep}
  tolres: 1e-8
  toldisp: 1e-10
  maxiter: 50
solver: {{method: gmres, precond: jacobi, maxiter: 4000, gmres_restart: 200}}
materials:
  1: {{type: beam_elastic, youngs: {E}, nue: 0.0, area: {A}, iyy: {I},
       izz: {I}, torsion_j: {2 * I}, shear_area: {shear_area}, density: 1.0,
       formulation: {formulation}}}
functions:
  1: "t"
geometry:
  generator: {{kind: line, n: {n}, p0: [0,0,0], p1: [{L},0,0]}}
conditions:
  dirichlet:
    - {{nodes: start, onoff: [1,1,1,1,1,1], val: [0,0,0,0,0,0]}}
  point_neumann:
    - {{nodes: end, onoff: [0,0,1,0,0,0], val: [0,0,{P},0,0,0],
        funct: [1,1,1,1,1,1]}}
""")


def test_small_load_euler_bernoulli_exact():
    P = 1.0e-2 * E * I / L**2  # tiny: linear regime
    res = driver.run(_deck("kirchhoff", P))
    w_tip = res.query("structure", "dispz", 10)
    w_eb = P * L**3 / (3 * E * I)
    np.testing.assert_allclose(w_tip, w_eb, rtol=2e-4)


def test_large_deflection_matches_reissner_kirchhoff_limit():
    P = 3.0 * E * I / L**2  # PL^2/EI = 3: strongly geometric regime
    res_k = driver.run(_deck("kirchhoff", P, n=16, numstep=8))
    # Reissner in the Kirchhoff limit: shear stiffness 1000x bending scale
    res_r = driver.run(_deck("reissner", P, n=16, numstep=8,
                             shear_area=A * 100))
    for q in ("dispx", "dispz"):
        vk = res_k.query("structure", q, 16)
        vr = res_r.query("structure", q, 16)
        np.testing.assert_allclose(vk, vr, rtol=0.02, atol=1e-4 * L)
    # sanity: genuinely large deflection
    assert abs(res_k.query("structure", "dispz", 16)) > 0.4 * L


def test_objectivity_rigid_rotation_force_free():
    from fourc_tpu.materials import make_material
    from fourc_tpu.ops import beam_kirchhoff as bk
    import jax.numpy as jnp

    mat = make_material({"type": "beam_elastic", "youngs": E, "area": A,
                         "iyy": I, "izz": I, "formulation": "kirchhoff"})
    X = np.array([[[0.0, 0, 0], [0.5, 0, 0]],
                  [[0.5, 0, 0], [1.0, 0, 0]]])
    force = bk.make_internal_force(X, mat)
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    T = np.array([1.0, 0, 0])
    u = X @ R.T - X  # rigid rotation displacement
    t = np.broadcast_to(R @ T - T, (2, 2, 3))
    ue6 = np.concatenate([u, t], axis=2)
    fe = np.asarray(force(jnp.asarray(ue6)))
    assert np.abs(fe).max() < 1e-8 * E * I
