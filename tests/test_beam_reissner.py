"""Geometrically exact (Simo-Reissner) beam tests.

Oracles (classic large-rotation benchmarks, the same the reference's beam3r
decks use, ref: tests/input_files/beam3r_*.dat):
- roll-up: tip moment M = pi EI / L bends a straight cantilever into an
  exact half circle of radius R = L/pi -> tip displacement
  (-L, 0, 2L/pi); curvature is constant so the 2-node geodesic element is
  exact in bending angle per element
- small-load limit reduces to the linear Timoshenko solution
- rigid rotation of the whole beam is force-free (objectivity)
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

E = 1.0e7
NU = 0.0  # decouple torsion/shear constants for clean oracles
A = 0.01
I = 8.333e-6
L = 2.0


def _deck(onoff, val, n=10, numstep=10):
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
  1: {{type: beam_elastic, youngs: {E}, nue: {NU}, area: {A}, iyy: {I}, izz: {I},
       torsion_j: {2 * I}, shear_area: {A}, density: 1.0,
       formulation: reissner}}
functions:
  1: "t"
geometry:
  generator: {{kind: line, n: {n}, p0: [0,0,0], p1: [{L},0,0]}}
conditions:
  dirichlet:
    - {{nodes: start, onoff: [1,1,1,1,1,1], val: [0,0,0,0,0,0]}}
  point_neumann:
    - {{nodes: end, onoff: {onoff}, val: {val}, funct: {[1] * 6}}}
""")


def test_rollup_half_circle():
    M = np.pi * E * I / L
    res = driver.run(_deck([0, 0, 0, 0, 1, 0], [0, 0, 0, 0, -M, 0]))
    n = 10
    ux = res.query("structure", "dispx", n)
    uy = res.query("structure", "dispy", n)
    uz = res.query("structure", "dispz", n)
    # half circle: the n-segment geodesic discretization is EXACT in the
    # nodal rotations (theta_k = -k pi / n) and puts the tip at the closed
    # polygon sum: z = (L/n) sum sin((k+1/2) pi/n) = (L/n)/sin(pi/(2n)),
    # x = 0.  Continuum limit: (−L, 0, 2L/pi).
    z_exact = (L / n) / np.sin(np.pi / (2 * n))
    assert ux == pytest.approx(-L, abs=1e-8)
    assert abs(uy) < 1e-8
    assert abs(uz) == pytest.approx(z_exact, abs=1e-7)
    assert abs(uz) == pytest.approx(2 * L / np.pi, rel=5e-3)  # converges
    th_y = np.asarray(res.states["structure"]["d"]).reshape(-1, 6)[:, 4]
    assert np.allclose(th_y, -np.pi * np.arange(n + 1) / n, atol=1e-9)


def test_small_load_matches_linear():
    P = 0.01  # tip deflection ~ 3e-4 L: linear regime
    res = driver.run(_deck([0, 0, 1, 0, 0, 0], [0, 0, P, 0, 0, 0], numstep=1))
    tip = res.query("structure", "dispz", 10)
    exact = P * L**3 / (3 * E * I) + P * L / (E / 2 * A)  # G = E/2 (nue=0)
    assert tip == pytest.approx(exact, rel=5e-3)  # O(h^2) reduced-integration error


def test_reissner_rigid_rotation_force_free():
    import jax.numpy as jnp

    from fourc_tpu.materials import make_material
    from fourc_tpu.ops import beam_gex

    mat = make_material({"type": "beam_elastic", "youngs": E, "nue": NU,
                         "area": A, "iyy": I, "izz": I, "torsion_j": 2 * I,
                         "shear_area": A, "formulation": "reissner"})
    Xe = np.array([[[0, 0, 0], [0.5, 0, 0]],
                   [[0.5, 0, 0], [1.0, 0, 0]]])
    force = beam_gex.make_internal_force(Xe, mat)
    th = np.array([0.3, -0.2, 0.4])
    # manual Rodrigues
    ang = np.linalg.norm(th)
    k = th / ang
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
    ue = np.zeros((2, 2, 6))
    for e in range(2):
        for a_ in range(2):
            ue[e, a_, :3] = R @ Xe[e, a_] - Xe[e, a_]
            ue[e, a_, 3:] = th
    f = np.asarray(force(jnp.asarray(ue)))
    assert np.abs(f).max() < 1e-6 * E * I
