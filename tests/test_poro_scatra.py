"""Poroelast-scatra: Darcy-advected transport through a porous column.

Oracle analog of the reference's poroelast_scatra regression decks (ref:
src/poroelast_scatra, tests/input_files poroelast_scatra cases).

Setup: stiff porous column with a pressure drop P0 across its height ->
steady Darcy flux q = (k/mu) P0 / H upward; a concentration front fed at
the inlet advects with seepage speed v = q / phi and spreads with
D' = D / phi.  Compare against the 1D advection-diffusion erfc solution.
"""

import numpy as np
import pytest
from scipy.special import erfc

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

E = 1.0e6  # stiff skeleton: deformation negligible
K_OVER_MU = 0.02
P0 = 5.0
H = 1.0
PHI = 0.4
D = 0.002
Q = K_OVER_MU * P0 / H  # Darcy flux
V = Q / PHI  # seepage (front) speed
DP = D / PHI


def _deck(numstep, dt, nz=24):
    return dm.load(f"""
problem: {{type: poroelast_scatra}}
structural_dynamic:
  dynamictype: statics
  kinem: nonlinear
  tolres: 1e-8
  toldisp: 1e-9
poro_pressure_dynamic:
  dynamictype: onesteptheta
  theta: 1.0
  tolres: 1e-9
  toldisp: 1e-10
scatra_dynamic:
  dynamictype: onesteptheta
  theta: 0.5
  tolres: 1e-9
  toldisp: 1e-10
poroelasticity_dynamic:
  coupling: monolithic
  timestep: {dt}
  numstep: {numstep}
solver: {{method: gmres, precond: block_jacobi, maxiter: 4000, gmres_restart: 120}}
materials:
  1:
    type: structporo
    youngs: {E}
    nue: 0.0
    biot_alpha: 1.0
    permeability: {K_OVER_MU}
    viscosity: 1.0
    storage: 1e-4
  2:
    type: scatra
    diffusivity: {D}
    capacity: {PHI}
functions:
  1: "1"
geometry:
  generator:
    - {{kind: box, nx: 1, ny: 1, nz: {nz}, cell: hex8, mat: 1, name: structure,
        lo: [0, 0, 0], hi: [0.1, 0.1, {H}]}}
    - {{kind: box, nx: 1, ny: 1, nz: {nz}, cell: hex8, mat: 2, name: scatra,
        lo: [0, 0, 0], hi: [0.1, 0.1, {H}]}}
conditions:
  dirichlet:
    - {{nodes: zmin, onoff: [1,1,1], val: [0,0,0]}}
    - {{nodes: all, onoff: [1,1,0], val: [0,0,0]}}
    - {{field: pressure, nodes: zmin, onoff: [1], val: [{P0}]}}
    - {{field: pressure, nodes: zmax, onoff: [1], val: [0]}}
    - {{field: scatra, nodes: zmin, onoff: [1], val: [1.0]}}
""")


def test_darcy_advection_front():
    dt, numstep = 0.05, 40  # t_end = 2.0; front at v*t = 0.5
    res = driver.run(_deck(numstep, dt))
    state = res.states["poro_scatra"]
    f = res.fields["poro_scatra"].f
    X = np.asarray(f.poro.solid.disc.coords)
    t_end = numstep * dt

    # pressure is the linear steady profile (storage tiny)
    p = np.asarray(state["p"])
    np.testing.assert_allclose(p, P0 * (1 - X[:, 2] / H), atol=0.02 * P0)

    # Darcy flux projection: q_z = (k/mu) P0 / H everywhere
    q = np.asarray(f.darcy_nodes(state["p"]))
    np.testing.assert_allclose(q[:, 2], Q, rtol=0.03)

    # concentration front: Ogata-Banks solution for c(0,t)=1 on z>0
    #   c = 1/2 [erfc((z-vt)/(2 sqrt(D't))) + e^(vz/D') erfc((z+vt)/(2 sqrt(D't)))]
    c = np.asarray(state["c"])
    z = X[:, 2]
    interior = (z > 0.05) & (z < 0.9)
    s = 2 * np.sqrt(DP * t_end)
    with np.errstate(over="ignore"):
        tail = np.exp(np.minimum(V * z / DP, 700)) * erfc((z + V * t_end) / s)
    want = 0.5 * (erfc((z - V * t_end) / s) + tail)
    err = np.abs(c[interior] - want[interior]).max()
    assert err < 0.04, f"front mismatch {err:.3f}"


def test_result_description_surface():
    """Deck-level result check drives the same run through the CLI path."""
    deck = _deck(10, 0.05)
    deck.result_description = [
        {"field": "scatra", "node": 0, "quantity": "phi", "value": 1.0,
         "tolerance": 1e-8},
    ]
    res = driver.run(deck)
    from fourc_tpu.io.result_test import assert_result_tests

    assert_result_tests(deck.result_description, res)
