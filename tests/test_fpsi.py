"""FPSI (fluid-poro-structure interaction) tests.

Oracle: the hydrostatic piston against a POROELASTIC block — the fluid
pressure loads the skeleton (compression like FSI) AND sets the interface
pore pressure, which diffuses into the porous domain
(ref: src/fpsi interface coupling semantics).
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

G = 2.0
E_MOD = 1000.0


def _deck(numstep=3):
    return dm.load(f"""
problem: {{type: fpsi}}
structural_dynamic:
  dynamictype: statics
  kinem: nonlinear
  tolres: 1e-8
  toldisp: 1e-9
fluid_dynamic:
  dynamictype: onesteptheta
  theta: 1.0
  tolres: 1e-8
  toldisp: 1e-9
poro_pressure_dynamic: {{dynamictype: onesteptheta, theta: 1.0}}
poroelasticity_dynamic: {{coupling: monolithic, timestep: 1.0, numstep: {numstep}}}
fsi_dynamic: {{timestep: 1.0, numstep: {numstep}, convtol: 1e-7, itemax: 25}}
fpsi_dynamic: {{pressure_penalty: 1e4}}
solver: {{method: gmres, precond: jacobi, maxiter: 3000, gmres_restart: 120}}
materials:
  1: {{type: newtonianfluid, viscosity: 0.1, density: 1.0}}
  2: {{type: structporo, youngs: {E_MOD}, nue: 0.0, biot_alpha: 1.0,
       porosity: 0.3, permeability: 1e-2, viscosity: 1.0,
       storage: 1e-3}}
geometry:
  generator:
    - {{kind: rectangle, nx: 5, ny: 5, cell: quad4, mat: 2, name: structure,
        lo: [1, 0], hi: [2, 1]}}
    - {{kind: rectangle, nx: 5, ny: 5, cell: quad4, mat: 1, name: fluid}}
conditions:
  dirichlet:
    - {{field: fluid, nodes: xmin, onoff: [1,1,0], val: [0,0,0]}}
    - {{field: fluid, nodes: ymin, onoff: [1,1,0], val: [0,0,0]}}
    - {{field: fluid, nodes: ymax, onoff: [1,1,0], val: [0,0,0]}}
    - {{field: fluid, nodes: [0], onoff: [0,0,1], val: [0,0,0]}}
    - {{field: structure, nodes: xmax, onoff: [1,1], val: [0,0]}}
    - {{field: structure, nodes: ymin, onoff: [0,1], val: [0,0]}}
    - {{field: structure, nodes: ymax, onoff: [0,1], val: [0,0]}}
    - {{field: pressure, nodes: xmax, onoff: [1], val: [0.0]}}
  body_force:
    - {{field: fluid, val: [{G}, 0]}}
  fsi_interface:
    - {{structure: xmin, fluid: xmax}}
""")


def test_fpsi_pressure_transmits_into_porous_block():
    res = driver.run(_deck(numstep=3))
    poro = res.fields["fpsi"].poro
    X = np.asarray(poro.solid.disc.coords)
    p = np.asarray(res.states["fpsi"]["p"])
    d = np.asarray(res.states["fpsi"]["d"]).reshape(-1, 2)

    # hydrostatic fluid column: interface pressure ~ rho G L = 2.0
    p_if = p[np.isclose(X[:, 0], 1.0)].mean()
    assert abs(p_if - 2.0) < 0.4, p_if
    # pore pressure decays toward the drained far side
    p_far = p[np.isclose(X[:, 0], 2.0)].mean()
    assert p_far < 0.5 * p_if
    # skeleton compressed by the fluid load (moves +x, away from the fluid)
    u_if = d[np.isclose(X[:, 0], 1.0), 0].mean()
    assert u_if > 1e-4
