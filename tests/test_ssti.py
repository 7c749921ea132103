"""SSTI (scatra-structure-thermo) tests.

Oracle: free thermal+swelling expansion — with spatially uniform c and T
ramps, the strain superposes exactly: eps = beta dc + alpha dT
(ref: src/ssti monolithic coupling semantics).
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

BETA, ALPHA = 0.02, 0.01
DC, DT_T = 0.5, 2.0


def _deck(beta=BETA, alpha=ALPHA):
    return dm.load(f"""
problem: {{type: ssti}}
ssti_dynamic: {{timestep: 0.5, numstep: 2, thermal_expansion: {alpha},
               ref_temp: 0.0}}
structural_dynamic: {{dynamictype: statics, kinem: nonlinear, numstep: 2,
                     timestep: 0.5, maxiter: 20, tolres: 1e-9,
                     toldisp: 1e-9, normcombi: or}}
scatra_dynamic: {{dynamictype: onesteptheta, theta: 1.0}}
thermal_dynamic: {{dynamictype: onesteptheta, theta: 1.0}}
solver: {{method: gmres, precond: jacobi, maxiter: 3000, rtol: 1e-10,
         gmres_restart: 100}}
functions:
  1: "t"
  2: "t"
materials:
  1: {{type: scatra_stvenantkirchhoff, youngs: 1000.0, nue: 0.0,
       swelling: {beta}, refconc: 0.0, diffusivity: 1.0, capacity: 1.0}}
geometry:
  generator: {{kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 1,
               name: structure}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,0,0], val: [0,0,0]}}
    - {{nodes: [0], onoff: [0,1,1], val: [0,0,0]}}
    - {{nodes: [3], onoff: [0,0,1], val: [0,0,0]}}
    - {{nodes: all, onoff: [1], val: [{DC}], funct: [1], field: scatra}}
    - {{nodes: all, onoff: [1], val: [{DT_T}], funct: [2], field: thermo}}
""")


def test_ssti_superposed_free_expansion():
    res = driver.run(_deck())
    f = res.fields["ssti"].f
    d = np.asarray(res.states["ssti"]["d"]).reshape(-1, 3)
    X = np.asarray(f.disc.coords)
    eps_ref = BETA * DC + ALPHA * DT_T  # both ramps reach full value at t=1
    # free expansion: u = eps * x (all directions), within geometric
    # nonlinearity tolerance (eps ~ 3%)
    for k in range(3):
        sel = X[:, k] > 0.9
        eps_k = d[sel, k].mean()
        assert abs(eps_k - eps_ref) / eps_ref < 0.05, (k, eps_k, eps_ref)


def test_ssti_decouples_when_coefficients_zero():
    res = driver.run(_deck(beta=0.0, alpha=0.0))
    d = np.asarray(res.states["ssti"]["d"])
    assert np.abs(d).max() < 1e-10
    # scalars still evolve
    assert abs(res.query("ssti", "c", 0) - DC) < 1e-8
    assert abs(res.query("ssti", "temperature", 0) - DT_T) < 1e-8
