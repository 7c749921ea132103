"""FBI (immersed fluid-beam interaction) tests.

Oracle: a flexible fiber clamped at the channel floor bends downstream
under flow drag; tip deflection is bounded by the cantilever-with-
distributed-load estimate q L^4 / (8 E I), q = c_d U
(ref: src/fbi weak Dirichlet/penalty beam-fluid coupling).
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

U, CD, EI, LF = 1.0, 0.5, 2e-3, 0.5


def _deck(inflow, numstep=8):
    return dm.load(f"""
problem: {{type: fbi}}
fbi_dynamic: {{timestep: 0.25, numstep: {numstep}, drag: {CD}}}
structural_dynamic: {{maxiter: 15, tolres: 1e-9, toldisp: 1e-10,
                     normcombi: or}}
fluid_dynamic: {{dynamictype: onesteptheta, theta: 1.0, tolres: 1e-8,
                toldisp: 1e-9}}
solver: {{method: gmres, precond: jacobi, maxiter: 3000, gmres_restart: 100}}
functions:
  1: "{inflow}"
materials:
  1: {{type: newtonianfluid, viscosity: 0.05, density: 1.0}}
  2: {{type: beam_elastic, youngs: 1.0, area: 1.0, iyy: {EI}, izz: {EI},
       density: 1.0}}
geometry:
  generator:
    - {{kind: rectangle, nx: 10, ny: 6, cell: quad4, mat: 1, name: fluid,
        lo: [0, 0], hi: [2, 1]}}
    - {{kind: line, n: 5, p0: [0.65, 0.02, 0], p1: [0.65, {0.02 + LF}, 0],
        name: beams, mat: 2}}
conditions:
  dirichlet:
    - {{field: fluid, nodes: xmin, onoff: [1,1,0], val: [{U}, 0, 0],
        funct: [1, 0, 0]}}
    - {{field: fluid, nodes: ymin, onoff: [0,1,0], val: [0,0,0]}}
    - {{field: fluid, nodes: ymax, onoff: [0,1,0], val: [0,0,0]}}
    - {{field: beams, nodes: start, onoff: [1,1,1,1,1,1],
        val: [0,0,0,0,0,0]}}
    - {{field: beams, nodes: all, onoff: [0,0,1,1,1,0],
        val: [0,0,0,0,0,0]}}
""")


def test_fbi_fiber_bends_downstream():
    res = driver.run(_deck(inflow=1.0))
    d = np.asarray(res.states["beams"]["d"]).reshape(-1, 6)
    tip_ux = d[-1, 0]
    # bends downstream, bounded by the distributed-load cantilever estimate
    w_est = CD * U * LF**4 / (8.0 * 1.0 * EI)
    assert tip_ux > 0.15 * w_est
    assert tip_ux < 1.5 * w_est
    # fluid feels the fiber: wake velocity deficit behind it
    f = res.fields["fluid"].f
    x = np.asarray(res.states["fluid"]["x"]).reshape(-1, f.ndpn)
    X = np.asarray(f.disc.coords)
    behind = (np.abs(X[:, 0] - 0.8) < 0.11) & (X[:, 1] > 0.15) & (X[:, 1] < 0.45)
    free = (np.abs(X[:, 0] - 0.8) < 0.11) & (X[:, 1] > 0.7)
    assert x[behind, 0].mean() < x[free, 0].mean()


def test_fbi_no_flow_no_motion():
    res = driver.run(_deck(inflow=0.0, numstep=3))
    d = np.asarray(res.states["beams"]["d"])
    assert np.abs(d).max() < 1e-10
