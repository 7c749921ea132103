"""Smoothed-aggregation AMG tests (MueLu analog for unstructured meshes).

Oracle: on a tet4 mesh (no geometric hierarchy) AMG-preconditioned CG
needs far fewer iterations than Jacobi and reaches the same solution.
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver


def _deck(precond):
    return dm.load(f"""
problem: {{type: structure}}
structural_dynamic: {{dynamictype: statics, kinem: linear, numstep: 1,
                     timestep: 1.0, maxiter: 6, tolres: 1e-8,
                     toldisp: 1e-9, normcombi: or}}
solver: {{method: cg, precond: {precond}, maxiter: 4000, rtol: 1e-8}}
functions:
  1: "t"
materials:
  1: {{type: stvenantkirchhoff, youngs: 1000.0, nue: 0.3}}
geometry:
  generator: {{kind: box, nx: 6, ny: 6, nz: 6, cell: tet4, mat: 1}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,1,1], val: [0,0,0]}}
  neumann:
    - {{faces: xmax, onoff: [0,0,1], val: [0,0,-5.0], funct: [0,0,1]}}
""")


def test_amg_beats_jacobi_on_tets():
    r_j = driver.run(_deck("jacobi"))
    r_a = driver.run(_deck("amg"))
    it_j = r_j.stats["structure"]["lin_iters"]
    it_a = r_a.stats["structure"]["lin_iters"]
    d_j = np.asarray(r_j.states["structure"]["d"])
    d_a = np.asarray(r_a.states["structure"]["d"])
    assert np.allclose(d_a, d_j, atol=5e-6 * np.abs(d_j).max() + 1e-10)
    assert it_a < 0.4 * it_j, (it_a, it_j)
