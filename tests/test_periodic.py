"""Periodic boundary condition tests (tied translated interfaces).

Oracle: a shear-loaded RVE with x-periodic BCs reproduces the uniform
shear solution: u on xmax equals u on xmin node-for-node
(ref: periodic-boundary dofsets, core/fem/src/dofset pbc wrappers).
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver


def test_periodic_faces_move_together():
    res = driver.run(dm.load("""
problem: {type: structure}
structural_dynamic: {dynamictype: statics, kinem: linear, numstep: 1,
                     timestep: 1.0, maxiter: 10, tolres: 1e-9,
                     toldisp: 1e-9, normcombi: or}
solver: {method: direct}
functions:
  1: "t"
materials:
  1: {type: stvenantkirchhoff, youngs: 1000.0, nue: 0.3}
geometry:
  generator: {kind: box, nx: 3, ny: 3, nz: 3, cell: hex8, mat: 1}
conditions:
  dirichlet:
    - {nodes: zmin, onoff: [1,1,1], val: [0,0,0]}
    - {nodes: zmax, onoff: [1,0,1], val: [0.05, 0, 0], funct: [1, 0, 0]}
  periodic:
    - {slave: xmax, master: xmin}
"""))
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    X = np.asarray(f.disc.coords)
    # pair nodes on the two faces by (y, z)
    lo = f.disc.node_sets["xmin"]
    hi = f.disc.node_sets["xmax"]
    key = lambda ids: np.lexsort((X[ids, 2], X[ids, 1]))
    d_lo = d[lo[key(lo)]]
    d_hi = d[hi[key(hi)]]
    assert np.abs(d_hi - d_lo).max() < 1e-10
    # the shear actually happened
    assert abs(d[f.disc.node_sets["zmax"], 0].mean() - 0.05) < 1e-8
