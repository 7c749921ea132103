"""MULF prestress tests.

Oracle (ref: the MULF prestress semantics): after the prestress phase the
LOADED configuration becomes the stress-carrying reference — re-applying
the same load produces (almost) no further displacement, while without
prestress it deflects fully.
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver


def _deck(prestress_steps):
    return dm.load(f"""
problem: {{type: structure}}
structural_dynamic:
  dynamictype: statics
  kinem: nonlinear
  numstep: 1
  timestep: 1.0
  maxiter: 20
  tolres: 1e-9
  toldisp: 1e-10
  normcombi: or
  prestress: mulf
  prestress_steps: {prestress_steps}
solver: {{method: direct}}
functions:
  1: "1.0"
materials:
  1: {{type: mulf, material: {{type: neohooke, youngs: 1000.0, nue: 0.3}}}}
geometry:
  generator: {{kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 1}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,1,1], val: [0,0,0]}}
  neumann:
    - {{faces: xmax, onoff: [1,0,0], val: [20.0, 0, 0], funct: [1, 0, 0]}}
""")


def test_mulf_prestress_absorbs_load():
    d_plain = np.asarray(driver.run(_deck(0)).states["structure"]["d"])
    d_pre = np.asarray(driver.run(_deck(1)).states["structure"]["d"])
    u_plain = np.abs(d_plain).max()
    u_pre = np.abs(d_pre).max()
    assert u_plain > 1e-2  # the load does deflect an unstressed body
    # after one MULF pass the deformed state carries the load: residual
    # motion under the SAME load is an order of magnitude smaller
    assert u_pre < 0.12 * u_plain, (u_pre, u_plain)
