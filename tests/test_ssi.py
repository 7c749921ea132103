"""SSI tests: free swelling + monolithic/partitioned agreement."""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

BETA = 1e-3
C0 = 1.0
DC = 5.0


def _deck(coupling, numstep=1, dt=1.0):
    return dm.load(f"""
problem: {{type: ssi}}
structural_dynamic: {{dynamictype: statics, kinem: nonlinear, tolres: 1e-8, toldisp: 1e-9}}
scatra_dynamic: {{dynamictype: onesteptheta, theta: 1.0, tolres: 1e-8, toldisp: 1e-9}}
ssi_dynamic: {{coupling: {coupling}, timestep: {dt}, numstep: {numstep}}}
solver: {{method: gmres, precond: block_jacobi}}
materials:
  1:
    type: scatra_stvenantkirchhoff
    youngs: 1000.0
    nue: 0.3
    swelling: {BETA}
    refconc: {C0}
    diffusivity: 5.0
functions:
  1: "1"
geometry:
  generator: {{kind: box, nx: 3, ny: 3, nz: 3, cell: hex8, mat: 1, name: structure}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,0,0], val: [0,0,0]}}
    - {{nodes: ymin, onoff: [0,1,0], val: [0,0,0]}}
    - {{nodes: zmin, onoff: [0,0,1], val: [0,0,0]}}
    - {{field: scatra, nodes: all, onoff: [1], val: [{C0 + DC}], funct: [1]}}
""")


@pytest.mark.parametrize("coupling", ["oneway", "partitioned", "monolithic"])
def test_free_swelling(coupling):
    """Uniform concentration rise -> stress-free swelling d = beta dc x."""
    res = driver.run(_deck(coupling))
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    X = res.fields["structure"].f.disc.coords
    expect = BETA * DC * X
    assert np.abs(d - expect).max() < 5e-5
    c = np.asarray(res.states["scatra"]["phi"])
    assert np.allclose(c, C0 + DC, atol=1e-8)


def test_ssi_monolithic_matches_partitioned():
    res_m = driver.run(_deck("monolithic", numstep=2, dt=0.5))
    res_p = driver.run(_deck("partitioned", numstep=2, dt=0.5))
    dm_ = np.asarray(res_m.states["structure"]["d"])
    dp_ = np.asarray(res_p.states["structure"]["d"])
    assert np.abs(dm_ - dp_).max() < 1e-7
