"""Diffusion-conduction (Newman) electrochemistry tests.

Oracle: a binary concentrated electrolyte carrying NO current develops the
concentration overpotential

    phi(x) - phi(ref) = (2RT/F) (1 - t+) f_th * ln(c(x)/c(ref))

(zero-current limit of the Newman current law i = -kappa grad phi +
(2RT/F) kappa (1 - t+) f_th grad ln c; ref:
src/scatra_ele/4C_scatra_ele_calc_elch_diffcond.*, src/mat/4C_mat_newman.*).
With constant D the steady concentration profile is linear.
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

pytestmark = pytest.mark.minimal

FRT = 96485.3329 / (8.314462 * 298.0)
TP = 0.3
FTH = 1.2
CL, CR = 2.0, 1.0


def _deck(numstep=40, dt=0.05, nx=16):
    return dm.load(f"""
problem: {{type: elch}}
scatra_dynamic:
  dynamictype: onesteptheta
  theta: 1.0
  timestep: {dt}
  numstep: {numstep}
  tolres: 1e-10
  toldisp: 1e-12
  maxiter: 25
solver: {{method: gmres, precond: jacobi, maxiter: 4000, gmres_restart: 200}}
materials:
  1:
    type: newman
    diffusivity: 0.8
    conductivity: "0.5*c"
    transference: {TP}
    thermfac: {FTH}
    c0: {CR}
geometry:
  generator:
    - {{kind: rectangle, nx: {nx}, ny: 1, cell: quad4, mat: 1, name: elch,
        lo: [0, 0], hi: [1, 0.1]}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,1], val: [{CL}, 0]}}
    - {{nodes: xmax, onoff: [1,0], val: [{CR}, 0]}}
""")


def test_concentration_overpotential_zero_current():
    res = driver.run(_deck())
    f = res.fields["elch"].f
    y = np.asarray(res.states["elch"]["y"]).reshape(-1, 2)
    X = np.asarray(f.disc.coords)

    # steady linear concentration profile (constant D, no current)
    c_expect = CL + (CR - CL) * X[:, 0]
    np.testing.assert_allclose(y[:, 0], c_expect, rtol=2e-3)

    # concentration overpotential at the right boundary
    right = f.disc.node_sets["xmax"]
    phi_r = y[right, 1].mean()
    phi_expect = (2.0 / FRT) * (1.0 - TP) * FTH * np.log(CR / CL)
    np.testing.assert_allclose(phi_r, phi_expect, rtol=2e-3)

    # the potential follows the ln(c) profile pointwise
    phi_profile = (2.0 / FRT) * (1.0 - TP) * FTH * np.log(y[:, 0] / CL)
    np.testing.assert_allclose(y[:, 1], phi_profile, atol=5e-3 * abs(phi_expect))
