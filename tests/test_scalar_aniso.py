"""Anisotropic diffusion tensor transport (ref: scatra_ele diffusion
manager with tensor conductivity, src/scatra_ele/4C_scatra_ele_calc.cpp).

Oracle: a compact Gaussian blob evolving under d phi/dt = div(D grad phi)
grows its second-moment tensor by exactly 2 D t — the measured covariance
increment recovers BOTH principal values and the principal-frame angle.
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

THETA = 0.5236  # 30 degrees
D1, D2 = 2.0e-3, 0.5e-3


def _deck(numstep):
    return dm.load(f"""
problem: {{type: scatra}}
scatra_dynamic:
  dynamictype: onesteptheta
  theta: 0.5
  numstep: {numstep}
  timestep: 0.5
  tolres: 1e-12
  toldisp: 1e-13
  normcombi: or
  initialfield_funct: 1
solver: {{method: cg, precond: jacobi, maxiter: 1200}}
materials:
  1: {{type: scatra, diffusivity: [{D1}, {D2}], diff_angle: {THETA}}}
functions:
  1: "exp(-((x-0.5)^2+(y-0.5)^2)/0.002)"
geometry:
  generator: {{kind: rectangle, nx: 40, ny: 40, cell: quad4, mat: 1,
               lo: [0, 0], hi: [1, 1], name: scatra}}
""")


def _moments(x, y, phi):
    m0 = phi.sum()
    cx, cy = (phi * x).sum() / m0, (phi * y).sum() / m0
    sxx = (phi * (x - cx) ** 2).sum() / m0
    syy = (phi * (y - cy) ** 2).sum() / m0
    sxy = (phi * (x - cx) * (y - cy)).sum() / m0
    return np.array([[sxx, sxy], [sxy, syy]])


def test_anisotropic_gaussian_spread():
    res0 = driver.run(_deck(1))
    res1 = driver.run(_deck(8))
    f = res0.fields["scatra"].f
    X = np.asarray(f.disc.coords)
    x, y = X[:, 0], X[:, 1]
    S0 = _moments(x, y, np.asarray(res0.states["scatra"]["phi"]))
    S1 = _moments(x, y, np.asarray(res1.states["scatra"]["phi"]))
    dt_total = 7 * 0.5
    Dmeas = (S1 - S0) / (2.0 * dt_total)
    c, s = np.cos(THETA), np.sin(THETA)
    R = np.array([[c, -s], [s, c]])
    Dexact = R @ np.diag([D1, D2]) @ R.T
    np.testing.assert_allclose(Dmeas, Dexact, rtol=0.04,
                               atol=0.02 * D1)
    # principal angle recovered
    w, V = np.linalg.eigh(Dmeas)
    ang = np.arctan2(V[1, -1], V[0, -1]) % np.pi
    assert abs(ang - THETA) < 0.03
    # isotropic cross-check: zero angle, equal values -> diagonal D
    assert w[-1] / w[0] > 3.0  # strongly anisotropic spread observed
