"""1D arterial network (art_net analog) tests.

Oracles mirror the physics the reference's art_net verifies
(ref: src/art_net tests): rest state stability, pulse-wave propagation at
the Moens-Korteweg speed, and mass conservation of the inflow bolus.
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

E, NUE, TH, DIAM = 4.0e5, 0.5, 1.0e-3, 0.0112838  # A0 ~ 1e-4 m^2


def _deck(numstep, qmax=1e-5, n=100):
    return dm.load(f"""
problem: {{type: artery}}
artery_dynamic: {{timestep: 5e-4, numstep: {numstep}, q_in_funct: 1}}
solver: {{method: cg}}
functions:
  1: "{qmax} * sin(pi*t/0.02)^2 * (t < 0.02)"
materials:
  1: {{type: cnst_art, youngs: {E}, nue: {NUE}, th: {TH}, diam: {DIAM},
       density: 1000.0, viscosity: 3.5e-3}}
geometry:
  generator: {{kind: line, n: {n}, p0: [0, 0, 0], p1: [1, 0, 0],
               name: artery, mat: 1}}
""")


def _front(res, rel=0.05):
    f = res.fields["artery"].f
    A = np.asarray(res.states["artery"]["A"])
    x = np.asarray(f.disc.coords)[:, 0]
    dA = A - f.mat.area0
    if dA.max() <= 0:
        return 0.0, dA
    on = dA > rel * dA.max()
    return x[on].max(), dA


def test_rest_state_stays_at_rest():
    res = driver.run(_deck(numstep=50, qmax=0.0))
    A = np.asarray(res.states["artery"]["A"])
    Q = np.asarray(res.states["artery"]["Q"])
    assert np.allclose(A, res.fields["artery"].f.mat.area0, rtol=1e-10)
    assert np.allclose(Q, 0.0, atol=1e-12)


def test_pulse_wave_speed_moens_korteweg():
    r1 = driver.run(_deck(numstep=100))  # t = 0.05
    r2 = driver.run(_deck(numstep=200))  # t = 0.10
    x1, _ = _front(r1)
    x2, _ = _front(r2)
    c_meas = (x2 - x1) / 0.05
    c0 = r1.fields["artery"].f.mat.c0()
    assert abs(c_meas - c0) / c0 < 0.15, (c_meas, c0)


def test_bolus_mass_conservation():
    """Before the pulse reaches the outlet, the stored volume increase must
    equal the integrated inflow (Q_in integrates to qmax * 0.01)."""
    res = driver.run(_deck(numstep=100))
    f = res.fields["artery"].f
    A = np.asarray(res.states["artery"]["A"])
    ml = np.asarray(f.mlump)  # tributary lengths
    vol_added = float(np.sum(ml * (A - f.mat.area0)))
    assert abs(vol_added - 1e-7) / 1e-7 < 0.05, vol_added
