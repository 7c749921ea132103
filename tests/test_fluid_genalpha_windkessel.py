"""Fluid gen-alpha time integration + Windkessel (RCR) outflow impedance.

ref: 4C_fluid_timint_genalpha.* (JWH generalized-alpha for N-S) and
src/fluid/4C_fluid_impedancecondition.* (3-element Windkessel outflow).

Oracles:
- gen-alpha on a decaying transient reaches the same steady state as
  one-step-theta, and matches OST closely at small dt.
- plug flow through a frictionless channel into an RCR outflow: the
  steady outlet pressure is (R1 + R2) * Q exactly.
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver


def _channel_deck(dyntype, numstep, dt, extra_cond="", rho_inf=0.7):
    return dm.load(f"""
problem: {{type: fluid}}
fluid_dynamic: {{dynamictype: {dyntype}, timestep: {dt}, numstep: {numstep},
                theta: 0.6, rho_inf: {rho_inf}, maxiter: 25, tolres: 1e-10,
                toldisp: 1e-12, normcombi: or}}
solver: {{method: gmres, precond: jacobi, maxiter: 2000, gmres_restart: 120}}
materials:
  1: {{type: newtonianfluid, viscosity: 0.01, density: 1.0}}
functions:
  1: "1.0 - exp(-5.0*t)"
geometry:
  generator: {{kind: rectangle, nx: 6, ny: 3, cell: quad4, mat: 1,
              lo: [0, 0], hi: [2, 1], name: fluid}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,1,0], val: [0.5,0,0], funct: [1,0,0]}}
    - {{nodes: ymin, onoff: [0,1,0], val: [0,0,0]}}
    - {{nodes: ymax, onoff: [0,1,0], val: [0,0,0]}}
{extra_cond}
""")


WK = """  windkessel_outflow:
    - {faces: xmax, r1: 2.0, r2: 8.0, c: 0.5}
"""


def _outlet_state(res):
    f = res.fields["fluid"].f
    x = np.asarray(res.states["fluid"]["x"]).reshape(-1, f.ndpn)
    out = f.disc.node_sets["xmax"]
    return x[out, 0].mean(), x[out, f.dim].mean()  # (u_x, p) at outlet


def test_windkessel_steady_pressure():
    """Plug flow (slip walls): Q = 0.5 * 1 = 0.5, steady outlet pressure
    (R1 + R2) Q = 5.0."""
    res = driver.run(_channel_deck("onesteptheta", 60, 0.5, WK))
    u_out, p_out = _outlet_state(res)
    Q = 0.5 * 1.0
    assert u_out == pytest.approx(0.5, rel=1e-3)
    assert p_out == pytest.approx((2.0 + 8.0) * Q, rel=2e-2), p_out
    # distal state converged to R2*Q
    pwk = float(np.asarray(res.states["fluid"]["pwk"])[0])
    assert pwk == pytest.approx(8.0 * Q, rel=2e-2)


def test_windkessel_transient_charging():
    """Early in the transient the capacitor keeps the distal pressure well
    below its steady value (RC charging)."""
    res = driver.run(_channel_deck("onesteptheta", 4, 0.5, WK))
    pwk = float(np.asarray(res.states["fluid"]["pwk"])[0])
    assert 0.0 < pwk < 0.8 * 8.0 * 0.5


def test_genalpha_matches_ost_steady():
    res_ga = driver.run(_channel_deck("genalpha", 50, 0.5, WK))
    res_ost = driver.run(_channel_deck("onesteptheta", 50, 0.5, WK))
    u_ga, p_ga = _outlet_state(res_ga)
    u_ost, p_ost = _outlet_state(res_ost)
    assert u_ga == pytest.approx(u_ost, rel=1e-4)
    assert p_ga == pytest.approx(p_ost, rel=1e-3)


def test_genalpha_runs_high_dissipation():
    """rho_inf = 0 (maximal damping) remains stable on the ramp."""
    res = driver.run(_channel_deck("genalpha", 10, 0.25, WK, rho_inf=0.0))
    u_out, _ = _outlet_state(res)
    assert np.isfinite(u_out)
