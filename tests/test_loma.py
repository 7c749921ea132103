"""Low-Mach (loma) tests: thermal expansion drives outflow.

Oracle: uniform heating of an ideal gas in a box with one open side —
divergence theorem gives outflow Q = integral of div u = V * (dT/dt) / T
exactly (T spatially uniform), independent of the velocity profile
(ref: src/loma algorithm semantics).
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

S_HEAT = 30.0
T0 = 300.0


def _deck(heat, numstep=4, n=8):
    return dm.load(f"""
problem: {{type: loma}}
loma_dynamic: {{timestep: 0.01, numstep: {numstep}, p_thermo: 1.0e5,
               gas_constant: 287.0, initial_t_funct: 2, tolres: 1e-7}}
fluid_dynamic: {{maxiter: 12, tolres: 1e-7, toldisp: 1e-9, normcombi: or}}
solver: {{method: gmres, precond: jacobi, maxiter: 4000, rtol: 1e-9,
         gmres_restart: 120}}
functions:
  1: "{heat}"
  2: "{T0}"
materials:
  1: {{type: newtonianfluid, viscosity: 1e-3, density: 1.16}}
  2: {{type: fourier, conductivity: 1e-6, density: 1.0, capacity: 1.0}}
geometry:
  generator: {{kind: rectangle, nx: {n}, ny: {n}, cell: quad4, mat: 1,
               lo: [0, 0], hi: [1, 1], name: loma}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,1,0], val: [0,0,0], field: loma}}
    - {{nodes: ymin, onoff: [1,1,0], val: [0,0,0], field: loma}}
    - {{nodes: ymax, onoff: [1,1,0], val: [0,0,0], field: loma}}
  body_force:
    - {{val: [1.0], funct: [1], field: thermo}}
""")


def _outflow(res):
    f = res.fields["loma"].f
    x = np.asarray(res.states["loma"]["x"]).reshape(-1, f.ndpn)
    X = np.asarray(f.disc.coords)
    sel = np.isclose(X[:, 0], 1.0)
    y = X[sel, 1]
    ux = x[sel, 0]
    order = np.argsort(y)
    return np.trapezoid(ux[order], y[order])


def test_thermal_expansion_outflow():
    res = driver.run(_deck(S_HEAT))
    T = np.asarray(res.states["loma"]["T"])
    # uniform heating: T ~ T0 + s*t everywhere
    t_end = 4 * 0.01
    assert np.allclose(T, T0 + S_HEAT * t_end, rtol=1e-6)
    q = _outflow(res)
    q_ref = S_HEAT / float(T.mean())  # V = 1
    assert abs(q - q_ref) / q_ref < 0.1, (q, q_ref)


def test_isothermal_reduces_to_incompressible():
    res = driver.run(_deck(0.0))
    x = np.asarray(res.states["loma"]["x"])
    f = res.fields["loma"].f
    u = x.reshape(-1, f.ndpn)[:, : f.dim]
    assert np.abs(u).max() < 1e-8
