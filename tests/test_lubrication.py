"""Lubrication (Reynolds equation) test: linear slider bearing.

Oracle: the stationary 1D Reynolds equation d/dx(h^3/(12 mu) p') =
d/dx(U h / 2) integrates to p'(x) = 6 mu U (h - h_m)/h^3 with h_m fixed by
p(L) = 0 — evaluated here by high-resolution quadrature (independent of the
FE solver).  (Classic slider-bearing benchmark; the reference's lubrication
regression decks exercise the same kernel, ref: src/lubrication.)
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

MU = 0.1
U = 2.0
H1 = 0.02  # inlet film
H2 = 0.01  # outlet film
L = 1.0


def _h(x):
    return H1 + (H2 - H1) * x / L


def _p_exact(x):
    """p(x) by quadrature of p' = 6 mu U (h - h_m) / h^3, p(0)=p(L)=0."""
    xs = np.linspace(0, L, 20001)
    h = _h(xs)
    I2 = np.trapezoid(1 / h**2, xs)
    I3 = np.trapezoid(1 / h**3, xs)
    hm = I2 / I3
    integrand = 6 * MU * U * (h - hm) / h**3
    P = np.concatenate([[0], np.cumsum(
        0.5 * (integrand[1:] + integrand[:-1]) * np.diff(xs))])
    return np.interp(x, xs, P)


def test_slider_bearing_pressure():
    deck = dm.load(f"""
problem: {{type: lubrication}}
lubrication_dynamic:
  timestep: 1.0
  numstep: 1
  viscosity: {MU}
  height_funct: 1
  velocity: [{U}, 0]
solver: {{method: cg, precond: jacobi, maxiter: 3000}}
materials: {{}}
functions:
  1: "{H1} + ({H2} - {H1}) * x / {L}"
geometry:
  generator:
    - {{kind: rectangle, nx: 60, ny: 2, cell: quad4, mat: 1, name: lubrication,
        lo: [0, 0], hi: [{L}, 0.05]}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1], val: [0]}}
    - {{nodes: xmax, onoff: [1], val: [0]}}
""")
    res = driver.run(deck)
    f = res.fields["lubrication"].f
    X = np.asarray(f.disc.coords)
    p = np.asarray(res.states["lubrication"]["p"])
    p_ref = _p_exact(X[:, 0])
    assert np.abs(p - p_ref).max() < 0.02 * p_ref.max()
    # peak pressure location is in the converging wedge (x > L/2)
    assert X[np.argmax(p), 0] > 0.5 * L
