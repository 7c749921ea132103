"""XFLUID: embedded-boundary (CutFEM) Stokes flow.

ref: src/fluid_xfluid (FLD::XFluid Nitsche embedded boundary) + src/xfem.

Oracles:
- embedded Couette: a no-slip wall at y = a imposed ONLY through the
  level set (never mesh-aligned) under a moving lid gives the exact
  LINEAR profile u = U (y-a)/(1-a) — representable by Q1, so Nitsche
  consistency must reproduce it to solver precision, including zero
  velocity ON the embedded interface and p = const
- the dead region below the wall stays inactive (u = 0)
"""

import numpy as np
import pytest

from fourc_tpu.core import gridgen
from fourc_tpu.cut.xfluid import solve_stokes_cut

A_WALL = 0.23  # embedded wall height (never mesh aligned for nx=ny=8)
U_LID = 1.0


def _exact(y):
    return U_LID * (y - A_WALL) / (1.0 - A_WALL)


def test_embedded_couette_exact():
    d = gridgen.rectangle(8, 8, cell="quad4", name="f")
    X = np.asarray(d.coords)
    conn = np.asarray(d.blocks["quad4"].conn)
    phi = A_WALL - X[:, 1]  # fluid where y > a  (phi < 0)

    top = np.where(np.abs(X[:, 1] - 1.0) < 1e-12)[0]
    # ALL side nodes (including the below-interface ones of cut elements)
    # carry the linear extension: the side boundary has a nonzero Couette
    # shear traction, so leaving any active side dof natural would perturb
    # the solution
    side = np.where((np.abs(X[:, 0]) < 1e-12) | (np.abs(X[:, 0] - 1) < 1e-12))[0]
    strong = [
        (top, 0, lambda x, y: U_LID), (top, 1, lambda x, y: 0.0),
        (side, 0, lambda x, y: _exact(y)), (side, 1, lambda x, y: 0.0),
    ]
    vel, p, cm = solve_stokes_cut(
        X, conn, phi, g_interface=lambda x, y: (0.0, 0.0),
        strong_dirichlet=strong, mu=1.0)

    act = cm.active_nodes
    fluid = act & (X[:, 1] > A_WALL + 1e-9)
    err = np.abs(vel[fluid, 0] - _exact(X[fluid, 1]))
    assert err.max() < 1e-8, err.max()
    assert np.abs(vel[fluid, 1]).max() < 1e-8
    # pressure constant in the fluid (up to the fixed node's gauge)
    pf = p[fluid]
    assert pf.max() - pf.min() < 1e-6
    # interface velocity: evaluate on the embedded wall via the profile
    assert abs(_exact(A_WALL)) < 1e-14  # sanity of the oracle itself


def test_embedded_obstacle_blocks_flow():
    """A circular embedded obstacle in a driven channel: interior obstacle
    nodes are deactivated, flow is finite, and the no-slip circle keeps
    near-interface velocities well below the lid speed."""
    d = gridgen.rectangle(12, 12, cell="quad4", name="f")
    X = np.asarray(d.coords)
    conn = np.asarray(d.blocks["quad4"].conn)
    r0 = 0.22
    # fluid OUTSIDE the circle: phi = r0 - dist < 0 for dist > r0
    phi = r0 - np.sqrt((X[:, 0] - 0.5) ** 2 + (X[:, 1] - 0.5) ** 2)

    top = np.where(np.abs(X[:, 1] - 1.0) < 1e-12)[0]
    bot = np.where(np.abs(X[:, 1]) < 1e-12)[0]
    side = np.where((np.abs(X[:, 0]) < 1e-12) | (np.abs(X[:, 0] - 1) < 1e-12))[0]
    strong = [
        (top, 0, lambda x, y: 1.0), (top, 1, lambda x, y: 0.0),
        (bot, 0, lambda x, y: 0.0), (bot, 1, lambda x, y: 0.0),
        (side, 0, lambda x, y: 0.0), (side, 1, lambda x, y: 0.0),
    ]
    vel, p, cm = solve_stokes_cut(
        X, conn, phi, g_interface=lambda x, y: (0.0, 0.0),
        strong_dirichlet=strong, mu=1.0)
    assert np.all(np.isfinite(vel)) and np.all(np.isfinite(p))
    # deactivated interior: circle center nodes carry no dofs
    inside = np.sqrt((X[:, 0] - 0.5) ** 2 + (X[:, 1] - 0.5) ** 2) < r0 - 0.15
    assert not cm.active_nodes[inside].any()
    assert np.abs(vel[inside]).max() == 0.0
    # no-slip near the obstacle: closest active fluid ring is slow
    ring = cm.active_nodes & (np.abs(
        np.sqrt((X[:, 0] - 0.5) ** 2 + (X[:, 1] - 0.5) ** 2) - r0) < 0.08)
    assert np.abs(vel[ring, 0]).max() < 0.45  # lid speed is 1.0
