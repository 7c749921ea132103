"""XFLUID 3D: embedded-boundary (CutFEM) Stokes on the 3D cut engine.

ref: src/fluid_xfluid (FLD::XFluid on Cut volume/boundary cells) +
src/xfem + src/cut (4C_cut_cutwizard.hpp:55).

Oracles:
- linear-exactness: any trace-free linear velocity field u = A x with
  constant pressure solves Stokes exactly; it lies in the Q1 space, the
  tet-tessellated cut quadrature integrates every nonvanishing term
  exactly, so the CutFEM solution on a sphere-cut box must reproduce it
  to solver precision (the 3D analog of the contact patch test)
- embedded no-slip sphere in a driven box: interior sphere nodes
  deactivate, the solve is finite, near-interface speeds stay far below
  the lid speed
"""

import numpy as np
import pytest

from fourc_tpu.core import gridgen
from fourc_tpu.cut.xfluid3d import solve_stokes_cut3d

# trace-free velocity gradient: u = A x is divergence-free + Stokes-exact
A_LIN = np.array([[0.13, 0.40, -0.22],
                  [0.31, -0.25, 0.17],
                  [-0.08, 0.26, 0.12]])


def _box_mesh(n):
    d = gridgen.box(n, n, n, cell="hex8")
    X = np.asarray(d.coords)
    conn = np.asarray(d.blocks["hex8"].conn)
    return X, conn


def _outer_nodes(X):
    eps = 1e-12
    on = np.zeros(X.shape[0], bool)
    for j in range(3):
        on |= (np.abs(X[:, j]) < eps) | (np.abs(X[:, j] - 1.0) < eps)
    return np.where(on)[0]


def test_linear_exactness_sphere_cut():
    """u = A x (tr A = 0), p = 0 reproduced exactly on a sphere-cut box."""
    X, conn = _box_mesh(6)
    r0 = 0.243  # never mesh-aligned
    phi = r0 - np.linalg.norm(X - 0.5, axis=1)  # fluid outside the sphere

    u_ex = X @ A_LIN.T
    outer = _outer_nodes(X)
    strong = [(outer, i, lambda x, y, z, i=i: A_LIN[i] @ (x, y, z))
              for i in range(3)]
    vel, p, cm = solve_stokes_cut3d(
        X, conn, phi, g_interface=lambda x, y, z: A_LIN @ (x, y, z),
        strong_dirichlet=strong, mu=1.3)

    act = cm.active_nodes
    fluid = act & (phi < -1e-9)
    err = np.abs(vel[fluid] - u_ex[fluid]).max()
    assert err < 1e-8, err
    pf = p[act]
    assert pf.max() - pf.min() < 1e-6, (pf.min(), pf.max())


def test_cut_geometry_sphere():
    """Tessellated cut volume/area converge to the sphere complement at
    O(h^2) (chordal interface approximation)."""
    from fourc_tpu.cut.cut3d import CutMesh3D

    r0 = 0.31
    want_v = 1.0 - 4.0 / 3.0 * np.pi * r0**3
    want_a = 4 * np.pi * r0**2
    errs = []
    for n in (8, 14):
        X, conn = _box_mesh(n)
        phi = r0 - np.linalg.norm(X - 0.5, axis=1)
        cm = CutMesh3D(X, conn, phi)
        errs.append((abs(cm.volume() - want_v), abs(cm.area() - want_a)))
    # h ratio 14/8 = 1.75 -> h^2 ratio 3.06; require clear superlinear drop
    assert errs[1][0] < 0.45 * errs[0][0], errs
    assert errs[1][1] < 0.55 * errs[0][1], errs
    assert errs[1][0] < 5e-3 and errs[1][1] < 2.5e-2, errs


def test_embedded_sphere_blocks_flow():
    """No-slip sphere in a lid-driven box: finite flow, dead interior,
    slow fluid at the interface."""
    X, conn = _box_mesh(8)
    r0 = 0.27
    phi = r0 - np.linalg.norm(X - 0.5, axis=1)

    eps = 1e-12
    top = np.where(np.abs(X[:, 2] - 1.0) < eps)[0]
    rest = np.setdiff1d(_outer_nodes(X), top)
    strong = ([(top, 0, lambda x, y, z: 1.0),
               (top, 1, lambda x, y, z: 0.0),
               (top, 2, lambda x, y, z: 0.0)]
              + [(rest, i, lambda x, y, z: 0.0) for i in range(3)])
    vel, p, cm = solve_stokes_cut3d(
        X, conn, phi, g_interface=lambda x, y, z: (0.0, 0.0, 0.0),
        strong_dirichlet=strong, mu=1.0)

    assert np.isfinite(vel).all() and np.isfinite(p).all()
    # nodes so deep inside the sphere that no element touching them is
    # cut (> element diagonal) are deactivated
    deep = phi > np.sqrt(3.0) * (1.0 / 8) + 1e-9
    assert deep.any()
    assert not cm.active_nodes[deep].any()
    # fluid moves under the lid but is slow next to the no-slip sphere
    speed = np.linalg.norm(vel, axis=1)
    near = cm.active_nodes & (np.abs(phi) < 0.02)
    assert speed[near].max() < 0.45, speed[near].max()
    mid = cm.active_nodes & (X[:, 2] > 0.8) & (phi < -1e-9)
    assert speed[mid].max() > 0.5
