"""Cut-based FSI: CutFEM fluid coupled to an embedded structure.

Counterpart of the reference's XFEM FSI (ref: src/fsi_xfem —
4C_fsi_xfem_fluid.*/XFSCoupling manager and src/fluid_xfluid: the fluid
lives on a fixed background mesh cut by the structure's boundary; the
coupling conditions are enforced weakly a la Nitsche and the fluid
interface traction loads the structure — no ALE mesh motion).

Two pieces, both on the 2D cut engine (cut/levelset.py + cut/xfluid.py):

- ``interface_traction``: consistent extraction of the fluid traction
  sigma(u, p) n at the interface quadrature points of a cut solve — the
  fluid -> structure load transfer (the reference extracts the same
  Nitsche-consistent traction, 4C_xfem_coupling_base.*).  The penalty part
  gamma (u - g) is INCLUDED: for Nitsche methods the discrete interface
  traction is sigma n - gamma (u - g), which is the quantity that
  satisfies discrete momentum balance.

- ``step_partitioned``: one Dirichlet-Neumann step — structure velocity
  becomes the fluid's embedded-interface velocity (Dirichlet), fluid
  traction becomes the structure load (Neumann) — the classic partitioned
  XFSI scheme (ref: 4C_fsi_xfem_monolithic is the monolithic variant; the
  partitioned loop here carries the same transfer operators).
"""

from __future__ import annotations

import numpy as np

from fourc_tpu.cut.levelset import _inv_map, _quad_N, _quad_dN
from fourc_tpu.cut.xfluid import solve_stokes_cut


def interface_traction(cm, u, p, mu, g_interface, gamma):
    """Fluid traction at interface quadrature points of a CutMesh2D solve.

    Returns (pts (Q,2), wts (Q,), trac (Q,2)) with
    trac = sigma(u, p) n - gamma (u - g): the Nitsche-consistent discrete
    boundary traction acting ON the fluid (n points out of the fluid).
    The force per unit length the fluid exerts on the embedded structure
    is -trac (Newton's third law across the interface).
    """
    coords, conn = cm.coords, cm.conn
    trac = np.zeros((len(cm.sif_wts), 2))
    for q, (pq, e, nr) in enumerate(zip(cm.sif_pts, cm.sif_ele, cm.sif_nrm)):
        ce = conn[e]
        X = coords[ce]
        xi = _inv_map(X, pq)
        Nv = _quad_N(xi)
        dN = _quad_dN(xi)
        G = dN @ np.linalg.inv(dN.T @ X).T  # (4, 2)
        gradu = G.T @ u[ce]  # (2, 2): gradu[i, j] = du_j/dx_i
        eps = 0.5 * (gradu + gradu.T)
        sig = 2.0 * mu * eps - (Nv @ p[ce]) * np.eye(2)
        uh = Nv @ u[ce]
        g = np.asarray(g_interface(pq[0], pq[1]), float)
        trac[q] = sig @ nr - gamma * (uh - g)
    return cm.sif_pts.copy(), cm.sif_wts.copy(), trac


def total_interface_force(cm, u, p, mu, g_interface, gamma):
    """Integrated fluid force ON the embedded structure (drag/lift):
    -integral of the fluid boundary traction over the interface."""
    _, w, t = interface_traction(cm, u, p, mu, g_interface, gamma)
    return -(w[:, None] * t).sum(axis=0)


def step_partitioned(coords, conn, phi_nodes, mu, u_wall,
                     strong_dirichlet=(), nitsche=20.0, **kw):
    """One Dirichlet-Neumann XFSI transfer: fluid solve with the structure
    (wall) velocity as the embedded Dirichlet datum, then the consistent
    traction integrated back.

    u_wall: callable (x, y) -> (2,) structure interface velocity.
    Returns (u, p, cm, F) with F (2,) the total fluid force on the
    structure — feed F into the structure solve, update u_wall, repeat
    (Aitken or constant relaxation converges this loop exactly as the
    matched-interface partitioned FSI driver, physics/fsi_driver.py).
    """
    u, p, cm = solve_stokes_cut(coords, conn, phi_nodes, u_wall,
                                strong_dirichlet=strong_dirichlet,
                                mu=mu, nitsche=nitsche, **kw)
    h = np.sqrt(np.max(np.sum(
        (cm.coords[cm.conn[:, 2]] - cm.coords[cm.conn[:, 0]]) ** 2, axis=1)))
    gamma = nitsche * mu / max(h, 1e-14)
    F = total_interface_force(cm, u, p, mu, u_wall, gamma)
    return u, p, cm, F


def interface_traction3d(cm, u, p, mu, g_interface, gamma):
    """3D analog of interface_traction for a CutMesh3D solve (hex8
    background): trac = sigma(u, p) n - gamma (u - g) at the interface
    quadrature points.  g_interface: callable (x, y, z) -> (3,)."""
    from fourc_tpu.cut.cut3d import _hex_N, _hex_dN, _inv_map_hex

    coords, conn = cm.coords, cm.conn
    trac = np.zeros((len(cm.sif_wts), 3))
    for q, (pq, e, nr) in enumerate(zip(cm.sif_pts, cm.sif_ele, cm.sif_nrm)):
        ce = conn[e]
        X = coords[ce]
        xi = _inv_map_hex(X, pq)
        Nv = _hex_N(xi)
        dN = _hex_dN(xi)
        G = dN @ np.linalg.inv(dN.T @ X).T  # (8, 3)
        gradu = G.T @ u[ce]  # gradu[i, j] = du_j/dx_i
        eps = 0.5 * (gradu + gradu.T)
        sig = 2.0 * mu * eps - (Nv @ p[ce]) * np.eye(3)
        uh = Nv @ u[ce]
        g = np.asarray(g_interface(pq[0], pq[1], pq[2]), float)
        trac[q] = sig @ nr - gamma * (uh - g)
    return cm.sif_pts.copy(), cm.sif_wts.copy(), trac


def total_interface_force3d(cm, u, p, mu, g_interface, gamma):
    """Integrated fluid force ON the embedded structure (3D drag/lift)."""
    _, w, t = interface_traction3d(cm, u, p, mu, g_interface, gamma)
    return -(w[:, None] * t).sum(axis=0)
