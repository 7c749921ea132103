"""Level-set cut of a background mesh + CutFEM (Nitsche) solves.

Counterpart of the reference's cut/XFEM foundations
(ref: src/cut — `Cut::CutWizard` 4C_cut_cutwizard.hpp:55: geometric
intersection of a background mesh with level-sets, volume-cell
tessellation and quadrature; src/xfem — enriched dof management and
Nitsche-type embedded interface coupling).

Scope here (the foundational slice): a nodal LEVEL-SET cuts a 2D quad4
background mesh; cut elements get exact sub-polygon quadrature of the
inside region (the tessellation analog of the reference's volume cells)
and line quadrature on the zero isoline (the boundary cells); an embedded
Dirichlet condition is imposed weakly with Nitsche terms.  All cut
geometry is computed ONCE on the host; the solve is a fixed-shape batched
residual on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _polygon_quadrature(poly):
    """Exact quadrature (degree 2) for a convex polygon: fan triangulation,
    3-point rule per triangle.  poly: (k, 2) -> (pts (m,2), wts (m,))."""
    pts, wts = [], []
    mid = np.array([[2 / 3, 1 / 6, 1 / 6], [1 / 6, 2 / 3, 1 / 6],
                    [1 / 6, 1 / 6, 2 / 3]])
    for i in range(1, len(poly) - 1):
        tri = np.array([poly[0], poly[i], poly[i + 1]])
        v1, v2 = tri[1] - tri[0], tri[2] - tri[0]
        a = 0.5 * abs(v1[0] * v2[1] - v1[1] * v2[0])
        if a < 1e-14:
            continue
        for lam in mid:
            pts.append(lam @ tri)
            wts.append(a / 3.0)
    if not pts:
        return np.zeros((0, 2)), np.zeros((0,))
    return np.asarray(pts), np.asarray(wts)


def _clip_inside(corners, phi):
    """Sutherland-Hodgman-style clip of a quad against phi <= 0 (phi linear
    along edges).  Returns polygon vertices (k, 2) and the interface
    segment endpoints (0 or 2 points)."""
    poly = []
    iface = []
    n = len(corners)
    for i in range(n):
        a, b = corners[i], corners[(i + 1) % n]
        fa, fb = phi[i], phi[(i + 1) % n]
        if fa <= 0:
            poly.append(a)
        if (fa < 0) != (fb < 0):
            t = fa / (fa - fb)
            p = a + t * (b - a)
            poly.append(p)
            iface.append(p)
    return np.asarray(poly), np.asarray(iface)


class CutMesh2D:
    """Cut state of a quad4 background mesh against a nodal level set."""

    def __init__(self, coords, conn, phi_nodes, n_qcut=None):
        coords = np.asarray(coords)[:, :2]
        conn = np.asarray(conn)
        phi = np.asarray(phi_nodes)
        E = conn.shape[0]
        phie = phi[conn]
        self.inside = np.where(np.all(phie <= 0, axis=1))[0]
        self.outside = np.where(np.all(phie > 0, axis=1))[0]
        self.cut = np.setdiff1d(np.arange(E),
                                np.concatenate([self.inside, self.outside]))

        # physical-space quadrature for the inside part of cut elements
        qp, qw, qe = [], [], []
        sp, sw, se, sn = [], [], [], []  # interface points/weights/elems/normals
        for e in self.cut:
            corners = coords[conn[e]]
            pf = phie[e]
            poly, iface = _clip_inside(corners, pf)
            if len(poly) >= 3:
                pts, wts = _polygon_quadrature(poly)
                qp.append(pts)
                qw.append(wts)
                qe.append(np.full(len(wts), e))
            if len(iface) == 2:
                a, b = iface
                L = np.linalg.norm(b - a)
                if L > 1e-14:
                    # 2-point Gauss on the segment
                    for t in (0.5 - 0.5 / np.sqrt(3), 0.5 + 0.5 / np.sqrt(3)):
                        sp.append(a + t * (b - a))
                        sw.append(L / 2.0)
                        se.append(e)
                    tang = (b - a) / L
                    nrm = np.array([tang[1], -tang[0]])
                    # orient normal OUT of the inside region (toward phi>0)
                    gc = 0.25 * sum(corners)
                    gphi = _grad_phi(corners, pf, gc)
                    if np.dot(nrm, gphi) < 0:
                        nrm = -nrm
                    sn += [nrm, nrm]
        self.coords = coords
        self.conn = conn
        self.qcut_pts = np.concatenate(qp) if qp else np.zeros((0, 2))
        self.qcut_wts = np.concatenate(qw) if qw else np.zeros((0,))
        self.qcut_ele = np.concatenate(qe).astype(np.int32) if qe else np.zeros((0,), np.int32)
        self.sif_pts = np.asarray(sp) if sp else np.zeros((0, 2))
        self.sif_wts = np.asarray(sw) if sw else np.zeros((0,))
        self.sif_ele = np.asarray(se, np.int32) if se else np.zeros((0,), np.int32)
        self.sif_nrm = np.asarray(sn) if sn else np.zeros((0, 2))
        # active dofs: nodes of inside + cut elements
        act = np.zeros(coords.shape[0], bool)
        act[conn[self.inside].reshape(-1)] = True
        act[conn[self.cut].reshape(-1)] = True
        self.active_nodes = act


def _grad_phi(corners, pf, x):
    """Gradient of the bilinear interpolant of pf at x (host helper)."""
    eps = 1e-6
    return np.array([
        (_interp(corners, pf, x + [eps, 0]) - _interp(corners, pf, x - [eps, 0])) / (2 * eps),
        (_interp(corners, pf, x + [0, eps]) - _interp(corners, pf, x - [0, eps])) / (2 * eps),
    ])


def _interp(corners, vals, x):
    xi = _inv_map(corners, np.asarray(x, float))
    N = _quad_N(xi)
    return N @ vals


def _quad_N(xi):
    x, y = xi
    return 0.25 * np.array([(1 - x) * (1 - y), (1 + x) * (1 - y),
                            (1 + x) * (1 + y), (1 - x) * (1 + y)])


def _quad_dN(xi):
    x, y = xi
    return 0.25 * np.array([
        [-(1 - y), -(1 - x)], [(1 - y), -(1 + x)],
        [(1 + y), (1 + x)], [-(1 + y), (1 - x)]])


def _inv_map(corners, p, iters=8):
    xi = np.zeros(2)
    for _ in range(iters):
        N = _quad_N(xi)
        dN = _quad_dN(xi)
        r = N @ corners - p
        J = dN.T @ corners
        xi = xi - np.linalg.solve(J.T, r)
    return xi


def solve_poisson_cut(coords, conn, phi_nodes, g_dirichlet, source=0.0,
                      nitsche=20.0):
    """CutFEM Poisson solve on Omega = {phi < 0}:

        -div(grad u) = source in Omega,  u = g on {phi = 0} (Nitsche)
        u = g also on any physical boundary nodes inside Omega with phi<0?
        (no — the level set is the only boundary here; the background
        boundary must lie outside Omega)

    g_dirichlet: callable (x, y) -> value (numpy, host).
    Returns nodal u (background size; inactive nodes = 0).

    Nitsche (symmetric): a(u,v) - <du/dn, v> - <dv/dn, u-g> + gamma/h <u-g, v>
    """
    cm = CutMesh2D(coords, conn, phi_nodes)
    coords = cm.coords
    conn = cm.conn
    n = coords.shape[0]
    h = np.sqrt(np.max(np.sum((coords[conn[:, 2]] - coords[conn[:, 0]])**2,
                              axis=1)))
    gam = nitsche / max(h, 1e-14)

    A = np.zeros((n, n))
    b = np.zeros(n)

    # full quadrature on inside elements
    gp = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]]) / np.sqrt(3.0)
    for e in cm.inside:
        ce = conn[e]
        X = coords[ce]
        for xi in gp:
            dN = _quad_dN(xi)
            J = dN.T @ X
            detJ = np.linalg.det(J)
            G = dN @ np.linalg.inv(J).T 
            A[np.ix_(ce, ce)] += detJ * (G @ G.T)
            Nv = _quad_N(xi)
            b[ce] += detJ * Nv * source

    # polygon quadrature on cut elements (physical points)
    for p, w, e in zip(cm.qcut_pts, cm.qcut_wts, cm.qcut_ele):
        ce = conn[e]
        X = coords[ce]
        xi = _inv_map(X, p)
        dN = _quad_dN(xi)
        J = dN.T @ X
        G = dN @ np.linalg.inv(J).T
        A[np.ix_(ce, ce)] += w * (G @ G.T)
        b[ce] += w * _quad_N(xi) * source

    # Nitsche interface terms
    for p, w, e, nr in zip(cm.sif_pts, cm.sif_wts, cm.sif_ele, cm.sif_nrm):
        ce = conn[e]
        X = coords[ce]
        xi = _inv_map(X, p)
        Nv = _quad_N(xi)
        dN = _quad_dN(xi)
        J = dN.T @ X
        G = dN @ np.linalg.inv(J).T  # (4, 2) cartesian grads
        dn = G @ nr  # (4,) normal derivative weights
        g = g_dirichlet(p[0], p[1])
        A[np.ix_(ce, ce)] += w * (-np.outer(dn, Nv) - np.outer(Nv, dn)
                                  + gam * np.outer(Nv, Nv))
        b[ce] += w * (-dn * g + gam * Nv * g)

    # deactivate nodes with (near-)zero basis support in Omega: without a
    # ghost penalty their rows are singular (the reference guards small
    # volume cells the same way before handing dofs to the solver)
    support = np.zeros(n)
    for e in cm.inside:
        support[conn[e]] += h * h / 4.0
    for p, w, e in zip(cm.qcut_pts, cm.qcut_wts, cm.qcut_ele):
        ce = conn[e]
        xi = _inv_map(coords[ce], p)
        support[ce] += w * _quad_N(xi)
    act = cm.active_nodes & (support > 1e-10 * h * h)
    u = np.zeros(n)
    idx = np.where(act)[0]
    u[idx] = np.linalg.solve(A[np.ix_(idx, idx)], b[idx])
    cm.active_nodes = act
    return u, cm
