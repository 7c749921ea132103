"""XFLUID: embedded-boundary (CutFEM) incompressible flow.

Counterpart of the reference's XFEM fluid (ref: src/fluid_xfluid —
FLD::XFluid assembles the stabilized fluid on a background mesh cut by an
embedded boundary, with Nitsche-type weak velocity Dirichlet coupling on
the cut interface; src/xfem 4C_xfem_* condition manager).

This module is the verification-grade implementation on the 2D cut engine
(cut/levelset.py CutMesh2D): equal-order Q1/Q1 Stokes with PSPG, polygon
quadrature on the physical part of cut elements, interface quadrature with
symmetric Nitsche velocity conditions, and small-cut dof deactivation (the
reference guards small volume cells the same way).  Host-numpy dense
assembly — the production path is the same batched-quadrature structure
as ops/fluid.py, which is why the quadrature data layout here mirrors the
device kernels.
"""

from __future__ import annotations

import numpy as np

from fourc_tpu.cut.levelset import CutMesh2D, _inv_map, _quad_N, _quad_dN


def solve_stokes_cut(coords, conn, phi_nodes, g_interface,
                     strong_dirichlet=(), mu=1.0, body=(0.0, 0.0),
                     nitsche=20.0, pspg_alpha=0.05, fix_pressure_node=None):
    """Stokes flow on Omega = {phi < 0} of a quad4 background mesh.

    g_interface: callable (x, y) -> (2,) velocity on the embedded boundary
    strong_dirichlet: list of (node_ids, comp, value_fn(x, y)) strong BCs
    Returns (u (n,2), p (n,), CutMesh2D).
    """
    cm = CutMesh2D(coords, conn, phi_nodes)
    coords = cm.coords
    conn = cm.conn
    n = coords.shape[0]
    h = np.sqrt(np.max(np.sum(
        (coords[conn[:, 2]] - coords[conn[:, 0]]) ** 2, axis=1)))
    gam = nitsche * mu / max(h, 1e-14)
    tau = pspg_alpha * h * h / mu  # PSPG for equal-order Q1/Q1

    ndof = 3 * n  # (u, v, p) per node
    A = np.zeros((ndof, ndof))
    b = np.zeros(ndof)
    ui = lambda nd: 3 * nd
    vi = lambda nd: 3 * nd + 1
    pi = lambda nd: 3 * nd + 2
    f = np.asarray(body, float)

    def add_volume(ce, X, xi, w):
        dN = _quad_dN(xi)
        J = dN.T @ X
        G = dN @ np.linalg.inv(J).T  # (4, 2)
        Nv = _quad_N(xi)
        iu, iv, ip = ui(ce), vi(ce), pi(ce)
        # viscous 2 mu eps(u):eps(w)
        GG = G @ G.T  # (4, 4) grad.grad
        for i in range(2):
            rows = iu if i == 0 else iv
            A[np.ix_(rows, rows)] += w * mu * GG
            for j in range(2):
                cols = ui(ce) if j == 0 else vi(ce)
                A[np.ix_(rows, cols)] += w * mu * np.outer(G[:, j], G[:, i])
        # pressure -p div w  +  continuity q div u
        for i in range(2):
            rows = iu if i == 0 else iv
            A[np.ix_(rows, ip)] += -w * np.outer(G[:, i], Nv)
            A[np.ix_(ip, rows)] += w * np.outer(Nv, G[:, i])
        # PSPG: tau grad q . (grad p - f)
        A[np.ix_(ip, ip)] += w * tau * GG
        b[ip] += w * tau * (G @ f)
        # body force
        b[iu] += w * Nv * f[0]
        b[iv] += w * Nv * f[1]

    gp = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]]) / np.sqrt(3.0)
    for e in cm.inside:
        ce = conn[e]
        X = coords[ce]
        dN0 = _quad_dN(np.zeros(2))
        detJ = np.linalg.det(dN0.T @ X)
        for xi in gp:
            add_volume(ce, X, xi, detJ)
    for pq, w, e in zip(cm.qcut_pts, cm.qcut_wts, cm.qcut_ele):
        ce = conn[e]
        X = coords[ce]
        add_volume(ce, X, _inv_map(X, pq), w)

    # symmetric Nitsche velocity Dirichlet on the embedded interface:
    #   - w . sigma(u,p) n - sigma(w,q) n . (u - g) + gam w.(u - g)
    # with sigma(u,p) n = 2 mu eps(u) n - p n (adjoint pressure sign +:
    # the inf-sup-friendly skew pressure variant)
    for pq, w, e, nr in zip(cm.sif_pts, cm.sif_wts, cm.sif_ele, cm.sif_nrm):
        ce = conn[e]
        X = coords[ce]
        xi = _inv_map(X, pq)
        Nv = _quad_N(xi)
        dN = _quad_dN(xi)
        G = dN @ np.linalg.inv(dN.T @ X).T  # (4, 2)
        g = np.asarray(g_interface(pq[0], pq[1]), float)
        iu, iv, ip = ui(ce), vi(ce), pi(ce)
        rows = {0: iu, 1: iv}
        Gn = G @ nr  # (4,)
        for i in range(2):
            for j in range(2):
                # 2 mu eps(u) n | i = mu (du_i/dx_j n_j + du_j/dx_i n_j)
                # consistency: - w_i (.)   adjoint: - (.)(w) (u_j - g_j)
                A[np.ix_(rows[i], rows[i])] += -w * mu * np.outer(Nv, Gn) \
                    * (1 if j == i else 0)
                A[np.ix_(rows[i], rows[j])] += -w * mu * np.outer(
                    Nv, G[:, i]) * nr[j]
                A[np.ix_(rows[i], rows[i])] += -w * mu * np.outer(Gn, Nv) \
                    * (1 if j == i else 0)
                A[np.ix_(rows[j], rows[i])] += -w * mu * np.outer(
                    G[:, i], Nv) * nr[j]
            # pressure consistency + p n . w ; skew adjoint + q n.(u-g)
            A[np.ix_(rows[i], ip)] += w * nr[i] * np.outer(Nv, Nv)
            A[np.ix_(ip, rows[i])] += w * nr[i] * np.outer(Nv, Nv)
            b[ip] += w * nr[i] * Nv * g[i]
            # penalty
            A[np.ix_(rows[i], rows[i])] += w * gam * np.outer(Nv, Nv)
            b[rows[i]] += w * gam * Nv * g[i]
            # adjoint rhs: - sigma(w,q) n . g (viscous part)
            for j in range(2):
                b[rows[i]] += -w * mu * Gn * g[i] * (1 if j == i else 0)
                b[rows[j]] += -w * mu * G[:, i] * nr[j] * g[i]

    # small-support deactivation
    support = np.zeros(n)
    for e in cm.inside:
        support[conn[e]] += h * h / 4.0
    for pq, w, e in zip(cm.qcut_pts, cm.qcut_wts, cm.qcut_ele):
        ce = conn[e]
        support[ce] += w * _quad_N(_inv_map(coords[ce], pq))
    act_n = cm.active_nodes & (support > 1e-8 * h * h)
    cm.active_nodes = act_n

    active = np.zeros(ndof, bool)
    for nd in np.where(act_n)[0]:
        active[3 * nd:3 * nd + 3] = True

    # strong Dirichlet rows
    fixed_val = np.zeros(ndof)
    fixed = np.zeros(ndof, bool)
    for nodes, comp, val_fn in strong_dirichlet:
        for nd in np.asarray(nodes):
            if not act_n[nd]:
                continue
            dof = 3 * nd + comp
            fixed[dof] = True
            fixed_val[dof] = val_fn(coords[nd, 0], coords[nd, 1])
    if fix_pressure_node is None:
        fix_pressure_node = int(np.where(act_n)[0][0])
    fixed[pi(np.array([fix_pressure_node]))[0]] = True

    free = active & ~fixed
    idx = np.where(free)[0]
    rhs = b - A @ fixed_val
    x = np.zeros(ndof)
    x[fixed] = fixed_val[fixed]
    x[idx] = np.linalg.solve(A[np.ix_(idx, idx)], rhs[idx])
    vel = x.reshape(n, 3)[:, :2]
    prs = x.reshape(n, 3)[:, 2]
    solve_stokes_cut._debug = (A, b, free)  # residual checks in tests
    return vel, prs, cm
