"""XFLUID fluid-fluid: two-phase CutFEM Stokes with Nitsche interface
coupling.

Counterpart of the reference's fluid-fluid XFEM coupling (ref:
src/fluid_xfluid 4C_fluid_xfluid_fluid.* — two fluid fields coupled weakly
across an embedded interface; condition manager src/xfem
4C_xfem_coupling_fluid_fluid.*).  Both phases live on the SAME background
mesh; nodes whose support is cut carry doubled (enriched) velocity/pressure
dofs — one set per phase — the XFEM dof-duplication the reference manages
via XFEMDofSet (src/xfem/4C_xfem_xfield_state_utils.hpp).

Interface conditions enforced weakly a la Nitsche mortaring with
viscosity-harmonic weights (the standard choice for large viscosity
contrast):
    [u] = 0,   [sigma(u, p) n] = 0
    {sigma n} = kappa_m sigma^- n + kappa_p sigma^+ n,
    kappa_m = mu+/(mu- + mu+),  kappa_p = mu-/(mu- + mu+),
    gamma = nitsche * (2 mu- mu+/(mu- + mu+)) / h
Verification-grade host-numpy dense assembly on the 2D cut engine
(cut/levelset.py), same PSPG-stabilized equal-order Q1/Q1 discretization
and sign conventions as the single-phase module (cut/xfluid.py).
"""

from __future__ import annotations

import numpy as np

from fourc_tpu.cut.levelset import CutMesh2D, _inv_map, _quad_N, _quad_dN


def solve_stokes_two_fluid(coords, conn, phi_nodes, mu_minus, mu_plus,
                           strong_dirichlet=(), body=(0.0, 0.0),
                           nitsche=20.0, pspg_alpha=0.05,
                           fix_pressure="global"):
    """Two-fluid Stokes: phase '-' on {phi < 0}, phase '+' on {phi > 0}.

    strong_dirichlet: list of (node_ids, comp, value_fn(x, y)[, side])
    applied to the given side's dofs (side 0 = minus, 1 = plus; omitted =
    both) wherever that phase is active at the node.
    fix_pressure: "global" pins one pressure dof (phases share the
    hydrostatic mode through the interface traction) or "per_side".

    Returns (u_minus (n,2), p_minus, u_plus (n,2), p_plus, (cm_m, cm_p)).
    """
    cm_m = CutMesh2D(coords, conn, phi_nodes)  # minus side + interface quad
    cm_p = CutMesh2D(coords, conn, -np.asarray(phi_nodes))  # plus side
    coords = cm_m.coords
    conn = cm_m.conn
    n = coords.shape[0]
    h = np.sqrt(np.max(np.sum(
        (coords[conn[:, 2]] - coords[conn[:, 0]]) ** 2, axis=1)))
    mu_m, mu_p = float(mu_minus), float(mu_plus)
    kap_m = mu_p / (mu_m + mu_p)
    kap_p = mu_m / (mu_m + mu_p)
    mu_harm = 2.0 * mu_m * mu_p / (mu_m + mu_p)
    gam = nitsche * mu_harm / max(h, 1e-14)
    f = np.asarray(body, float)

    ndof = 6 * n  # (u-, v-, p-, u+, v+, p+) per node
    A = np.zeros((ndof, ndof))
    b = np.zeros(ndof)

    def dofs(side):  # side 0 = minus, 1 = plus
        off = 3 * side

        def ui(nd):
            return 6 * nd + off

        def vi(nd):
            return 6 * nd + off + 1

        def pi(nd):
            return 6 * nd + off + 2

        return ui, vi, pi

    def add_volume(side, mu, ce, X, xi, w):
        ui, vi, pi = dofs(side)
        dN = _quad_dN(xi)
        J = dN.T @ X
        G = dN @ np.linalg.inv(J).T  # (4, 2)
        Nv = _quad_N(xi)
        iu, iv, ip = ui(ce), vi(ce), pi(ce)
        tau = pspg_alpha * h * h / mu
        GG = G @ G.T
        for i in range(2):
            rows = iu if i == 0 else iv
            A[np.ix_(rows, rows)] += w * mu * GG
            for j in range(2):
                cols = iu if j == 0 else iv
                A[np.ix_(rows, cols)] += w * mu * np.outer(G[:, j], G[:, i])
        for i in range(2):
            rows = iu if i == 0 else iv
            A[np.ix_(rows, ip)] += -w * np.outer(G[:, i], Nv)
            A[np.ix_(ip, rows)] += w * np.outer(Nv, G[:, i])
        A[np.ix_(ip, ip)] += w * tau * GG
        b[ip] += w * tau * (G @ f)
        b[iu] += w * Nv * f[0]
        b[iv] += w * Nv * f[1]

    gp = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]]) / np.sqrt(3.0)
    for side, mu, cm in ((0, mu_m, cm_m), (1, mu_p, cm_p)):
        for e in cm.inside:
            ce = conn[e]
            X = coords[ce]
            detJ = np.linalg.det(_quad_dN(np.zeros(2)).T @ X)
            for xi in gp:
                add_volume(side, mu, ce, X, xi, detJ)
        for pq, w, e in zip(cm.qcut_pts, cm.qcut_wts, cm.qcut_ele):
            ce = conn[e]
            add_volume(side, mu, ce, X=coords[ce],
                       xi=_inv_map(coords[ce], pq), w=w)

    # Nitsche interface coupling; n points from '-' to '+' (levelset.py
    # orients the interface normal out of the phi<0 region).
    # jump [w] = w^- - w^+; {sigma n} = kap_m sigma^- n + kap_p sigma^+ n.
    sides = ((0, mu_m, kap_m, +1.0), (1, mu_p, kap_p, -1.0))
    for pq, w, e, nr in zip(cm_m.sif_pts, cm_m.sif_wts, cm_m.sif_ele,
                            cm_m.sif_nrm):
        ce = conn[e]
        X = coords[ce]
        xi = _inv_map(X, pq)
        Nv = _quad_N(xi)
        dN = _quad_dN(xi)
        G = dN @ np.linalg.inv(dN.T @ X).T  # (4, 2)
        Gn = G @ nr  # (4,)
        # precompute per-side dof rows
        srows = []
        for side, mu, kap, sgn in sides:
            ui, vi, pi = dofs(side)
            srows.append((side, mu, kap, sgn,
                          {0: ui(ce), 1: vi(ce)}, pi(ce)))
        for sw_, muw, kapw, sgnw, rw, pw in srows:  # test-function side
            for su, muu, kapu, sgnu, ru, pu in srows:
                for i in range(2):
                    for j in range(2):
                        # viscous consistency -[w]_i {2 mu eps(u) n}_i
                        A[np.ix_(rw[i], ru[i])] += \
                            -w * sgnw * kapu * muu * np.outer(Nv, Gn) \
                            * (1 if j == i else 0)
                        A[np.ix_(rw[i], ru[j])] += \
                            -w * sgnw * kapu * muu * np.outer(Nv, G[:, i]) \
                            * nr[j]
                        # viscous adjoint -{2 mu eps(w) n}_i [u]_i
                        A[np.ix_(rw[i], ru[i])] += \
                            -w * sgnu * kapw * muw * np.outer(Gn, Nv) \
                            * (1 if j == i else 0)
                        A[np.ix_(rw[j], ru[i])] += \
                            -w * sgnu * kapw * muw * np.outer(G[:, i], Nv) \
                            * nr[j]
                    # pressure consistency +{p n}_i [w]_i
                    A[np.ix_(rw[i], pu)] += \
                        w * sgnw * kapu * nr[i] * np.outer(Nv, Nv)
                    # pressure adjoint (skew) +{q n}_i [u]_i
                    A[np.ix_(pw, ru[i])] += \
                        w * sgnu * kapw * nr[i] * np.outer(Nv, Nv)
                    # penalty gam [w]_i [u]_i
                    A[np.ix_(rw[i], ru[i])] += \
                        w * gam * sgnw * sgnu * np.outer(Nv, Nv)

    # per-side small-support deactivation (as in cut/xfluid.py)
    act = []
    for cm in (cm_m, cm_p):
        support = np.zeros(n)
        for e in cm.inside:
            support[conn[e]] += h * h / 4.0
        for pq, w, e in zip(cm.qcut_pts, cm.qcut_wts, cm.qcut_ele):
            ce = conn[e]
            support[ce] += w * _quad_N(_inv_map(coords[ce], pq))
        a = cm.active_nodes & (support > 1e-8 * h * h)
        cm.active_nodes = a
        act.append(a)

    active = np.zeros(ndof, bool)
    for side in (0, 1):
        for nd in np.where(act[side])[0]:
            active[6 * nd + 3 * side:6 * nd + 3 * side + 3] = True

    fixed_val = np.zeros(ndof)
    fixed = np.zeros(ndof, bool)
    for entry in strong_dirichlet:
        nodes, comp, val_fn = entry[:3]
        only = entry[3] if len(entry) > 3 else None  # 0/1 = one side only
        for nd in np.asarray(nodes):
            for side in (0, 1):
                if only is not None and side != only:
                    continue
                if not act[side][nd]:
                    continue
                dof = 6 * nd + 3 * side + comp
                fixed[dof] = True
                fixed_val[dof] = val_fn(coords[nd, 0], coords[nd, 1])
    if not act[0].any():
        raise ValueError("minus phase has no active dofs — the level set "
                         "does not cut the mesh (phi >= 0 everywhere)")
    pin_m = int(np.where(act[0])[0][0])
    fixed[6 * pin_m + 2] = True
    if fix_pressure == "per_side":
        if not act[1].any():
            raise ValueError("plus phase has no active dofs — the level set "
                             "does not cut the mesh (phi < 0 everywhere)")
        pin_p = int(np.where(act[1])[0][0])
        fixed[6 * pin_p + 5] = True

    free = active & ~fixed
    idx = np.where(free)[0]
    rhs = b - A @ fixed_val
    x = np.zeros(ndof)
    x[fixed] = fixed_val[fixed]
    x[idx] = np.linalg.solve(A[np.ix_(idx, idx)], rhs[idx])
    z = x.reshape(n, 6)
    solve_stokes_two_fluid._debug = (A, b, free)
    return z[:, 0:2], z[:, 2], z[:, 3:5], z[:, 5], (cm_m, cm_p)
