"""XFLUID 3D: embedded-boundary (CutFEM) incompressible flow on the 3D
cut engine.

Counterpart of the reference's 3D XFEM fluid (ref: src/fluid_xfluid —
FLD::XFluid, `XFluidState` cut-dependent dof management, Nitsche-type weak
velocity Dirichlet coupling built on the Cut library volume/boundary cells;
src/xfem 4C_xfem_condition_manager; src/cut 4C_cut_cutwizard.hpp:55).

Equal-order Q1/Q1 hex8 Stokes with PSPG pressure stabilization on a
background mesh cut by a nodal level set (CutMesh3D tet-tessellated
volume + interface quadrature), symmetric Nitsche velocity conditions on
the embedded interface, small-cut dof deactivation.  Geometry + assembly
on host (sparse COO), solve via SuperLU — this is the verification-grade
path; the production device path reuses the same quadrature data layout
(fixed flat arrays of points/weights/owners) as ops/fluid.py.
"""

from __future__ import annotations

import numpy as np

from fourc_tpu.cut.cut3d import CutMesh3D, _hex_N, _hex_dN, _inv_map_hex


def solve_stokes_cut3d(coords, conn, phi_nodes, g_interface,
                       strong_dirichlet=(), mu=1.0, body=(0.0, 0.0, 0.0),
                       nitsche=40.0, pspg_alpha=0.05, fix_pressure_node=None):
    """Stokes flow on Omega = {phi < 0} of a hex8 background mesh.

    g_interface: callable (x, y, z) -> (3,) velocity on the embedded
        boundary.
    strong_dirichlet: list of (node_ids, comp, value_fn(x, y, z)) strong
        BCs on background-mesh nodes (comp in 0..2 velocity, 3 pressure).
    Returns (u (n,3), p (n,), CutMesh3D).
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    cm = CutMesh3D(coords, conn, phi_nodes)
    coords, conn = cm.coords, cm.conn
    n = coords.shape[0]
    h = np.max(np.linalg.norm(coords[conn[:, 6]] - coords[conn[:, 0]],
                              axis=1)) / np.sqrt(3.0)
    gam = nitsche * mu / max(h, 1e-14)
    tau = pspg_alpha * h * h / mu  # PSPG for equal-order Q1/Q1

    ndof = 4 * n  # (u, v, w, p) per node
    rows, cols, vals = [], [], []
    b = np.zeros(ndof)
    fvec = np.asarray(body, float)

    def _add(r, c, A):
        rows.append(np.repeat(r, len(c)))
        cols.append(np.tile(c, len(r)))
        vals.append(np.asarray(A).reshape(-1))

    def vdof(ce, i):
        return 4 * ce + i

    def pdof(ce):
        return 4 * ce + 3

    def add_volume(ce, X, xi, w):
        dN = _hex_dN(xi)
        J = dN.T @ X
        G = dN @ np.linalg.inv(J).T  # (8, 3)
        Nv = _hex_N(xi)
        GG = G @ G.T
        for i in range(3):
            # viscous 2 mu eps(u):eps(v) = mu (grad u + grad u^T) : grad v
            _add(vdof(ce, i), vdof(ce, i), w * mu * GG)
            for j in range(3):
                _add(vdof(ce, i), vdof(ce, j),
                     w * mu * np.outer(G[:, j], G[:, i]))
            # pressure -p div v  +  continuity q div u
            _add(vdof(ce, i), pdof(ce), -w * np.outer(G[:, i], Nv))
            _add(pdof(ce), vdof(ce, i), w * np.outer(Nv, G[:, i]))
            b[vdof(ce, i)] += w * Nv * fvec[i]
        # PSPG: tau grad q . (grad p - f)
        _add(pdof(ce), pdof(ce), w * tau * GG)
        b[pdof(ce)] += w * tau * (G @ fvec)

    # full 2x2x2 Gauss on uncut inside elements
    g1 = 1.0 / np.sqrt(3.0)
    gp = np.array(np.meshgrid(*3 * [[-g1, g1]], indexing="ij")).reshape(3, -1).T
    for e in cm.inside:
        ce = conn[e]
        X = coords[ce]
        for xi in gp:
            detJ = abs(np.linalg.det(_hex_dN(xi).T @ X))
            add_volume(ce, X, xi, detJ)

    # cut-cell volume quadrature (physical weights from the tessellation)
    for p, w, e in zip(cm.qcut_pts, cm.qcut_wts, cm.qcut_ele):
        ce = conn[e]
        add_volume(ce, coords[ce], _inv_map_hex(coords[ce], p), w)

    # symmetric Nitsche velocity Dirichlet on the embedded interface:
    #   - v.sigma(u,p)n - sigma(v,q)n.(u-g) + gam v.(u-g)
    # sigma(u,p)n = 2 mu eps(u) n - p n, with the skew (inf-sup friendly)
    # pressure adjoint sign (+ q n.(u-g)) as in the 2D engine
    for p, w, e, nr in zip(cm.sif_pts, cm.sif_wts, cm.sif_ele, cm.sif_nrm):
        ce = conn[e]
        X = coords[ce]
        xi = _inv_map_hex(X, p)
        Nv = _hex_N(xi)
        dN = _hex_dN(xi)
        G = dN @ np.linalg.inv(dN.T @ X).T  # (8, 3)
        g = np.asarray(g_interface(*p), float)
        Gn = G @ nr
        for i in range(3):
            # consistency - v_i (2 mu eps(u) n)_i and its adjoint
            _add(vdof(ce, i), vdof(ce, i), -w * mu * np.outer(Nv, Gn))
            _add(vdof(ce, i), vdof(ce, i), -w * mu * np.outer(Gn, Nv))
            for j in range(3):
                _add(vdof(ce, i), vdof(ce, j),
                     -w * mu * np.outer(Nv, G[:, i]) * nr[j])
                _add(vdof(ce, j), vdof(ce, i),
                     -w * mu * np.outer(G[:, i], Nv) * nr[j])
                b[vdof(ce, j)] += -w * mu * G[:, i] * nr[j] * g[i]
            b[vdof(ce, i)] += -w * mu * Gn * g[i]
            # pressure consistency + p n.v ; skew adjoint + q n.(u-g)
            _add(vdof(ce, i), pdof(ce), w * nr[i] * np.outer(Nv, Nv))
            _add(pdof(ce), vdof(ce, i), w * nr[i] * np.outer(Nv, Nv))
            b[pdof(ce)] += w * nr[i] * Nv * g[i]
            # penalty
            _add(vdof(ce, i), vdof(ce, i), w * gam * np.outer(Nv, Nv))
            b[vdof(ce, i)] += w * gam * Nv * g[i]

    # small-support dof deactivation (reference: small-volume-cell guards)
    support = np.zeros(n)
    for e in cm.inside:
        X = coords[conn[e]]
        support[conn[e]] += abs(np.linalg.det(_hex_dN(np.zeros(3)).T @ X))
    for p, w, e in zip(cm.qcut_pts, cm.qcut_wts, cm.qcut_ele):
        ce = conn[e]
        support[ce] += w * _hex_N(_inv_map_hex(coords[ce], p))
    act_n = cm.active_nodes & (support > 1e-8 * h**3)
    cm.active_nodes = act_n

    active = np.repeat(act_n, 4)

    fixed_val = np.zeros(ndof)
    fixed = np.zeros(ndof, bool)
    for nodes, comp, val_fn in strong_dirichlet:
        for nd in np.asarray(nodes):
            if not act_n[nd]:
                continue
            dof = 4 * nd + comp
            fixed[dof] = True
            fixed_val[dof] = val_fn(*coords[nd])
    if fix_pressure_node is None:
        fix_pressure_node = int(np.where(act_n)[0][0])
    fixed[4 * fix_pressure_node + 3] = True

    A = sp.csr_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))), shape=(ndof, ndof))
    free = active & ~fixed
    idx = np.where(free)[0]
    rhs = b - A @ fixed_val
    x = np.zeros(ndof)
    x[fixed] = fixed_val[fixed]
    x[idx] = spla.spsolve(A[idx][:, idx].tocsc(), rhs[idx])
    vel = x.reshape(n, 4)[:, :3]
    prs = x.reshape(n, 4)[:, 3]
    solve_stokes_cut3d._debug = (A, b, free)
    return vel, prs, cm
