"""Transient scalar transport on a MOVING 3D cut domain (CutFEM).

Counterpart of the reference's cut-based transport capabilities
(ref: src/scatra levelset / xfem variants + src/cut CutWizard — transport
on Omega(t) implicitly defined by a level set, e.g. two-phase interface
problems).

Backward-Euler heat/transport solve on Omega(t) = {phi_t < 0} of a hex8
background mesh: at each step the 3D cut engine (cut/cut3d.py) supplies
fresh volume + interface quadrature for the CURRENT level set, the
Nitsche terms impose theta = g on the moving boundary, and the mass term
integrates theta_old through its FE interpolation on the new quadrature
(so uncovering/covering elements is consistent).  After each solve the
field is extended to inactive nodes by nearest-active values, giving
newly activated dofs a sane history (the reference's XFEM time
integration does ghost-value projection for the same reason).

Assembly is batched numpy (vectorized inverse maps + einsum element
matrices + one COO scatter) — the same quadrature-array layout the
device kernels consume.  Solve: SuperLU (verification-grade, same
contract as cut/xfluid3d.py).
"""

from __future__ import annotations

import numpy as np

from fourc_tpu.cut.cut3d import CutMesh3D, _HEX_XI


def _hex_N_batch(xi):
    """(Q, 3) -> (Q, 8)"""
    return 0.125 * np.prod(1.0 + _HEX_XI[None] * xi[:, None, :], axis=2)


def _hex_dN_batch(xi):
    """(Q, 3) -> (Q, 8, 3)"""
    Q = xi.shape[0]
    dN = np.empty((Q, 8, 3))
    for j in range(3):
        terms = 1.0 + _HEX_XI[None] * xi[:, None, :]
        terms[:, :, j] = _HEX_XI[None, :, j]
        dN[:, :, j] = 0.125 * np.prod(terms, axis=2)
    return dN


def _inv_map_batch(X, p, iters=10):
    """Batched trilinear inverse map: X (Q, 8, 3), p (Q, 3) -> xi (Q, 3)."""
    xi = np.zeros_like(p)
    for _ in range(iters):
        r = np.einsum("qa,qai->qi", _hex_N_batch(xi), X) - p
        J = np.einsum("qaj,qai->qji", _hex_dN_batch(xi), X)
        xi = xi - np.linalg.solve(J, r[..., None])[..., 0]
    return np.clip(xi, -1.2, 1.2)


def step_scatra_cut3d(coords, conn, phi_nodes, theta_old, dt, kappa=1.0,
                      g_dirichlet=lambda x, y, z, t=0.0: 0.0, source=0.0,
                      nitsche=40.0, t_new=0.0):
    """One backward-Euler step on Omega = {phi < 0}.

    theta_old: nodal field from the previous step (defined on ALL
        background nodes — inactive nodes carry extended values).
    Returns (theta_new nodal values, CutMesh3D of this step).
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    cm = CutMesh3D(coords, conn, phi_nodes)
    coords, conn = cm.coords, cm.conn
    n = coords.shape[0]
    h = np.max(np.linalg.norm(coords[conn[:, 6]] - coords[conn[:, 0]],
                              axis=1)) / np.sqrt(3.0)
    gam = nitsche * kappa / max(h, 1e-300)

    rows, cols, vals = [], [], []
    rhs = np.zeros(n)
    th_old = np.asarray(theta_old, float)

    def add_batch(ce, Nv, G, w):
        """ce (Q,8) nodes, Nv (Q,8), G (Q,8,3), w (Q,) -> volume terms."""
        Ae = w[:, None, None] * (
            kappa * np.einsum("qad,qbd->qab", G, G)
            + np.einsum("qa,qb->qab", Nv, Nv) / dt)
        rows.append(np.repeat(ce, 8, axis=1).reshape(-1))
        cols.append(np.tile(ce, (1, 8)).reshape(-1))
        vals.append(Ae.reshape(-1))
        fe = w[:, None] * Nv * (source
                                + np.einsum("qa,qa->q", Nv, th_old[ce])[:, None] / dt
                                / 1.0)
        np.add.at(rhs, ce.reshape(-1), fe.reshape(-1))

    g1 = 1.0 / np.sqrt(3.0)
    gp = np.array(np.meshgrid(*3 * [[-g1, g1]], indexing="ij")).reshape(3, -1).T
    if len(cm.inside):
        ce = conn[cm.inside]  # (E, 8)
        X = coords[ce]
        for xi in gp:
            xiq = np.broadcast_to(xi, (len(cm.inside), 3)).copy()
            Nv = _hex_N_batch(xiq)
            dN = _hex_dN_batch(xiq)
            J = np.einsum("qaj,qai->qji", dN, X)
            detJ = np.abs(np.linalg.det(J))
            G = np.einsum("qak,qjk->qaj", dN, np.linalg.inv(J))
            add_batch(ce, Nv, G, detJ)

    if len(cm.qcut_ele):
        ce = conn[cm.qcut_ele]
        X = coords[ce]
        xi = _inv_map_batch(X, cm.qcut_pts)
        Nv = _hex_N_batch(xi)
        dN = _hex_dN_batch(xi)
        J = np.einsum("qaj,qai->qji", dN, X)
        G = np.einsum("qak,qjk->qaj", dN, np.linalg.inv(J))
        add_batch(ce, Nv, G, cm.qcut_wts)

    # symmetric Nitsche Dirichlet on the moving interface (batched)
    if len(cm.sif_ele):
        ce = conn[cm.sif_ele]
        X = coords[ce]
        xi = _inv_map_batch(X, cm.sif_pts)
        Nv = _hex_N_batch(xi)
        dN = _hex_dN_batch(xi)
        J = np.einsum("qaj,qai->qji", dN, X)
        G = np.einsum("qak,qjk->qaj", dN, np.linalg.inv(J))
        dn = kappa * np.einsum("qaj,qj->qa", G, cm.sif_nrm)
        w = cm.sif_wts
        g = np.asarray([g_dirichlet(p[0], p[1], p[2], t_new)
                        for p in cm.sif_pts], float)
        Ae = w[:, None, None] * (
            -np.einsum("qa,qb->qab", dn, Nv) - np.einsum("qa,qb->qab", Nv, dn)
            + gam * np.einsum("qa,qb->qab", Nv, Nv))
        rows.append(np.repeat(ce, 8, axis=1).reshape(-1))
        cols.append(np.tile(ce, (1, 8)).reshape(-1))
        vals.append(Ae.reshape(-1))
        fe = w[:, None] * (-dn * g[:, None] + gam * Nv * g[:, None])
        np.add.at(rhs, ce.reshape(-1), fe.reshape(-1))

    # small-support deactivation
    support = np.zeros(n)
    if len(cm.inside):
        ce = conn[cm.inside]
        X = coords[ce]
        dN0 = _hex_dN_batch(np.zeros((len(cm.inside), 3)))
        det0 = np.abs(np.linalg.det(np.einsum("qaj,qai->qji", dN0, X)))
        np.add.at(support, ce.reshape(-1),
                  np.repeat(det0, 8))
    if len(cm.qcut_ele):
        ce = conn[cm.qcut_ele]
        xi = _inv_map_batch(coords[ce], cm.qcut_pts)
        np.add.at(support, ce.reshape(-1),
                  (cm.qcut_wts[:, None] * _hex_N_batch(xi)).reshape(-1))
    # sliver guard: nodes with near-zero basis support in Omega make the
    # Nitsche system ill-conditioned (constancy error from spsolve
    # roundoff amplification); deactivate them — their (small) column
    # contributions are moved to the rhs below with the extended old
    # value, so consistency is preserved
    act = cm.active_nodes & (support > 1e-4 * h**3)
    cm.active_nodes = act

    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    idx = np.where(act)[0]
    th = th_old.copy()
    # deactivated (sliver) nodes enter as Dirichlet carriers of their
    # extended old value — their columns move to the rhs
    th_fix = np.where(act, 0.0, th_old)
    rhs_eff = rhs - A @ th_fix
    th[idx] = spla.spsolve(A[idx][:, idx].tocsc(), rhs_eff[idx])

    # extend to inactive nodes: nearest active value (XFEM ghost values)
    inact = np.where(~act)[0]
    if len(inact) and len(idx):
        from scipy.spatial import cKDTree

        tree = cKDTree(coords[idx])
        _, nearest = tree.query(coords[inact])
        th[inact] = th[idx][nearest]
    return th, cm
