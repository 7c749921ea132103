"""Mortar D/M integration for NON-matching interface meshtying.

Counterpart of the reference's mortar coupling backbone
(ref: src/mortar — `Mortar::Interface::assemble_d/assemble_m`
4C_mortar_interface.cpp:3366,3444; dual Lagrange shape functions
4C_mortar_element_shapefct.cpp; 2D/3D projection in coupling2d/3d).

TPU-native design: the interface is STATIC (meshtying), so the D/M
integration runs ONCE on the host (numpy) and produces a sparse
interpolation operator

    u_slave = W u_master,      W = D^{-1} M

with CONSISTENT slave-side D (dense solve at setup — interface counts are
tiny next to the volume problem):

    D_ss' = sum_segments int N_s N_s' dA    (slave-side interface mass)
    M_sm  = sum_segments int N_s N_m dA     (clipped slave x master
                                             segments, triangle quadrature)

The runtime coupling is matrix-free: residual condensation
r_m += W^T r_s, r_s = 0, with u_s = W u_m (coupling/meshtying.py pattern).
Consistent D reproduces linear interface fields; the flat-interface patch
test is exact.
"""

from __future__ import annotations

import numpy as np


def _shape_quad4(xi, eta):
    return 0.25 * np.array([
        (1 - xi) * (1 - eta), (1 + xi) * (1 - eta),
        (1 + xi) * (1 + eta), (1 - xi) * (1 + eta),
    ])


def _project_point_quad(x, Xf, iters=10):
    """Closest-point projection of x (3,) onto bilinear quad Xf (4,3);
    returns (xi, eta, dist)."""
    xi = eta = 0.0
    for _ in range(iters):
        N = _shape_quad4(xi, eta)
        dN = 0.25 * np.array([
            [-(1 - eta), -(1 - xi)],
            [(1 - eta), -(1 + xi)],
            [(1 + eta), (1 + xi)],
            [-(1 + eta), (1 - xi)],
        ])
        xp = N @ Xf
        t = dN.T @ Xf  # (2,3)
        r = x - xp
        A = t @ t.T
        b = t @ r
        try:
            dxi = np.linalg.solve(A, b)
        except np.linalg.LinAlgError:
            break
        xi = float(np.clip(xi + dxi[0], -1.2, 1.2))
        eta = float(np.clip(eta + dxi[1], -1.2, 1.2))
    N = _shape_quad4(np.clip(xi, -1, 1), np.clip(eta, -1, 1))
    xp = N @ Xf
    return xi, eta, float(np.linalg.norm(x - xp))


def _face_quads(face_blocks):
    """Concatenate tri3 (degenerated) / quad4 faces into (F, 4) conn."""
    out = []
    for fb in face_blocks:
        conn = np.asarray(fb.conn)
        if conn.shape[1] == 3:
            conn = np.concatenate([conn, conn[:, 2:3]], axis=1)
        elif conn.shape[1] != 4:
            raise NotImplementedError("mortar supports tri3/quad4 faces")
        out.append(conn)
    return np.concatenate(out, axis=0)


def _clip_convex(subject, clip):
    """Sutherland-Hodgman: clip convex polygon `subject` (n,2) by convex
    polygon `clip` (m,2), both CCW. Returns (k,2) or empty."""
    out = list(subject)
    m = len(clip)
    for i in range(m):
        a, b = clip[i], clip[(i + 1) % m]
        edge = b - a
        inp, out = out, []
        if not inp:
            break
        for j in range(len(inp)):
            p, q = inp[j], inp[(j + 1) % len(inp)]
            sp = edge[0] * (p - a)[1] - edge[1] * (p - a)[0]
            sq = edge[0] * (q - a)[1] - edge[1] * (q - a)[0]
            if sp >= -1e-14:
                out.append(p)
            if (sp >= -1e-14) != (sq >= -1e-14):
                t = sp / (sp - sq)
                out.append(p + t * (q - p))
    return np.asarray(out) if out else np.zeros((0, 2))


def _ccw(poly):
    a = 0.0
    for i in range(len(poly)):
        p, q = poly[i], poly[(i + 1) % len(poly)]
        a += p[0] * q[1] - q[0] * p[1]
    return poly if a >= 0 else poly[::-1]


_TRI_GP = np.array([[1 / 6, 1 / 6], [2 / 3, 1 / 6], [1 / 6, 2 / 3]])
_TRI_W = np.array([1 / 6, 1 / 6, 1 / 6])  # weights * reference-area


def mortar_interpolation(coords, slave_faces, master_faces, n_gp=2,
                         max_masters=16, tol_rel=1e-6):
    """Build the mortar interpolation u_slave = W u_master by SEGMENT-based
    integration (slave x master polygon clipping in the interface plane —
    the reference's coupling3d approach, exact for flat interfaces).

    Returns (slave_nodes (S,), master_ids (S, K), weights (S, K)) with
    row sums == 1 for interior slave nodes (partition of unity).
    """
    coords = np.asarray(coords)
    sconn = _face_quads(slave_faces)  # (Fs, 4)
    mconn = _face_quads(master_faces)  # (Fm, 4)

    snodes = np.unique(sconn)
    sidx = {n: i for i, n in enumerate(snodes)}
    S = len(snodes)
    Dfull = {}  # (slave_row, slave_row) -> slave-side mass (consistent D)
    M = {}  # (slave_row, master_node) -> weight

    mcent = coords[mconn].mean(axis=1)

    for f in range(sconn.shape[0]):
        Xs = coords[sconn[f]]
        # local interface plane from the slave face
        c0 = Xs.mean(axis=0)
        t1v = Xs[1] - Xs[0]
        t1v /= np.linalg.norm(t1v)
        nrm = np.cross(Xs[2] - Xs[0], Xs[3] - Xs[1])
        nrm /= np.linalg.norm(nrm)
        t2v = np.cross(nrm, t1v)
        P = np.stack([t1v, t2v])  # (2,3) plane basis

        spoly = _ccw((Xs - c0) @ P.T)  # (4,2) in plane
        scent = coords[sconn[f]].mean(axis=0)
        diam = np.linalg.norm(Xs - scent, axis=1).max()
        near = np.where(((mcent - scent) ** 2).sum(axis=1)
                        < (4.0 * diam) ** 2)[0]
        for mf in near:
            Xm = coords[mconn[mf]]
            mpoly = _ccw((Xm - c0) @ P.T)
            clip = _clip_convex(spoly, mpoly)
            if len(clip) < 3:
                continue
            # fan-triangulate the clip polygon, integrate each triangle
            for k in range(1, len(clip) - 1):
                tri = np.stack([clip[0], clip[k], clip[k + 1]])
                e1, e2 = tri[1] - tri[0], tri[2] - tri[0]
                J2 = abs(e1[0] * e2[1] - e1[1] * e2[0])
                if J2 < 1e-16:
                    continue
                for gp, wt in zip(_TRI_GP, _TRI_W):
                    xg2 = (1 - gp[0] - gp[1]) * tri[0] + gp[0] * tri[1] \
                        + gp[1] * tri[2]
                    xg3 = c0 + xg2 @ P  # back to 3D (on the slave plane)
                    sxi, seta, _ = _project_point_quad(xg3, Xs)
                    mxi, meta, _ = _project_point_quad(xg3, Xm)
                    N_s = _shape_quad4(np.clip(sxi, -1, 1), np.clip(seta, -1, 1))
                    N_m = _shape_quad4(np.clip(mxi, -1, 1), np.clip(meta, -1, 1))
                    w = wt * J2  # physical segment area weight
                    for a, sn in enumerate(sconn[f]):
                        row = sidx[sn]
                        for a2, sn2 in enumerate(sconn[f]):
                            Dfull[(row, sidx[sn2])] = Dfull.get(
                                (row, sidx[sn2]), 0.0) + w * N_s[a] * N_s[a2]
                        for b, mn in enumerate(mconn[mf]):
                            M[(row, mn)] = M.get((row, mn), 0.0) \
                                + w * N_s[a] * N_m[b]

    # consistent D: W = D^-1 M (dense solve at setup; reproduces linear
    # fields across the interface — optimal mortar projection).  Sizes are
    # interface-node counts, tiny next to the volume problem.
    if S > 20000:
        raise NotImplementedError("mortar interface too large for dense D")
    Dm = np.zeros((S, S))
    for (r, c), v in Dfull.items():
        Dm[r, c] += v
    mnodes = np.unique([mn for (_, mn) in M.keys()])
    midx = {n: i for i, n in enumerate(mnodes)}
    Mm = np.zeros((S, len(mnodes)))
    for (r, mn), v in M.items():
        Mm[r, midx[mn]] += v
    # guard empty rows (slave nodes with no master overlap)
    empty = Dm.diagonal() < 1e-14
    Dm[empty, :] = 0.0
    Dm[empty, empty] = 1.0
    W = np.linalg.solve(Dm, Mm)  # (S, n_masters)

    master_ids = np.zeros((S, max_masters), np.int32)
    weights = np.zeros((S, max_masters))
    for row in range(S):
        order = np.argsort(-np.abs(W[row]))[:max_masters]
        k = len(order)
        master_ids[row, :k] = mnodes[order]
        weights[row, :k] = W[row][order]
        # partition-of-unity repair after truncation
        s = weights[row].sum()
        if abs(s) > 1e-12:
            weights[row] *= (W[row].sum() / s) if abs(W[row].sum()) > 1e-12 else 1.0
    return snodes, master_ids, weights


class MortarTies:
    """Weighted (non-matching) slave-master condensation:
    u_s = W u_m; r_m += W^T r_s; r_s = 0."""

    def __init__(self, slave_nodes, master_ids, weights, ndpn, n_nodes):
        import jax.numpy as jnp

        S, K = master_ids.shape
        self.ndpn = ndpn
        # per-dof index arrays
        sd = (np.asarray(slave_nodes)[:, None] * ndpn
              + np.arange(ndpn)[None, :])  # (S, ndpn)
        md = (np.asarray(master_ids)[:, :, None] * ndpn
              + np.arange(ndpn)[None, None, :])  # (S, K, ndpn)
        self.slave_dofs = jnp.asarray(sd.astype(np.int32))
        self.master_dofs = jnp.asarray(md.astype(np.int32))
        self.weights = jnp.asarray(weights)  # (S, K)
        fixed = np.zeros(n_nodes * ndpn, dtype=bool)
        fixed[sd.reshape(-1)] = True
        self.slave_mask = jnp.asarray(fixed)

    def spread(self, u):
        import jax.numpy as jnp

        um = u[self.master_dofs]  # (S, K, ndpn)
        us = jnp.einsum("sk,skd->sd", self.weights, um)
        return u.at[self.slave_dofs.reshape(-1)].set(us.reshape(-1))

    def reduce(self, r):
        import jax.numpy as jnp

        rs = r[self.slave_dofs]  # (S, ndpn)
        contrib = self.weights[:, :, None] * rs[:, None, :]  # (S, K, ndpn)
        r = r.at[self.master_dofs.reshape(-1)].add(contrib.reshape(-1))
        return r.at[self.slave_dofs.reshape(-1)].set(0.0)

    def wrap_residual(self, residual_fn):
        def wrapped(u):
            return self.reduce(residual_fn(self.spread(u)))

        return wrapped
