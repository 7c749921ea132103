"""Volume-mortar (volmortar) projection between non-matching volume meshes.

Counterpart of the reference's coupling/volmortar module (ref:
src/coupling/src/volmortar — VolMortarCoupl builds D and M volume-integral
matrices and the projection P = D^-1 M between two non-matching volume
discretizations; used by TSI/SSI/poro with independently meshed fields).

TPU-native design: the pairing is resolved ONCE on the host in the
reference configuration — every target-element Gauss point is located in
the source mesh by inverse isoparametric Newton — and baked into fixed
gather indices + weights.  With row-sum (lumped) D the projection is

    (P x_s)_a = sum_gp w_gp N_a^t(gp) N_b^s(gp) x_s,b / sum_gp w_gp N_a^t

which reproduces constants and linear fields exactly (partition of unity
x linear completeness) and is the standard lumped-mortar projector.  The
runtime apply is two static gathers + segment sums — one XLA kernel.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fourc_tpu.coupling.beam_solid import _locate_in_hex


class VolMortar:
    """P: source-mesh nodal field -> target-mesh nodal field."""

    def __init__(self, source_disc, target_disc):
        from fourc_tpu.core.cells import get_cell

        src_key, src_blk = next(iter(target_and(source_disc)))
        tgt_key, tgt_blk = next(iter(target_and(target_disc)))
        if src_blk.cell != "hex8" or tgt_blk.cell != "hex8":
            raise NotImplementedError("volmortar: hex8/hex8 for now")
        cell = get_cell("hex8")
        Xs = np.asarray(source_disc.coords)
        Xt = np.asarray(target_disc.coords)
        sconn = np.asarray(src_blk.conn)
        tconn = np.asarray(tgt_blk.conn)

        # target Gauss points in world coords
        gp_xi = np.asarray(cell.gauss_points)  # (g, 3)
        gp_w = np.asarray(cell.gauss_weights)  # (g,)
        rows_t, cols_s, vals, wsum_idx, wsum_val = [], [], [], [], []
        scent = Xs[sconn].mean(axis=1)
        for e in range(tconn.shape[0]):
            Xe_t = Xt[tconn[e]]
            # element-local DUAL shape coefficients A = D_e M_e^-1 with
            # M_e = int N N^T, D_e = diag(int N_a): the dual test basis
            # phi = A N makes D globally diagonal AND the projection
            # linear-complete (ref: volmortar dual Lagrange multipliers,
            # 4C_mortar_element_shapefct dual path)
            Me = np.zeros((8, 8))
            de = np.zeros(8)
            for g in range(gp_xi.shape[0]):
                Ng = cell.eval_shape(gp_xi[g])
                Jg = cell.eval_shape_deriv(gp_xi[g]).T @ Xe_t
                wg = gp_w[g] * abs(np.linalg.det(Jg))
                Me += wg * np.outer(Ng, Ng)
                de += wg * Ng
            A = np.diag(de) @ np.linalg.inv(Me)
            for g in range(gp_xi.shape[0]):
                Nt = cell.eval_shape(gp_xi[g])  # (8,)
                phi = A @ Nt  # dual test functions at this GP
                xw = Nt @ Xe_t
                dN = cell.eval_shape_deriv(gp_xi[g])  # (8, 3)
                J = dN.T @ Xe_t
                w = gp_w[g] * abs(np.linalg.det(J))
                # locate xw in the source mesh (nearest candidates first)
                order = np.argsort(((scent - xw) ** 2).sum(axis=1))[:8]
                hit = None
                for se in order:
                    xi, inside = _locate_in_hex(xw, Xs[sconn[se]])
                    if inside:
                        hit = (se, xi)
                        break
                if hit is None:  # clip to the nearest element (overhang)
                    se = order[0]
                    xi, _ = _locate_in_hex(xw, Xs[sconn[se]])
                    xi = np.clip(xi, -1.0, 1.0)
                    hit = (se, xi)
                se, xi = hit
                Ns = cell.eval_shape(np.asarray(xi))  # (8,)
                for a in range(8):
                    wsum_idx.append(tconn[e, a])
                    wsum_val.append(w * Nt[a])
                    for b in range(8):
                        rows_t.append(tconn[e, a])
                        cols_s.append(sconn[se, b])
                        vals.append(w * phi[a] * Ns[b])

        rows_t = np.asarray(rows_t, np.int32)
        cols_s = np.asarray(cols_s, np.int32)
        vals = np.asarray(vals)
        diag = np.zeros(Xt.shape[0])
        np.add.at(diag, np.asarray(wsum_idx, np.int32), np.asarray(wsum_val))
        self.n_t = Xt.shape[0]
        self.n_s = Xs.shape[0]
        self.rows = jnp.asarray(rows_t)
        self.cols = jnp.asarray(cols_s)
        self.vals = jnp.asarray(vals / np.maximum(diag[rows_t], 1e-300))
        # transpose weights for conservative force transfer: F_s = P^T F_t
        self.vals_T = jnp.asarray(vals / np.maximum(diag[rows_t], 1e-300))

    def project(self, x_s):
        """Nodal source field (n_s,) or (n_s, k) -> target field."""
        contrib = self.vals.reshape(
            self.vals.shape + (1,) * (x_s.ndim - 1)) * x_s[self.cols]
        out = jnp.zeros((self.n_t,) + x_s.shape[1:], x_s.dtype)
        return out.at[self.rows].add(contrib)

    def transfer_forces(self, f_t):
        """Conservative transpose transfer: target nodal forces -> source
        (sum-preserving: sum_s F_s = sum_t F_t since P rows sum to 1)."""
        contrib = self.vals_T.reshape(
            self.vals_T.shape + (1,) * (f_t.ndim - 1)) * f_t[self.rows]
        out = jnp.zeros((self.n_s,) + f_t.shape[1:], f_t.dtype)
        return out.at[self.cols].add(contrib)


def target_and(disc):
    return iter(disc.blocks.items())
