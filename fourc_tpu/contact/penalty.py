"""Node-to-surface penalty contact with active-set masking.

Counterpart of the reference's computational-contact module
(ref: src/contact — `CONTACT::AbstractStrategy` -> `PenaltyStrategy`
(4C_contact_penalty_strategy.*); gap + normal evaluation in
4C_contact_integrator.cpp; semismooth active-set update
`update_active_set_semi_smooth` 4C_contact_lagrange_strategy.cpp:3385).

TPU-native design:
- broad phase ONCE at setup (host numpy): K candidate master faces per
  slave node by reference-configuration distance (the analog of the
  binary-tree search, ref: 4C_contact_binarytree.cpp) — fixed-shape arrays,
  re-jit-free; re-run on demand for large sliding
- narrow phase INSIDE the jitted residual: closest-point projection onto
  each candidate face (fixed-iteration Newton in the parametric coords),
  gap g = (x_s - x_proj) . n
- active set = (g < 0) masks in the residual; jax.jvp through the masked
  residual IS the consistent semismooth-Newton linearization (the
  derivative of the active branch), replacing the reference's hand-coded
  derivative maps (CoNode 'deriv' containers)
- penalty regularization sigma_n = -pen * min(g, 0) (ref: PenaltyStrategy);
  forces act on the slave node and are spread to the master face nodes by
  the shape functions at the projection point (action = reaction)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class ContactCondition:
    """Deck-level contact definition: slave nodes vs master faces."""

    slave_nodes: np.ndarray  # (S,) node ids
    master_faces: object  # list[FaceBlock] (quad4/tri3 faces)
    penalty: float = 1e5
    n_candidates: int = 4


class PenaltyContact:
    """Evaluates contact forces for a list of ContactConditions."""

    def __init__(self, conds, coords: np.ndarray, ndpn: int):
        self.ndpn = ndpn
        self.pairs = []
        for c in conds:
            faces = []
            for fb in c.master_faces:
                conn = np.asarray(fb.conn)
                if conn.shape[1] not in (3, 4):
                    raise NotImplementedError("contact master faces must be tri3/quad4")
                if conn.shape[1] == 3:  # degenerate quad from tri
                    conn = np.concatenate([conn, conn[:, 2:3]], axis=1)
                faces.append(conn)
            mconn = np.concatenate(faces, axis=0)  # (F, 4)
            slave = np.asarray(c.slave_nodes, np.int32)
            # broad phase: K nearest faces by reference centroid distance
            cent = coords[mconn].mean(axis=1)  # (F, d)
            d2 = ((coords[slave][:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            K = min(c.n_candidates, mconn.shape[0])
            cand = np.argsort(d2, axis=1)[:, :K].astype(np.int32)  # (S, K)
            self.pairs.append(
                dict(
                    slave=jnp.asarray(slave),
                    mconn=jnp.asarray(mconn.astype(np.int32)),
                    cand=jnp.asarray(cand),
                    pen=float(c.penalty),
                )
            )

    def force(self, x_nodes):
        """Contact nodal forces given CURRENT coordinates (n_nodes, d).

        Returns (n_nodes, d) forces (to be ADDED to the internal force,
        i.e. they enter the residual with a + sign on the slave side).
        """
        f = jnp.zeros_like(x_nodes)
        for p in self.pairs:
            f = f + _pair_force(x_nodes, p["slave"], p["mconn"], p["cand"], p["pen"])
        return f


def _project_quad(xs, Xf, iters=4):
    """Closest-point projection of xs (d,) onto bilinear quad Xf (4, d).

    Fixed-iteration Newton in (xi, eta) in [-1,1]^2 (jit-static), returns
    (xi, eta, x_proj, normal).
    """

    def shape(xi, eta):
        N = 0.25 * jnp.stack([
            (1 - xi) * (1 - eta), (1 + xi) * (1 - eta),
            (1 + xi) * (1 + eta), (1 - xi) * (1 + eta),
        ])
        dN = 0.25 * jnp.stack([
            jnp.stack([-(1 - eta), -(1 - xi)]),
            jnp.stack([(1 - eta), -(1 + xi)]),
            jnp.stack([(1 + eta), (1 + xi)]),
            jnp.stack([-(1 + eta), (1 - xi)]),
        ])  # (4, 2)
        return N, dN

    xi = jnp.asarray(0.0, xs.dtype)
    eta = jnp.asarray(0.0, xs.dtype)
    for _ in range(iters):
        N, dN = shape(xi, eta)
        xp = N @ Xf  # (d,)
        t = dN.T @ Xf  # (2, d) tangents
        r = xs - xp
        # solve [t.t^T] dxi = t.r (2x2)
        A = t @ t.T
        b = t @ r
        det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        dxi = jnp.stack([
            (A[1, 1] * b[0] - A[0, 1] * b[1]),
            (A[0, 0] * b[1] - A[1, 0] * b[0]),
        ]) / jnp.where(det == 0, 1.0, det)
        xi = jnp.clip(xi + dxi[0], -1.0, 1.0)
        eta = jnp.clip(eta + dxi[1], -1.0, 1.0)
    N, dN = shape(xi, eta)
    xp = N @ Xf
    t = dN.T @ Xf
    n = jnp.cross(t[0], t[1])
    n = n / jnp.maximum(jnp.linalg.norm(n), 1e-30)
    return xi, eta, N, xp, n


def _pair_force(x, slave, mconn, cand, pen):
    """Penalty forces for one contact pair set.

    Candidate faces are blended with a CONTINUOUS partition of unity (an
    insideness measure of the clipped projection), never selected by
    argmax: selection would make the residual jump when a node sits over a
    shared face edge (ties at flat interfaces), which destroys Newton.
    """

    def per_slave(s, cands):
        xs = x[s]

        def per_cand(fidx):
            Xf = x[mconn[fidx]]  # (4, d)
            xi, eta, N, xp, n = _project_quad(xs, Xf)
            g = jnp.dot(xs - xp, n)
            # smooth insideness measure of the (clipped) projection; >0 on
            # the closed face, decays to ~0 just outside -> continuous
            # partition across neighbouring faces
            tol = 0.02
            mu = jnp.maximum(0.0, 1.0 + tol - jnp.abs(xi)) * jnp.maximum(
                0.0, 1.0 + tol - jnp.abs(eta)
            )
            active = (g < 0.0) & (g > -0.5)
            p_n = jnp.where(active, -pen * g, 0.0)  # sigma_n >= 0
            return p_n, mu, n, N

        p_n, mu, n, N = jax.vmap(per_cand)(cands)  # (K,), (K,), (K,d), (K,4)
        # weights independent of the active state (gating by activity would
        # re-introduce jumps when a candidate activates); clipped outside
        # projections carry mu <= tol so they barely dilute the partition
        w = mu / jnp.maximum(mu.sum(), 1e-30)
        fs = jnp.einsum("k,k,kd->d", w, p_n, n)  # blended slave force
        fr = -(w * p_n)[:, None, None] * N[..., None] * n[:, None, :]  # (K,4,d)
        return fs, fr

    fs, fr = jax.vmap(per_slave)(slave, cand)  # (S, d), (S, K, 4, d)
    f = jnp.zeros_like(x)
    f = f.at[slave].add(fs)
    mnodes = mconn[cand]  # (S, K, 4)
    f = f.at[mnodes.reshape(-1)].add(fr.reshape(-1, x.shape[1]))
    return f
