"""Matched-node mesh tying (strong master/slave condensation).

Counterpart of the reference's mesh tying for conforming interfaces
(ref: src/mortar Mortar::Interface with matching meshes — there D and M
become identical permutation-mass matrices and condensation reduces to
u_slave = u_master; the general non-matching mortar D/M integration is
future work).  Implemented matrix-free: the residual of a tied system is
r_reduced = T^T r(T u) with T the spread map copying master dofs onto
slave dofs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class TiedDofs:
    """Ties slave nodes to master nodes (all ndpn components)."""

    def __init__(self, pairs, ndpn: int, n_nodes: int):
        """pairs: (n_pairs, 2) [slave_node, master_node]."""
        pairs = np.asarray(pairs, np.int64)
        self.ndpn = ndpn
        s = (pairs[:, 0:1] * ndpn + np.arange(ndpn)[None, :]).reshape(-1)
        m = (pairs[:, 1:2] * ndpn + np.arange(ndpn)[None, :]).reshape(-1)
        self.slave_dofs = jnp.asarray(s.astype(np.int32))
        self.master_dofs = jnp.asarray(m.astype(np.int32))
        fixed = np.zeros(n_nodes * ndpn, dtype=bool)
        fixed[s] = True
        self.slave_mask = jnp.asarray(fixed)

    def spread(self, u):
        """Copy master values onto slave dofs (T u)."""
        return u.at[self.slave_dofs].set(u[self.master_dofs])

    def reduce(self, r):
        """Accumulate slave residuals onto master rows, zero slave rows (T^T r)."""
        r = r.at[self.master_dofs].add(r[self.slave_dofs])
        return r.at[self.slave_dofs].set(0.0)

    def wrap_residual(self, residual_fn):
        def wrapped(u):
            return self.reduce(residual_fn(self.spread(u)))

        return wrapped


def match_pairs(coords, slave_nodes, master_nodes, tol=1e-9, offset=None):
    """Build (slave, master) node pairs by coordinate matching.

    offset: None (coincident interfaces) | "auto" | translation vector —
    the slave side is shifted by -offset before matching (periodic BCs,
    ref: the reference's periodic-boundary dofset
    fem/src/dofset pbc wrappers + 4C_fem_condition periodic conditions).
    """
    slave_nodes = np.asarray(slave_nodes)
    master_nodes = np.asarray(master_nodes)
    xs = np.asarray(coords)[slave_nodes]
    xm = np.asarray(coords)[master_nodes]
    if offset is not None:
        off = (xs.mean(axis=0) - xm.mean(axis=0)
               if isinstance(offset, str) else np.asarray(offset, float))
        xs = xs - off[None, :]
    scale = max(1.0, float(np.abs(xm).max()))
    ks = np.round(xs / (tol * scale)).astype(np.int64)
    km = np.round(xm / (tol * scale)).astype(np.int64)
    om = np.lexsort(km.T)
    os_ = np.lexsort(ks.T)
    if not np.array_equal(km[om], ks[os_]):
        raise ValueError("meshtying interfaces do not match node-wise")
    return np.stack([slave_nodes[os_], master_nodes[om]], axis=1)
