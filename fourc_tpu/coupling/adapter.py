"""Field-to-field dof coupling on matching interfaces.

Counterpart of the reference's `Coupling::Adapter::Coupling`
(ref: src/coupling/src/adapter/4C_coupling_adapter.hpp:73-267 —
matched-node master/slave dof correspondence built by a matching octree,
`master_to_slave()` vector transfers).  TPU-native: the correspondence is
two permutation index arrays built once on the host; transfers are pure
gathers inside jit.
"""

from __future__ import annotations

import numpy as np


class MatchedCoupling:
    """Node-matched interface between two discretizations."""

    def __init__(self, coords_master, master_nodes, coords_slave, slave_nodes,
                 tol=1e-9):
        master_nodes = np.asarray(master_nodes)
        slave_nodes = np.asarray(slave_nodes)
        xm = np.asarray(coords_master)[master_nodes]
        xs = np.asarray(coords_slave)[slave_nodes]
        if xm.shape[0] != xs.shape[0]:
            raise ValueError(
                f"interface node counts differ: {xm.shape[0]} vs {xs.shape[0]}"
            )
        scale = max(1.0, float(np.abs(xm).max()))
        # match by lexicographic sort of rounded coords (matching octree analog)
        km = np.round(xm / (tol * scale)).astype(np.int64)
        ks = np.round(xs / (tol * scale)).astype(np.int64)
        om = np.lexsort(km.T)
        os_ = np.lexsort(ks.T)
        if not np.array_equal(km[om], ks[os_]):
            raise ValueError("interfaces do not match node-wise")
        self.master_nodes = master_nodes[om]
        self.slave_nodes = slave_nodes[os_]

    def master_to_slave(self, values_on_master_nodes):
        """values ordered like self.master_nodes -> ordered like slave."""
        return values_on_master_nodes

    def gather_master(self, field_master):
        """(n_master_nodes_total, c) -> (n_if, c) in interface order."""
        return field_master[self.master_nodes]

    def gather_slave(self, field_slave):
        return field_slave[self.slave_nodes]
