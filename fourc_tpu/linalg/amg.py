"""Smoothed-aggregation algebraic multigrid (unstructured meshes).

Counterpart of the reference's MueLu AMG preconditioner for meshes where
the geometric hierarchy (linalg/gmg.py) does not apply
(ref: src/core/linear_solver/src/preconditioner/4C_linear_solver_preconditioner_muelu.cpp
— CreateXpetraPreconditioner with rigid-body-mode nullspace; smoothed
aggregation is MueLu's default coarsening).

Setup happens ONCE on the host (scipy.sparse): strength-graph greedy
aggregation of NODES (all dofs of a node share its aggregate — the
block/nodal aggregation MueLu uses for elasticity), tentative prolongator
from the translational nullspace, one Jacobi smoothing pass
P = (I - omega D^-1 A) P0, Galerkin coarse operators A_c = P^T A P.
The V-cycle then runs fully on device: every level's SpMV and transfer is
a gather-only node-block ELL apply (TPU has no efficient scatter — see
_BlockELL), smoothers are Chebyshev on the Jacobi-scaled operator, the
coarsest level is a dense factor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class _BlockELL:
    """Node-block padded-row (ELL) sparse operator — gather-only matvec.

    TPU has no efficient scatter: the COO segment-sum SpMV measured 128 ms
    for ONE fine-level apply at 8.7M nnz (serialized scatter).  The ELL
    form stores, per row NODE, a fixed-width neighbor-node table plus
    (ndpn x ndpn) dense blocks; the matvec is a node gather + one batched
    small-matmul einsum — bandwidth-bound, ~100x faster.  Padding slots
    point at column 0 with zero blocks (mathematically inert)."""

    def __init__(self, A_csr, ndpn, shape_nodes):
        nr, nc = shape_nodes
        coo = A_csr.tocoo()
        rn = (coo.row // ndpn).astype(np.int64)
        cn = (coo.col // ndpn).astype(np.int64)
        keys = rn * nc + cn
        pairs = np.unique(keys)
        prow = pairs // nc
        pcol = (pairs % nc).astype(np.int32)
        counts = np.bincount(prow, minlength=nr)
        k = max(int(counts.max()) if pairs.size else 1, 1)
        starts = np.zeros(nr + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        slot_of_pair = np.arange(pairs.size) - starts[prow]
        nbr = np.zeros((nr, k), np.int32)
        nbr[prow, slot_of_pair] = pcol
        blk = np.zeros((nr, k, ndpn, ndpn), np.float32)
        pid = np.searchsorted(pairs, keys)
        blk[rn, slot_of_pair[pid], coo.row % ndpn, coo.col % ndpn] = coo.data
        self.ndpn = ndpn
        self.n_cols = nc
        self.nbr = jnp.asarray(nbr)
        self.blk = jnp.asarray(blk)

    def mv(self, x):
        xg = x.reshape(self.n_cols, self.ndpn)[self.nbr]  # (nr, k, d)
        # HIGHEST precision: default would route through the bf16 MXU,
        # breaking the preconditioner linearity Krylov assumes (see gmg.py)
        y = jnp.einsum("rkij,rkj->ri", self.blk, xg,
                       precision=jax.lax.Precision.HIGHEST)
        return y.reshape(-1)


def _aggregate(A_node, theta=0.08):
    """Vanek-style greedy aggregation of the node graph (scipy csr).

    Phase 1 seeds an aggregate at every node with no aggregated strong
    neighbor (root + its unaggregated strong neighbors); phase 2 attaches
    leftovers to the aggregated neighbor with the largest |a_ij|.

    Strength is ROW-RELATIVE (classical AMG): |a_ij| >= theta * max_k
    |a_ik| over the row's off-diagonals.  A diagonal-scaled test
    (|a_ij| > theta sqrt(a_ii a_jj)) marked every connection weak on
    smoothed-aggregation coarse operators (off-diagonals small vs the
    diagonal), so phase 1 seeded all-singleton aggregates: levels shrank
    1.5x with stencils blowing up to 490 blocks/row.  Returns agg id per
    node."""
    n = A_node.shape[0]
    A = A_node.tocsr()
    agg = -np.ones(n, np.int64)
    next_agg = 0
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbrs = A.indices[A.indptr[i]:A.indptr[i + 1]]
        vals = A.data[A.indptr[i]:A.indptr[i + 1]]
        off = [abs(v) for j, v in zip(nbrs, vals) if j != i]
        thr = theta * max(off, default=0.0)
        strong = [j for j, v in zip(nbrs, vals) if j != i and abs(v) >= thr
                  and abs(v) > 0.0]
        if all(agg[j] < 0 for j in strong):
            agg[i] = next_agg
            for j in strong:
                agg[j] = next_agg
            next_agg += 1
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbrs = A.indices[A.indptr[i]:A.indptr[i + 1]]
        vals = A.data[A.indptr[i]:A.indptr[i + 1]]
        best, bv = -1, 0.0
        for j, v in zip(nbrs, vals):
            if j != i and agg[j] >= 0 and abs(v) > bv:
                best, bv = agg[j], abs(v)
        if best >= 0:
            agg[i] = best
        else:
            agg[i] = next_agg
            next_agg += 1
    return agg, next_agg


class SmoothedAggregationAMG:
    """V-cycle preconditioner from an assembled SparseMatrix."""

    def __init__(self, A_sparse, ndpn, free_mask, omega=0.6, coarsest=400,
                 max_levels=10, cheby_degree=3, n_smooth=1):
        import scipy.sparse as sp

        if sp.issparse(A_sparse):
            # host-assembled operator (the fast setup path: no device
            # sparse pattern, no remote eager dispatches)
            A0 = A_sparse.tocsr().astype(np.float64)
        else:
            p = A_sparse.pattern
            n = p.n_rows
            A0 = sp.coo_matrix(
                (np.asarray(A_sparse.vals, np.float64),
                 (np.asarray(p.rows), np.asarray(p.cols))),
                shape=(n, n)).tocsr()
        free = np.asarray(free_mask)
        # constrained dofs already carry unit diagonal via apply_dirichlet
        self.ndpn = ndpn
        self.levels = []  # dicts: A (_COO), dinv, lmax, P (_COO) or None
        A = A0
        while True:
            d = np.asarray(A.diagonal())
            dinv = np.where(np.abs(d) > 1e-300, 1.0 / d, 1.0)
            absA = abs(A)
            lmax = float((np.abs(dinv) * np.asarray(
                absA.sum(axis=1)).ravel()).max())
            nn_l = A.shape[0] // ndpn
            lev = {"A": _BlockELL(A, ndpn, (nn_l, nn_l)),
                   "dinv": jnp.asarray(dinv.astype(np.float32)),
                   "lmax": 1.02 * lmax, "P": None, "R": None}
            self.levels.append(lev)
            nn = A.shape[0] // ndpn
            if nn <= coarsest // ndpn or len(self.levels) >= max_levels:
                break
            # node-level strength graph: sum |A_ij| over the dof block
            Ab = abs(A).tocsr()
            rows = np.repeat(np.arange(A.shape[0]) // ndpn, np.diff(Ab.indptr))
            cols = Ab.indices // ndpn
            G = sp.coo_matrix((Ab.data, (rows, cols)), shape=(nn, nn)).tocsr()
            agg, n_agg = _aggregate(G)
            if n_agg > nn // 2:  # stalled coarsening: stop the hierarchy
                break
            # tentative prolongator: per-dof-component injection
            ridx = np.arange(A.shape[0])
            cidx = agg[ridx // ndpn] * ndpn + (ridx % ndpn)
            P0 = sp.coo_matrix((np.ones(A.shape[0]), (ridx, cidx)),
                               shape=(A.shape[0], n_agg * ndpn)).tocsr()
            # smoothing: P = (I - omega D^-1 A) P0
            Dinv = sp.diags(dinv)
            P = (P0 - omega * (Dinv @ (A @ P0))).tocsr()
            lev["P"] = _BlockELL(P, ndpn, (nn, n_agg))
            # restriction as its own ELL operator (gather-only transpose
            # apply — mv_t would be a scatter)
            lev["R"] = _BlockELL(P.T.tocsr(), ndpn, (n_agg, nn))
            A = (P.T @ A @ P).tocsr()
        # coarsest dense factor
        self._coarse_inv = jnp.asarray(
            np.linalg.inv(A.toarray()).astype(np.float32))
        self.cheby_degree = cheby_degree
        self.n_smooth = n_smooth

    def _smooth0(self, lev, b, return_res=False):
        """Chebyshev(degree) from x = 0, skipping the wasted A·0 matvec;
        with ``return_res`` also returns the true residual b - A x from the
        smoother's own matvecs (degree SpMVs total vs degree + 2 for
        smooth + separate residual — same fusion as linalg/gmg.py)."""
        lmax, dinv, A = lev["lmax"], lev["dinv"], lev["A"]
        lmin = lmax / 30.0
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma = theta / delta
        rho_old = 1.0 / sigma
        r = dinv * b
        d = r / theta
        x = d
        rt = b
        for _ in range(self.cheby_degree - 1):
            t = A.mv(d)
            if return_res:
                rt = rt - t
            rho = 1.0 / (2.0 * sigma - rho_old)
            r = r - dinv * t
            d = rho * rho_old * d + (2.0 * rho / delta) * r
            x = x + d
            rho_old = rho
        if return_res:
            return x, rt - A.mv(d)
        return x

    def _vcycle(self, k, r):
        lev = self.levels[k]
        if lev["P"] is None:
            return self._coarse_inv @ r
        x, res = self._smooth0(lev, r, return_res=True)
        rc = lev["R"].mv(res)
        xc = self._vcycle(k + 1, rc)
        x = x + lev["P"].mv(xc)
        res = r - lev["A"].mv(x)
        return x + self._smooth0(lev, res)

    def __call__(self, r):
        return self._vcycle(0, r.astype(jnp.float32)).astype(r.dtype)


# -- disk persistence (driver-bench robustness: the host-side hierarchy
# build at 555k dofs costs ~45 min on a 1-core host and is deterministic
# for a given mesh + mass shift; the reference's analog is MueLu
# preconditioner reuse across solves) --------------------------------------


def save_amg(M: "SmoothedAggregationAMG", path):
    """Serialize the V-cycle data (ELL levels + coarse factor) to npz."""
    import numpy as np

    data = {"n_levels": np.asarray(len(M.levels)),
            "coarse_inv": np.asarray(M._coarse_inv),
            "cheby_degree": np.asarray(M.cheby_degree),
            "n_smooth": np.asarray(M.n_smooth),
            "ndpn": np.asarray(M.ndpn)}
    for i, lev in enumerate(M.levels):
        data[f"l{i}_dinv"] = np.asarray(lev["dinv"])
        data[f"l{i}_lmax"] = np.asarray(lev["lmax"])
        for nm in ("A", "P", "R"):
            op = lev[nm]
            if op is None:
                continue
            data[f"l{i}_{nm}_nbr"] = np.asarray(op.nbr)
            data[f"l{i}_{nm}_blk"] = np.asarray(op.blk)
            data[f"l{i}_{nm}_ncols"] = np.asarray(op.n_cols)
    np.savez_compressed(path, **data)


def load_amg(path):
    """Inverse of save_amg; returns a ready SmoothedAggregationAMG."""
    import numpy as np

    z = np.load(path)
    M = SmoothedAggregationAMG.__new__(SmoothedAggregationAMG)
    M.ndpn = int(z["ndpn"])
    M.cheby_degree = int(z["cheby_degree"])
    M.n_smooth = int(z["n_smooth"])
    M._coarse_inv = jnp.asarray(z["coarse_inv"])
    M.levels = []
    for i in range(int(z["n_levels"])):
        lev = {"dinv": jnp.asarray(z[f"l{i}_dinv"]),
               "lmax": float(z[f"l{i}_lmax"]), "P": None, "R": None}
        for nm in ("A", "P", "R"):
            if f"l{i}_{nm}_nbr" not in z:
                continue
            op = _BlockELL.__new__(_BlockELL)
            op.ndpn = M.ndpn
            op.n_cols = int(z[f"l{i}_{nm}_ncols"])
            op.nbr = jnp.asarray(z[f"l{i}_{nm}_nbr"])
            op.blk = jnp.asarray(z[f"l{i}_{nm}_blk"])
            lev[nm] = op
        M.levels.append(lev)
    return M
