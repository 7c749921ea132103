"""Assembled sparse operators (COO with precomputed merge structure).

Counterpart of the reference's Epetra-CRS ``Core::LinAlg::SparseMatrix``
(ref: src/core/linalg/src/sparse/4C_linalg_sparsematrix.hpp:73) with the
``savegraph`` reuse mode (:77-109): the sparsity structure — which element
matrix entry lands in which unique (row, col) slot — is computed ONCE on the
host when the mesh is built; re-assembly of values is then a single device
``segment_sum`` over a precomputed permutation (bitwise deterministic; the
TPU answer to "sum into global by gid", 4C_linalg_sparsematrix.cpp:426).

The matrix-free path (jvp through the residual) is the preferred operator
for Krylov solves; this assembled path exists for preconditioners, block
systems and direct coarse solves — the same split of responsibilities the
reference has between its Evaluate loop and its solver stack.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class SparsePattern:
    """Host-built structure for one field's stiffness sparsity."""

    n_rows: int
    rows: jnp.ndarray  # (nnz,) unique entry rows
    cols: jnp.ndarray  # (nnz,) unique entry cols
    # mapping from concatenated element-matrix entries (in block order) to
    # unique nnz slots, pre-sorted so segment_sum is contiguous:
    perm: jnp.ndarray  # (n_contrib,) gather order of element entries
    seg: jnp.ndarray  # (n_contrib,) target slot per sorted entry
    sizes: dict  # block key -> n_contrib of that block (for splitting)
    order: list  # block keys in concatenation order

    @property
    def nnz(self):
        return self.rows.shape[0]


def build_pattern(dofmap, ndof: int | None = None) -> SparsePattern:
    """Build the merged COO pattern for K = sum_e scatter(K_e)."""
    ndof = ndof or dofmap.ndof
    all_r, all_c = [], []
    order, sizes = [], {}
    for key, ba in dofmap.blocks.items():
        edof = np.asarray(ba.edof)  # (n_ele, nd)
        nd = edof.shape[1]
        r = np.repeat(edof, nd, axis=1).reshape(-1)  # row-major K_e entries
        c = np.tile(edof, (1, nd)).reshape(-1)
        all_r.append(r)
        all_c.append(c)
        order.append(key)
        sizes[key] = r.size
    r = np.concatenate(all_r).astype(np.int64)
    c = np.concatenate(all_c).astype(np.int64)
    lin = r * ndof + c
    perm = np.argsort(lin, kind="stable")
    lin_sorted = lin[perm]
    uniq, seg = np.unique(lin_sorted, return_inverse=True)
    return SparsePattern(
        n_rows=ndof,
        rows=jnp.asarray((uniq // ndof).astype(np.int32)),
        cols=jnp.asarray((uniq % ndof).astype(np.int32)),
        perm=jnp.asarray(perm.astype(np.int32)),
        seg=jnp.asarray(seg.astype(np.int32)),
        sizes=sizes,
        order=order,
    )


def assemble_values(pattern: SparsePattern, elem_mats: dict) -> jnp.ndarray:
    """Element matrices {block: (n_ele, nd, nd)} -> merged COO values (nnz,)."""
    parts = [elem_mats[k].reshape(-1) for k in pattern.order]
    flat = jnp.concatenate(parts)[pattern.perm]
    return jax.ops.segment_sum(flat, pattern.seg, num_segments=pattern.nnz)


@dataclass
class SparseMatrix:
    """Immutable assembled operator y = A x (COO segment-sum SpMV)."""

    pattern: SparsePattern
    vals: jnp.ndarray

    def matvec(self, x):
        p = self.pattern
        return jax.ops.segment_sum(self.vals * x[p.cols], p.rows, num_segments=p.n_rows)

    def __call__(self, x):
        return self.matvec(x)

    def diagonal(self):
        p = self.pattern
        mask = p.rows == p.cols
        return jax.ops.segment_sum(
            jnp.where(mask, self.vals, 0.0), p.rows, num_segments=p.n_rows
        )

    def to_dense(self):
        p = self.pattern
        A = jnp.zeros((p.n_rows, p.n_rows), self.vals.dtype)
        return A.at[p.rows, p.cols].add(self.vals)

    def transpose_matvec(self, x):
        p = self.pattern
        return jax.ops.segment_sum(self.vals * x[p.rows], p.cols, num_segments=p.n_rows)


def apply_dirichlet(A: SparseMatrix, free_mask: jnp.ndarray) -> SparseMatrix:
    """Zero constrained rows/cols, put 1 on their diagonal.

    Analog of ``Core::LinAlg::apply_dirichlet_to_system``
    (ref: 4C_linalg_utils_sparse_algebra_assemble.hpp:147-249).
    free_mask: (ndof,) bool, True = free dof.
    """
    p = A.pattern
    fr = free_mask[p.rows]
    fc = free_mask[p.cols]
    keep = jnp.logical_and(fr, fc)
    diag_fixed = jnp.logical_and(p.rows == p.cols, jnp.logical_not(free_mask[p.rows]))
    vals = jnp.where(keep, A.vals, 0.0) + jnp.where(diag_fixed, 1.0, 0.0)
    return SparseMatrix(pattern=p, vals=vals)
