"""System scaling + Krylov nullspace projection.

Counterparts of the reference's
- ``Core::LinAlg::Equilibration`` row/column scaling of linear systems
  (ref: src/core/linalg/src/sparse/4C_linalg_equilibrate.hpp:32 — rows /
  columns / rows-and-columns / symmetric modes used by monolithic coupled
  systems with badly scaled blocks), and
- ``Core::LinAlg::KrylovProjector``
  (ref: src/core/linalg/src/sparse/4C_linalg_krylov_projector.hpp:32 —
  projects the Krylov space orthogonal to known operator kernels, e.g. the
  constant-pressure mode of pure-Dirichlet incompressible flow).

Both are operator wrappers: matrix-free first-class, jit-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Equilibration:
    """Symmetric (or one-sided) diagonal scaling of A x = b.

    With row scale r and column scale c:  (R A C) y = R b,  x = C y.
    `symmetric` mode uses r = c = 1/sqrt(|diag A|) — preserves symmetry for
    CG (the reference's EquilibrationMethod::symmetry).
    """

    def __init__(self, rowscale=None, colscale=None):
        self.r = rowscale
        self.c = colscale if colscale is not None else rowscale

    @classmethod
    def symmetric_from_diag(cls, diag, eps=1e-30):
        s = 1.0 / jnp.sqrt(jnp.maximum(jnp.abs(diag), eps))
        return cls(rowscale=s, colscale=s)

    @classmethod
    def rows_from_matrix(cls, A_sparse, eps=1e-30):
        """Row inf-norm scaling from an assembled SparseMatrix
        (the reference's EquilibrationMethod::rows_maindiag analog)."""
        p = A_sparse.pattern
        rinf = jax.ops.segment_max(jnp.abs(A_sparse.vals), p.rows,
                                   num_segments=p.n_rows)
        return cls(rowscale=1.0 / jnp.maximum(rinf, eps), colscale=None)

    def wrap(self, A, b):
        """Returns (A_scaled, b_scaled, unscale) for the solver."""
        r = self.r if self.r is not None else jnp.ones_like(b)
        c = self.c if self.c is not None else jnp.ones_like(b)

        def As(y):
            return r * A(c * y)

        return As, r * b, (lambda y: c * y)


class KrylovProjector:
    """P = I - W (C^T W)^{-1} C^T with kernel basis C and weight basis W.

    Wrapping the operator as P^T A P (and the rhs as P^T b) makes a Krylov
    method iterate in the complement of span(C) — the solution of the
    consistent-but-singular system with zero kernel component.  For the
    common symmetric case W = C.
    """

    def __init__(self, kernel, weights=None):
        C = jnp.atleast_2d(jnp.asarray(kernel))
        if C.shape[0] > C.shape[1]:
            C = C.T  # (k, n)
        W = C if weights is None else jnp.atleast_2d(jnp.asarray(weights))
        if W.shape[0] > W.shape[1]:
            W = W.T
        self.C = C
        self.W = W
        self.CtW_inv = jnp.linalg.inv(C @ W.T)  # (k, k)

    def apply(self, v):
        """P v = v - W (C^T W)^-1 C^T v."""
        return v - self.W.T @ (self.CtW_inv @ (self.C @ v))

    def apply_t(self, v):
        """P^T v = v - C (W^T C)^-1 W^T v."""
        return v - self.C.T @ (self.CtW_inv.T @ (self.W @ v))

    def wrap(self, A):
        def Ap(v):
            return self.apply_t(A(self.apply(v)))

        return Ap
