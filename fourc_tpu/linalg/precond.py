"""Preconditioners.

Counterpart of the reference's Ifpack/MueLu/Teko stack
(ref: src/core/linear_solver/src/preconditioner/*).  ILU-style serial
factorizations don't map to TPUs; the deterministic, bandwidth-friendly
equivalents implemented here are:

- (block-)Jacobi — diagonal / 3x3-nodal-block inverse
- Chebyshev polynomial smoothing (matrix-free, no dot products)
- geometric multigrid (linalg/gmg.py) for structured meshes — the analog of
  MueLu AMG with rigid-body-mode nullspace
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from fourc_tpu.ops import common as gm


def jacobi(diag, eps=1e-30):
    """M^-1 = diag^-1. diag: (ndof,)."""
    inv = 1.0 / jnp.where(jnp.abs(diag) > eps, diag, 1.0)

    def M(r):
        return inv * r

    return M


def block_jacobi(blocks):
    """Nodal-block Jacobi: blocks (n_nodes, k, k) -> M(r).

    The natural elasticity preconditioner (couples the k dofs of one node),
    equivalent in role to Ifpack point-block relaxation.
    """
    k = blocks.shape[-1]
    if k == 3:
        inv = gm.inv3(blocks)
    elif k == 2:
        inv = gm.inv2(blocks)
    else:
        inv = jnp.linalg.inv(blocks)

    def M(r):
        rn = r.reshape(-1, k)
        return jnp.einsum("nij,nj->ni", inv, rn).reshape(-1)

    return M


def chebyshev(A, diag, lmax, lmin_ratio=30.0, degree=4, free_mask=None):
    """Chebyshev smoother/preconditioner of given degree.

    A: operator; diag: (ndof,) for diagonal scaling; lmax: upper eigenvalue
    estimate of D^-1 A (e.g. from power iteration, times 1.1 safety).
    """
    dinv = 1.0 / jnp.where(jnp.abs(diag) > 1e-30, diag, 1.0)
    if free_mask is not None:
        dinv = jnp.where(free_mask, dinv, 0.0)
    lmin = lmax / lmin_ratio
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)

    def M(r):
        # Chebyshev iteration on A z = r starting from z=0
        z = jnp.zeros_like(r)
        p = dinv * r / theta
        z = z + p
        alpha_prev = 2.0 / theta

        def body(i, carry):
            z, p, alpha_prev = carry
            res = r - A(z)
            beta = (delta * alpha_prev / 2.0) ** 2
            alpha = 1.0 / (theta - beta / alpha_prev)
            p = dinv * res * alpha + beta * alpha / alpha_prev * p
            # standard three-term recurrence (Saad form)
            z = z + p
            return (z, p, alpha)

        z, _, _ = jax.lax.fori_loop(0, degree - 1, body, (z, p, alpha_prev))
        return z

    return M


def power_iteration_lmax(A, diag, n, iters=20, key=0):
    """Estimate largest eigenvalue of D^-1 A by power iteration (on device)."""
    dinv = 1.0 / jnp.where(jnp.abs(diag) > 1e-30, diag, 1.0)
    v = jax.random.normal(jax.random.PRNGKey(key), (n,))
    v = v / jnp.linalg.norm(v)

    def body(i, v):
        w = dinv * A(v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v)
    w = dinv * A(v)
    return jnp.vdot(v, w)


@dataclass
class Equilibration:
    """Row/column scaling of a system (ref: 4C_linalg_equilibrate.hpp:32).

    Symmetric scaling with s = 1/sqrt(diag): solve (S A S) y = S b,
    x = S y — improves conditioning of monolithic multi-field blocks."""

    scale: jnp.ndarray

    @classmethod
    def from_diag(cls, diag):
        s = 1.0 / jnp.sqrt(jnp.maximum(jnp.abs(diag), 1e-30))
        return cls(scale=s)

    def wrap_operator(self, A):
        s = self.scale

        def As(y):
            return s * A(s * y)

        return As

    def scale_rhs(self, b):
        return self.scale * b

    def unscale_solution(self, y):
        return self.scale * y
