"""Block preconditioners for monolithic multi-field systems.

Counterpart of the reference's Teko / AMGnxn block preconditioning for
coupled problems (ref: src/core/linear_solver/src/amgnxn/
4C_linear_solver_amgnxn_vcycle.cpp — per-field AMG hierarchies composed
into block smoothers; BGS block sweeps in
4C_linear_solver_amgnxn_smoothers.cpp).

TPU-native design: the coupled Jacobian is never assembled — off-diagonal
coupling blocks are applied MATRIX-FREE as slices of ``jax.jvp`` through
the stacked monolithic residual, linearised at the Newton iterate the
preconditioner was built for.  Per-field single-physics preconditioners
(block-Jacobi / Chebyshev / GMG / AMG — whatever each field builds) become
the diagonal blocks:

- ``block_diagonal``:  z_k = M_k r_k                 (field-decoupled)
- ``block_gauss_seidel``:  forward sweep
      z_k = M_k ( r_k - Σ_{j<k} (J z)_k )           (coupling-aware)

One full-system jvp per downstream block per application (the k = 0 jvp is
skipped since z = 0).  For strongly coupled saddle systems (FSI, poro) the
sweep typically cuts Krylov counts by severalfold over the field-diagonal
composition — the same effect the reference gets from AMGnxn BGS cycles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _offsets(sizes):
    off = np.cumsum([0] + list(sizes))
    return [(int(off[k]), int(off[k + 1])) for k in range(len(sizes))]


def block_diagonal(precs, sizes):
    """Field-decoupled composition: z = [M_0 r_0; M_1 r_1; ...]."""
    offs = _offsets(sizes)

    def M(r):
        return jnp.concatenate(
            [Mk(r[a:b]) for Mk, (a, b) in zip(precs, offs)])

    return M


def block_gauss_seidel(residual_fn, y_lin, precs, sizes, mask, sweeps=1):
    """Forward block-Gauss-Seidel on the monolithic system.

    residual_fn: stacked residual (the function Newton solves); its jvp at
                 ``y_lin`` is the coupled Jacobian J.
    y_lin:       linearisation point (Newton-step start; preconditioner lag
                 over the Newton iterations is standard and harmless).
    precs:       per-field approximate inverses of the DIAGONAL blocks.
    sizes:       per-field vector lengths (sum = len(y)).
    mask:        free-dof mask of the stacked vector.
    """
    offs = _offsets(sizes)

    def Jz(z):
        zm = jnp.where(mask, z, 0.0)
        _, out = jax.jvp(residual_fn, (y_lin,), (zm,))
        return jnp.where(mask, out, zm)

    def M(r):
        z = jnp.zeros_like(r)
        for s in range(sweeps):
            for k, (a, b) in enumerate(offs):
                if s == 0 and k == 0:
                    rk = r[a:b]  # z == 0: no coupling correction needed
                else:
                    rk = r[a:b] - Jz(z)[a:b]
                zk = precs[k](rk)
                z = z.at[a:b].add(zk) if (s or k) else z.at[a:b].set(zk)
        return z

    return M
