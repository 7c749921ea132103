"""On-device Krylov solvers.

Counterpart of the reference's Belos iterative solver stack
(ref: src/core/linear_solver/src/method/4C_linear_solver_method_iterative.cpp:109-131
— PseudoBlockCG / PseudoBlockGmres / BiCGStab behind the `Solver` facade).
Here each solver is a jit-compatible pure function built on lax.while_loop:
the whole Krylov iteration — SpMV / matrix-free operator application, dot
products, preconditioner — runs on device with zero host round-trips (the
reference pays an MPI_Allreduce per dot product; we pay a psum over ICI only
when sharded).

All operators are callables v -> A v (matrix-free first-class; assembled
operators just close over their arrays).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import numpy as np
import jax.numpy as jnp


@dataclass
class KrylovResult:
    x: jnp.ndarray
    iters: jnp.ndarray  # int32
    resnorm: jnp.ndarray  # final residual norm
    converged: jnp.ndarray  # bool


def _identity(v):
    return v


def _dot(a, b):
    # full-precision dot: TPU's default matmul precision routes 1D dots
    # through the bf16 MXU; Krylov recurrences need true f32 inner products
    return jnp.vdot(a, b, precision=jax.lax.Precision.HIGHEST)


def cg(A, b, x0=None, M=None, tol=1e-8, atol=0.0, maxiter=1000):
    """Preconditioned conjugate gradients.

    Convergence: ||r||_2 <= max(tol * ||b||_2, atol), matching the
    reference's Belos default (relative residual on the right-hand side).
    """
    M = M or _identity
    if x0 is None:
        # zero start: r0 = b exactly (A is linear); skips one matvec —
        # XLA cannot fold A(0) through a Pallas-backed operator
        x0 = jnp.zeros_like(b)
        r0 = b
    else:
        r0 = b - A(x0)
    z0 = M(r0)
    rz0 = _dot(r0, z0)
    bnorm = jnp.linalg.norm(b)
    stop = jnp.maximum(tol * bnorm, atol)

    def cond(state):
        x, r, z, p, rz, k = state
        return jnp.logical_and(k < maxiter, jnp.linalg.norm(r) > stop)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = A(p)
        pAp = _dot(p, Ap)
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, z, p, rz, k = jax.lax.while_loop(cond, body, (x0, r0, z0, r0 * 0 + z0, rz0, 0))
    rn = jnp.linalg.norm(r)
    return KrylovResult(x=x, iters=k, resnorm=rn, converged=rn <= stop)


def gmres(A, b, x0=None, M=None, tol=1e-8, atol=0.0, restart=30, maxiter=1000):
    """Restarted GMRES(m), RIGHT-preconditioned, with Givens rotations.

    Right preconditioning keeps all convergence norms on the TRUE residual
    (matching Belos' convention), so `tol`/`atol` compose with the Newton
    forcing terms; fixed-size Krylov basis (restart m) keeps shapes static
    under jit — iterations past convergence are masked no-ops.
    """
    M = M or _identity
    n = b.shape[0]
    m = restart
    x0 = jnp.zeros_like(b) if x0 is None else x0
    dtype = b.dtype

    bnorm = jnp.linalg.norm(b)
    stop = jnp.maximum(tol * bnorm, atol)
    # dtype-safe division guard: a 1e-300 literal underflows to 0.0 in f32,
    # so a happy Arnoldi breakdown (hj1 == 0 exactly, e.g. a tiny system
    # whose Krylov space is exhausted before `stop` is reachable at this
    # precision) would divide 0/0 -> NaN.  sqrt(tiny) also serves as the
    # breakdown threshold below.
    tiny = float(np.sqrt(np.finfo(np.dtype(dtype)).tiny))

    def inner(x):
        r = b - A(x)
        beta = jnp.linalg.norm(r)

        V = jnp.zeros((m + 1, n), dtype)
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros((m,), dtype)
        sn = jnp.zeros((m,), dtype)
        g = jnp.zeros((m + 1,), dtype).at[0].set(beta)
        V = V.at[0].set(r / jnp.maximum(beta, tiny))

        def arnoldi_step(j, carry):
            def step(carry):
                V, H, cs, sn, g, done, jdone = carry
                w = A(M(V[j]))
                # Gram-Schmidt (static loop over full basis, masked).  The
                # basis contractions MUST run at full f32: on TPU the default
                # matmul precision routes V @ w through the bf16 MXU, whose
                # ~1e-3 relative error destroys the Arnoldi relation at ~1M
                # dofs — the Givens residual estimate then silently diverges
                # from the true residual (observed: claimed 0.05, true 1.3).
                # A second full pass guards against classical f32
                # orthogonality loss on top of that.
                hp = jax.lax.Precision.HIGHEST
                hcol = jnp.matmul(V, w, precision=hp)  # (m+1,); mask below
                mask = (jnp.arange(m + 1) <= j).astype(dtype)
                hcol = hcol * mask
                w = w - jnp.matmul(hcol, V, precision=hp)
                corr = jnp.matmul(V, w, precision=hp) * mask
                w = w - jnp.matmul(corr, V, precision=hp)
                hcol = hcol + corr
                hj1 = jnp.linalg.norm(w)
                V = V.at[j + 1].set(w / jnp.maximum(hj1, tiny))
                hcol = hcol.at[j + 1].set(hj1)
                # lucky breakdown: A V_j already lies in span(V_0..V_j) — the
                # exact solution lives in the current Krylov space, so stop
                # extending the basis (ref: Belos GMRES breakdown handling)
                breakdown = hj1 <= tiny

                # apply accumulated Givens rotations
                def apply_rot(i, hc):
                    t1 = cs[i] * hc[i] + sn[i] * hc[i + 1]
                    t2 = -sn[i] * hc[i] + cs[i] * hc[i + 1]
                    return hc.at[i].set(t1).at[i + 1].set(t2)

                hcol = jax.lax.fori_loop(0, j, apply_rot, hcol)
                denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
                c = jnp.where(denom > tiny, hcol[j] / jnp.maximum(denom, tiny), 1.0)
                s = jnp.where(denom > tiny, hcol[j + 1] / jnp.maximum(denom, tiny), 0.0)
                hcol = hcol.at[j].set(denom).at[j + 1].set(0.0)
                cs = cs.at[j].set(c)
                sn = sn.at[j].set(s)
                gj = g[j]
                g = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
                H = H.at[:, j].set(hcol)
                done = jnp.logical_or(jnp.abs(g[j + 1]) <= stop, breakdown)
                return (V, H, cs, sn, g, done, jdone + 1)

            return jax.lax.cond(carry[5], lambda c: c, step, carry)

        V, H, cs, sn, g, _, jdone = jax.lax.fori_loop(
            0, m, arnoldi_step, (V, H, cs, sn, g, jnp.asarray(False), 0)
        )

        # back substitution on the upper-triangular H; columns never filled
        # (early convergence) get a unit diagonal + zero rhs so their y is 0
        idx = jnp.arange(m)
        Hm = H[:m, :m] + jnp.diag(jnp.where(idx >= jdone, 1.0, 0.0).astype(dtype))
        g_eff = jnp.where(idx >= jdone, 0.0, g[:m])
        y = jax.scipy.linalg.solve_triangular(Hm, g_eff, lower=False)
        corr = jnp.matmul(y, V[:m], precision=jax.lax.Precision.HIGHEST)
        return x + M(corr), jnp.abs(g[jdone]), jdone

    def cond(state):
        x, res, k = state
        return jnp.logical_and(k < maxiter, res > stop)

    def body(state):
        x, _, k = state
        x, res, jdone = inner(x)
        return (x, res, k + jdone)

    r0 = jnp.linalg.norm(b - A(x0))
    x, res, k = jax.lax.while_loop(cond, body, (x0, r0, 0))
    return KrylovResult(x=x, iters=k, resnorm=res, converged=res <= stop)


def bicgstab(A, b, x0=None, M=None, tol=1e-8, atol=0.0, maxiter=1000):
    """BiCGStab (right-preconditioned), for nonsymmetric systems."""
    M = M or _identity
    if x0 is None:
        x0 = jnp.zeros_like(b)
        r0 = b  # zero start: skip the A(0) matvec (A linear)
    else:
        r0 = b - A(x0)
    rhat = r0
    bnorm = jnp.linalg.norm(b)
    stop = jnp.maximum(tol * bnorm, atol)

    def cond(s):
        return jnp.logical_and(s["k"] < maxiter, jnp.linalg.norm(s["r"]) > stop)

    def body(s):
        rho_new = _dot(rhat, s["r"])
        beta = (rho_new / jnp.where(s["rho"] == 0, 1.0, s["rho"])) * (
            s["alpha"] / jnp.where(s["omega"] == 0, 1.0, s["omega"])
        )
        p = s["r"] + beta * (s["p"] - s["omega"] * s["v"])
        phat = M(p)
        v = A(phat)
        rv = _dot(rhat, v)
        alpha = rho_new / jnp.where(rv == 0, 1.0, rv)
        h = s["x"] + alpha * phat
        sres = s["r"] - alpha * v
        shat = M(sres)
        t = A(shat)
        tt = _dot(t, t)
        # t == 0 exactly (breakdown / converged): a 1e-300 guard underflows
        # to 0 in f32 and the division NaNs; keep omega finite instead
        omega = jnp.where(tt == 0, 0.0, _dot(t, sres) / jnp.where(tt == 0, 1.0, tt))
        x = h + omega * shat
        r = sres - omega * t
        return dict(x=x, r=r, p=p, v=v, rho=rho_new, alpha=alpha, omega=omega, k=s["k"] + 1)

    init = dict(
        x=x0, r=r0, p=jnp.zeros_like(b), v=jnp.zeros_like(b),
        rho=jnp.asarray(1.0, b.dtype), alpha=jnp.asarray(1.0, b.dtype),
        omega=jnp.asarray(1.0, b.dtype), k=0,
    )
    out = jax.lax.while_loop(cond, body, init)
    rn = jnp.linalg.norm(out["r"])
    return KrylovResult(x=out["x"], iters=out["k"], resnorm=rn, converged=rn <= stop)


def direct(A, b, x0=None, M=None, tol=0.0, atol=0.0, **_):
    """Dense direct solve (LU with partial pivoting).

    Counterpart of the reference's Amesos direct path (UMFPACK/SuperLU;
    ref: src/core/linear_solver/src/method/4C_linear_solver_method_direct.cpp)
    used for small/robust systems and coarse levels.  TPU-native form: the
    operator is densified by probing with identity columns (one batched
    vmap of the matrix-free operator — n extra operator applications), then
    solved with jnp.linalg.solve, which lowers to a batched MXU LU.  Meant
    for ndof up to a few thousand (0D/1D networks, coarse grids, tests);
    assembled SparseMatrix operators densify without probing.
    """
    n = b.shape[0]
    Ad = getattr(A, "to_dense", None)
    Adense = Ad() if Ad is not None else jax.vmap(A, in_axes=1, out_axes=1)(
        jnp.eye(n, dtype=b.dtype))
    x = jnp.linalg.solve(Adense, b)
    rn = jnp.linalg.norm(b - Adense @ x)
    return KrylovResult(x=x, iters=jnp.asarray(1), resnorm=rn,
                        converged=jnp.asarray(True))


SOLVERS = {"cg": cg, "gmres": gmres, "bicgstab": bicgstab, "direct": direct}


def solve(method: str, A, b, **kw) -> KrylovResult:
    """Solver facade — analog of Core::LinAlg::Solver::solve
    (ref: 4C_linear_solver_method_linalg.cpp:218) dispatching on the deck's
    SOLVER block."""
    return SOLVERS[method.lower()](A, b, **kw)
