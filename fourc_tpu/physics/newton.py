"""Matrix-free Newton-Krylov nonlinear solver.

Counterpart of the reference's NOX-driven full Newton
(ref: src/structure_new/src/nonlinear_solver/4C_structure_new_nln_solver_nox.cpp:188
delegating to NOX line-search Newton; status tests in src/solver_nonlin_nox).
Differences by design:

- The Jacobian is never assembled: the Krylov operator is ``jax.jvp``
  through the residual — the exact consistent tangent (material + geometric
  + follower-load parts) at the cost of ~2 residual evaluations per matvec.
- The entire Newton loop is one ``lax.while_loop`` under jit: convergence
  tests, the inner Krylov while_loop, and the line search all run on device.
  The reference pays host/MPI synchronisation per dot product; here a norm
  is a plain on-device reduction (a psum over ICI when sharded).
- Inexact-Newton forcing (Eisenstat-Walker style) keeps early Krylov solves
  loose, like the reference's adaptive solver tolerance (ADAPTCONV).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from fourc_tpu.linalg import solvers


@dataclass
class NewtonParams:
    max_iter: int = 20
    tol_res: float = 1e-8  # absolute residual norm (2-norm), ref NORM_RESF
    tol_disp: float = 1e-8  # absolute increment norm, ref NORM_DISP
    tol_res_rel: float = 0.0  # relative to ||r0|| (ref NORM_RESF Rel); 0=off
    combine: str = "and"  # ref NORMCOMBI_RESFDISP
    # stagnation test (NOX stagnation-status-test analog): stop when the
    # residual stops contracting (rnorm > stag_tol * previous) after >= 2
    # iterations; counted as converged if it dropped by stag_min_drop.
    # Essential on f32 TPUs where the roundoff floor is state-dependent.
    stag_tol: float = 0.0  # 0 = off; typical 0.9
    stag_min_drop: float = 1e-3
    lin_method: str = "cg"
    lin_maxiter: int = 500
    lin_rtol: float = 1e-4  # floor for the adaptive forcing term
    lin_adaptive: bool = True
    gmres_restart: int = 50
    line_search: bool = False
    ls_max_halvings: int = 4
    # pseudo-transient continuation (ref: Solid::Nln::SOLVER ptc,
    # 4C_structure_new_nln_solver_ptc.*): augment the tangent with a
    # pseudo-mass 1/dt_ptc * I and grow dt_ptc by SER (switched-evolution
    # relaxation) as the residual drops — globalizes Newton far from the
    # solution, reduces to plain Newton as dt_ptc -> inf.
    ptc: bool = False
    ptc_dt0: float = 1.0  # initial pseudo time step
    # per-iteration convergence table (the analog of the reference's
    # EveryIterationWriter / NOX iteration printout,
    # ref: 4C_io_every_iteration_writer.hpp:35); emitted from inside the
    # jitted loop via jax.debug.print (io verbosity 'debug')
    debug: bool = False


def newton_solve(residual_fn, u0, free_mask, precond, params: NewtonParams,
                 matvec_fn=None):
    """Solve residual_fn(u) = 0 on the free dofs.

    residual_fn: u -> r (full-length; constrained entries ignored)
    free_mask:   (ndof,) bool; constrained dofs of u0 must already carry
                 their prescribed values (Dirichlet applied by the caller).
    precond:     r -> z approximate inverse (must be mask-safe)
    matvec_fn:   optional custom J·v (defaults to jvp of residual_fn)

    Returns (u, stats dict with iters/resnorm/converged/lin_iters).
    """
    mask = free_mask
    # ARITHMETIC masking with an f32/f64 0/1 weight, not jnp.where(bool):
    # exactness is identical (one product term is exactly zero), but on
    # TPU large packed-pred mask arrays fault the runtime when composed
    # with multiple Pallas kernels in one program (see linalg/gmg.py NOTE)
    w = jnp.asarray(mask, u0.dtype)
    cw = 1.0 - w

    def masked_res(u):
        return w * residual_fn(u)

    def make_op(u, sigma=None):
        if matvec_fn is not None:
            def A(v):
                vm = w * v
                out = matvec_fn(u, vm)
                if sigma is not None:
                    out = out + sigma * vm
                return w * out + cw * v
            return A

        def A(v):
            vm = w * v
            _, jv = jax.jvp(residual_fn, (u,), (vm,))
            if sigma is not None:
                jv = jv + sigma * vm
            return w * jv + cw * v

        return A

    r0 = masked_res(u0)
    rnorm0 = jnp.linalg.norm(r0)

    def _stagnated(rnorm, rprev, k):
        if not params.stag_tol:
            return jnp.asarray(False)
        return jnp.logical_and(jnp.asarray(k) >= 2, rnorm > params.stag_tol * rprev)

    def cond(state):
        u, r, rnorm, dnorm, k, lin_tot, rprev, sigma = state
        unconv = jnp.logical_not(_converged(rnorm, dnorm, params, rnorm0, k))
        go = jnp.logical_and(k < params.max_iter, unconv)
        return jnp.logical_and(go, jnp.logical_not(_stagnated(rnorm, rprev, k)))

    def body(state):
        u, r, rnorm, dnorm, k, lin_tot, rprev, sigma = state
        A = make_op(u, sigma if params.ptc else None)
        if params.lin_adaptive:
            eta = jnp.clip(jnp.sqrt(rnorm / jnp.maximum(rnorm0, 1e-300)), params.lin_rtol, 1e-1)
        else:
            eta = jnp.asarray(params.lin_rtol)
        if params.lin_method == "direct":
            res = solvers.direct(A, -r)
        elif params.lin_method == "cg":
            res = solvers.cg(A, -r, M=precond, tol=eta, atol=0.1 * params.tol_res,
                             maxiter=params.lin_maxiter)
        elif params.lin_method == "gmres":
            res = solvers.gmres(A, -r, M=precond, tol=eta, atol=0.1 * params.tol_res,
                                restart=params.gmres_restart, maxiter=params.lin_maxiter)
        else:
            res = solvers.bicgstab(A, -r, M=precond, tol=eta, atol=0.1 * params.tol_res,
                                   maxiter=params.lin_maxiter)
        du = w * res.x

        if params.line_search:
            # backtracking on ||r||: try 1, 1/2, 1/4 ... (static unroll)
            def try_alpha(carry, _):
                best_u, best_rn, alpha, found = carry
                u_try = u + alpha * du
                rn_try = jnp.linalg.norm(masked_res(u_try))
                better = jnp.logical_and(jnp.logical_not(found), rn_try < rnorm)
                best_u = jnp.where(better, u_try, best_u)
                best_rn = jnp.where(better, rn_try, best_rn)
                found = jnp.logical_or(found, better)
                return (best_u, best_rn, alpha * 0.5, found), None

            (u_new, _, _, found), _ = jax.lax.scan(
                try_alpha, (u + du, jnp.inf, jnp.asarray(1.0), jnp.asarray(False)),
                None, length=params.ls_max_halvings + 1,
            )
            u_new = jnp.where(found, u_new, u + du)
        else:
            u_new = u + du

        r_new = masked_res(u_new)
        rnorm_new = jnp.linalg.norm(r_new)
        if params.debug:
            jax.debug.print(
                "  newton it {k}: |r| {r:.6e} -> {rn:.6e}  |du| {dn:.3e}  "
                "krylov {ki}", k=k + 1, r=rnorm, rn=rnorm_new,
                dn=jnp.linalg.norm(du), ki=res.iters)
        if params.ptc:
            # SER: dt_ptc *= ||r_old|| / ||r_new||  (sigma = 1/dt_ptc)
            sigma = sigma * rnorm_new / jnp.maximum(rnorm, 1e-300)
        return (
            u_new,
            r_new,
            rnorm_new,
            jnp.linalg.norm(du),
            k + 1,
            lin_tot + res.iters,
            rnorm,
            sigma,
        )

    sigma0 = jnp.asarray(1.0 / params.ptc_dt0 if params.ptc else 0.0,
                         rnorm0.dtype)
    init = (u0, r0, rnorm0, jnp.asarray(0.0, u0.dtype), 0, 0,
            jnp.asarray(jnp.inf, rnorm0.dtype), sigma0)
    u, r, rnorm, dnorm, k, lin_tot, rprev, _ = jax.lax.while_loop(cond, body, init)
    conv = _converged(rnorm, dnorm, params, rnorm0, k)
    # a non-finite residual can still satisfy the increment test (du == 0
    # when the linear solver bailed out on a NaN rhs) — never call that
    # converged (the reference treats NaN norms as divergence, ref:
    # structure_new/src/implicit/4C_structure_new_timint_implicit.cpp:230)
    conv = jnp.logical_and(conv, jnp.isfinite(rnorm))
    if params.stag_tol:
        # stagnation at the roundoff floor counts as converged when the
        # residual dropped by the required factor
        stag_ok = jnp.logical_and(
            _stagnated(rnorm, rprev, k),
            rnorm <= params.stag_min_drop * jnp.maximum(rnorm0, 1e-300),
        )
        conv = jnp.logical_or(conv, stag_ok)
    stats = {
        "iters": k,
        "resnorm": rnorm,
        "dispnorm": dnorm,
        "lin_iters": lin_tot,
        "converged": conv,
    }
    return u, stats


def _converged(rnorm, dnorm, params: NewtonParams, rnorm0=None, k=0):
    """Status test. Before the first increment exists (k == 0), only the
    residual is checked (NOX convention) — the increment norm has no
    meaning yet and must neither block an already-converged entry ('and')
    nor fake convergence ('or')."""
    tol = params.tol_res
    if params.tol_res_rel and rnorm0 is not None:
        tol = jnp.maximum(tol, params.tol_res_rel * rnorm0)
    cr = rnorm <= tol
    cd = dnorm <= params.tol_disp
    if params.combine == "and":
        full = jnp.logical_and(cr, cd)
    else:
        full = jnp.logical_or(cr, cd)
    return jnp.where(jnp.asarray(k) == 0, cr, full)
