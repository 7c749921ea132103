"""Direct solver, Equilibration, KrylovProjector tests.

Oracles mirror the reference components they replace:
ref: 4C_linear_solver_method_direct.cpp (Amesos direct),
4C_linalg_equilibrate.hpp (row/col scaling), and
4C_linalg_krylov_projector.hpp (kernel-orthogonal Krylov).
"""

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.linalg import solvers
from fourc_tpu.linalg.scaling import Equilibration, KrylovProjector


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((n, n))
    return jnp.asarray(B @ B.T + n * np.eye(n))


def test_direct_solve_matches_numpy():
    A = _spd(40)
    x_true = jnp.asarray(np.random.default_rng(1).standard_normal(40))
    b = A @ x_true
    res = solvers.solve("direct", lambda v: A @ v, b)
    assert bool(res.converged)
    assert np.allclose(res.x, x_true, atol=1e-8)


def test_equilibration_preserves_solution_and_conditioning():
    # badly scaled SPD system: two blocks 1e6 apart in magnitude
    n = 30
    A0 = _spd(n, 2)
    s = jnp.asarray(np.concatenate([np.full(n // 2, 1e3), np.ones(n - n // 2)]))
    A = s[:, None] * A0 * s[None, :]
    x_true = jnp.asarray(np.random.default_rng(3).standard_normal(n))
    b = A @ x_true

    eq = Equilibration.symmetric_from_diag(jnp.diag(A))
    As, bs, unscale = eq.wrap(lambda v: A @ v, b)
    res = solvers.cg(As, bs, tol=1e-12, maxiter=3000)
    x = unscale(res.x)
    assert np.allclose(x, x_true, rtol=1e-5, atol=1e-6)

    # scaled operator has unit diagonal (the point of the exercise)
    d = jax.vmap(As, in_axes=1, out_axes=1)(jnp.eye(n)).diagonal()
    assert np.allclose(d, 1.0, atol=1e-10)


def test_krylov_projector_singular_system():
    # pure-Neumann Laplacian (1D, periodic-free): kernel = constants
    n = 20
    A = (2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)).astype(float)
    A[0, 0] = A[-1, -1] = 1.0  # singular: A @ ones = 0
    A = jnp.asarray(A)
    ones = jnp.ones((n,))
    assert np.allclose(A @ ones, 0.0)

    proj = KrylovProjector(ones / jnp.linalg.norm(ones))
    b = jnp.asarray(np.random.default_rng(4).standard_normal(n))
    b = proj.apply_t(b)  # consistent rhs
    Ap = proj.wrap(lambda v: A @ v)
    res = solvers.cg(Ap, b, tol=1e-12, maxiter=2000)
    x = proj.apply(res.x)
    # solves the singular system with zero mean
    assert np.allclose(A @ x, b, atol=1e-8)
    assert abs(float(jnp.mean(x))) < 1e-10
