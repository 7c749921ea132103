"""Reissner-Mindlin shell element kernels (MITC4 quad4, 6 dofs/node).

Counterpart of the reference's shell elements
(ref: src/shell7p — 7-parameter shell with ANS assumed natural strains for
transverse shear locking, 4C_shell7p_ele_calc_lib.hpp; the linear regime of
those elements).  TPU-native design: the element ENERGY is written once as
a pure function of the 24 nodal dofs (membrane + bending + MITC4 assumed
transverse shear + drilling stabilization, flat-facet local frame), and the
constant element stiffness is its batched AD Hessian — no hand-derived B
matrices, and bitwise symmetric by construction.

Kinematics (local frame e1,e2,e3 from the element center tangents):
  U(x, z) = (u1 + z b1, u2 + z b2, w),  b = (th2, -th1)  (director tilt)
  membrane eps = sym grad(u1,u2); curvature kap = sym grad(b);
  shear gamma = grad w + b, MITC4-interpolated from edge-midpoint covariant
  samples (cures shear locking of the bilinear quad).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# quad4 shape functions and derivatives at a parametric point
_XI_NODES = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])


def _N(xi):
    return 0.25 * (1 + _XI_NODES[:, 0] * xi[0]) * (1 + _XI_NODES[:, 1] * xi[1])


def _dN(xi):
    return np.stack([
        0.25 * _XI_NODES[:, 0] * (1 + _XI_NODES[:, 1] * xi[1]),
        0.25 * _XI_NODES[:, 1] * (1 + _XI_NODES[:, 0] * xi[0]),
    ], axis=1)  # (4, 2)


_GP = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]]) / np.sqrt(3.0)
_W = np.ones(4)
# MITC4 tying points: gamma_xi at A(0,-1), C(0,1); gamma_eta at D(-1,0), B(1,0)
_TIE_XI = [np.array([0.0, -1.0]), np.array([0.0, 1.0])]
_TIE_ETA = [np.array([-1.0, 0.0]), np.array([1.0, 0.0])]


def _local_frame(Xe):
    """Element frame from center tangents. Xe: (4, 3) -> R (3, 3) rows e_i,
    local 2D nodal coords (4, 2)."""
    dNc = jnp.asarray(_dN(np.zeros(2)), Xe.dtype)  # (4, 2)
    t = jnp.einsum("ad,ai->di", dNc, Xe)  # (2, 3)
    e3 = jnp.cross(t[0], t[1])
    e3 = e3 / jnp.linalg.norm(e3)
    e1 = t[0] / jnp.linalg.norm(t[0])
    e2 = jnp.cross(e3, e1)
    R = jnp.stack([e1, e2, e3])
    Xl = (Xe - jnp.mean(Xe, axis=0)) @ R.T  # flat-facet: drop z-warp
    return R, Xl[:, :2]


def element_energy(Xe, qe, mat):
    """Strain energy of ONE shell element. Xe: (4,3); qe: (4,6) [u, theta]."""
    E_, nue = mat.youngs, mat.nue
    h = mat.thickness
    G = E_ / (2 * (1 + nue))
    Cm = E_ * h / (1 - nue**2) * jnp.array(
        [[1, nue, 0], [nue, 1, 0], [0, 0, (1 - nue) / 2]], Xe.dtype)
    Cb = Cm * (h * h / 12.0)
    ks = mat.kappa * G * h

    R, xl = _local_frame(Xe)
    u = qe[:, :3] @ R.T  # local displacements (4, 3)
    th = qe[:, 3:] @ R.T  # local rotations
    b = jnp.stack([th[:, 1], -th[:, 0]], axis=1)  # director tilt (4, 2)
    w = u[:, 2]

    # covariant shear samples at the 4 tying points
    def gamma_cov(xi, comp):
        dN = jnp.asarray(_dN(xi), Xe.dtype)  # (4, 2)
        N = jnp.asarray(_N(xi), Xe.dtype)
        dw = dN[:, comp] @ w
        xs = jnp.einsum("a,ai->i", dN[:, comp], xl)  # x,_comp (2,)
        bs = N @ b  # (2,)
        return dw + xs @ bs

    gxi = [gamma_cov(p, 0) for p in _TIE_XI]  # at A, C
    geta = [gamma_cov(p, 1) for p in _TIE_ETA]  # at D, B

    W = jnp.asarray(0.0, Xe.dtype)
    for g in range(4):
        xi = _GP[g]
        dN = jnp.asarray(_dN(xi), Xe.dtype)
        N = jnp.asarray(_N(xi), Xe.dtype)
        J = jnp.einsum("ad,ai->di", dN, xl)  # (2, 2) d x_i / d xi_d
        detJ = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
        Jinv = jnp.array([[J[1, 1], -J[0, 1]], [-J[1, 0], J[0, 0]]],
                         Xe.dtype) / detJ
        Gd = dN @ Jinv  # (4, 2) cartesian gradients

        gu = jnp.einsum("ad,ai->id", Gd, u[:, :2])  # d u_i / d x_d
        eps = jnp.array([gu[0, 0], gu[1, 1], gu[0, 1] + gu[1, 0]])
        gb = jnp.einsum("ad,ai->id", Gd, b)
        kap = jnp.array([gb[0, 0], gb[1, 1], gb[0, 1] + gb[1, 0]])

        # MITC4 covariant shear interpolated to this GP, then to cartesian
        gxi_g = 0.5 * (1 - xi[1]) * gxi[0] + 0.5 * (1 + xi[1]) * gxi[1]
        geta_g = 0.5 * (1 - xi[0]) * geta[0] + 0.5 * (1 + xi[0]) * geta[1]
        gam = Jinv.T @ jnp.array([gxi_g, geta_g])

        # drilling rotation stabilization (small penalty on theta_n)
        thn = N @ th[:, 2]
        kd = mat.drill * G * h

        W = W + 0.5 * detJ * (
            eps @ Cm @ eps + kap @ Cb @ kap + ks * (gam @ gam) + kd * thn**2
        )
    return W


def element_stiffness(Xe, mat):
    """Constant linear stiffness (E, 24, 24) = batched Hessian of the
    energy at q = 0 (exact, symmetric)."""
    def K_one(X):
        return jax.hessian(
            lambda q: element_energy(X, q.reshape(4, 6), mat))(
                jnp.zeros((24,), X.dtype))

    return jax.vmap(K_one)(Xe)


def lumped_mass(Xe, mat):
    """Row-sum lumped translational + rotary mass: (E, 24)."""
    def area_one(X):
        _, xl = _local_frame(X)
        A = jnp.asarray(0.0, X.dtype)
        for g in range(4):
            dN = jnp.asarray(_dN(_GP[g]), X.dtype)
            J = jnp.einsum("ad,ai->di", dN, xl)
            A = A + (J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0])
        return A

    A = jax.vmap(area_one)(Xe)  # (E,)
    rho, h = mat.density, mat.thickness
    mt = rho * h * A / 4.0  # per node translational
    mr = rho * h**3 / 12.0 * A / 4.0  # rotary
    per_node = jnp.concatenate(
        [jnp.repeat(mt[:, None], 3, 1), jnp.repeat(mr[:, None], 3, 1)], axis=1
    )  # (E, 6)
    return jnp.tile(per_node, (1, 4))
