"""7-parameter shell element kernels (quad4, 7 dofs/node, nonlinear).

Counterpart of the reference's shell7p element (ref: src/shell7p —
4C_shell7p_ele_calc.* : 7-parameter formulation with extensible director;
dofs = 3 midsurface displacements + 3 director displacements + 1
hierarchic thickness parameter, enabling UNMODIFIED 3D material laws
because the transverse normal strain is linear in the thickness
coordinate; ANS tying for transverse shear, 4C_shell7p_ele_calc_lib.hpp).

TPU-native design: the element strain ENERGY is one pure function of the
28 element dofs evaluated by 2x2 in-plane x 2 thickness Gauss points with
a full 3D hyperelastic psi(C); internal force and tangent come from jax
AD (grad / jvp) over the batched elements — no hand-derived B-operators,
no Voigt algebra.

Kinematics (total Lagrangian, ref. director D = element normal):
  X(xi, z) = Xm(xi) + z*h2*D
  x(xi, z) = Xm + u(xi) + z*h2*(D + w(xi)) + z^2*h2^2*beta(xi)*D
with z in [-1,1], h2 = t/2.  F = a_i (x) G^i from the covariant bases;
the z^2 term makes E_33 linear in z (cures Poisson-thickness locking);
MITC4 tying replaces the covariant transverse shear strains E_13/E_23
with edge-midpoint samples (cures shear locking).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_XI_NODES = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])


def _N(xi):
    return 0.25 * (1 + _XI_NODES[:, 0] * xi[0]) * (1 + _XI_NODES[:, 1] * xi[1])


def _dN(xi):
    return np.stack([
        0.25 * _XI_NODES[:, 0] * (1 + _XI_NODES[:, 1] * xi[1]),
        0.25 * _XI_NODES[:, 1] * (1 + _XI_NODES[:, 0] * xi[0]),
    ], axis=1)  # (4, 2)


_G2 = 1.0 / np.sqrt(3.0)
_GP_IN = np.array([[-_G2, -_G2], [_G2, -_G2], [_G2, _G2], [-_G2, _G2]])
_GP_Z = np.array([-_G2, _G2])
# MITC4 transverse-shear tying points (ref: shell7p ANS setup)
_TIE_13 = np.array([[0.0, -1.0], [0.0, 1.0]])  # E_13 sampled at eta = -+1
_TIE_23 = np.array([[-1.0, 0.0], [1.0, 0.0]])  # E_23 sampled at xi  = -+1


def _director(Xe):
    """Element director: unit normal from the center tangents, (3,)."""
    dNc = jnp.asarray(_dN(np.zeros(2)), Xe.dtype)
    t = jnp.einsum("ad,ai->di", dNc, Xe)
    n = jnp.cross(t[0], t[1])
    return n / jnp.linalg.norm(n)


def _cov_bases(Xe, ue, we, be, D, h2, xi, z):
    """Covariant reference / current base vectors at (xi, z).

    Returns (A (3,3) rows = G_1,G_2,G_3, a (3,3) rows = g_1,g_2,g_3)."""
    N = jnp.asarray(_N(xi), Xe.dtype)  # (4,)
    dN = jnp.asarray(_dN(xi), Xe.dtype)  # (4, 2)
    # reference: flat director per element -> G_alpha = Xm,alpha; G_3 = h2 D
    G1 = jnp.einsum("a,ai->i", dN[:, 0], Xe)
    G2v = jnp.einsum("a,ai->i", dN[:, 1], Xe)
    G3 = h2 * D
    A = jnp.stack([G1, G2v, G3])
    # current
    u_a = jnp.einsum("ad,ai->di", dN, ue)  # (2, 3)
    w_a = jnp.einsum("ad,ai->di", dN, we)
    b_a = jnp.einsum("ad,a->d", dN, be)  # (2,)
    w_ = jnp.einsum("a,ai->i", N, we)
    b_ = jnp.einsum("a,a->", N, be)
    g1 = G1 + u_a[0] + z * h2 * w_a[0] + (z * h2) ** 2 * b_a[0] * D
    g2 = G2v + u_a[1] + z * h2 * w_a[1] + (z * h2) ** 2 * b_a[1] * D
    g3 = h2 * (D + w_) + 2.0 * z * h2 * h2 * b_ * D
    a = jnp.stack([g1, g2, g3])
    return A, a


def _E_cov(Xe, ue, we, be, D, h2, xi, z):
    """Covariant Green-Lagrange components E_ij = (g_i.g_j - G_i.G_j)/2."""
    A, a = _cov_bases(Xe, ue, we, be, D, h2, xi, z)
    return 0.5 * (a @ a.T - A @ A.T), A


def element_energy(Xe, qe, mat_psi, thickness):
    """Strain energy of ONE element. qe: (4, 7) = [u(3), w(3), beta]."""
    ue, we, be = qe[:, 0:3], qe[:, 3:6], qe[:, 6]
    h2 = 0.5 * thickness
    D = _director(Xe)

    def Ecov(xi, z):
        return _E_cov(Xe, ue, we, be, D, h2, xi, z)

    total = 0.0
    for z in _GP_Z:
        # ANS: covariant transverse shear from the tying points (z-level
        # consistent; constant-in-xi_alpha interpolation along each edge
        # pair — the MITC4 scheme)
        E13_t = [Ecov(tp, z)[0][0, 2] for tp in _TIE_13]
        E23_t = [Ecov(tp, z)[0][1, 2] for tp in _TIE_23]
        for gp in _GP_IN:
            E, A = Ecov(gp, z)
            # interpolate tied shears: E13 linear in eta, E23 linear in xi
            e13 = 0.5 * ((1 - gp[1]) * E13_t[0] + (1 + gp[1]) * E13_t[1])
            e23 = 0.5 * ((1 - gp[0]) * E23_t[0] + (1 + gp[0]) * E23_t[1])
            E = E.at[0, 2].set(e13).at[2, 0].set(e13)
            E = E.at[1, 2].set(e23).at[2, 1].set(e23)
            # transform covariant E to the Cartesian frame: E_cart =
            # G^i (x) G^j E_ij with contravariant G^i from A^-T
            Ainv = jnp.linalg.inv(A)  # columns = contravariant base G^i
            Ecart = Ainv.T @ E @ Ainv
            C = 2.0 * Ecart + jnp.eye(3, dtype=E.dtype)
            detA = jnp.abs(jnp.linalg.det(A))
            total = total + detA * mat_psi(C)
    return total  # unit gauss weights (2x2x2 rule)


def make_internal_force(Xb, mat, thickness):
    """Batched internal force / energy over one element block.

    Xb: (E, 4, 3) reference coords.  Returns (force_fn, energy_fn) over
    qb: (E, 4, 7)."""
    psi = mat.psi

    def energy(qb):
        e = jax.vmap(lambda X, q: element_energy(X, q, psi, thickness))(
            Xb, qb)
        return jnp.sum(e)

    force = jax.grad(energy)
    return force, energy


def lumped_mass(Xb, rho, thickness):
    """Row-sum lumped mass (E, 4, 7): translational rho*t*A/4 per node;
    director/thickness dofs get the rotary inertia rho*t^3/12 scale."""
    dNc = jnp.asarray(_dN(np.zeros(2)))
    t = jnp.einsum("ad,eai->edi", dNc, Xb)
    area = 4.0 * jnp.linalg.norm(jnp.cross(t[:, 0], t[:, 1]), axis=-1)
    m_t = rho * thickness * area / 4.0  # (E,)
    m_r = rho * thickness**3 / 12.0 * area / 4.0
    mm = jnp.stack([m_t] * 3 + [m_r] * 4, axis=-1)  # (E, 7)
    return jnp.broadcast_to(mm[:, None, :], (Xb.shape[0], 4, 7))
