"""Batched 3D Timoshenko beam element kernels.

Counterpart of the reference's beam3 module (ref: src/beam3 — geometrically
exact Reissner `beam3r`, Kirchhoff `beam3k`, Euler-Bernoulli `beam3eb`).
Round-1 scope: shear-deformable Timoshenko 2-node beams with the exact
static stiffness (axial / torsion / bending incl. shear correction),
arbitrary orientation; linear kinematics (the reference's large-rotation
algebra, 4C_fem_general_largerotations.hpp, is future work — documented
deviation).

6 dofs per node: [u_x, u_y, u_z, theta_x, theta_y, theta_z].
All elements evaluate as one batched (E, 12, 12) matmul; the local
stiffness blocks are assembled once at setup from section properties.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def local_stiffness(L, E, G, A, Iy, Iz, J, ksy=0.0, ksz=0.0):
    """Exact 12x12 Timoshenko stiffness in the local frame (numpy, setup).

    ksy/ksz: shear parameters phi = 12 E I / (G As L^2); 0 = Euler-Bernoulli.
    """
    K = np.zeros((12, 12))
    # axial
    ka = E * A / L
    K[np.ix_([0, 6], [0, 6])] += ka * np.array([[1, -1], [-1, 1]])
    # torsion
    kt = G * J / L
    K[np.ix_([3, 9], [3, 9])] += kt * np.array([[1, -1], [-1, 1]])

    def bend(I, phi, it, ir, sign):
        # it: translational dofs, ir: rotational dofs; sign couples v-theta
        c = E * I / (L**3 * (1 + phi))
        k11 = 12 * c
        k12 = sign * 6 * L * c
        k22 = (4 + phi) * L**2 * c
        k22b = (2 - phi) * L**2 * c
        i1, i2 = it
        r1, r2 = ir
        K[i1, i1] += k11
        K[i2, i2] += k11
        K[i1, i2] += -k11
        K[i2, i1] += -k11
        for (ti, ri) in ((i1, r1), (i1, r2)):
            K[ti, ri] += k12
            K[ri, ti] += k12
        for (ti, ri) in ((i2, r1), (i2, r2)):
            K[ti, ri] += -k12
            K[ri, ti] += -k12
        K[r1, r1] += k22
        K[r2, r2] += k22
        K[r1, r2] += k22b
        K[r2, r1] += k22b

    # bending about z (deflection in y, rotation theta_z)
    bend(Iz, ksy, (1, 7), (5, 11), +1)
    # bending about y (deflection in z, rotation theta_y) — opposite sign
    bend(Iy, ksz, (2, 8), (4, 10), -1)
    return K


def frame_rotation(dX, up=(0.0, 0.0, 1.0)):
    """Local->global rotation (3,3) for a beam axis dX (numpy, setup)."""
    ex = dX / np.linalg.norm(dX)
    upv = np.asarray(up, float)
    if abs(ex @ upv) > 0.99:
        upv = np.array([0.0, 1.0, 0.0])
    ez = np.cross(ex, upv)
    ez /= np.linalg.norm(ez)
    ey = np.cross(ez, ex)
    return np.stack([ex, ey, ez], axis=1)  # columns = local axes in global


def build_element_matrices(Xe, mat):
    """(E, 12, 12) global stiffness + (E,) lengths, numpy at setup.

    Xe: (E, 2, 3) node coords; mat: beam section material.
    """
    E_count = Xe.shape[0]
    G = mat.youngs / (2 * (1 + mat.nue))
    Kg = np.zeros((E_count, 12, 12))
    Ls = np.zeros(E_count)
    for e in range(E_count):
        dX = Xe[e, 1] - Xe[e, 0]
        L = float(np.linalg.norm(dX))
        Ls[e] = L
        phi_y = 12 * mat.youngs * mat.izz / (G * mat.shear_area * L**2) if mat.shear_area else 0.0
        phi_z = 12 * mat.youngs * mat.iyy / (G * mat.shear_area * L**2) if mat.shear_area else 0.0
        Kl = local_stiffness(L, mat.youngs, G, mat.area, mat.iyy, mat.izz,
                             mat.torsion_j, phi_y, phi_z)
        R = frame_rotation(dX)
        T = np.zeros((12, 12))
        for b in range(4):
            T[3 * b: 3 * b + 3, 3 * b: 3 * b + 3] = R
        Kg[e] = T @ Kl @ T.T
    return Kg, Ls


def internal_force(Ke, ue):
    """f = K u per element: Ke (E, 12, 12), ue (E, 12) -> (E, 12)."""
    return jnp.einsum("eij,ej->ei", Ke, ue)


def lumped_mass(Ls, mat):
    """(E, 12) translational + rotary lumped mass per element dof."""
    rhoAL = mat.density * mat.area * Ls  # (E,)
    m_t = 0.5 * rhoAL
    r2 = (mat.iyy + mat.izz) / max(mat.area, 1e-300)
    m_r = 0.5 * rhoAL * max(r2, 1e-12)
    per_node = jnp.concatenate(
        [jnp.repeat(m_t[:, None], 3, 1), jnp.repeat(m_r[:, None], 3, 1)], axis=1
    )  # (E, 6)
    return jnp.concatenate([per_node, per_node], axis=1)  # (E, 12)
