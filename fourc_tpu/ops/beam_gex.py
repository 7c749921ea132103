"""Geometrically exact (Simo-Reissner) beam kernels, quaternion-based.

Counterpart of the reference's beam3r elements
(ref: src/beam3 — `Discret::Elements::Beam3r` geometrically exact shear-
deformable beams with large-rotation algebra in
src/core/fem/src/general/utils/4C_fem_general_largerotations.hpp).

TPU-native design: nodal unknowns are displacements + TOTAL rotation
vectors theta (|theta| < 2 pi); all SO(3) algebra runs through unit
quaternions with smooth (AD-safe) sinc-style maps, and the internal force
is the EXACT gradient of the stored-energy functional

  W = sum_e L/2 ( Gamma^T C_N Gamma + kappa^T C_M kappa )
  Gamma = Lambda^T x' - e1   (material translational strain; shear + axial)
  kappa = R0^T theta_rel / L (material curvature; geodesic interpolation)
  Lambda = R(q_mid) R0,      q_mid = q1 * exp(theta_rel / 2)

via jax.grad — replacing the reference's hand-coded multiplicative
linearization (T-matrices, Lie-group updates).  One-point (reduced)
quadrature avoids shear locking, as in the reference's reduced-integrated
variants.  Conservative loads conjugate to the rotation vector; moments
about a fixed axis coincide with spatial moments (T(theta) e = e).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# -- smooth quaternion algebra ------------------------------------------------


def quat_from_rotvec(th):
    """(..., 3) rotation vector -> (..., 4) unit quaternion (w, xyz);
    smooth at theta = 0 (sinc forms)."""
    ang = jnp.sqrt(jnp.sum(th * th, axis=-1) + 1e-30)
    w = jnp.cos(0.5 * ang)
    # sin(ang/2)/(ang/2) = sinc(ang / (2 pi)) (numpy normalized sinc)
    s = jnp.sinc(ang / (2.0 * jnp.pi))
    return jnp.concatenate([w[..., None], 0.5 * s[..., None] * th], axis=-1)


def quat_mul(a, b):
    aw, av = a[..., 0], a[..., 1:]
    bw, bv = b[..., 0], b[..., 1:]
    w = aw * bw - jnp.sum(av * bv, axis=-1)
    v = aw[..., None] * bv + bw[..., None] * av + jnp.cross(av, bv)
    return jnp.concatenate([w[..., None], v], axis=-1)


def quat_conj(q):
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def quat_rotate(q, x):
    """Rotate vector x by quaternion q: R(q) x."""
    w, v = q[..., 0], q[..., 1:]
    t = 2.0 * jnp.cross(v, x)
    return x + w[..., None] * t + jnp.cross(v, t)


def rotvec_from_quat(q):
    """(..., 4) -> (..., 3); smooth near the identity."""
    w, v = q[..., 0], q[..., 1:]
    s = jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-30)
    ang = 2.0 * jnp.arctan2(s, w)
    return (ang / s)[..., None] * v


# -- element energy -----------------------------------------------------------


def _ref_triad(E1):
    """Reference triad R0 (columns = material axes in space) with first
    column along the beam axis; smooth pick of the second axis."""
    up = np.array([0.0, 0.0, 1.0])
    e2 = np.cross(up, E1)
    n = np.linalg.norm(e2)
    if n < 1e-8:
        e2 = np.cross(np.array([0.0, 1.0, 0.0]), E1)
        n = np.linalg.norm(e2)
    e2 = e2 / n
    e3 = np.cross(E1, e2)
    return np.stack([E1, e2, e3], axis=1)  # (3,3), columns


def element_energy(X1, X2, d1, d2, th1, th2, R0, CN, CM):
    """Stored energy of one Simo-Reissner element (1-point quadrature)."""
    L = jnp.linalg.norm(X2 - X1)
    q1 = quat_from_rotvec(th1)
    q2 = quat_from_rotvec(th2)
    qrel = quat_mul(quat_conj(q1), q2)
    threl = rotvec_from_quat(qrel)
    qm = quat_mul(q1, quat_from_rotvec(0.5 * threl))

    xp = (X2 + d2 - X1 - d1) / L  # current tangent (spatial)
    t_mat = R0.T @ quat_rotate(quat_conj(qm), xp)
    e1 = jnp.zeros((3,), xp.dtype).at[0].set(1.0)
    Gam = t_mat - e1
    kap = (R0.T @ threl) / L
    return 0.5 * L * (jnp.sum(Gam * CN * Gam) + jnp.sum(kap * CM * kap))


def make_internal_force(Xe, mat):
    """Batched Reissner internal force builder for one line2 block.

    Xe: (E, 2, 3) host array of reference coords. Returns
    ``f(ue) -> (E, 2, 6)`` with ue (E, 2, 6) = [d, theta] per node —
    the exact gradient of the total energy (conservative).
    """
    E_, nen, _ = Xe.shape
    dX = np.asarray(Xe[:, 1] - Xe[:, 0])
    Ls = np.linalg.norm(dX, axis=1)
    R0 = np.stack([_ref_triad(dX[i] / Ls[i]) for i in range(E_)])  # (E,3,3)
    G = mat.youngs / (2.0 * (1.0 + mat.nue))
    GA = G * (mat.shear_area or mat.area)
    CN = np.array([mat.youngs * mat.area, GA, GA])
    CM = np.array([G * mat.torsion_j, mat.youngs * mat.iyy,
                   mat.youngs * mat.izz])
    X1 = jnp.asarray(Xe[:, 0])
    X2 = jnp.asarray(Xe[:, 1])
    R0j = jnp.asarray(R0)
    CNj = jnp.asarray(CN)
    CMj = jnp.asarray(CM)

    def total_energy(ue):
        d1, th1 = ue[:, 0, :3], ue[:, 0, 3:]
        d2, th2 = ue[:, 1, :3], ue[:, 1, 3:]
        Ws = jax.vmap(element_energy, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None))(
            X1, X2, d1, d2, th1, th2, R0j, CNj, CMj)
        return jnp.sum(Ws)

    def force(ue):
        return jax.grad(total_energy)(ue)  # (E, 2, 6)

    return force
