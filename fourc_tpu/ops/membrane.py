"""Batched membrane element kernels (2D elements in 3D space, total
Lagrangian, plane stress, no bending stiffness).

Counterpart of the reference's membrane module
(ref: src/membrane — `Discret::Elements::Membrane` quad4/tri3 membranes,
4C_membrane_evaluate.cpp: curvilinear in-plane kinematics + plane-stress
condition; thickness from the MEMBRANE element line).

Kinematics (per GP, curvilinear):
  A_a = dX/dxi_a, a_a = dx/dxi_a (a = 1,2) — reference/current tangents
  metric A_ab = A_a.A_b, a_ab = a_a.a_b  (2x2)
  in-plane GL strain (contravariant local frame): E = (a_ab - A_ab)/2
  plane-stress SVK in the local orthonormal frame: S = C_ps : E with
  lam_ps = 2 lam mu / (lam + 2 mu)
  internal force: f = t sum_g w sqrt(det A) S^ab a_b dN/dxi_a

The geometric (initial-stress) tangent — which gives a rigidly rotated
membrane its out-of-plane stiffness — comes for free via jax.jvp.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fourc_tpu.core.cells import CellType


def _local_metric(T, dN):
    """Tangents + metric per GP. T: (nen, 3, E) nodal coords (transposed),
    dN: (g, a, 2) -> (tang (g,2,3,E), metric (g,2,2,E))."""
    tang = jnp.einsum("gap,apE->gpxE" if False else "gap,axE->gpxE",
                      jnp.asarray(dN, T.dtype), T)
    # tang[g, p, x, E]: d x_x / d xi_p
    met = jnp.einsum("gpxE,gqxE->gpqE", tang, tang)
    return tang, met


def internal_force(Xe, ue, cell: CellType, material, thickness: float):
    """Membrane internal force.

    Xe/ue: (E, nen, 3). Returns (E, nen, 3). material must expose Lame
    params via youngs/nue (plane-stress SVK; ref membrane materials).
    """
    E_, nen, _ = Xe.shape
    dN = np.asarray(cell.dN)  # (g, a, 2)
    w = np.asarray(cell.gauss_weights)
    Xt = jnp.transpose(Xe, (1, 2, 0))  # (nen, 3, E)
    xt = jnp.transpose(Xe + ue, (1, 2, 0))

    A_t, A_met = _local_metric(Xt, dN)  # (g,2,3,E), (g,2,2,E)
    a_t, a_met = _local_metric(xt, dN)

    # reference area measure sqrt(det A)
    detA = A_met[:, 0, 0] * A_met[:, 1, 1] - A_met[:, 0, 1] * A_met[:, 1, 0]
    jac = jnp.sqrt(jnp.maximum(detA, 1e-30))  # (g, E)

    # contravariant reference metric A^ab (2x2 inverse)
    Ainv = jnp.stack([
        jnp.stack([A_met[:, 1, 1], -A_met[:, 0, 1]], 1),
        jnp.stack([-A_met[:, 1, 0], A_met[:, 0, 0]], 1),
    ], 1) / jnp.maximum(detA, 1e-30)[:, None, None]

    # GL strain in curvilinear components: E_ab = (a_ab - A_ab)/2
    Ecurv = 0.5 * (a_met - A_met)  # (g,2,2,E)

    # plane-stress SVK in mixed components: S^ab = lam_ps tr(E) A^ab +
    # 2 mu A^ac E_cd A^db,   tr(E) = A^ab E_ab
    lam = material.youngs * material.nue / (1 - material.nue**2)  # lam_ps
    mu = material.youngs / (2 * (1 + material.nue))
    trE = jnp.einsum("gpqE,gqpE->gE", Ainv, Ecurv)
    S = lam * trE[:, None, None] * Ainv + 2.0 * mu * jnp.einsum(
        "gpcE,gcdE,gdqE->gpqE", Ainv, Ecurv, Ainv)

    # f_[a,x] = t sum_g w jac S^pq a_q,x dN[g,a,p]
    f = thickness * jnp.einsum(
        "g,gE,gpqE,gqxE,gap->axE", jnp.asarray(w, Xe.dtype), jac, S, a_t,
        jnp.asarray(dN, Xe.dtype))
    return jnp.transpose(f, (2, 0, 1))  # (E, nen, 3)


def lumped_mass(Xe, cell: CellType, rho_t: float):
    """Row-sum lumped mass per node for a curved 2D element in 3D:
    rho * thickness * area share. Returns (E, nen)."""
    dN = np.asarray(cell.dN)
    w = jnp.asarray(cell.gauss_weights, Xe.dtype)
    N = jnp.asarray(cell.N, Xe.dtype)
    Xt = jnp.transpose(Xe, (1, 2, 0))
    _, A_met = _local_metric(Xt, dN)
    detA = A_met[:, 0, 0] * A_met[:, 1, 1] - A_met[:, 0, 1] * A_met[:, 1, 0]
    jac = jnp.sqrt(jnp.maximum(detA, 1e-30))  # (g, E)
    m = rho_t * jnp.einsum("g,gE,ga->Ea", w, jac, N)
    return m


def element_stiffness(Xe, ue, cell: CellType, material, thickness: float):
    """Consistent membrane element tangent via batched jvps: (E, m, m)."""
    import jax

    E_, nen, d = Xe.shape
    m = nen * d

    def f_of(u_flat):
        return internal_force(Xe, u_flat.reshape(E_, nen, d), cell, material,
                              thickness).reshape(E_, m)

    u0 = ue.reshape(E_, m)

    def col(k):
        tang = jnp.zeros((E_, m), Xe.dtype).at[:, k].set(1.0)
        _, jv = jax.jvp(f_of, (u0,), (tang,))
        return jv

    return jax.vmap(col, out_axes=2)(jnp.arange(m))
