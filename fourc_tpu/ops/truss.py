"""Batched truss / torsion-spring / rigid-sphere structural elements.

Counterpart of the reference's small structural element zoo:
- truss3 (ref: src/truss3 — 2-node nonlinear truss, Green-Lagrange strain,
  total-Lagrangian internal force)
- torsion3 (ref: src/torsion3 — 3-node torsion spring penalising the angle
  between consecutive segments; used in polymer-network models)
- rigidsphere (ref: src/rigidsphere — point mass/sphere with radius, used
  by Brownian dynamics, crosslinking and contact)

TPU-native design: each element family is one vmapped closed-form (or AD)
kernel over fixed-shape (E, nen, 3) batches; tangents come from jax.jvp
through these functions — no hand-coded stiffness matrices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def truss_force(Xe, ue, EA):
    """Total-Lagrangian Green-strain truss internal force.

    Xe, ue: (E, 2, 3) reference coords / displacements (translational).
    Returns (E, 2, 3).  With d = current chord, L = reference length,
    eps_GL = (|d|^2 - L^2) / (2 L^2) and N = EA * eps_GL (PK2 axial force),
    f_2 = N * d / L = dPsi/du_2 for Psi = EA L eps^2 / 2  (exact gradient).
    (ref: src/truss3 4C_truss3.cpp internal force, same strain measure)
    """
    D = Xe[:, 1] - Xe[:, 0]  # (E, 3) reference chord
    d = D + ue[:, 1] - ue[:, 0]  # current chord
    L2 = jnp.sum(D * D, axis=1)
    eps = (jnp.sum(d * d, axis=1) - L2) / (2.0 * L2)
    coef = (EA * eps / jnp.sqrt(L2))[:, None]  # N / L
    f2 = coef * d
    return jnp.stack([-f2, f2], axis=1)


def truss_energy(Xe, ue, EA):
    """(E,) strain energy EA L eps_GL^2 / 2 (for tests/line search)."""
    D = Xe[:, 1] - Xe[:, 0]
    d = D + ue[:, 1] - ue[:, 0]
    L2 = jnp.sum(D * D, axis=1)
    eps = (jnp.sum(d * d, axis=1) - L2) / (2.0 * L2)
    return 0.5 * EA * jnp.sqrt(L2) * eps * eps


def torsion_energy(Xe, ue, k, bend_potential="quadratic"):
    """(E,) torsion-spring energy over node triplets (E, 3, 3).

    theta = angle between segments (x2-x1) and (x3-x2); energy
    k/2 theta^2 ("quadratic") or k (1 - cos theta) ("cosine") — the two
    potentials of the reference's torsion3 element
    (ref: src/torsion3 4C_torsion3.cpp evaluate, SPRING_QUADRATIC/COSINE).
    """
    x = Xe + ue  # (E, 3, 3) current positions
    d1 = x[:, 1] - x[:, 0]
    d2 = x[:, 2] - x[:, 1]
    dot = jnp.sum(d1 * d2, axis=1)
    if bend_potential == "cosine":
        n1 = jnp.linalg.norm(d1, axis=1)
        n2 = jnp.linalg.norm(d2, axis=1)
        return k * (1.0 - dot / jnp.maximum(n1 * n2, 1e-30))
    # |d1 x d2| regularized for AD: the plain norm has a NaN gradient at
    # the straight configuration (|c| at c = 0); sqrt(|c|^2 + (eps s)^2)
    # keeps U smooth with an O(eps^2) energy error and the exact zero
    # force at theta = 0
    c2 = jnp.sum(jnp.cross(d1, d2) ** 2, axis=1)
    scale2 = jnp.sum(d1 * d1, axis=1) * jnp.sum(d2 * d2, axis=1)
    crs = jnp.sqrt(c2 + 1e-28 * scale2)
    theta = jnp.arctan2(crs, dot)
    return 0.5 * k * theta * theta


def torsion_force(Xe, ue, k, bend_potential="quadratic"):
    """(E, 3, 3) internal force = d(energy)/d(ue) via AD (the consistent
    variational force, replacing the reference's hand-derived gradients)."""
    return jax.grad(lambda u: jnp.sum(torsion_energy(Xe, u, k,
                                                     bend_potential)))(ue)


def sphere_mass(radius, density):
    """(m, I) mass and rotational inertia of a solid sphere."""
    r = np.asarray(radius, np.float64)
    m = density * 4.0 / 3.0 * np.pi * r**3
    return m, 0.4 * m * r * r


def sphere_drag(radius, viscosity):
    """(gamma_t, gamma_r) Stokes translational/rotational drag of a sphere
    (6 pi eta r, 8 pi eta r^3) — the Brownian-dynamics friction model
    (ref: src/rigidsphere damping in browniandyn)."""
    r = np.asarray(radius, np.float64)
    return 6.0 * np.pi * viscosity * r, 8.0 * np.pi * viscosity * r**3
