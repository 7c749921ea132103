"""Geometrically exact Kirchhoff(-Love) beam — torsion-free Hermite form.

Counterpart of the reference's beam3k Kirchhoff beam family
(ref: src/beam3/4C_beam3_kirchhoff.{hpp,cpp} — shear-free geometrically
exact beams; the torsion-free position/tangent formulation follows Meier,
Popp & Wall's torsion-free Kirchhoff beam for isotropic circular sections,
CMAME 2015, which the reference realizes in the same element family).

TPU-native design: the element is a C1 Hermite cubic over the centerline
with nodal dofs (displacement u (3), tangent increment t (3)) — the
rotational dof slots of the 6-dof beam layout carry the TANGENT vector
change, not a rotation vector (shear-free kinematics: the cross-section
stays normal to the centerline, so the tangent IS the orientation up to
torsion, which this variant omits — valid for isotropic circular
sections).  The strain energy

    E = ∫ [ EA/2 ε² + EI/2 κ² ] ds₀,
    ε = |r'|/|r₀'| − 1,   κ = |r' × r''| / |r'|³ · |r'| ... (curvature of
    the current centerline measured per unit current length, integrated
    over the reference length — the standard torsion-free measure)

is integrated with a 4-point Gauss rule and differentiated by AD: forces
are the exact energy gradient, the Newton matvec the exact Hessian action
(`jax.jvp` of the gradient) — no hand-coded linearization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 4-point Gauss on [0, 1]
_GP = 0.5 * (1.0 + np.array([-0.8611363115940526, -0.3399810435848563,
                             0.3399810435848563, 0.8611363115940526]))
_GW = 0.5 * np.array([0.3478548451374538, 0.6521451548625461,
                      0.6521451548625461, 0.3478548451374538])


def _hermite(s):
    """Cubic Hermite shapes + first/second parametric derivatives at s in
    [0,1]: values for (x1, m1, x2, m2) with m = tangent * L_ref."""
    H = np.array([
        2 * s**3 - 3 * s**2 + 1, s**3 - 2 * s**2 + s,
        -2 * s**3 + 3 * s**2, s**3 - s**2,
    ])
    dH = np.array([
        6 * s**2 - 6 * s, 3 * s**2 - 4 * s + 1,
        -6 * s**2 + 6 * s, 3 * s**2 - 2 * s,
    ])
    ddH = np.array([12 * s - 6, 6 * s - 4, -12 * s + 6, 6 * s - 2])
    return H, dH, ddH


_H = np.stack([_hermite(s)[0] for s in _GP])  # (g, 4)
_dH = np.stack([_hermite(s)[1] for s in _GP])
_ddH = np.stack([_hermite(s)[2] for s in _GP])


def element_energy(X1, X2, u1, t1, u2, t2, T1, T2, L, EA, EI):
    """Strain energy of one torsion-free Kirchhoff element.

    X: reference node positions; u: displacements; t: tangent-increment
    dofs; T: reference unit tangents; L: reference length (Hermite
    tangent scaling).  All per-element (vmapped by the caller)."""
    # Hermite control values: positions and scaled tangents
    P = jnp.stack([X1 + u1, (T1 + t1) * L, X2 + u2, (T2 + t2) * L])
    P0 = jnp.stack([X1, T1 * L, X2, T2 * L])
    H, dH, ddH = (jnp.asarray(_H), jnp.asarray(_dH), jnp.asarray(_ddH))
    rp = dH @ P    # (g, 3) dr/ds
    rpp = ddH @ P  # (g, 3)
    r0p = dH @ P0
    n0 = jnp.linalg.norm(r0p, axis=1)  # ds0/ds
    n1 = jnp.linalg.norm(rp, axis=1)
    eps = n1 / n0 - 1.0
    cr = jnp.cross(rp, rpp)
    # safe-norm curvature: |cr| has a NaN gradient at 0 (straight beam);
    # regularize with a tiny eps — exact to 1e-15 away from zero
    kappa = jnp.sqrt(jnp.sum(cr * cr, axis=1) + 1e-30) \
        / jnp.maximum(n1**3, 1e-30)
    w = jnp.asarray(_GW) * n0  # reference-length weights
    return jnp.sum(w * (0.5 * EA * eps**2 + 0.5 * EI * kappa**2))


def make_internal_force(Xe, mat):
    """(E, 2, 3) reference coords + BeamSection -> force fn ue6 (E,2,6)
    -> fe6 (E,2,6).  Tangent dofs = slots 3:6 (see module docstring)."""
    Xe = jnp.asarray(Xe)
    dX = Xe[:, 1] - Xe[:, 0]
    L = jnp.linalg.norm(dX, axis=1)  # (E,)
    T = dX / L[:, None]  # straight reference elements: T1 = T2
    EA = float(mat.youngs * mat.area)
    EI = float(mat.youngs * 0.5 * (mat.iyy + mat.izz))

    def total_energy(ue6):
        def one(X, t_ref, l_ref, ue):
            return element_energy(
                X[0], X[1], ue[0, :3], ue[0, 3:], ue[1, :3], ue[1, 3:],
                t_ref, t_ref, l_ref, EA, EI)

        return jnp.sum(jax.vmap(one)(Xe, T, L, ue6))

    def force(ue6):
        return jax.grad(total_energy)(ue6)

    return force
