"""Basic hyperelastic materials (SVK, Neo-Hooke).

ref: src/mat/4C_mat_stvenantkirchhoff.cpp:151,169 (SVK stress/tangent) and
the logarithmic neo-Hooke summand
(src/mat/elast/4C_mat_elast_couplogneohooke.hpp:68-70).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from fourc_tpu.materials.base import HistoryMaterial, HyperelasticMaterial, Material, register_material
from fourc_tpu.ops import common as gm

_I3 = jnp.eye(3)


def lame(youngs: float, nue: float):
    lam = youngs * nue / ((1 + nue) * (1 - 2 * nue))
    mu = youngs / (2 * (1 + nue))
    return lam, mu


@register_material("stvenantkirchhoff")
@dataclass
class StVenantKirchhoff(HyperelasticMaterial):
    """S = lambda tr(E) I + 2 mu E (hand-coded, no AD needed)."""

    youngs: float
    nue: float
    density: float = 0.0

    def psi(self, C):
        lam, mu = lame(self.youngs, self.nue)
        E = 0.5 * (C - _I3)
        trE = jnp.trace(E)
        return 0.5 * lam * trE**2 + mu * jnp.sum(E * E)

    def pk2(self, C):
        # leading-index closed form: works for (3,3) and batched (3,3,M)
        lam, mu = lame(self.youngs, self.nue)
        E = 0.5 * (C - gm.eye3l(C))
        return lam * gm.tr3l(E) * gm.eye3l(C) + 2.0 * mu * E

    def pk2_from_E(self, E):
        # SVK is linear in E: exactly stable
        lam, mu = lame(self.youngs, self.nue)
        return lam * gm.tr3l(E) * gm.eye3l(E) + 2.0 * mu * E


@register_material("neohooke")
@dataclass
class NeoHooke(HyperelasticMaterial):
    """Compressible Neo-Hooke:
    psi = mu/2 (I1 - 3) - mu ln J + lambda/2 (ln J)^2
    (the classic form; matches the reference's ElastHyper with CoupNeoHooke
    + volumetric ln-J penalty composition).
    """

    youngs: float
    nue: float
    density: float = 0.0

    def psi(self, C):
        lam, mu = lame(self.youngs, self.nue)
        I1 = jnp.trace(C)
        J2 = jnp.linalg.det(C)  # = J^2
        lnJ = 0.5 * jnp.log(J2)
        return 0.5 * mu * (I1 - 3.0) - mu * lnJ + 0.5 * lam * lnJ**2

    def pk2(self, C):
        # hand-coded for speed: S = mu (I - C^-1) + lambda lnJ C^-1
        # (leading-index closed form: works for (3,3) and batched (3,3,M))
        lam, mu = lame(self.youngs, self.nue)
        det = gm.det3l(C)
        Cinv = gm.inv3l(C, det)
        lnJ = 0.5 * jnp.log(det)
        return mu * (gm.eye3l(C) - Cinv) + lam * lnJ * Cinv

    def pk2_from_E(self, E):
        """Cancellation-free form for f32: with A = 2E = C - I,
        I - C^-1 = C^-1 A  and  det(C) - 1 = trA + c2(A) + det(A) exactly,
        so S = C^-1 (mu A + lam lnJ I), lnJ = log1p(det(C)-1)/2."""
        lam, mu = lame(self.youngs, self.nue)
        A = 2.0 * E
        C = A + gm.eye3l(A)
        trA = gm.tr3l(A)
        trA2 = gm.tr3l(gm.matmul3l(A, A))
        detC_m1 = trA + 0.5 * (trA * trA - trA2) + gm.det3l(A)
        lnJ = 0.5 * jnp.log1p(detC_m1)
        Cinv = gm.inv3l(C)
        return gm.matmul3l(Cinv, mu * A + lam * lnJ * gm.eye3l(A))


@register_material("mooneyrivlin")
@dataclass
class MooneyRivlin(HyperelasticMaterial):
    """Compressible Mooney-Rivlin: c1 (I1b-3) + c2 (I2b-3) + kappa/2 (J-1)^2."""

    c1: float
    c2: float
    kappa: float
    density: float = 0.0

    def psi(self, C):
        J2 = jnp.linalg.det(C)
        J = jnp.sqrt(J2)
        I1 = jnp.trace(C)
        I2 = 0.5 * (I1**2 - jnp.trace(C @ C))
        I1b = I1 * J2 ** (-1.0 / 3.0)
        I2b = I2 * J2 ** (-2.0 / 3.0)
        return self.c1 * (I1b - 3.0) + self.c2 * (I2b - 3.0) + 0.5 * self.kappa * (J - 1.0) ** 2


@register_material("membrane")
@dataclass
class MembraneSVK(HyperelasticMaterial):
    """Plane-stress SVK membrane material + element thickness.

    Counterpart of the reference's membrane elements (ref: src/membrane —
    `MEMBRANE4` elements carry the thickness on the element line; the
    plane-stress condition is enforced in 4C_membrane_evaluate.cpp).  Here
    thickness rides on the material since a membrane block is homogeneous.
    """

    kind = "membrane"
    youngs: float
    nue: float
    thickness: float = 1.0
    density: float = 0.0

    def psi(self, C):  # not used (membrane kernel is 2D curvilinear)
        raise NotImplementedError("membrane material is element-bound")


@register_material("shell_elastic")
class ShellElastic(Material):
    """Linear elastic shell section (ref: shells use standard materials with
    a THICKNESS element parameter; src/shell7p).  kappa = shear correction,
    drill = drilling-rotation penalty factor."""

    kind = "shell"

    def __init__(self, youngs, nue, thickness, density=0.0, kappa=5.0 / 6.0,
                 drill=1e-3):
        self.youngs = float(youngs)
        self.nue = float(nue)
        self.thickness = float(thickness)
        self.density = float(density)
        self.kappa = float(kappa)
        self.drill = float(drill)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)


@register_material("shell7p")
class Shell7p(Material):
    """7-parameter shell section: a full 3D hyperelastic law + THICKNESS
    (ref: src/shell7p — shell7p elements evaluate unmodified 3D materials
    because the 7th parameter supplies the linear transverse normal
    strain; 4C_shell7p_ele_calc.*)."""

    kind = "shell7p"

    def __init__(self, youngs, nue, thickness, density=0.0, law="svk"):
        self.youngs = float(youngs)
        self.nue = float(nue)
        self.thickness = float(thickness)
        self.density = float(density)
        self.law = str(law)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)

    def psi(self, C):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        mu = self.youngs / (2 * (1 + self.nue))
        if self.law == "neohooke":
            I1 = jnp.trace(C)
            lnJ = 0.5 * jnp.log(jnp.linalg.det(C))
            return 0.5 * mu * (I1 - 3.0) - mu * lnJ + 0.5 * lam * lnJ**2
        E = 0.5 * (C - jnp.eye(3, dtype=C.dtype))
        trE = jnp.trace(E)
        return 0.5 * lam * trE**2 + mu * jnp.trace(E @ E)


@register_material("mulf")
class MulfPrestress(HistoryMaterial):
    """MULF (multiplicative update) prestressing wrapper.

    Counterpart of the reference's MULF prestress technology
    (ref: src/solid_3D_ele prestress formulation 4C_solid_3D_ele_calc_mulf.*
    — TECH/PRESTRESS mulf: a stored per-GP prestretch F0 makes the known
    loaded geometry the reference; during the prestress phase F0 <- F F0
    and displacements reset).

    history per GP: F0 flattened (9), init = identity.  The wrapped
    isotropic material is evaluated at C_tot = F0^T C F0 and its PK2 is
    pushed to the current reference: S' = F0 S F0^T (the MULF pull-back).
    """

    kind = "solid_history"
    history_shape = (9,)

    def __init__(self, material, density=0.0):
        from fourc_tpu.materials import make_material as _mk

        self.base = _mk(dict(material))
        self.density = float(density or getattr(self.base, "density", 0.0))
        # expose base elastic constants (preconditioners read them)
        for attr in ("youngs", "nue"):
            if hasattr(self.base, attr):
                setattr(self, attr, getattr(self.base, attr))

    @classmethod
    def from_deck(cls, params):
        return cls(**params)

    def init_history(self, ngp_total):
        eye = jnp.eye(3).reshape(-1)
        return jnp.tile(eye[None, :], (ngp_total, 1))

    def evaluate(self, C, h):
        F0 = h.reshape(3, 3)
        Ctot = F0.T @ C @ F0
        E = 0.5 * (Ctot - jnp.eye(3, dtype=C.dtype))
        S = self.base.pk2_from_E(E[..., None])[..., 0]
        # the prestressed configuration is the NEW reference (ref: MULF,
        # Gee et al. 2010 / 4C_solid_3D_ele_calc_mulf): energy is measured
        # per UPDATED volume, so the pull-back to the stored original
        # coordinates carries det(F0):  S' = J0 F0 S F0^T
        Sp = jnp.linalg.det(F0) * (F0 @ S @ F0.T)
        return Sp, h
