"""Thermal materials.

ref: src/mat fourier (isotropic conduction) and thermostvenantkirchhoff
(thermo-mechanical coupling via thermal-expansion eigenstrain).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from fourc_tpu.materials.base import HyperelasticMaterial, Material, register_material

_I3 = jnp.eye(3)


@register_material("fourier")
@dataclass
class FourierIso(Material):
    """Isotropic heat conduction: q = -k grad T; c_p rho dT/dt."""

    kind = "thermo"
    conductivity: float
    capacity: float = 1.0
    density: float = 1.0

    def flux(self, gradT):
        return -self.conductivity * gradT


@register_material("scatra_stvenantkirchhoff")
@dataclass
class ScatraStVenantKirchhoff(HyperelasticMaterial):
    """SVK + concentration swelling eigenstrain: S = C:(E - beta (c - c0) I).

    The SSI analog of thermo-SVK (ref: src/ssi coupled materials /
    MAT_MultiplicativeSplitDefgradElastHyper growth laws, reduced to linear
    isotropic swelling for round 1).  Also carries the transport properties
    for the scalar side.
    """

    kind = "scatra_solid"
    youngs: float
    nue: float
    swelling: float  # beta, volumetric swelling coefficient per unit c
    refconc: float = 0.0
    diffusivity: float = 1.0
    reacoeff: float = 0.0
    density: float = 0.0
    capacity: float = 1.0  # transient coefficient of the scalar eq

    def _lame(self):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        mu = self.youngs / (2 * (1 + self.nue))
        return lam, mu

    def pk2_from_E(self, E, c=None):
        from fourc_tpu.ops import common as gm

        lam, mu = self._lame()
        eye = gm.eye3l(E)
        S = lam * gm.tr3l(E) * eye + 2.0 * mu * E
        if c is not None:
            S = S - (3.0 * lam + 2.0 * mu) * self.swelling * (c - self.refconc) * eye
        return S

    def pk2(self, C, c=None):
        from fourc_tpu.ops import common as gm

        return self.pk2_from_E(0.5 * (C - gm.eye3l(C)), c)

    def psi(self, C):
        from fourc_tpu.ops import common as gm

        lam, mu = self._lame()
        E = 0.5 * (C - gm.eye3l(C))
        return 0.5 * lam * gm.tr3l(E) ** 2 + mu * jnp.sum(E * E)

    # scalar-transport side
    def diff(self, phi=None):
        return self.diffusivity

    def reaction(self, phi):
        return self.reacoeff * phi


@register_material("thermostvenantkirchhoff")
@dataclass
class ThermoStVenantKirchhoff(HyperelasticMaterial):
    """SVK + thermal eigenstrain: S = C : (E - alpha (T - T0) I).

    ref: src/mat/4C_mat_thermostvenantkirchhoff.*; also provides the
    thermo side (conductivity/capacity) for TSI.
    """

    kind = "thermo_solid"
    youngs: float
    nue: float
    thexpans: float  # thermal expansion coefficient alpha
    inittemp: float = 0.0
    conductivity: float = 0.0
    capacity: float = 0.0
    density: float = 0.0

    def _lame(self):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        mu = self.youngs / (2 * (1 + self.nue))
        return lam, mu

    def pk2(self, C, T=None):
        # leading-index closed form: works for (3,3) and batched (3,3,M)
        from fourc_tpu.ops import common as gm

        lam, mu = self._lame()
        eye = gm.eye3l(C)
        E = 0.5 * (C - eye)
        S = lam * gm.tr3l(E) * eye + 2.0 * mu * E
        if T is not None:
            # thermal stress: -(3 lam + 2 mu) alpha (T - T0) I
            S = S - (3.0 * lam + 2.0 * mu) * self.thexpans * (T - self.inittemp) * eye
        return S

    def pk2_from_E(self, E, T=None):
        # SVK+thermal is linear in E: exactly stable
        from fourc_tpu.ops import common as gm

        lam, mu = self._lame()
        eye = gm.eye3l(E)
        S = lam * gm.tr3l(E) * eye + 2.0 * mu * E
        if T is not None:
            S = S - (3.0 * lam + 2.0 * mu) * self.thexpans * (T - self.inittemp) * eye
        return S

    def psi(self, C):
        lam, mu = self._lame()
        E = 0.5 * (C - _I3)
        trE = jnp.trace(E)
        return 0.5 * lam * trE**2 + mu * jnp.sum(E * E)

    def flux(self, gradT):
        return -self.conductivity * gradT
