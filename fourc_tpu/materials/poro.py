"""Porous-media materials (Biot poroelasticity).

Counterpart of the reference's poro material pair
(ref: src/mat/4C_mat_structporo.* — skeleton material wrapping a bulk
elastic law + porosity law; src/mat/4C_mat_fluidporo.* — pore-fluid with
permeability/viscosity).  Here one material carries both sides of the
coupled u-p problem, mirroring how ThermoStVenantKirchhoff carries the
thermo side for TSI:

  effective-stress solid:   S = S_eff(E) - alpha p J C^{-1}
    (total PK2 = effective PK2 + pull-back of the pore-pressure Cauchy
     stress -alpha p I; alpha = Biot coefficient)
  pressure (mass balance):  S0 pdot + alpha dJ/dt - div( (k/mu_f) grad p ) = 0
    (S0 = storage coefficient 1/M; k = intrinsic permeability;
     mu_f = fluid dynamic viscosity)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from fourc_tpu.materials.base import HyperelasticMaterial, register_material


@register_material("structporo")
@dataclass
class StructPoro(HyperelasticMaterial):
    """Biot skeleton + pore fluid properties (ref: 4C_mat_structporo.* +
    4C_mat_fluidporo.*).

    law: effective-stress elasticity — "svk" or "neohooke".
    """

    kind = "poro_solid"
    youngs: float
    nue: float
    biot_alpha: float = 1.0
    permeability: float = 1.0  # k
    viscosity: float = 1.0  # mu_f
    storage: float = 0.0  # S0 = 1/M (Biot modulus inverse)
    density: float = 0.0  # skeleton bulk density (dynamics)
    porosity: float = 0.5
    law: str = "svk"
    reaction = None  # scalar-side API (no reactive term)

    def _lame(self):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        mu = self.youngs / (2 * (1 + self.nue))
        return lam, mu

    # -- solid side (effective stress + pressure coupling) -------------------

    def pk2_eff_from_E(self, E):
        from fourc_tpu.ops import common as gm

        lam, mu = self._lame()
        if self.law == "svk":
            return lam * gm.tr3l(E) * gm.eye3l(E) + 2.0 * mu * E
        # compressible neo-Hooke (same form as materials/elastic.py):
        # S = mu (I - C^-1) + lam/2 (J^2 - 1) C^-1
        C = 2.0 * E + gm.eye3l(E)
        detC = gm.det3l(C)
        Cinv = gm.inv3l(C, detC)
        return mu * (gm.eye3l(E) - Cinv) + 0.5 * lam * (detC - 1.0) * Cinv

    def pk2_from_E(self, E, p=None):
        from fourc_tpu.ops import common as gm

        S = self.pk2_eff_from_E(E)
        if p is not None:
            C = 2.0 * E + gm.eye3l(E)
            detC = gm.det3l(C)
            Cinv = gm.inv3l(C, detC)
            J = jnp.sqrt(detC)
            S = S - self.biot_alpha * p * J * Cinv
        return S

    def pk2(self, C, p=None):
        from fourc_tpu.ops import common as gm

        return self.pk2_from_E(0.5 * (C - gm.eye3l(C)), p)

    def psi(self, C):
        from fourc_tpu.ops import common as gm

        lam, mu = self._lame()
        E = 0.5 * (C - gm.eye3l(C))
        return 0.5 * lam * gm.tr3l(E) ** 2 + mu * jnp.sum(E * E)

    # -- pressure (scalar) side ----------------------------------------------

    @property
    def capacity(self):
        return self.storage

    def diff(self, phi=None):
        return self.permeability / self.viscosity
