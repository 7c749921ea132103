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

import jax

from fourc_tpu.materials.base import HyperelasticMaterial, Material, register_material


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


@register_material("fluidporo_multiphase")
class PoroMultiphase(Material):
    """Two-phase porous flow material (ref: MAT_FluidPoroMultiPhase)."""

    kind = "porofluid"

    def __init__(self, porosity, permeability, mu_w=1.0, mu_n=1.0,
                 vg_alpha=1.0, vg_n=2.0, s_rw=0.0, s_rn=0.0, kr_exp=2.0):
        self.porosity = float(porosity)
        self.permeability = float(permeability)
        self.mu_w = float(mu_w)
        self.mu_n = float(mu_n)
        self.vg_alpha = float(vg_alpha)
        self.vg_n = float(vg_n)
        self.vg_m = 1.0 - 1.0 / float(vg_n)
        self.s_rw = float(s_rw)
        self.s_rn = float(s_rn)
        self.kr_exp = float(kr_exp)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)

    def s_w(self, pc):
        """Effective wetting saturation from capillary pressure (van
        Genuchten; smooth across pc <= 0 via softplus regularization)."""
        x = self.vg_alpha * pc
        pcp = 0.5 * (x + jnp.sqrt(x * x + 1e-6))  # smooth max(0, .)
        se = (1.0 + pcp ** self.vg_n) ** (-self.vg_m)
        return self.s_rw + (1.0 - self.s_rw - self.s_rn) * se

    def kr(self, s_eff, kr_min=1e-3):
        """Power-law relative permeability (Corey-type) with a small floor
        (keeps the vanishing-phase equation non-degenerate — the standard
        regularization, cf. the reference's minimal relative permeability
        input in 4C_mat_fluidporo_relpermeability_law.*)."""
        return jnp.clip(s_eff, 0.0, 1.0) ** self.kr_exp + kr_min

