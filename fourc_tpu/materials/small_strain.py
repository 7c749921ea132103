"""Small-strain materials (KINEM linear path of the solid elements)."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from fourc_tpu.materials.base import SmallStrainMaterial, register_material

_I3 = jnp.eye(3)


@register_material("linelastic")
@dataclass
class LinearElastic(SmallStrainMaterial):
    """Isotropic linear elasticity: sigma = lambda tr(eps) I + 2 mu eps."""

    youngs: float
    nue: float
    density: float = 0.0

    def psi_small(self, eps):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        mu = self.youngs / (2 * (1 + self.nue))
        tr = jnp.trace(eps)
        return 0.5 * lam * tr**2 + mu * jnp.sum(eps * eps)

    def stress_small(self, eps):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        mu = self.youngs / (2 * (1 + self.nue))
        return lam * jnp.trace(eps) * _I3 + 2.0 * mu * eps
