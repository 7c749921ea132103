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
        # leading-index closed form: works for (3,3) and batched (3,3,M)
        from fourc_tpu.ops import common as gm

        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        mu = self.youngs / (2 * (1 + self.nue))
        return lam * gm.tr3l(eps) * gm.eye3l(eps) + 2.0 * mu * eps
