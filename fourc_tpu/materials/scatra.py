"""Scalar-transport materials.

ref: src/mat scatra (diffusivity/reaction), scatra_reaction (coupled
multi-scalar reactions), ion / newman / electrode (electrochemistry).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from fourc_tpu.materials.base import Material, register_material


@register_material("scatra")
@dataclass
class ScatraMat(Material):
    """Linear diffusion + optional linear reaction: d phi/dt + u.grad phi
    = div(D grad phi) - reacoeff * phi."""

    kind = "scatra"
    diffusivity: float
    reacoeff: float = 0.0
    density: float = 1.0
    # storage scaling of d phi/dt — porosity for transport through porous
    # media (poroelast_scatra; ref src/scatra_ele poro variants pull this
    # from the coupled poro material)
    capacity: float = 1.0

    def diff(self, phi=None):
        return self.diffusivity

    def reaction(self, phi):
        return self.reacoeff * phi


@register_material("soret")
@dataclass
class SoretMat(Material):
    """Thermodiffusive scalar: Fickian diffusion + Soret thermal drift
    j = -D (grad c + S_T c grad T)  (ref: src/mat/4C_mat_soret.* used by
    the sti module)."""

    kind = "scatra"
    diffusivity: float
    soret: float = 0.0  # S_T thermal-diffusion coefficient
    reacoeff: float = 0.0
    density: float = 1.0
    capacity: float = 1.0

    def diff(self, phi=None):
        return self.diffusivity

    def reaction(self, phi):
        return self.reacoeff * phi


@register_material("scatra_reaction")
@dataclass
class ScatraReaction(Material):
    """Nonlinear reaction term r(phi) given as a symbolic expression of
    `phi` (ref: scatra_reaction coupling REACSTART/power-law forms reduced
    to an expression here)."""

    kind = "scatra"
    diffusivity: float
    reaction_expr: str = "0"
    density: float = 1.0
    _fn: object = field(default=None, repr=False)

    def __post_init__(self):
        from fourc_tpu.core.functions import SymbolicExpression

        object.__setattr__(self, "_fn", SymbolicExpression(self.reaction_expr))

    def diff(self, phi=None):
        return self.diffusivity

    def reaction(self, phi):
        return -self._fn(phi=phi, x=0.0, y=0.0, z=0.0, t=0.0)


@register_material("ion")
@dataclass
class IonMat(Material):
    """Ion species for electrochemistry (Nernst-Planck).

    ref: src/mat/4C_mat_ion.*: diffusivity, valence, (optional) ELIM."""

    kind = "scatra"
    diffusivity: float
    valence: float = 0.0
    density: float = 1.0

    def diff(self, phi=None):
        return self.diffusivity

    def reaction(self, phi):
        return 0.0 * phi
