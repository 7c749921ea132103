"""Modular hyperelasticity: strain-energy summand composition.

Counterpart of the reference's ElastHyper framework
(ref: src/mat/4C_mat_elasthyper.cpp:337 `evaluate` sums dPsi/dI over
summands; summand files in src/mat/elast/).  A material is a list of
summands, each contributing psi(invariants); stress and consistent tangent
come from AD of the summed energy — exactly the structure the reference
hand-codes via first/second invariant derivatives.

Deck syntax:
  {type: elasthyper, density: 1.0, summands: [
      {type: coupneohooke, youngs: 1e4, nue: 0.3},
      {type: isoyeoh, c1: ..., c2: ..., c3: ...},
      {type: vologden, kappa: ..., beta: ...},
      {type: coupanisoexpo, k1: ..., k2: ..., a: [1,0,0]},
  ]}
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from fourc_tpu.materials.base import HyperelasticMaterial, register_material

_I3 = jnp.eye(3)

SUMMAND_REGISTRY: dict[str, type] = {}


def register_summand(name):
    def deco(cls):
        SUMMAND_REGISTRY[name.lower()] = cls
        return cls

    return deco


class Summand:
    """One strain-energy contribution psi(C)."""

    def psi(self, inv):
        raise NotImplementedError


def invariants(C):
    I1 = jnp.trace(C)
    I2 = 0.5 * (I1**2 - jnp.trace(C @ C))
    I3 = jnp.linalg.det(C)
    J = jnp.sqrt(I3)
    return {
        "C": C,
        "I1": I1,
        "I2": I2,
        "I3": I3,
        "J": J,
        "I1b": I1 * I3 ** (-1.0 / 3.0),
        "I2b": I2 * I3 ** (-2.0 / 3.0),
    }


# --- coupled (non-split) summands -----------------------------------------


@register_summand("coupneohooke")
@dataclass
class CoupNeoHooke(Summand):
    """ref: 4C_matelast_coupneohooke: psi = c (I1-3) - 2c ln J + lambda/2 ln^2 J
    with c = mu/2."""

    youngs: float
    nue: float

    def psi(self, inv):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        mu = self.youngs / (2 * (1 + self.nue))
        lnJ = jnp.log(inv["J"])
        return 0.5 * mu * (inv["I1"] - 3.0) - mu * lnJ + 0.5 * lam * lnJ**2


@register_summand("coupmooneyrivlin")
@dataclass
class CoupMooneyRivlin(Summand):
    c1: float
    c2: float
    c3: float  # volumetric penalty coefficient

    def psi(self, inv):
        return (
            self.c1 * (inv["I1"] - 3.0)
            + self.c2 * (inv["I2"] - 3.0)
            + self.c3 * (inv["J"] - 1.0) ** 2
            - (2 * self.c1 + 4 * self.c2) * jnp.log(inv["J"])
        )


@register_summand("coupblatzko")
@dataclass
class CoupBlatzKo(Summand):
    """ref: 4C_matelast_coupblatzko (f=1 variant)."""

    mue: float
    nue: float
    f: float = 1.0

    def psi(self, inv):
        beta = self.nue / (1.0 - 2.0 * self.nue)
        I2, I3 = inv["I2"], inv["I3"]
        return (
            self.mue
            / 2.0
            * ((1 - self.f) * (I2 / I3 - 3.0 + (I3**beta - 1.0) / beta) if self.f != 1.0 else 0.0)
            + self.mue / 2.0 * self.f * (inv["I1"] - 3.0 + (I3 ** (-beta) - 1.0) / beta)
        )


@register_summand("couplogneohooke")
@dataclass
class CoupLogNeoHooke(Summand):
    youngs: float
    nue: float

    def psi(self, inv):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        mu = self.youngs / (2 * (1 + self.nue))
        lnJ = jnp.log(inv["J"])
        return mu / 2.0 * (inv["I1"] - 3.0) - mu * lnJ + lam / 2.0 * lnJ**2


# --- isochoric summands ----------------------------------------------------


@register_summand("isoneohooke")
@dataclass
class IsoNeoHooke(Summand):
    mue: float

    def psi(self, inv):
        return 0.5 * self.mue * (inv["I1b"] - 3.0)


@register_summand("isoyeoh")
@dataclass
class IsoYeoh(Summand):
    """ref: 4C_matelast_isoyeoh: sum_k c_k (I1b - 3)^k."""

    c1: float
    c2: float = 0.0
    c3: float = 0.0

    def psi(self, inv):
        x = inv["I1b"] - 3.0
        return self.c1 * x + self.c2 * x**2 + self.c3 * x**3


@register_summand("isomooneyrivlin")
@dataclass
class IsoMooneyRivlin(Summand):
    c1: float
    c2: float

    def psi(self, inv):
        return self.c1 * (inv["I1b"] - 3.0) + self.c2 * (inv["I2b"] - 3.0)


@register_summand("isoexpopow")
@dataclass
class IsoExpoPow(Summand):
    k1: float
    k2: float
    d: int = 1

    def psi(self, inv):
        return self.k1 / (2.0 * self.k2) * (jnp.exp(self.k2 * (inv["I1b"] - 3.0) ** self.d) - 1.0)


# --- volumetric summands ---------------------------------------------------


@register_summand("volsussmanbathe")
@dataclass
class VolSussmanBathe(Summand):
    kappa: float

    def psi(self, inv):
        return 0.5 * self.kappa * (inv["J"] - 1.0) ** 2


@register_summand("volpenalty")
@dataclass
class VolPenalty(Summand):
    eps: float
    gam: float

    def psi(self, inv):
        J = inv["J"]
        return self.eps * (J**self.gam + J ** (-self.gam) - 2.0)


@register_summand("vologden")
@dataclass
class VolOgden(Summand):
    kappa: float
    beta: float = -2.0

    def psi(self, inv):
        J = inv["J"]
        b = self.beta
        return self.kappa / (b**2) * (b * jnp.log(J) + J ** (-b) - 1.0)


# --- anisotropic summands --------------------------------------------------


@register_summand("coupanisoexpo")
@dataclass
class CoupAnisoExpo(Summand):
    """Fiber-reinforcement (Holzapfel-type): k1/(2 k2) (exp(k2 (I4-1)^2) - 1).

    ref: src/mat/elast/4C_matelast_coupanisoexpo.*; fiber direction `a`
    is a unit vector in reference configuration.
    """

    k1: float
    k2: float
    a: tuple = (1.0, 0.0, 0.0)
    tension_only: bool = True

    def psi(self, inv):
        a = jnp.asarray(self.a)
        a = a / jnp.linalg.norm(a)
        I4 = a @ (inv["C"] @ a)
        x = I4 - 1.0
        if self.tension_only:
            x = jnp.maximum(x, 0.0)
        return self.k1 / (2.0 * self.k2) * (jnp.exp(self.k2 * x**2) - 1.0)


@register_summand("coupanisoneohooke")
@dataclass
class CoupAnisoNeoHooke(Summand):
    c: float
    a: tuple = (1.0, 0.0, 0.0)

    def psi(self, inv):
        a = jnp.asarray(self.a)
        a = a / jnp.linalg.norm(a)
        I4 = a @ (inv["C"] @ a)
        return self.c * (I4 - 1.0)


# --- the composed material ---------------------------------------------------


@register_material("elasthyper")
@dataclass
class ElastHyper(HyperelasticMaterial):
    summands: list = field(default_factory=list)
    density: float = 0.0

    @classmethod
    def from_deck(cls, params: dict):
        specs = params.pop("summands")
        summands = []
        for s in specs:
            s = {k.lower(): v for k, v in s.items()}
            typ = s.pop("type").lower()
            summands.append(SUMMAND_REGISTRY[typ](**s))
        return cls(summands=summands, **params)

    def psi(self, C):
        inv = invariants(C)
        total = 0.0
        for s in self.summands:
            total = total + s.psi(inv)
        return total
