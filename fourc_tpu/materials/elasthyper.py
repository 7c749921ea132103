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


@register_summand("couplogneohooke")
@dataclass
class CoupLogNeoHooke(Summand):
    """ref: 4C_mat_elast_couplogneohooke.hpp:68-70:
    psi = mu/2 (I1-3) - mu ln J + lambda/2 ln^2 J  (MODE YN parametrisation
    from YOUNG/NUE)."""

    youngs: float
    nue: float

    def psi(self, inv):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        mu = self.youngs / (2 * (1 + self.nue))
        lnJ = jnp.log(inv["J"])
        return 0.5 * mu * (inv["I1"] - 3.0) - mu * lnJ + 0.5 * lam * lnJ**2


@register_summand("coupneohooke")
@dataclass
class CoupNeoHooke(Summand):
    """ref: 4C_mat_elast_coupneohooke.hpp:76:
    psi = c (I1-3) + c/beta (J^(-2 beta) - 1)  with  c = E/(4(1+nu)),
    beta = nu/(1-2 nu)  (4C_mat_elast_coupneohooke.cpp:23-24).  The
    Ogden-compressible volumetric coupling — NOT the logarithmic form
    (that is couplogneohooke above); the two differ at finite strain."""

    youngs: float
    nue: float

    def psi(self, inv):
        c = self.youngs / (4.0 * (1.0 + self.nue))
        beta = self.nue / (1.0 - 2.0 * self.nue)
        J = inv["J"]
        if abs(beta) < 1e-14:
            # nu = 0 limit: c/beta (J^(-2 beta) - 1) -> -2c ln J
            vol = -2.0 * c * jnp.log(J)
        else:
            vol = (c / beta) * (J ** (-2.0 * beta) - 1.0)
        return c * (inv["I1"] - 3.0) + vol


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
    kappa: float = 0.0  # GOH fiber dispersion (0 = aligned, 1/3 = isotropic)

    def psi(self, inv):
        I4 = _I4(inv, self.a, self.kappa)
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


# --- additional coupled summands (ref: src/mat/elast/) ----------------------


@register_summand("coupsvk")
@register_summand("coupsaintvenantkirchhoff")
@dataclass
class CoupSVK(Summand):
    """ref: 4C_mat_elast_coupSaintVenantKirchhoff: lam/2 tr(E)^2 + mu tr(E^2)."""

    youngs: float
    nue: float

    def psi(self, inv):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        mu = self.youngs / (2 * (1 + self.nue))
        E = 0.5 * (inv["C"] - _I3)
        return 0.5 * lam * jnp.trace(E) ** 2 + mu * jnp.trace(E @ E)


@register_summand("coup1pow")
@dataclass
class Coup1Pow(Summand):
    """ref: 4C_mat_elast_coup1pow: c (I1 - 3)^d."""

    c: float
    d: int = 1

    def psi(self, inv):
        return self.c * (inv["I1"] - 3.0) ** self.d


@register_summand("coup2pow")
@dataclass
class Coup2Pow(Summand):
    """ref: 4C_mat_elast_coup2pow: c (I2 - 3)^d."""

    c: float
    d: int = 1

    def psi(self, inv):
        return self.c * (inv["I2"] - 3.0) ** self.d


@register_summand("coup3pow")
@dataclass
class Coup3Pow(Summand):
    """ref: 4C_mat_elast_coup3pow: c (I3 - 1)^d."""

    c: float
    d: int = 1

    def psi(self, inv):
        return self.c * (inv["I3"] - 1.0) ** self.d


@register_summand("coup13apow")
@dataclass
class Coup13APow(Summand):
    """ref: 4C_mat_elast_coup13apow: c (I1 * I3^(-a) - 3)^d."""

    c: float
    d: int = 1
    a: float = 1.0

    def psi(self, inv):
        return self.c * (inv["I1"] * inv["I3"] ** (-self.a) - 3.0) ** self.d


@register_summand("coupexppol")
@dataclass
class CoupExpPol(Summand):
    """ref: 4C_mat_elast_coupexppol: a exp(b(I1-3) - (2b+c) lnJ + c(J-1)) - a."""

    a: float
    b: float
    c: float

    def psi(self, inv):
        lnJ = jnp.log(inv["J"])
        return self.a * jnp.exp(
            self.b * (inv["I1"] - 3.0) - (2.0 * self.b + self.c) * lnJ
            + self.c * (inv["J"] - 1.0)
        ) - self.a


@register_summand("coupsimopister")
@dataclass
class CoupSimoPister(Summand):
    """ref: 4C_mat_elast_coupsimopister: mu/2 (I1-3) - mu ln J."""

    mue: float

    def psi(self, inv):
        return 0.5 * self.mue * (inv["I1"] - 3.0) - self.mue * jnp.log(inv["J"])


@register_summand("couplogmixneohooke")
@dataclass
class CoupLogMixNeoHooke(Summand):
    """ref: 4C_mat_elast_couplogmixneohooke:
    mu/2 (I1-3) - mu ln sqrt(I3) + lam/2 (sqrt(I3)-1)^2."""

    youngs: float
    nue: float

    def psi(self, inv):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        mu = self.youngs / (2 * (1 + self.nue))
        J = inv["J"]
        return 0.5 * mu * (inv["I1"] - 3.0) - mu * jnp.log(J) + 0.5 * lam * (J - 1.0) ** 2


@register_summand("volpow")
@dataclass
class VolPow(Summand):
    """ref: 4C_mat_elast_volpow: a/(expon-1) J^(1-expon) + a J."""

    a: float
    expon: float = 5.0

    def psi(self, inv):
        J = inv["J"]
        return self.a / (self.expon - 1.0) * J ** (1.0 - self.expon) + self.a * J


# --- principal-stretch summands ---------------------------------------------
#
# Stretches come from eigvalsh(C).  eigh's jvp divides by eigenvalue gaps,
# so at degenerate stretches (undeformed state!) gradients NaN; a fixed
# infinitesimal anisotropic jitter splits the eigenvalues with O(1e-10)
# energy error, keeping the AD stress/tangent finite everywhere.
_EIG_JITTER = jnp.diag(jnp.array([1.0, 2.0, 3.0])) * 1e-10


def principal_stretches(C):
    lam2 = jnp.linalg.eigvalsh(C + _EIG_JITTER)
    return jnp.sqrt(jnp.maximum(lam2, 1e-30))


@register_summand("coupvarga")
@dataclass
class CoupVarga(Summand):
    """ref: 4C_mat_elast_coupvarga: (2mu-beta)(l1+l2+l3-3) + beta(sum 1/li - 3)."""

    mue: float
    beta: float = 0.0

    def psi(self, inv):
        lam = principal_stretches(inv["C"])
        alpha = 2.0 * self.mue - self.beta
        return alpha * (jnp.sum(lam) - 3.0) + self.beta * (jnp.sum(1.0 / lam) - 3.0)


@register_summand("isovarga")
@dataclass
class IsoVarga(Summand):
    """ref: 4C_mat_elast_isovarga — Varga on the isochoric stretches."""

    mue: float
    beta: float = 0.0

    def psi(self, inv):
        lam = principal_stretches(inv["C"]) * inv["J"] ** (-1.0 / 3.0)
        alpha = 2.0 * self.mue - self.beta
        return alpha * (jnp.sum(lam) - 3.0) + self.beta * (jnp.sum(1.0 / lam) - 3.0)


@register_summand("isoogden")
@dataclass
class IsoOgden(Summand):
    """ref: 4C_mat_elast_isoogden: 2 mu/alpha^2 (sum lbar_i^alpha - 3)."""

    mue: float
    alpha: float = 2.0

    def psi(self, inv):
        lb = principal_stretches(inv["C"]) * inv["J"] ** (-1.0 / 3.0)
        return 2.0 * self.mue / self.alpha**2 * (jnp.sum(lb**self.alpha) - 3.0)


@register_summand("iso1pow")
@dataclass
class Iso1Pow(Summand):
    """ref: 4C_mat_elast_iso1pow: c (I1b - 3)^d."""

    c: float
    d: int = 1

    def psi(self, inv):
        return self.c * (inv["I1b"] - 3.0) ** self.d


@register_summand("iso2pow")
@dataclass
class Iso2Pow(Summand):
    """ref: 4C_mat_elast_iso2pow: c (I2b - 3)^d."""

    c: float
    d: int = 1

    def psi(self, inv):
        return self.c * (inv["I2b"] - 3.0) ** self.d


# --- additional anisotropic summands ----------------------------------------


def _unit(a):
    a = jnp.asarray(a, jnp.result_type(float))
    return a / jnp.linalg.norm(a)


def _I4(inv, a, kappa=0.0):
    """Generalized fiber invariant with GOH dispersion: the dispersed
    structural tensor H = kappa I + (1-3 kappa) a (x) a gives
    I4* = kappa I1 + (1-3 kappa) a.C.a (ref:
    4C_mat_elast_aniso_structuraltensor_strategy dispersed transversely
    isotropic strategy; kappa in [0, 1/3], 0 = perfectly aligned)."""
    a = _unit(a)
    I4 = a @ (inv["C"] @ a)
    if kappa:
        return kappa * inv["I1"] + (1.0 - 3.0 * kappa) * I4
    return I4


@register_summand("coupanisopow")
@dataclass
class CoupAnisoPow(Summand):
    """ref: 4C_mat_elast_coupanisopow: K ((I4)^d1 - 1)^d2."""

    k: float
    d1: float = 1.0
    d2: float = 1.0
    a: tuple = (1.0, 0.0, 0.0)
    tension_only: bool = True

    def psi(self, inv):
        I4 = _I4(inv, self.a)
        x = I4**self.d1 - 1.0
        if self.tension_only:
            x = jnp.maximum(x, 0.0)
        return self.k * x**self.d2


@register_summand("isoanisoexpo")
@dataclass
class IsoAnisoExpo(Summand):
    """ref: 4C_mat_elast_isoanisoexpo: Holzapfel fiber term on the
    ISOCHORIC fiber invariant I4b = I4 * I3^(-1/3)."""

    k1: float
    k2: float
    a: tuple = (1.0, 0.0, 0.0)
    tension_only: bool = True

    def psi(self, inv):
        I4b = _I4(inv, self.a) * inv["I3"] ** (-1.0 / 3.0)
        x = I4b - 1.0
        if self.tension_only:
            x = jnp.maximum(x, 0.0)
        return self.k1 / (2.0 * self.k2) * (jnp.exp(self.k2 * x**2) - 1.0)


@register_summand("coupanisoexpotwocoup")
@dataclass
class CoupAnisoExpoTwoCoup(Summand):
    """Two coupled fiber families with fiber-fiber shear coupling
    (Holzapfel-Ogden passive myocardium; ref:
    4C_mat_elast_coupanisoexpotwocoup):
      psi = a4/(2 b4) (e^{b4 (I4-1)^2} - 1) + a6/(2 b6) (e^{b6 (I6-1)^2} - 1)
          + a8/(2 b8) (e^{b8 (I8 - a.b)^2} - 1),   I8 = a.C.b
    """

    a4: float
    b4: float
    a6: float
    b6: float
    a8: float
    b8: float
    a: tuple = (1.0, 0.0, 0.0)
    b: tuple = (0.0, 1.0, 0.0)
    tension_only: bool = True

    def psi(self, inv):
        a, b = _unit(self.a), _unit(self.b)
        C = inv["C"]
        I4 = a @ (C @ a)
        I6 = b @ (C @ b)
        I8 = a @ (C @ b)
        x4, x6 = I4 - 1.0, I6 - 1.0
        if self.tension_only:
            x4 = jnp.maximum(x4, 0.0)
            x6 = jnp.maximum(x6, 0.0)
        x8 = I8 - jnp.dot(a, b)
        return (
            self.a4 / (2 * self.b4) * (jnp.exp(self.b4 * x4**2) - 1.0)
            + self.a6 / (2 * self.b6) * (jnp.exp(self.b6 * x6**2) - 1.0)
            + self.a8 / (2 * self.b8) * (jnp.exp(self.b8 * x8**2) - 1.0)
        )


@register_summand("coupanisoexposhear")
@dataclass
class CoupAnisoExpoShear(Summand):
    """Exponential fiber-fiber shear coupling between two families
    (ref: 4C_mat_elast_coupanisoexposhear.hpp):
      psi = a_fs/(2 b_fs) (exp(b_fs (I8 - f.s)^2) - 1),  I8 = f.C.s
    """

    a_fs: float
    b_fs: float
    f: tuple = (1.0, 0.0, 0.0)
    s: tuple = (0.0, 1.0, 0.0)

    def psi(self, inv):
        f, s = _unit(self.f), _unit(self.s)
        I8 = f @ (inv["C"] @ s)
        x = I8 - jnp.dot(f, s)
        return self.a_fs / (2.0 * self.b_fs) * (jnp.exp(self.b_fs * x**2) - 1.0)


@register_summand("couptransverselyisotropic")
@dataclass
class CoupTransverselyIsotropic(Summand):
    """Bonet-Burton transversely isotropic hyperelastic reinforcement
    (ref: 4C_mat_elast_couptransverselyisotropic.cpp:173):
      psi = (alpha + beta/2 ln I3 + gamma (I4-1)) (I4-1) - alpha/2 (I5-1)
    with I4 = a.C.a, I5 = a.C^2.a.  Parameters (alpha, beta, gamma) come
    from the linear transversely isotropic compliance (Schuermann)."""

    alpha: float
    beta: float
    gamma: float
    a: tuple = (1.0, 0.0, 0.0)

    def psi(self, inv):
        a = _unit(self.a)
        C = inv["C"]
        Ca = C @ a
        I4 = a @ Ca
        I5 = Ca @ Ca
        x = I4 - 1.0
        return (
            (self.alpha + 0.5 * self.beta * jnp.log(inv["I3"]) + self.gamma * x) * x
            - 0.5 * self.alpha * (I5 - 1.0)
        )


@register_summand("coupanisoexpoactive")
@dataclass
class CoupAnisoExpoActive(Summand):
    """Active fiber family: Holzapfel passive exponential (separate
    compression branch) + constant active fiber tension (Wilson/Baek/
    Humphrey AAA G&R; ref: 4C_mat_elast_coupanisoexpoactive.cpp).

    Passive: k1/(2 k2)(exp(k2 (I4-1)^2)-1), with (k1comp, k2comp) when
    I4 < 1.  Active: the reference adds S_act = dPsi_act * A / I4 with
    dPsi_act = s/dens (1 - (lambdamax-1)^2/(lambdamax-lambda0)^2) held
    constant (active stretch = 1); that stress is exactly the C-gradient
    of psi_act = dPsi_act/2 * ln I4, which is the form used here so stress
    AND energy stay AD-consistent."""

    k1: float
    k2: float
    s: float = 0.0
    dens: float = 1.0
    lambdamax: float = 1.4
    lambda0: float = 0.8
    k1comp: float = 0.0
    k2comp: float = 1.0
    a: tuple = (1.0, 0.0, 0.0)

    def psi(self, inv):
        I4 = _I4(inv, self.a)
        x = I4 - 1.0
        tens = self.k1 / (2.0 * self.k2) * (jnp.exp(self.k2 * x**2) - 1.0)
        comp = self.k1comp / (2.0 * self.k2comp) * (
            jnp.exp(self.k2comp * x**2) - 1.0)
        passive = jnp.where(I4 >= 1.0, tens, comp)
        dpsi_act = self.s / self.dens * (
            1.0 - (self.lambdamax - 1.0) ** 2 / (self.lambdamax - self.lambda0) ** 2)
        return passive + 0.5 * dpsi_act * jnp.log(jnp.maximum(I4, 1e-12))


@register_summand("isotestmaterial")
@dataclass
class IsoTestMaterial(Summand):
    """ref: 4C_mat_elast_isotestmaterial.cpp — coupling-complete test
    summand: c1(I1b-3) + c1/2 (I1b-3)^2 + c2(I2b-3) + c2/2 (I2b-3)^2
    + d (I1b-3)(I2b-3)."""

    c1: float
    c2: float

    def psi(self, inv):
        d = self.c1 + 2.0 * self.c2
        x, y = inv["I1b"] - 3.0, inv["I2b"] - 3.0
        return (self.c1 * x + 0.5 * self.c1 * x**2 + self.c2 * y
                + 0.5 * self.c2 * y**2 + d * x * y)


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
