"""Fluid materials.

ref: src/mat newtonianfluid, carreauyasuda, herschelbulkley, modpowerlaw,
sutherland, murnaghantait.  Each provides dynamic viscosity as a function of
shear rate (and temperature where relevant); the fluid element kernel calls
``viscosity(gamma_dot)`` pointwise at Gauss points.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from fourc_tpu.materials.base import Material, register_material


@register_material("newtonianfluid")
@dataclass
class NewtonianFluid(Material):
    kind = "fluid"
    viscosity: float  # dynamic viscosity mu
    density: float = 1.0

    def visc(self, gamma_dot=None):
        return self.viscosity


@register_material("carreauyasuda")
@dataclass
class CarreauYasuda(Material):
    """mu(gdot) = mu_inf + (mu_0 - mu_inf) (1 + (lambda gdot)^a)^((n-1)/a)."""

    kind = "fluid"
    nu_0: float
    nu_inf: float
    lambda_: float
    a_param: float
    b_param: float
    density: float = 1.0

    @classmethod
    def from_deck(cls, params):
        if "lambda" in params:
            params["lambda_"] = params.pop("lambda")
        return cls(**params)

    def visc(self, gamma_dot):
        lam, a, n = self.lambda_, self.a_param, self.b_param
        return self.nu_inf + (self.nu_0 - self.nu_inf) * (1.0 + (lam * gamma_dot) ** a) ** (
            (n - 1.0) / a
        )


@register_material("modpowerlaw")
@dataclass
class ModPowerLaw(Material):
    kind = "fluid"
    m_cons: float
    delta: float
    a_exp: float
    density: float = 1.0

    def visc(self, gamma_dot):
        return self.m_cons * (self.delta + gamma_dot) ** (self.a_exp - 1.0)


@register_material("herschelbulkley")
@dataclass
class HerschelBulkley(Material):
    kind = "fluid"
    tau_0: float
    kfac: float
    nfac: float
    mexp: float = 100.0
    lolimshearrate: float = 1e-3
    uplimshearrate: float = 1e3
    density: float = 1.0

    def visc(self, gamma_dot):
        g = jnp.clip(gamma_dot, self.lolimshearrate, self.uplimshearrate)
        return self.kfac * g ** (self.nfac - 1.0) + self.tau_0 * (
            1.0 - jnp.exp(-self.mexp * g)
        ) / jnp.maximum(g, 1e-12)


@register_material("sutherland")
@dataclass
class Sutherland(Material):
    """Temperature-dependent viscosity (low-Mach flows)."""

    kind = "fluid"
    refvisc: float
    reftemp: float
    suthtemp: float
    shc: float = 1.0
    pranum: float = 0.7
    density: float = 1.0

    def visc_T(self, T):
        return (
            self.refvisc
            * (T / self.reftemp) ** 1.5
            * (self.reftemp + self.suthtemp)
            / (T + self.suthtemp)
        )

    def visc(self, gamma_dot=None):
        return self.refvisc


@register_material("murnaghantait")
@dataclass
class MurnaghanTait(Material):
    """Weakly compressible fluid with Murnaghan-Tait equation of state.

    rho(p) = rho0 * (1 + n/K0 * (p - p0))^(1/n)
    (ref: src/mat/4C_mat_fluid_murnaghantait.* — used by the reference's
    weakly-compressible fluid variants; here the EOS feeds the
    variable-density/loma continuity-source path).
    """

    kind = "fluid"
    viscosity: float
    density: float = 1.0      # rho0 at reference pressure
    refpressure: float = 0.0
    bulkmod: float = 1.0e5    # K0
    matparameter: float = 7.0  # Tait exponent n

    def visc(self, gamma_dot=None):
        return self.viscosity

    def rho_p(self, p):
        import jax.numpy as jnp

        n = self.matparameter
        return self.density * jnp.maximum(
            1.0 + n / self.bulkmod * (p - self.refpressure), 1e-6
        ) ** (1.0 / n)

    def drho_dp(self, p):
        import jax.numpy as jnp

        n = self.matparameter
        base = jnp.maximum(
            1.0 + n / self.bulkmod * (p - self.refpressure), 1e-6)
        return self.density / self.bulkmod * base ** (1.0 / n - 1.0)
