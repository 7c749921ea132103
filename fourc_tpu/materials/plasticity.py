"""Elasto-plastic materials with internal variables.

ref: the reference's plasticity family (src/mat: plasticlinelast /
plasticelasthyper / plasticdruckerprager).  Implemented here: small-strain
J2 (von Mises) plasticity with linear isotropic + kinematic hardening via a
closed-form radial-return map — fully branch-free (jnp.where), so it jits
and vmaps over all Gauss points at once, and the consistent tangent falls
out of AD through the return map (no hand-coded cep).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from fourc_tpu.materials.base import HistoryMaterial, register_material

_I3 = jnp.eye(3)


@register_material("plasticlinelast")
@dataclass
class PlasticLinElast(HistoryMaterial):
    """Small-strain J2 plasticity, linear hardening.

    history per GP: [eps_p (3,3) flattened (9), alpha (backstress, 9),
    kappa (1)] -> shape (19,)
    """

    kind = "solid_small_history"
    youngs: float
    nue: float
    yield_stress: float
    isohard: float = 0.0  # isotropic hardening modulus H_i
    kinhard: float = 0.0  # kinematic hardening modulus H_k
    density: float = 0.0
    history_shape = (19,)

    def evaluate_small(self, eps, h):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        mu = self.youngs / (2 * (1 + self.nue))

        eps_p = h[:9].reshape(3, 3)
        back = h[9:18].reshape(3, 3)
        kappa = h[18]

        eps_e = eps - eps_p
        sig_tr = lam * jnp.trace(eps_e) * _I3 + 2.0 * mu * eps_e
        s_tr = sig_tr - jnp.trace(sig_tr) / 3.0 * _I3
        xi = s_tr - back
        norm_xi = jnp.sqrt(jnp.sum(xi * xi) + 1e-30)
        q_tr = jnp.sqrt(3.0 / 2.0) * norm_xi

        sig_y = self.yield_stress + self.isohard * kappa
        f_tr = q_tr - sig_y

        dgamma = jnp.maximum(f_tr, 0.0) / (3.0 * mu + self.isohard + self.kinhard)
        n = xi / norm_xi  # flow direction

        plastic = f_tr > 0.0
        deps_p = jnp.where(plastic, jnp.sqrt(3.0 / 2.0) * dgamma, 0.0) * n
        eps_p_new = eps_p + deps_p
        back_new = back + jnp.where(plastic, (2.0 / 3.0) * self.kinhard, 0.0) * jnp.sqrt(
            3.0 / 2.0
        ) * dgamma * n
        kappa_new = kappa + jnp.where(plastic, dgamma, 0.0)

        sig = sig_tr - 2.0 * mu * deps_p
        h_new = jnp.concatenate([eps_p_new.reshape(9), back_new.reshape(9), kappa_new[None]])
        return sig, h_new


@register_material("viscoplastic_perzyna")
@dataclass
class ViscoPlasticPerzyna(HistoryMaterial):
    """Small-strain Perzyna-type viscoplasticity (rate-dependent J2).

    dgamma = dt/eta * <f/sigma_y>^m; history layout as PlasticLinElast.
    ref capability: viscoplastic_no_yield_surface / robinson family.
    """

    kind = "solid_small_history"
    youngs: float
    nue: float
    yield_stress: float
    eta: float = 1.0
    m_exp: float = 1.0
    isohard: float = 0.0
    density: float = 0.0
    history_shape = (19,)

    def evaluate_small(self, eps, h, dt=1.0):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        mu = self.youngs / (2 * (1 + self.nue))
        eps_p = h[:9].reshape(3, 3)
        kappa = h[18]
        eps_e = eps - eps_p
        sig_tr = lam * jnp.trace(eps_e) * _I3 + 2.0 * mu * eps_e
        s_tr = sig_tr - jnp.trace(sig_tr) / 3.0 * _I3
        norm_s = jnp.sqrt(jnp.sum(s_tr * s_tr) + 1e-30)
        q_tr = jnp.sqrt(3.0 / 2.0) * norm_s
        sig_y = self.yield_stress + self.isohard * kappa
        over = jnp.maximum(q_tr - sig_y, 0.0) / sig_y
        dgamma = dt / self.eta * over**self.m_exp
        dgamma = jnp.minimum(dgamma, q_tr / (3.0 * mu))  # cap at full relaxation
        n = s_tr / norm_s
        deps_p = jnp.sqrt(3.0 / 2.0) * dgamma * n
        sig = sig_tr - 2.0 * mu * deps_p
        h_new = jnp.concatenate(
            [(eps_p + deps_p).reshape(9), h[9:18], (kappa + dgamma)[None]]
        )
        return sig, h_new
