"""Viscoelastic materials (generalized Maxwell / SLS).

ref capability: src/mat visconeohooke / viscoelasthyper (viscous overstress
branches evolved by convolution integrals).  Implemented: small-strain
standard linear solid with one Maxwell branch, exact exponential time
integration of the internal stress (recurrence update), history = internal
deviatoric overstress per GP.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from fourc_tpu.materials.base import HistoryMaterial, register_material

_I3 = jnp.eye(3)


@register_material("visconeohooke")
@dataclass
class ViscoSLS(HistoryMaterial):
    """sigma = sigma_eq(eps) + q;  tau qdot + q = 2 mu_v deps_dev/dt.

    history per GP: [q (9), eps_dev_old (9)] -> (18,)
    """

    kind = "solid_small_history"
    youngs: float
    nue: float
    mu_v: float  # viscous branch shear modulus
    tau: float  # relaxation time
    density: float = 0.0
    history_shape = (18,)

    def evaluate_small(self, eps, h, dt=1.0):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        mu = self.youngs / (2 * (1 + self.nue))
        q_old = h[:9].reshape(3, 3)
        e_old = h[9:18].reshape(3, 3)
        e_dev = eps - jnp.trace(eps) / 3.0 * _I3
        # exponential (exact) recurrence for the Maxwell branch
        expf = jnp.exp(-dt / self.tau)
        hfac = self.tau / dt * (1.0 - expf)
        q_new = expf * q_old + 2.0 * self.mu_v * hfac * (e_dev - e_old)
        sig = lam * jnp.trace(eps) * _I3 + 2.0 * mu * eps + q_new
        h_new = jnp.concatenate([q_new.reshape(9), e_dev.reshape(9)])
        return sig, h_new
