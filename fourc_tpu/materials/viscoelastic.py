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


@register_material("viscoelasthyper")
class ViscoElastHyper(HistoryMaterial):
    """Finite-strain linear viscoelasticity around a hyperelastic core.

    Counterpart of the reference's viscoelasthyper
    (ref: src/mat/4C_mat_viscoelasthyper.* — hyperelastic summands plus
    generalized-Maxwell overstress branches on PK2, Simo's finite linear
    viscoelasticity with the exponential-integrator recurrence):

      S = S_eq(E) + sum_k Q_k,
      Q_k^{n+1} = e^{-dt/tau_k} Q_k^n
                + beta_k e^{-dt/(2 tau_k)} (S_eq^{n+1} - S_eq^n)

    history per GP: [Q_k (6 each), S_eq_prev (6)].
    """

    kind = "solid_history"

    def __init__(self, material, taus, betas, density=0.0):
        from fourc_tpu.materials import make_material as _mk

        self.base = _mk(dict(material))
        self.taus = [float(t) for t in (taus if isinstance(taus, (list, tuple)) else [taus])]
        self.betas = [float(b) for b in (betas if isinstance(betas, (list, tuple)) else [betas])]
        assert len(self.taus) == len(self.betas)
        self.nb = len(self.taus)
        self.history_shape = (6 * self.nb + 6,)
        self.density = float(density or getattr(self.base, "density", 0.0))
        for attr in ("youngs", "nue"):
            if hasattr(self.base, attr):
                setattr(self, attr, getattr(self.base, attr))

    @classmethod
    def from_deck(cls, params):
        return cls(**params)

    @staticmethod
    def _unvoigt(v):
        return jnp.array([[v[0], v[3], v[5]],
                          [v[3], v[1], v[4]],
                          [v[5], v[4], v[2]]])

    @staticmethod
    def _voigt(S):
        return jnp.array([S[0, 0], S[1, 1], S[2, 2], S[0, 1], S[1, 2],
                          S[0, 2]])

    def evaluate(self, C, h, dt=0.0):
        E = 0.5 * (C - jnp.eye(3, dtype=C.dtype))
        Seq = self.base.pk2_from_E(E[..., None])[..., 0]
        Seq_v = self._voigt(Seq)
        Sold_v = h[6 * self.nb:]
        S = Seq
        h_new = []
        for k in range(self.nb):
            Qk = h[6 * k:6 * k + 6]
            ek = jnp.exp(-dt / self.taus[k]) if dt else 1.0
            eh = jnp.exp(-dt / (2 * self.taus[k])) if dt else 1.0
            Qk_new = ek * Qk + self.betas[k] * eh * (Seq_v - Sold_v)
            S = S + self._unvoigt(Qk_new)
            h_new.append(Qk_new)
        h_new.append(Seq_v)
        return S, jnp.concatenate(h_new)
