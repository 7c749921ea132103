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


def _sqrtm_db(C, iters=7):
    """Denman-Beavers square root (AD-smooth at repeated eigenvalues)."""
    tr = jnp.trace(C) / 3.0
    Y = C / tr
    Z = jnp.eye(3, dtype=C.dtype)
    for _ in range(iters):
        Yn = 0.5 * (Y + jnp.linalg.inv(Z))
        Z = 0.5 * (Z + jnp.linalg.inv(Y))
        Y = Yn
    return Y * jnp.sqrt(tr)


def _logm_spd(C, roots=3, terms=10):
    """Matrix logarithm of an SPD 3x3 via inverse scaling-and-squaring:
    repeated smooth square roots bring C near I, then a log(1+x) series.
    Every operation is AD-smooth (no eigendecomposition)."""
    A = C
    for _ in range(roots):
        A = _sqrtm_db(A)
    X = A - jnp.eye(3, dtype=C.dtype)
    out = jnp.zeros_like(C)
    P = X
    for k in range(1, terms + 1):
        out = out + ((-1.0) ** (k + 1) / k) * P
        P = P @ X
    return out * (2.0 ** roots)


@register_material("plasticnlnlogneohooke")
class PlasticLogFiniteStrain(HistoryMaterial):
    """Finite-strain J2 plasticity in logarithmic strain space.

    Counterpart of the reference's plasticnlnlogneohooke
    (ref: src/mat/4C_mat_plasticnlnlogneohooke.* — Hencky hyperelasticity
    in principal logarithmic strains + von Mises radial return, exact
    exponential plastic update): the total material log strain
    eps = 1/2 log(C) splits additively into elastic + plastic parts; the
    return mapping is the standard small-strain J2 algorithm in that space
    (linear isotropic hardening), which IS the exponential-map-exact
    finite-strain algorithm.  TPU-native: the matrix log uses smooth
    Denman-Beavers roots + a series (AD-safe at repeated stretches, unlike
    eigh), and the consistent tangent is jvp through the whole update.

    history per GP: [eps_p (6 sym comps), alpha] = 7.
    """

    kind = "solid_history"
    history_shape = (7,)

    def __init__(self, youngs, nue, yield_stress, isohard=0.0, density=0.0):
        self.youngs = float(youngs)
        self.nue = float(nue)
        self.sy = float(yield_stress)
        self.H = float(isohard)
        self.density = float(density)
        self.G = self.youngs / (2 * (1 + self.nue))
        self.K = self.youngs / (3 * (1 - 2 * self.nue))

    @classmethod
    def from_deck(cls, params):
        return cls(**params)

    @staticmethod
    def _unpack(h):
        e = h[:6]
        eps_p = jnp.array([[e[0], e[3], e[5]],
                           [e[3], e[1], e[4]],
                           [e[5], e[4], e[2]]])
        return eps_p, h[6]

    @staticmethod
    def _pack(eps_p, alpha):
        return jnp.array([eps_p[0, 0], eps_p[1, 1], eps_p[2, 2],
                          eps_p[0, 1], eps_p[1, 2], eps_p[0, 2], alpha])

    def evaluate(self, C, h):
        G, K = self.G, self.K
        eps = 0.5 * _logm_spd(C)
        eps_p, alpha = self._unpack(h)
        ee_tr = eps - eps_p
        tr_e = jnp.trace(ee_tr)
        dev_tr = ee_tr - tr_e / 3.0 * jnp.eye(3, dtype=C.dtype)
        s_tr = 2.0 * G * dev_tr
        snorm = jnp.sqrt(jnp.sum(s_tr * s_tr) + 1e-30)
        q_tr = jnp.sqrt(1.5) * snorm
        f = q_tr - (self.sy + self.H * alpha)
        dgam = jnp.maximum(f, 0.0) / (3.0 * G + self.H)
        nhat = s_tr / snorm
        # radial return in log space
        ee = ee_tr - dgam * jnp.sqrt(1.5) * nhat
        tau = K * tr_e * jnp.eye(3, dtype=C.dtype) + 2.0 * G * (
            ee - jnp.trace(ee) / 3.0 * jnp.eye(3, dtype=C.dtype))
        # material Kirchhoff (coaxial with C) -> PK2: S = C^-1 tau
        Cinv = jnp.linalg.inv(C)
        S = 0.5 * (Cinv @ tau + tau @ Cinv)
        eps_p_new = eps - ee
        return S, self._pack(eps_p_new, alpha + dgam)
