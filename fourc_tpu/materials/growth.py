"""Biological materials: mixture rule, volumetric growth, active muscle.

Counterparts of the reference's growth/biology material family
(ref: src/mat — growthremodel_elasthyper 4C_mat_growthremodel_elasthyper.*,
the mixture framework src/mixture (constituents + growth strategies),
muscle_* active materials 4C_mat_muscle_{combo,giantesio,weickenmeier}.*).

All three are pure-function So3Materials on the standard interfaces:
- Mixture: mass-fraction-weighted sum of constituent PK2 stresses (the
  reference's MIXTURE_RULE FullConstrained analog).
- IsotropicGrowth: multiplicative split F = F_e F_g, F_g = theta^(1/3) I,
  with the growth stretch theta as per-GP HISTORY evolved by a
  stress-driven law  theta' = k_g (tr(M_e) - m_target)  (Mandel stress
  trace), explicit in dt — the reference's stress-driven isotropic law.
- MuscleActiveStrain: passive Neo-Hooke + active fiber stress
  S_act(t) m (x) m with a ramp activation; elapsed time tracked as GP
  history (the reference's materials receive total time via the parameter
  interface).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fourc_tpu.materials.base import (HistoryMaterial, Material,
                                      make_material, register_material)


@register_material("mixture")
class Mixture(Material):
    """Mass-fraction mixture of solid constituents.

    Deck: {type: mixture, constituents: [{frac: .., material: {...}}, ...]}.
    """

    kind = "solid"

    def __init__(self, constituents, density=0.0):
        self.parts = []
        for c in constituents:
            m = make_material(dict(c["material"]))
            if getattr(m, "history_shape", ()):
                raise ValueError(
                    "mixture constituents must be history-free materials "
                    f"({type(m).__name__} carries GP history)")
            self.parts.append((float(c["frac"]), m))
        self.density = density or sum(
            fr * float(getattr(m, "density", 0.0) or 0.0)
            for fr, m in self.parts)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)

    def pk2_from_E(self, Egl):
        S = None
        for fr, m in self.parts:
            Si = fr * m.pk2_from_E(Egl)
            S = Si if S is None else S + Si
        return S

    def psi(self, C):
        return sum(fr * m.psi(C) for fr, m in self.parts)


@register_material("growth_iso")
class IsotropicGrowth(HistoryMaterial):
    """Stress-driven isotropic volumetric growth around a Neo-Hooke core.

    history h = [theta] per GP (theta = isotropic growth stretch, init 1).
    """

    kind = "solid_history"
    history_shape = (1,)

    def __init__(self, youngs, nue, k_growth=0.0, m_target=0.0,
                 theta_min=0.5, theta_max=3.0, density=0.0):
        self.elastic = make_material({"type": "neohooke", "youngs": youngs,
                                      "nue": nue})
        self.k_growth = float(k_growth)
        self.m_target = float(m_target)
        self.theta_min = float(theta_min)
        self.theta_max = float(theta_max)
        self.density = float(density)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)

    def init_history(self, ngp_total):
        return jnp.ones((ngp_total, 1))

    def evaluate(self, C, h, dt=0.0):
        """C: (3,3) per GP (vmapped); h = [theta_n]."""
        theta = jnp.clip(h[0], self.theta_min, self.theta_max)
        Ce = theta ** (-2.0 / 3.0) * C
        Ee = 0.5 * (Ce - jnp.eye(3, dtype=C.dtype))
        Se = self.elastic.pk2_from_E(Ee[..., None])[..., 0]
        # total referential PK2: S = J_g F_g^-1 S_e F_g^-T = theta^(1/3) S_e
        S = theta ** (1.0 / 3.0) * Se
        # growth evolution: Mandel trace drives theta toward homeostasis
        trM = jnp.trace(Ce @ Se)
        theta_new = jnp.clip(
            theta + dt * self.k_growth * (trM - self.m_target),
            self.theta_min, self.theta_max)
        return S, jnp.stack([theta_new])


@register_material("growthremodel_cm")
class GrowthRemodelCM(HistoryMaterial):
    """Homogenized constrained-mixture growth & remodeling.

    ref capability: 4C_mat_growthremodel_elasthyper.* /
    4C_mat_constraintmixture.* (Humphrey/Cyron-type G&R): an elastin
    matrix (permanent, deposition-prestretched) plus collagen fiber
    families that continuously turn over — mass production is
    stress-mediated (gain k_sigma around the homeostatic fiber stress
    sigma_h) and deposition at the prestretch G_c makes the tissue REMODEL
    toward tensional homeostasis.  The homogenized form replaces the
    constituent-survival history integrals with two internal variables per
    family: the grown mass fraction rho_i and the inelastic remodeling
    stretch lam_r,i (Cyron et al., the reference's homogenized variant).

    Evolution (backward-difference in dt):
      sigma_i    = rho_i * 2 lam_e^2 psi'(lam_e^2),  lam_e = lam G_c/lam_r
      drho_i/dt  = rho_i k_sig (sigma_i/sigma_h - 1)
      dlam_r/lam_r = k_r (sigma_i/sigma_h - 1) dt   (remodeling toward
                                                     homeostasis)
    history per GP: [rho_1, lam_r_1, rho_2, lam_r_2] -> (4,)
    """

    kind = "solid_history"
    history_shape = (4,)

    def __init__(self, youngs_elastin, nue, k_fiber, sigma_h,
                 k_sigma=1.0, k_remodel=1.0, prestretch=1.1,
                 a1=(1.0, 0.0, 0.0), a2=(0.0, 1.0, 0.0),
                 rho0=0.3, phi_elastin=0.4, density=0.0):
        self.Ee = float(youngs_elastin)
        self.nue = float(nue)
        self.kf = float(k_fiber)  # fiber stiffness: psi = kf/4 (l_e^2-1)^2
        self.sh = float(sigma_h)
        self.ks = float(k_sigma)
        self.kr = float(k_remodel)
        self.G = float(prestretch)
        self.a1 = jnp.asarray(a1, jnp.result_type(float))
        self.a2 = jnp.asarray(a2, jnp.result_type(float))
        self.rho0 = float(rho0)
        self.phi_e = float(phi_elastin)
        self.density = float(density)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)

    def init_history(self, ngp_total):
        h0 = jnp.array([self.rho0, 1.0, self.rho0, 1.0])
        return jnp.tile(h0, (ngp_total, 1)).reshape(ngp_total, 4)

    def _fiber(self, C, a, rho, lam_r):
        a = a / jnp.linalg.norm(a)
        I4 = a @ (C @ a)
        lam = jnp.sqrt(jnp.maximum(I4, 1e-12))
        lam_e = lam * self.G / lam_r
        # fiber strain energy per unit ref volume: kf/4 (lam_e^2 - 1)^2,
        # tension only
        x = jnp.maximum(lam_e**2 - 1.0, 0.0)
        dpsi = 0.5 * self.kf * x  # d psi / d lam_e^2
        # Cauchy-like fiber stress measure sigma = 2 lam_e^2 dpsi
        sigma = 2.0 * lam_e**2 * dpsi
        # PK2 contribution: S = 2 rho dpsi * d(lam_e^2)/dC
        #   lam_e^2 = (G/lam_r)^2 a.C.a
        S = 2.0 * rho * dpsi * (self.G / lam_r) ** 2 * jnp.outer(a, a)
        return S, sigma

    def evaluate(self, C, h, dt=0.0):
        lam_el = self.Ee * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        mu_el = self.Ee / (2 * (1 + self.nue))
        # elastin: compressible neo-Hooke scaled by its mass fraction
        J2 = jnp.linalg.det(C)
        lnJ = 0.5 * jnp.log(jnp.maximum(J2, 1e-12))
        Cinv = jnp.linalg.inv(C)
        S_e = self.phi_e * (mu_el * (jnp.eye(3) - Cinv)
                            + lam_el * lnJ * Cinv)

        rho1, lr1, rho2, lr2 = h[0], h[1], h[2], h[3]

        def fiber_sigma(a, lam_r):
            a = a / jnp.linalg.norm(a)
            lam = jnp.sqrt(jnp.maximum(a @ (C @ a), 1e-12))
            lam_e = lam * self.G / lam_r
            x = jnp.maximum(lam_e**2 - 1.0, 0.0)
            return lam_e**2 * self.kf * x  # = 2 lam_e^2 dpsi

        # stress-mediated turnover.  The remodeling ODE
        # dlam_r/lam_r = k_r (sigma/sigma_h - 1) dt is STIFF (stiff fibers
        # make dsigma/dlam_r huge), so backward Euler in z = ln lam_r with
        # unrolled Newton — explicit updates limit-cycle around the
        # homeostatic point
        def evolve(rho, lr, a):
            z_n = jnp.log(lr)
            z = z_n
            for _ in range(8):
                sig = fiber_sigma(a, jnp.exp(z))
                g = z - z_n - dt * self.kr * (sig / self.sh - 1.0)
                dsig = jax.grad(lambda zz: fiber_sigma(a, jnp.exp(zz)))(z)
                dg = 1.0 - dt * self.kr * dsig / self.sh
                z = z - g / jnp.where(jnp.abs(dg) < 1e-12, 1e-12, dg)
                z = jnp.clip(z, jnp.log(0.2), jnp.log(5.0))
            lr_n = jnp.exp(z)
            sig_n = fiber_sigma(a, lr_n)
            dev = jnp.clip(sig_n / self.sh - 1.0, -2.0, 2.0)
            rho_n = jnp.clip(rho * (1.0 + dt * self.ks * dev), 1e-4, 10.0)
            return rho_n, lr_n

        rho1n, lr1n = evolve(rho1, lr1, self.a1)
        rho2n, lr2n = evolve(rho2, lr2, self.a2)
        # stress at the UPDATED internal state (implicit coupling)
        S1, _ = self._fiber(C, self.a1, rho1n, lr1n)
        S2, _ = self._fiber(C, self.a2, rho2n, lr2n)
        h_new = jnp.stack([rho1n, lr1n, rho2n, lr2n])
        return S_e + S1 + S2, h_new


@register_material("muscle_active")
class MuscleActiveStrain(HistoryMaterial):
    """Neo-Hooke passive + ramped active fiber stress.

    history h = [t_elapsed]; active PK2 = smax * min(t/tau, 1) m (x) m.
    """

    kind = "solid_history"
    history_shape = (1,)

    def __init__(self, youngs, nue, smax, tau=1.0, fiber=(1.0, 0.0, 0.0),
                 density=0.0):
        self.elastic = make_material({"type": "neohooke", "youngs": youngs,
                                      "nue": nue})
        self.smax = float(smax)
        self.tau = float(tau)
        f = jnp.asarray(fiber, jnp.float64)
        self.fiber = f / jnp.linalg.norm(f)
        self.density = float(density)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)

    def evaluate(self, C, h, dt=0.0):
        t = h[0] + dt
        Egl = 0.5 * (C - jnp.eye(3, dtype=C.dtype))
        Sp = self.elastic.pk2_from_E(Egl[..., None])[..., 0]
        m = self.fiber.astype(C.dtype)
        act = self.smax * jnp.minimum(t / self.tau, 1.0)
        S = Sp + act * jnp.outer(m, m)  # tensile active stress -> contraction
        return S, jnp.stack([t])
