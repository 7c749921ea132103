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
