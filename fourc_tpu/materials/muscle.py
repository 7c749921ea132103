"""Active skeletal/cardiac muscle materials.

Counterparts of the reference's active-stress muscle family:
- IsoMuscleBlemker (ref: src/mat/elast/4C_mat_elast_isomuscle_blemker.*):
  isochoric Blemker et al. (2005) muscle — along/cross fiber shear
  energies + piecewise passive/active fiber force-length laws, with a
  tanh-type time activation (Mat::Utils::Muscle::
  evaluate_time_dependent_active_stress_tanh,
  ref: src/mat/4C_mat_muscle_utils.cpp:330).
- AnisoActiveStress (ref: src/mat/elast/
  4C_mat_elast_anisoactivestress_evolution.hpp): Bestel-Clement-Sorine
  first-order active-tension evolution tau' = n0 sigma0 |u|+ - tau |u|,
  S_active = tau f0 (x) f0, with a Frank-Starling stretch factor n0.

TPU-native redesign: instead of the reference's hand-coded Voigt
stress/cmat (isomuscle_blemker.cpp:142-230), both materials define a
scalar strain energy / active tension and obtain PK2 + consistent
tangent by AD; the isochoric projection falls out of differentiating
psi(Cbar(C)) exactly.  Time enters through per-GP history (the reference
passes `params["total time"]`; here elapsed time is an internal
variable threaded by the integrator — same convention as
materials/growth.py MuscleActiveStrain).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fourc_tpu.core.functions import SymbolicExpression
from fourc_tpu.materials.base import HistoryMaterial, register_material


def _unit(a):
    a = jnp.asarray(a, jnp.result_type(float))
    return a / jnp.linalg.norm(a)


def _blemker_passive_antideriv(lam, lam_star, P1, P2):
    """Antiderivative of the Blemker normalized passive force f_p(lam)
    (ref: 4C_mat_muscle_utils.cpp evaluate_passive_force_stretch_
    dependency_blemker; lambda_opt = 1):
      f_p = 0                      (lam <= 1)
          = P1 (e^{P2(lam-1)} - 1) (1 < lam < lam*)
          = P3 lam + P4            (lam >= lam*)
    continuous antiderivative with F(1) = 0."""
    P3 = P1 * P2 * jnp.exp(P2 * (lam_star - 1.0))
    P4 = P1 * (jnp.exp(P2 * (lam_star - 1.0)) - 1.0) - P3 * lam_star
    # region 2 antiderivative (clamp the exp argument so the unselected
    # branch can't overflow)
    lam2 = jnp.clip(lam, 1.0, lam_star)
    F2 = P1 * (jnp.exp(P2 * (lam2 - 1.0)) / P2 - lam2) - P1 * (1.0 / P2 - 1.0)
    F2_star = P1 * (jnp.exp(P2 * (lam_star - 1.0)) / P2 - lam_star) - P1 * (
        1.0 / P2 - 1.0)
    C3 = F2_star - (0.5 * P3 * lam_star**2 + P4 * lam_star)
    F3 = 0.5 * P3 * lam**2 + P4 * lam + C3
    return jnp.where(lam <= 1.0, 0.0, jnp.where(lam < lam_star, F2, F3))


def _blemker_active_antideriv(lam, lam_ofl):
    """Antiderivative of the Blemker normalized active force-length
    f_a(r), r = lam/lam_ofl (ref: 4C_mat_muscle_utils.cpp:242):
      f_a = 9 (r - 0.4)^2     (r <= 0.6)
          = 1 - 4 (1 - r)^2   (0.6 < r < 1.4)
          = 9 (r - 1.6)^2     (r >= 1.4)
    continuous in lam."""
    r = lam / lam_ofl
    F1 = 3.0 * lam_ofl * (r - 0.4) ** 3
    F2r = lam_ofl * (r + 4.0 / 3.0 * (1.0 - r) ** 3)
    C2 = 3.0 * lam_ofl * 0.2**3 - lam_ofl * (0.6 + 4.0 / 3.0 * 0.4**3)
    F2 = F2r + C2
    F3r = 3.0 * lam_ofl * (r - 1.6) ** 3
    C3 = (lam_ofl * (1.4 - 4.0 / 3.0 * 0.4**3) + C2) + 3.0 * lam_ofl * 0.2**3
    F3 = F3r + C3
    return jnp.where(r <= 0.6, F1, jnp.where(r < 1.4, F2, F3))


@register_material("muscle_blemker")
class IsoMuscleBlemker(HistoryMaterial):
    """Blemker active muscle (isochoric) + optional Neo-Hooke matrix.

    psi = G1 (I5b/I4b^2 - 1) + G2 acosh^2(H1) + W3(lam)   [+ matrix NH]
    H1 = (I1b I4b - I5b)/(2 lam), lam = sqrt(I4b);
    dW3/dlam = sigma_total(lam)/lam with
    sigma_total = (sigma_max f_p + sigma_max f_t(t) f_a) lam/lam_ofl,
    f_t(t) = alpha tanh(beta (t - t_act_start)) for t >= t_act_start.

    The reference notes the model has no compressive fiber response and
    should be paired with a Neo-Hooke matrix — pass youngs/nue to include
    one here (keeps the material usable standalone in a deck).

    history h = [t_elapsed] per GP.
    """

    kind = "solid_history"
    history_shape = (1,)

    def __init__(self, g1, g2, p1, p2, sigma_max, lambda_ofl, lambda_star,
                 alpha, beta, t_act_start=0.0, youngs=0.0, nue=0.3,
                 density=0.0):
        self.g1, self.g2 = float(g1), float(g2)
        self.p1, self.p2 = float(p1), float(p2)
        self.sigma_max = float(sigma_max)
        self.lambda_ofl = float(lambda_ofl)
        self.lambda_star = float(lambda_star)
        self.alpha, self.beta = float(alpha), float(beta)
        self.t_act_start = float(t_act_start)
        self.youngs, self.nue = float(youngs), float(nue)
        self.density = float(density)
        self.a = (1.0, 0.0, 0.0)  # fiber direction (reference config)

    @classmethod
    def from_deck(cls, params):
        params = dict(params)
        a = params.pop("a", (1.0, 0.0, 0.0))
        m = cls(**params)
        m.a = tuple(float(x) for x in a)
        return m

    def init_history(self, ngp_total):
        return jnp.zeros((ngp_total, 1))

    def _psi(self, C, sigma_max_ft):
        a = _unit(self.a).astype(C.dtype)
        J2 = jnp.linalg.det(C)
        Cb = jnp.sign(J2) * jnp.abs(J2) ** (-1.0 / 3.0) * C
        I1 = jnp.trace(Cb)
        Ca = Cb @ a
        I4 = a @ Ca
        I5 = Ca @ Ca
        lam = jnp.sqrt(jnp.maximum(I4, 1e-12))
        # along-fiber shear W1 and cross-fiber shear W2
        W1 = self.g1 * (I5 / jnp.maximum(I4, 1e-12) ** 2 - 1.0)
        eps = 1e-6 if C.dtype == jnp.float32 else 1e-12
        H1 = jnp.maximum((I1 * I4 - I5) / (2.0 * lam), 1.0 + eps)
        W2 = self.g2 * jnp.arccosh(H1) ** 2
        # fiber force-length energy W3: dW3/dlam = sigma_total/lam
        W3 = (self.sigma_max * _blemker_passive_antideriv(
                  lam, self.lambda_star, self.p1, self.p2)
              + sigma_max_ft * _blemker_active_antideriv(lam, self.lambda_ofl)
              ) / self.lambda_ofl
        psi = W1 + W2 + W3
        if self.youngs:
            mu = self.youngs / (2.0 * (1.0 + self.nue))
            lamc = self.youngs * self.nue / (
                (1.0 + self.nue) * (1.0 - 2.0 * self.nue))
            lnJ = 0.5 * jnp.log(jnp.maximum(J2, 1e-12))
            psi = psi + 0.5 * mu * (jnp.trace(C) - 3.0) - mu * lnJ \
                + 0.5 * lamc * lnJ**2
        return psi

    def evaluate(self, C, h, dt=0.0):
        t = h[0] + dt
        ft = jnp.where(
            t >= self.t_act_start,
            self.alpha * jnp.tanh(self.beta * (t - self.t_act_start)), 0.0)
        sigma_max_ft = self.sigma_max * ft
        S = 2.0 * jax.grad(self._psi)(C, sigma_max_ft)
        return S, jnp.stack([t])


@register_material("anisoactivestress")
class AnisoActiveStress(HistoryMaterial):
    """Active-stress evolution along a fiber (Bestel-Clement-Sorine).

    tau' = n0 sigma0 max(u, 0) - tau |u|,  S_act = tau f0 (x) f0,
    n0 = -(lam - lam_lower)(lam - lam_upper) 4/(lam_lower - lam_upper)^2
    (Frank-Starling flipped parabola, clamped to [0, 1]); u(t) is the
    activation control — a deck expression of t (the reference reads it
    from a FUNCT or an EP field;
    ref: 4C_mat_elast_anisoactivestress_evolution.hpp).

    Passive base: compressible Neo-Hooke (youngs, nue).
    history h = [tau, t] per GP.
    """

    kind = "solid_history"
    history_shape = (2,)

    def __init__(self, youngs, nue, sigma0, u_expr="1", tau0=0.0,
                 lambda_lower=0.0, lambda_upper=0.0, density=0.0):
        self.youngs, self.nue = float(youngs), float(nue)
        self.sigma0 = float(sigma0)
        self.tau0 = float(tau0)
        self.lambda_lower = float(lambda_lower)
        self.lambda_upper = float(lambda_upper)
        self.density = float(density)
        self.u_fn = SymbolicExpression(str(u_expr))
        self.f0 = (1.0, 0.0, 0.0)

    @classmethod
    def from_deck(cls, params):
        params = dict(params)
        f0 = params.pop("f0", (1.0, 0.0, 0.0))
        m = cls(**params)
        m.f0 = tuple(float(x) for x in f0)
        return m

    def init_history(self, ngp_total):
        h = jnp.zeros((ngp_total, 2))
        return h.at[:, 0].set(self.tau0)

    def _psi_passive(self, C):
        mu = self.youngs / (2.0 * (1.0 + self.nue))
        lam = self.youngs * self.nue / (
            (1.0 + self.nue) * (1.0 - 2.0 * self.nue))
        lnJ = 0.5 * jnp.log(jnp.maximum(jnp.linalg.det(C), 1e-12))
        return 0.5 * mu * (jnp.trace(C) - 3.0) - mu * lnJ + 0.5 * lam * lnJ**2

    def evaluate(self, C, h, dt=0.0):
        tau_n, t_n = h[0], h[1]
        t = t_n + dt
        u = self.u_fn(t=t)
        if self.lambda_upper > self.lambda_lower:
            f0 = _unit(self.f0).astype(C.dtype)
            lam = jnp.sqrt(jnp.maximum(f0 @ (C @ f0), 1e-12))
            n0 = jnp.clip(
                -(lam - self.lambda_lower) * (lam - self.lambda_upper)
                * 4.0 / (self.lambda_lower - self.lambda_upper) ** 2, 0.0, 1.0)
        else:
            n0 = 1.0
        # backward-Euler-in-tau (linear ODE: exact given u over the step)
        tau = (tau_n + dt * n0 * self.sigma0 * jnp.maximum(u, 0.0)) / (
            1.0 + dt * jnp.abs(u))
        f0 = _unit(self.f0).astype(C.dtype)
        S = 2.0 * jax.grad(self._psi_passive)(C) + tau * jnp.outer(f0, f0)
        return S, jnp.stack([tau, t])
