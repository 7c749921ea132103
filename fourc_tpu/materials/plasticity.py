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

import jax
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


@register_material("plasticdruckerprager")
@dataclass
class PlasticDruckerPrager(HistoryMaterial):
    """Small-strain Drucker-Prager plasticity with cone + apex return.

    ref: src/mat/4C_mat_plastic_drucker_prager.* (the reference's
    pressure-sensitive law).  Yield f = sqrt(J2) + eta*p - xi*c(kappa),
    flow potential g = sqrt(J2) + etabar*p (etabar=eta -> associative),
    linear cohesion hardening c = c0 + H*kappa.  Return mapping follows
    de Souza Neto's two-branch scheme (smooth cone return; apex return
    when the cone update would cross sqrt(J2) < 0), fully branch-free so
    it vmaps over Gauss points and the consistent tangent is AD.

    history per GP: [eps_p (9), kappa] -> (10,)
    """

    kind = "solid_small_history"
    youngs: float
    nue: float
    cohesion: float
    eta: float = 0.5  # pressure (friction) coefficient
    etabar: float = None  # dilatancy coefficient (default: = eta)
    xi: float = 1.0  # cohesion coefficient
    isohard: float = 0.0  # H (linear cohesion hardening)
    density: float = 0.0
    history_shape = (10,)

    def evaluate_small(self, eps, h):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        G = self.youngs / (2 * (1 + self.nue))
        K = lam + 2.0 * G / 3.0
        eta = self.eta
        etab = self.eta if self.etabar is None else self.etabar
        xi, H = self.xi, self.isohard

        eps_p = h[:9].reshape(3, 3)
        kappa = h[9]
        eps_e = eps - eps_p
        sig_tr = lam * jnp.trace(eps_e) * _I3 + 2.0 * G * eps_e
        p_tr = jnp.trace(sig_tr) / 3.0
        s_tr = sig_tr - p_tr * _I3
        # double-where sqrt guard: keeps SECOND-order AD (assembled-tangent
        # jacfwd) finite at s = 0, where d2 sqrt blows up
        ss = 0.5 * jnp.sum(s_tr * s_tr)
        nz = ss > 1e-24
        sqJ2_tr = jnp.where(nz, jnp.sqrt(jnp.where(nz, ss, 1.0)), 0.0)
        sqJ2_safe = jnp.where(nz, sqJ2_tr, 1.0)

        c_n = self.cohesion + H * kappa
        f_tr = sqJ2_tr + eta * p_tr - xi * c_n

        # cone (smooth wall) return
        dgam = jnp.maximum(f_tr, 0.0) / (G + K * eta * etab + xi**2 * H)
        sqJ2_c = sqJ2_tr - G * dgam
        apex = jnp.logical_and(f_tr > 0.0, sqJ2_c < 0.0)

        # apex return: s = 0, solve eta*(p_tr - K*x) = xi*c(kappa + xi/etab*x)
        x_apex = (eta * p_tr - xi * c_n) / (eta * K + xi**2 * H
                                            / jnp.maximum(etab, 1e-30))
        x_apex = jnp.maximum(x_apex, 0.0)

        plastic = f_tr > 0.0
        scale_s = jnp.where(apex, 0.0,
                            jnp.where(plastic, sqJ2_c / sqJ2_safe, 1.0))
        s_new = s_tr * scale_s
        p_new = jnp.where(apex, p_tr - K * x_apex,
                          jnp.where(plastic, p_tr - K * etab * dgam, p_tr))
        dk = jnp.where(apex, xi / jnp.maximum(etab, 1e-30) * x_apex,
                       jnp.where(plastic, xi * dgam, 0.0))
        sig = s_new + p_new * _I3
        # plastic strain from the elastic relation
        eps_e_new = (sig - p_new * _I3) / (2.0 * G) + p_new / (3.0 * K) * _I3
        eps_p_new = eps - eps_e_new
        return sig, jnp.concatenate([eps_p_new.reshape(9), (kappa + dk)[None]])


@register_material("plasticlemaitre")
@dataclass
class PlasticLemaitre(HistoryMaterial):
    """Small-strain J2 plasticity coupled to Lemaitre isotropic ductile
    damage (effective-stress formulation).

    ref capability: src/mat damage family (4C_mat_damage.* — Lemaitre-type
    isotropic damage with simplified coupling).  Return map runs in the
    effective space sig/(1-D); damage grows as
    dD = (Y/S0)^s_exp * dgamma / (1-D), Y = elastic energy release rate.

    history per GP: [eps_p (9), kappa, D] -> (11,)
    """

    kind = "solid_small_history"
    youngs: float
    nue: float
    yield_stress: float
    isohard: float = 0.0
    s0: float = 1.0  # damage energy denominator S
    s_exp: float = 1.0  # damage exponent
    d_crit: float = 0.99  # rupture cap
    density: float = 0.0
    history_shape = (11,)

    def evaluate_small(self, eps, h):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        G = self.youngs / (2 * (1 + self.nue))
        eps_p = h[:9].reshape(3, 3)
        kappa = h[9]
        D = h[10]
        omd = jnp.maximum(1.0 - D, 1.0 - self.d_crit)

        eps_e = eps - eps_p
        sig_eff_tr = lam * jnp.trace(eps_e) * _I3 + 2.0 * G * eps_e
        s_tr = sig_eff_tr - jnp.trace(sig_eff_tr) / 3.0 * _I3
        ss = jnp.sum(s_tr * s_tr)
        nz = ss > 1e-24
        norm_s = jnp.where(nz, jnp.sqrt(jnp.where(nz, ss, 1.0)), 1e-15)
        q_tr = jnp.sqrt(1.5) * norm_s
        sig_y = self.yield_stress + self.isohard * kappa
        f_tr = q_tr - sig_y

        dgam = jnp.maximum(f_tr, 0.0) / (3.0 * G + self.isohard)
        n = s_tr / norm_s
        deps_p = jnp.sqrt(1.5) * dgam * n
        eps_p_new = eps_p + deps_p
        sig_eff = sig_eff_tr - 2.0 * G * deps_p

        # energy release rate Y = sig_eff : eps_e_new / 2 (effective space)
        eps_e_new = eps_e - deps_p
        Y = 0.5 * jnp.sum(sig_eff * eps_e_new)
        dD = (jnp.maximum(Y, 0.0) / self.s0) ** self.s_exp * dgam / omd
        D_new = jnp.minimum(D + dD, self.d_crit)

        sig = (1.0 - D_new) * sig_eff  # nominal stress
        return sig, jnp.concatenate(
            [eps_p_new.reshape(9), (kappa + dgam)[None], D_new[None]])


@register_material("plasticgtn")
@dataclass
class PlasticGTN(HistoryMaterial):
    """Gurson-Tvergaard-Needleman porous plasticity (small strain).

    ref capability: the reference's GTN-type porous metal plasticity.
    Yield Phi = (q/sy)^2 + 2 q1 f* cosh(1.5 q2 p / sy) - 1 - q3 f*^2.
    Return map solves for (deq, dep) — deviatoric and volumetric plastic
    increments — with a fixed unrolled Newton (8 its, branch-free), then
    updates void fraction by growth + strain-controlled nucleation.

    history per GP: [eps_p (9), ebar (matrix plastic strain), fvoid] -> (11,)
    """

    kind = "solid_small_history"
    youngs: float
    nue: float
    yield_stress: float
    isohard: float = 0.0
    q1: float = 1.5
    q2: float = 1.0
    q3: float = 2.25
    f0: float = 0.0  # initial void fraction
    fn: float = 0.0  # nucleation volume fraction
    en: float = 0.3  # nucleation mean strain
    sn: float = 0.1  # nucleation std
    fc: float = 0.15  # coalescence onset
    ff: float = 0.25  # failure void fraction
    density: float = 0.0
    history_shape = (11,)

    def _fstar(self, f):
        # Tvergaard-Needleman coalescence acceleration
        fu = 1.0 / self.q1
        k = (fu - self.fc) / jnp.maximum(self.ff - self.fc, 1e-12)
        return jnp.where(f > self.fc, self.fc + k * (f - self.fc), f)

    def evaluate_small(self, eps, h):
        lam = self.youngs * self.nue / ((1 + self.nue) * (1 - 2 * self.nue))
        G = self.youngs / (2 * (1 + self.nue))
        K = lam + 2.0 * G / 3.0
        eps_p = h[:9].reshape(3, 3)
        ebar = h[9]
        f = jnp.where(h[10] == 0.0, self.f0, h[10])  # lazily seeded f0

        eps_e = eps - eps_p
        sig_tr = lam * jnp.trace(eps_e) * _I3 + 2.0 * G * eps_e
        p_tr = jnp.trace(sig_tr) / 3.0
        s_tr = sig_tr - p_tr * _I3
        ss = 1.5 * jnp.sum(s_tr * s_tr)
        nzq = ss > 1e-24
        q_tr = jnp.where(nzq, jnp.sqrt(jnp.where(nzq, ss, 1.0)), 1e-15)
        fs = self._fstar(f)

        def sy(e):
            return self.yield_stress + self.isohard * e

        def phi(q, p, e, fstar):
            y = sy(e)
            arg = jnp.clip(1.5 * self.q2 * p / y, -50.0, 50.0)
            return (q / y) ** 2 + 2.0 * self.q1 * fstar * jnp.cosh(
                arg) - 1.0 - self.q3 * fstar**2

        yielding = phi(q_tr, p_tr, ebar, fs) > 0.0

        # unknowns: deq (deviatoric), dep (volumetric) plastic increments.
        # Unrolled Newton with hard iterate clamps: the loop body always
        # executes (branch-free vmap), so at non-yielding GPs the iterates
        # must stay bounded or their NaNs poison the where() mask later.
        deq_cap = q_tr / (3.0 * G)  # full deviatoric relaxation
        dep_cap = (jnp.abs(p_tr) + self.yield_stress) / K
        deq = jnp.asarray(0.0, eps.dtype)
        dep = jnp.asarray(0.0, eps.dtype)
        for _ in range(8):
            q = q_tr - 3.0 * G * deq
            p = p_tr - K * dep
            e = ebar + deq  # matrix strain driven by deviatoric flow
            y = sy(e)
            arg = jnp.clip(1.5 * self.q2 * p / y, -50.0, 50.0)
            # residuals: yield condition + flow-direction consistency
            # dep/deq = dPhi/dp / dPhi/dq (normality)
            dphi_dq = 2.0 * q / y**2
            dphi_dp = 3.0 * self.q1 * self.q2 * fs / y * jnp.sinh(arg)
            r1 = phi(q, p, e, fs)
            r2 = dep * dphi_dq - deq * dphi_dp
            # Newton on (deq, dep) with hand-derived 2x2 jacobian (the
            # hardening term is dropped — picked up by the outer iteration)
            a11 = -3.0 * G * dphi_dq  # dr1/ddeq
            a12 = -K * dphi_dp  # dr1/ddep
            a21 = (-dphi_dp + dep * (-3.0 * G) * 2.0 / y**2)
            a22 = (dphi_dq + deq * K * 3.0 * self.q1 * self.q2 * fs / y
                   * jnp.cosh(arg) * 1.5 * self.q2 / y)
            det = a11 * a22 - a12 * a21
            det = jnp.where(jnp.abs(det) < 1e-20, -1e-20, det)
            ddeq = (-r1 * a22 + r2 * a12) / det
            ddep = (-a11 * r2 + a21 * r1) / det
            deq = jnp.clip(deq + ddeq, 0.0, deq_cap)
            dep = jnp.clip(dep + ddep, -dep_cap, dep_cap)

        deq = jnp.where(yielding, deq, 0.0)
        dep = jnp.where(yielding, dep, 0.0)
        q = q_tr - 3.0 * G * deq
        nhat = s_tr / jnp.where(nzq, jnp.sqrt(jnp.where(
            nzq, jnp.sum(s_tr * s_tr), 1.0)), 1.0)
        deps_p = jnp.sqrt(1.5) * deq * nhat + dep / 3.0 * _I3
        eps_p_new = eps_p + deps_p
        sig = sig_tr - (2.0 * G * jnp.sqrt(1.5) * deq * nhat + K * dep * _I3)

        # void evolution: growth + strain-controlled nucleation (Chu-Needleman)
        ebar_new = ebar + deq
        A = self.fn / (self.sn * jnp.sqrt(2.0 * jnp.pi)) * jnp.exp(
            -0.5 * ((ebar_new - self.en) / self.sn) ** 2)
        f_new = f + (1.0 - f) * dep + A * deq
        f_new = jnp.clip(f_new, 0.0, 0.999 / self.q1)
        return sig, jnp.concatenate(
            [eps_p_new.reshape(9), ebar_new[None], f_new[None]])


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


# FCC slip systems: {111} planes, <110> directions (normalized below)
_FCC_N = [(1, 1, 1)] * 3 + [(-1, 1, 1)] * 3 + [(1, -1, 1)] * 3 + [(1, 1, -1)] * 3
_FCC_S = [(0, 1, -1), (1, 0, -1), (1, -1, 0),
          (0, 1, -1), (1, 0, 1), (1, 1, 0),
          (0, 1, 1), (1, 0, -1), (1, 1, 0),
          (0, 1, 1), (1, 0, 1), (1, -1, 0)]


@register_material("crystal_plasticity")
class CrystalPlasticity(HistoryMaterial):
    """Rate-dependent finite-strain crystal plasticity.

    Counterpart of the reference's crystal plasticity material
    (ref: src/mat/4C_mat_crystal_plasticity.* — multiplicative F = Fe Fp,
    per-slip-system power-law visco-plastic flow, work hardening).

    TPU-native formulation: everything runs from C = F^T F only (the
    element kernels never materialize F for history materials):
    Ce = Fp^-T C Fp^-1, SVK elasticity on Ee in the intermediate
    configuration, resolved shears tau_a = (Ce Se) : (s_a (x) n_a),
    power-law slip rates gdot_a = gdot0 |tau/g|^(1/m) sgn(tau), Voce
    hardening g' = h0 (1 - g/g_sat) sum|gdot|.  The plastic update is the
    3rd-order exponential map applied over ``nsub`` explicit substeps —
    rate-dependent flow is an ODE, not a complementarity problem, so no
    inner Newton is needed and the whole update is jvp-differentiable.

    Slip systems: ``systems="fcc"`` (12 octahedral systems) or an explicit
    list of (s, n) direction/normal pairs (crystal axes = reference axes;
    pre-rotate s/n to orient the crystal).

    history per GP: [Fp (9 row-major), g] -> (10,)
    """

    kind = "solid_history"
    history_shape = (10,)

    def __init__(self, youngs, nue, g0, gdot0=1e-3, rate_m=0.05,
                 h0=0.0, g_sat=None, systems="fcc", nsub=10, density=0.0,
                 dgam_max=0.02):
        import numpy as _np

        self.youngs = float(youngs)
        self.nue = float(nue)
        self.lam = youngs * nue / ((1 + nue) * (1 - 2 * nue))
        self.mu = youngs / (2 * (1 + nue))
        self.g0 = float(g0)
        self.gdot0 = float(gdot0)
        self.inv_m = 1.0 / float(rate_m)
        self.h0 = float(h0)
        self.g_sat = float(g_sat) if g_sat is not None else 10.0 * float(g0)
        self.nsub = int(nsub)
        self.density = float(density)
        # per-substep slip cap: keeps the explicit update bounded when the
        # trial stress sits far above the flow surface (x^(1/m) explodes);
        # the capped substeps relax the state onto the surface instead
        self.dgam_max = float(dgam_max)
        if systems == "fcc":
            pairs = list(zip(_FCC_S, _FCC_N))
        else:
            pairs = [tuple(p) for p in systems]
        s = _np.asarray([p[0] for p in pairs], float)
        n = _np.asarray([p[1] for p in pairs], float)
        s /= _np.linalg.norm(s, axis=1, keepdims=True)
        n /= _np.linalg.norm(n, axis=1, keepdims=True)
        assert _np.abs((s * n).sum(1)).max() < 1e-12, "s must lie in plane n"
        self.P = jnp.asarray(s[:, :, None] * n[:, None, :])  # (nsys, 3, 3)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)

    def init_history(self, ngp_total: int):
        h0 = jnp.concatenate([jnp.eye(3).reshape(9), jnp.array([self.g0])])
        return jnp.tile(h0[None], (ngp_total, 1))

    @staticmethod
    def _expm3(A):
        """3rd-order series exponential (|A| is O(gdot dt / nsub))."""
        A2 = A @ A
        return (jnp.eye(3, dtype=A.dtype) + A + 0.5 * A2 + A2 @ A / 6.0)

    def evaluate(self, C, h, dt=1.0):
        eye = jnp.eye(3, dtype=C.dtype)
        Fp = jnp.where(jnp.abs(h[:9]).sum() > 1e-12, h[:9], eye.reshape(9))
        Fp = Fp.reshape(3, 3).astype(C.dtype)
        g = jnp.maximum(h[9], 1e-3 * self.g0).astype(C.dtype)
        P = self.P.astype(C.dtype)
        dts = jnp.asarray(dt / self.nsub, C.dtype)

        cap = self.dgam_max / dts

        def rates(Fp, g):
            Fpi = jnp.linalg.inv(Fp)
            Ce = Fpi.T @ C @ Fpi
            Ee = 0.5 * (Ce - eye)
            Se = self.lam * jnp.trace(Ee) * eye + 2.0 * self.mu * Ee
            M = Ce @ Se  # Mandel stress of the intermediate configuration
            tau = jnp.einsum("ij,aij->a", M, P)
            x = jnp.abs(tau) / g
            # NaN-safe power (float exponent at x=0 has a log(0) gradient)
            xs = jnp.where(x > 0, x, 1.0)
            mag = jnp.where(x > 0, xs ** self.inv_m, 0.0)
            gdot = jnp.clip(self.gdot0 * mag, 0.0, cap) * jnp.sign(tau)
            return gdot

        def sub(carry, _):
            Fp, g = carry
            gd1 = rates(Fp, g)  # Heun (RK2): midpoint-averaged slip rates
            Lp1 = jnp.einsum("a,aij->ij", gd1, P)
            Fp1 = self._expm3(dts * Lp1) @ Fp
            g1 = g + dts * self.h0 * (1.0 - g / self.g_sat) * jnp.sum(
                jnp.abs(gd1))
            gd2 = rates(Fp1, g1)
            gdm = 0.5 * (gd1 + gd2)
            Lp = jnp.einsum("a,aij->ij", gdm, P)
            Fp_new = self._expm3(dts * Lp) @ Fp
            g_new = g + dts * self.h0 * (1.0 - g / self.g_sat) * jnp.sum(
                jnp.abs(gdm))
            return (Fp_new, g_new), None

        (Fp, g), _ = jax.lax.scan(sub, (Fp, g), None, length=self.nsub)
        Fpi = jnp.linalg.inv(Fp)
        Ce = Fpi.T @ C @ Fpi
        Ee = 0.5 * (Ce - eye)
        Se = self.lam * jnp.trace(Ee) * eye + 2.0 * self.mu * Ee
        S = Fpi @ Se @ Fpi.T  # pull back to the reference configuration
        return S, jnp.concatenate([Fp.reshape(9), g[None]])


@register_material("thermoplastic_j2")
@dataclass
class ThermoPlasticJ2(HistoryMaterial):
    """Small-strain J2 plasticity with thermal softening + thermal
    eigenstrain.

    Counterpart of the reference's thermo-plastic family
    (ref: src/mat/4C_mat_thermoplastichyperelast.* — temperature-
    dependent yield stress sigma_y(T) = sigma_y0 (1 - omega_T (T - T0));
    4C_mat_thermostvenantkirchhoff.* thermal expansion): the return map
    runs on the THERMAL-strain-free elastic strain and the flow stress
    softens linearly in temperature.  Used by TSI with per-GP
    temperatures (needs_temp routes T into the element kernel).

    history per GP: [eps_p (9), alpha] -> (10,)
    """

    kind = "solid_small_history"
    needs_temp = True
    youngs: float
    nue: float
    yield_stress: float
    isohard: float = 0.0
    omega_t: float = 0.0  # thermal softening d(sy)/dT / sy0
    alpha_t: float = 0.0  # thermal expansion coefficient
    t_ref: float = 0.0
    density: float = 0.0
    history_shape = (10,)

    def __post_init__(self):
        self.G = self.youngs / (2 * (1 + self.nue))
        self.K = self.youngs / (3 * (1 - 2 * self.nue))

    def evaluate_small(self, eps, h, T=None):
        eye = jnp.eye(3, dtype=eps.dtype)
        dT = (0.0 if T is None else T - self.t_ref)
        eps_mech = eps - self.alpha_t * dT * eye
        eps_p = h[:9].reshape(3, 3)
        alpha = h[9]
        ee = eps_mech - eps_p
        tr_e = jnp.trace(ee)
        dev = ee - tr_e / 3.0 * eye
        s_tr = 2.0 * self.G * dev
        snorm = jnp.sqrt(jnp.sum(s_tr * s_tr) + 1e-30)
        q_tr = jnp.sqrt(1.5) * snorm
        sy = jnp.maximum(
            self.yield_stress * (1.0 - self.omega_t * dT)
            + self.isohard * alpha, 1e-8 * self.yield_stress)
        fy = q_tr - sy
        dgam = jnp.maximum(fy, 0.0) / (3.0 * self.G + self.isohard)
        nhat = s_tr / snorm
        s_new = s_tr - 2.0 * self.G * dgam * jnp.sqrt(1.5) * nhat
        sig = self.K * tr_e * eye + s_new
        eps_p_new = eps_p + dgam * jnp.sqrt(1.5) * nhat
        return sig, jnp.concatenate([eps_p_new.reshape(9),
                                     (alpha + dgam)[None]])


@register_material("superelastic_sma")
@dataclass
class SuperelasticSMA(HistoryMaterial):
    """Small-strain superelastic shape-memory alloy (flag-shaped
    hysteresis).

    Counterpart of the reference's SMA material
    (ref: src/mat/4C_mat_superelastic_sma.* — Auricchio/Taylor
    austenite<->single-variant-martensite model with linear
    transformation kinetics).  Implemented as a branch-free incremental
    return map on the martensite fraction xi in [0, 1]:

      forward  (A->S):  active when  q > s_as_s + h_as * xi
      reverse  (S->A):  active when  q < s_sa_f + h_sa * xi

    with plateau moduli h_as = s_as_f - s_as_s, h_sa = s_sa_s - s_sa_f and
    deviatoric transformation strain eps_t = sqrt(3/2) * eps_l * xi * n.
    Both corrections are jnp.where-gated, so the model jits/vmaps over all
    Gauss points; the consistent tangent is AD through the map.

    history per GP: [eps_t (9), xi (1)] -> (10,)
    """

    kind = "solid_small_history"
    youngs: float
    nue: float
    eps_l: float            # maximum transformation strain
    s_as_s: float           # forward (austenite->martensite) start stress
    s_as_f: float           # forward finish stress
    s_sa_s: float           # reverse start stress (upper, at xi=1)
    s_sa_f: float           # reverse finish stress (lower, at xi=0)
    density: float = 0.0
    history_shape = (10,)

    def __post_init__(self):
        self.G = self.youngs / (2 * (1 + self.nue))
        self.K = self.youngs / (3 * (1 - 2 * self.nue))

    def evaluate_small(self, eps, h):
        eye = jnp.eye(3, dtype=eps.dtype)
        eps_t = h[:9].reshape(3, 3)
        xi = h[9]
        ee = eps - eps_t
        tr_e = jnp.trace(ee)
        s_tr = 2.0 * self.G * (ee - tr_e / 3.0 * eye)
        snorm = jnp.sqrt(jnp.sum(s_tr * s_tr) + 1e-30)
        q_tr = jnp.sqrt(1.5) * snorm
        nhat = s_tr / snorm
        c = 3.0 * self.G * self.eps_l  # stress drop per unit dxi

        h_as = self.s_as_f - self.s_as_s
        h_sa = self.s_sa_s - self.s_sa_f
        # forward transformation: drive q down onto the loading plateau
        f_as = q_tr - (self.s_as_s + h_as * xi)
        dxi_f = jnp.clip(jnp.maximum(f_as, 0.0) / (c + h_as), 0.0, 1.0 - xi)
        # reverse transformation: drive q up onto the unloading plateau
        f_sa = (self.s_sa_f + h_sa * xi) - q_tr
        dxi_r = jnp.clip(jnp.maximum(f_sa, 0.0) / (c + h_sa), 0.0, xi)

        dxi = dxi_f - dxi_r
        xi_new = xi + dxi
        deps_t = jnp.sqrt(1.5) * self.eps_l * dxi * nhat
        s_new = s_tr - 2.0 * self.G * jnp.sqrt(1.5) * self.eps_l * dxi * nhat
        sig = self.K * tr_e * eye + s_new
        return sig, jnp.concatenate([(eps_t + deps_t).reshape(9),
                                     xi_new[None]])


@register_material("robinson")
@dataclass
class Robinson(HistoryMaterial):
    """Robinson's thermo-viscoplastic material (high-temperature creep).

    Counterpart of the reference's Robinson model
    (ref: src/mat/4C_mat_robinson.* — Bingham-Prager flow potential
    F = J2(s - alpha)/K^2(T) - 1 with power-law overstress flow, backstress
    hardening + thermal recovery; temperature-dependent shear threshold).
    Flow and recovery are integrated with one backward-Euler-in-rate
    (explicit-in-direction) step per time increment, branch-free:

      dgamma  = dt * A * <F>^n
      deps_p  = sqrt(3/2) dgamma nhat,   nhat = xi/|xi|,  xi = s - alpha
      dalpha  = (2/3) H deps_p - dt * R(T) * alpha

    K(T) = k0 * (1 - omega_t * (T - t_ref))  (linear thermal softening of
    the shear threshold, floored at 1% k0).

    history per GP: [eps_p (9), alpha (9)] -> (18,)
    """

    kind = "solid_small_history"
    needs_temp = True
    youngs: float
    nue: float
    k0: float               # shear threshold at t_ref
    a_flow: float = 1.0     # flow-rate constant A
    n_exp: float = 2.0      # overstress exponent n
    hard: float = 0.0       # backstress hardening modulus H
    recov: float = 0.0      # thermal recovery rate R
    omega_t: float = 0.0    # d(K)/dT / k0
    t_ref: float = 0.0
    density: float = 0.0
    history_shape = (18,)

    def __post_init__(self):
        self.G = self.youngs / (2 * (1 + self.nue))
        self.K = self.youngs / (3 * (1 - 2 * self.nue))

    def evaluate_small(self, eps, h, T=None, dt=1.0):
        eye = jnp.eye(3, dtype=eps.dtype)
        dT = 0.0 if T is None else T - self.t_ref
        eps_p = h[:9].reshape(3, 3)
        back = h[9:18].reshape(3, 3)
        ee = eps - eps_p
        tr_e = jnp.trace(ee)
        s_tr = 2.0 * self.G * (ee - tr_e / 3.0 * eye)
        xi = s_tr - back
        j2 = 0.5 * jnp.sum(xi * xi)
        kT = jnp.maximum(self.k0 * (1.0 - self.omega_t * dT),
                         0.01 * self.k0)
        F = j2 / (kT * kT) - 1.0
        dgamma = dt * self.a_flow * jnp.maximum(F, 0.0) ** self.n_exp
        norm_xi = jnp.sqrt(2.0 * j2 + 1e-30)
        # cap at landing ON the threshold surface sqrt(J2(xi)) = K(T)
        # (|xi_new| = |xi| - 2G sqrt(3/2) dgamma for frozen backstress):
        # the explicit flow update can never overshoot the elastic domain
        dg_to_surface = jnp.maximum(norm_xi - jnp.sqrt(2.0) * kT, 0.0) / (
            2.0 * self.G * jnp.sqrt(1.5))
        dgamma = jnp.minimum(dgamma, dg_to_surface)
        nhat = xi / norm_xi
        deps_p = jnp.sqrt(1.5) * dgamma * nhat
        back_new = (back + (2.0 / 3.0) * self.hard * deps_p
                    - dt * self.recov * back)
        sig = self.K * tr_e * eye + s_tr - 2.0 * self.G * deps_p
        return sig, jnp.concatenate([(eps_p + deps_p).reshape(9),
                                     back_new.reshape(9)])
