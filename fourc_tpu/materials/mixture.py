"""Constrained-mixture framework: rules, constituents, growth strategies.

Counterpart of the reference's homogenized mixture module
(ref: src/mixture — 4C_mixture_rule_simple.cpp, 4C_mixture_rule_growthremodel.cpp,
4C_mixture_constituent_{elasthyper,solidmaterial,remodelfiber_expl/impl}.*,
4C_mixture_growth_strategy_{isotropic,anisotropic,stiffness}.*,
4C_mixture_prestress_strategy_constant.*,
4C_mixture_growth_evolution_linear_cauchy_poisson_turnover.hpp).

A mixture is a set of constituents sharing one deformation (constrained
mixture): solid constituents (any hyperelastic material, optionally
deposited with a constant prestretch G) and remodel fibers (exponential
fiber families with stress-mediated mass turnover and inelastic remodel
stretch lambda_r — the Cyron/Humphrey homogenized G&R kinematics).

TPU-native redesign: the reference threads per-constituent stress/cmat
pairs through virtual Evaluate() calls and hand-coded pull-backs
(rule_growthremodel.cpp:22-47 iF_gM plumbing).  Here each GP carries a
small history vector h = [growth_scalar_i, lambda_r_i]*, the mixture
defines ONE scalar energy

    psi(C; h) = sum_i rho0 frac_i g_i psi_i( Ce_i(C; h) )

and PK2 + consistent tangent come from AD of psi — the growth /
prestretch pull-backs fall out of the chain rule exactly.  The local
G&R ODEs

    dg/dt       = (k_sig dsig/sig_h + basal/T - 1/T) g
    dlambda_r/dt = (k_sig dsig/sig_h + basal/T) lambda_r (sig-sig_h)
                   / (2 dsig/dI4 I4)

(ref: 4C_mixture_remodelfiber.cpp evaluate_{growth,remodel}_evolution_
equation_dt) are integrated per GP, explicit-Euler by default or a
fixed-point backward Euler (`impl: true`, the reference's
integrate_local_evolution_equations_implicit analog).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fourc_tpu.materials.base import HistoryMaterial, make_material, register_material


def _unit(a):
    a = jnp.asarray(a, jnp.result_type(float))
    return a / jnp.linalg.norm(a)


# --- exponential remodel fiber (ref: 4C_mixture_constituent_remodelfiber_lib.hpp:45) ---


def _fiber_psi(k1, k2, I4, supports_compression=False):
    x = I4 - 1.0
    psi = k1 / (2.0 * k2) * (jnp.exp(k2 * x * x) - 1.0)
    if not supports_compression:
        psi = jnp.where(I4 < 1.0, 0.0, psi)
    return psi


def _fiber_cauchy(k1, k2, I4, supports_compression=False):
    """sigma = 2 dpsi/dI4 * I4 (ref: remodelfiber_lib.hpp:98)."""
    dpsi = k1 * (I4 - 1.0) * jnp.exp(k2 * (I4 - 1.0) ** 2)
    if not supports_compression:
        dpsi = jnp.where(I4 < 1.0, 0.0, dpsi)
    return 2.0 * dpsi * I4


def _fiber_dcauchy_dI4(k1, k2, I4):
    x = I4 - 1.0
    e = jnp.exp(k2 * x * x)
    # d/dI4 [2 k1 x e I4] = 2 k1 e (x + I4 (1 + 2 k2 x^2))
    return 2.0 * k1 * e * (x + I4 * (1.0 + 2.0 * k2 * x * x))


class _SolidConstituent:
    """Any registered hyperelastic material, optionally deposited with a
    constant prestretch tensor G (ref:
    4C_mixture_prestress_strategy_constant.*): psi(G^T Ce G)."""

    def __init__(self, frac, material, prestretch=None):
        self.frac = float(frac)
        self.mat = make_material(dict(material))
        if getattr(self.mat, "history_shape", ()):
            raise ValueError("mixture solid constituents must be history-free")
        self.G = None
        if prestretch is not None:
            p = jnp.asarray(prestretch, jnp.result_type(float))
            self.G = jnp.diag(p) if p.ndim == 1 else p

    def psi(self, Ce):
        if self.G is not None:
            Ce = self.G.T @ Ce @ self.G
        return self.mat.psi(Ce)


class _RemodelFiber:
    """Exponential fiber family with mass turnover + remodel stretch."""

    def __init__(self, frac, k1, k2, a=(1.0, 0.0, 0.0), lambda_pre=1.0,
                 k_sig=0.0, decay_time=1.0, basal=True, impl=False,
                 supports_compression=False):
        self.frac = float(frac)
        self.k1, self.k2 = float(k1), float(k2)
        self.a = tuple(float(x) for x in a)
        self.lambda_pre = float(lambda_pre)
        self.k_sig = float(k_sig)
        self.decay_time = float(decay_time)
        self.basal = bool(basal)
        self.impl = bool(impl)
        self.supports_compression = bool(supports_compression)
        # homeostatic stress: lambda_f = 1, lambda_r = 1/lambda_pre ->
        # I4 = lambda_pre^2 (ref: 4C_mixture_remodelfiber.cpp:71)
        self.sig_h = float(_fiber_cauchy(
            self.k1, self.k2, jnp.asarray(self.lambda_pre**2),
            self.supports_compression))

    def rates(self, lam_f, lam_r, lam_ext, g):
        I4 = lam_f**2 / (lam_r * lam_ext) ** 2
        sig = _fiber_cauchy(self.k1, self.k2, I4, self.supports_compression)
        dsig = sig - self.sig_h
        prod = self.k_sig * dsig / self.sig_h + (
            1.0 / self.decay_time if self.basal else 0.0)
        g_dot = (prod - 1.0 / self.decay_time) * g
        dsig_dI4 = _fiber_dcauchy_dI4(self.k1, self.k2, I4)
        lam_r_dot = prod * lam_r * dsig / jnp.maximum(
            2.0 * dsig_dI4 * I4, 1e-12)
        return g_dot, lam_r_dot


@register_material("mixture_rule")
class MixtureRule(HistoryMaterial):
    """Homogenized constrained mixture with growth & remodeling.

    Deck::

      {type: mixture_rule, rule: simple | growthremodel,
       rho0: 1.0,                     # initial reference density
       growth_strategy: {kind: isotropic | anisotropic | stiffness,
                         g: [0,0,1]}, # direction for anisotropic
       constituents: [
         {kind: solid, frac: 0.3, material: {type: coupneohooke, ...},
          prestretch: [1.1, 1.0, 1.0]},
         {kind: remodelfiber, frac: 0.7, k1: .., k2: .., a: [1,0,0],
          lambda_pre: 1.1, k_sig: .., decay_time: .., impl: false},
       ]}

    history per GP: [g_i, lambda_r_i] per remodel fiber.
    """

    kind = "solid_history"

    def __init__(self, constituents, rule="simple", rho0=1.0,
                 growth_strategy=None, density=0.0):
        self.rule = str(rule).lower()
        self.rho0 = float(rho0)
        self.density = float(density)
        gs = dict(growth_strategy or {"kind": "isotropic"})
        self.growth_kind = str(gs.pop("kind", "isotropic")).lower()
        self.growth_dir = tuple(float(x) for x in gs.pop("g", (0.0, 0.0, 1.0)))
        self.solids: list[_SolidConstituent] = []
        self.fibers: list[_RemodelFiber] = []
        for c in constituents:
            c = dict(c)
            kindc = str(c.pop("kind", "solid")).lower()
            if kindc == "solid":
                self.solids.append(_SolidConstituent(**c))
            elif kindc == "remodelfiber":
                self.fibers.append(_RemodelFiber(**c))
            else:
                raise ValueError(f"unknown mixture constituent kind {kindc!r}")
        self.history_shape = (max(2 * len(self.fibers), 1),)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)

    def init_history(self, ngp_total):
        n = self.history_shape[0]
        h = jnp.zeros((ngp_total, n))
        for i, f in enumerate(self.fibers):
            # g = 1, lambda_r = 1/lambda_pre (deposition prestretch)
            h = h.at[:, 2 * i].set(1.0)
            h = h.at[:, 2 * i + 1].set(1.0 / f.lambda_pre)
        return h

    # -- growth kinematics (ref: 4C_mixture_growth_strategy_*.cpp) --------

    def _iFg(self, g_total, dtype):
        if self.growth_kind == "isotropic":
            return jnp.sign(g_total) * jnp.abs(g_total) ** (-1.0 / 3.0) \
                * jnp.eye(3, dtype=dtype)
        if self.growth_kind == "anisotropic":
            gv = _unit(self.growth_dir).astype(dtype)
            return jnp.eye(3, dtype=dtype) + (1.0 / g_total - 1.0) \
                * jnp.outer(gv, gv)
        # 'stiffness': growth only scales the stress (no Fg)
        return jnp.eye(3, dtype=dtype)

    def _growth_scalar(self, h):
        """Current reference growth scalar: mass-fraction-weighted g_i
        (solid constituents do not grow; ref:
        4C_mixture_rule_growthremodel.cpp compute_current_reference_
        growth_scalar)."""
        g = sum(s.frac for s in self.solids)
        for i, f in enumerate(self.fibers):
            g = g + f.frac * h[2 * i]
        return g

    # -- energy / stress ----------------------------------------------------

    def _psi(self, C, h):
        dtype = C.dtype
        if self.rule == "growthremodel":
            g_total = self._growth_scalar(h)
            iFg = self._iFg(g_total, dtype)
            Ce = iFg.T @ C @ iFg
        else:
            g_total = 1.0
            iFg = jnp.eye(3, dtype=dtype)
            Ce = C
        psi = 0.0
        for s in self.solids:
            psi = psi + self.rho0 * s.frac * s.psi(Ce)
        for i, f in enumerate(self.fibers):
            g_i = h[2 * i] if self.rule == "growthremodel" else 1.0
            lam_r = h[2 * i + 1]
            a = _unit(f.a).astype(dtype)
            lam_ext = 1.0 / jnp.maximum(jnp.linalg.norm(iFg @ a), 1e-12)
            I4e = (a @ (C @ a)) / (lam_r * lam_ext) ** 2
            psi = psi + self.rho0 * f.frac * g_i * _fiber_psi(
                f.k1, f.k2, I4e, f.supports_compression)
        return psi

    def evaluate(self, C, h, dt=0.0):
        S = 2.0 * jax.grad(self._psi)(C, h)
        # local G&R ODE update per fiber (explicit Euler, or fixed-point BE)
        h_new = h
        if self.fibers and dt:
            g_total = self._growth_scalar(h) if self.rule == "growthremodel" \
                else 1.0
            iFg = self._iFg(g_total, C.dtype) if self.rule == "growthremodel" \
                else jnp.eye(3, dtype=C.dtype)
            for i, f in enumerate(self.fibers):
                a = _unit(f.a).astype(C.dtype)
                lam_f = jnp.sqrt(jnp.maximum(a @ (C @ a), 1e-12))
                lam_ext = 1.0 / jnp.maximum(jnp.linalg.norm(iFg @ a), 1e-12)
                g_n, r_n = h[2 * i], h[2 * i + 1]
                if f.impl:
                    g, r = g_n, r_n
                    for _ in range(4):  # fixed-point backward Euler
                        gd, rd = f.rates(lam_f, r, lam_ext, g)
                        g = g_n + dt * gd
                        r = r_n + dt * rd
                else:
                    gd, rd = f.rates(lam_f, r_n, lam_ext, g_n)
                    g, r = g_n + dt * gd, r_n + dt * rd
                h_new = h_new.at[2 * i].set(g).at[2 * i + 1].set(r)
        return S, h_new
