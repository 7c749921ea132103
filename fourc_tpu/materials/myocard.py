"""Cardiac electrophysiology cell-model materials.

Counterpart of the reference's myocard material family
(ref: src/mat/4C_mat_myocard.hpp + the per-model classes
4C_mat_myocard_fitzhugh_nagumo.*, …_minimal.*, used by the scatra
cardiac-monodomain variant, src/scatra/4C_scatra_timint_cardiac_monodomain.*).

Each model provides the reaction kinetics of the monodomain equation

    dV/dt = div(D grad V) + R(V, w) + I_stim,   dw/dt = G(V, w)

as pure, vmappable functions over nodal (V, w) arrays — the TPU-native
replacement for the reference's per-Gauss-point internal-variable update.
Models: FitzHugh-Nagumo, Aliev-Panfilov, Bueno-Orovio et al. 'minimal'
(4-variable, epicardial parameter set).
"""

from __future__ import annotations

import jax.numpy as jnp

from fourc_tpu.materials.base import Material, register_material


@register_material("myocard")
class Myocard(Material):
    """Monodomain tissue + membrane model.

    Deck: {type: myocard, model: fitzhugh_nagumo|aliev_panfilov|minimal,
           diff: D}.  `diff` is the (isotropic) conductivity/(C_m chi).
    """

    kind = "scatra"

    def __init__(self, model="fitzhugh_nagumo", diff=1.0e-3, **params):
        self.model = str(model).lower()
        self.diffusivity = float(diff)
        self.capacity = 1.0
        self.density = 1.0
        if self.model not in _MODELS:
            raise KeyError(f"unknown myocard model {model!r}; "
                           f"known: {sorted(_MODELS)}")
        self._m = _MODELS[self.model](**params)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)

    # ScalarField material interface (diffusion handled by the PDE kernel)
    def diff(self, phi=None):
        return self.diffusivity

    def reaction(self, phi):
        return jnp.zeros_like(phi)  # kinetics live in the ODE substep

    # cell-model interface
    @property
    def n_gates(self):
        return self._m.n_gates

    @property
    def v_rest(self):
        return self._m.v_rest

    def w_rest(self):
        return jnp.asarray(self._m.w_rest)

    def rhs(self, V, w):
        """(V (n,), w (n, n_gates)) -> (dV/dt reaction, dw/dt)."""
        return self._m.rhs(V, w)


class _FitzHughNagumo:
    """dv = c1 v (v-a)(1-v) - c2 w ; dw = b (v - d w)."""

    n_gates = 1
    v_rest = 0.0
    w_rest = [0.0]

    def __init__(self, a=0.13, b=0.013, c1=0.26, c2=0.1, d=1.0):
        self.a, self.b, self.c1, self.c2, self.d = a, b, c1, c2, d

    def rhs(self, V, w):
        w0 = w[:, 0]
        dV = self.c1 * V * (V - self.a) * (1.0 - V) - self.c2 * w0
        dw = self.b * (V - self.d * w0)
        return dV, dw[:, None]


class _AlievPanfilov:
    """dv = -k v(v-a)(v-1) - v w ;
    dw = (eps0 + mu1 w/(mu2+v)) (-w - k v (v-b-1))."""

    n_gates = 1
    v_rest = 0.0
    w_rest = [0.0]

    def __init__(self, k=8.0, a=0.15, b=0.15, eps0=0.002, mu1=0.2, mu2=0.3):
        self.k, self.a, self.b = k, a, b
        self.eps0, self.mu1, self.mu2 = eps0, mu1, mu2

    def rhs(self, V, w):
        w0 = w[:, 0]
        dV = -self.k * V * (V - self.a) * (V - 1.0) - V * w0
        eps = self.eps0 + self.mu1 * w0 / (self.mu2 + V)
        dw = eps * (-w0 - self.k * V * (V - self.b - 1.0))
        return dV, dw[:, None]


class _Minimal:
    """Bueno-Orovio / Cherry / Fenton 4-variable minimal model (u, v, w, s),
    epicardial parameter set (ref: 4C_mat_myocard_minimal.* defaults)."""

    n_gates = 3
    v_rest = 0.0
    w_rest = [1.0, 1.0, 0.0]  # v, w, s

    def __init__(self, **p):
        d = dict(
            u_o=0.0, u_u=1.55, theta_v=0.3, theta_w=0.13, theta_vm=0.006,
            theta_o=0.006, tau_v1m=60.0, tau_v2m=1150.0, tau_vp=1.4506,
            tau_w1m=60.0, tau_w2m=15.0, k_wm=65.0, u_wm=0.03, tau_wp=200.0,
            tau_fi=0.11, tau_o1=400.0, tau_o2=6.0, tau_so1=30.0181,
            tau_so2=0.9957, k_so=2.0458, u_so=0.65, tau_s1=2.7342,
            tau_s2=16.0, k_s=2.0994, u_s=0.9087, tau_si=1.8875, tau_winf=0.07,
            w_infstar=0.94,
        )
        d.update(p)
        self.p = d

    def rhs(self, u, gates):
        p = self.p
        v, w, s = gates[:, 0], gates[:, 1], gates[:, 2]
        H = lambda x: jnp.where(x >= 0.0, 1.0, 0.0)  # noqa: E731
        Hv = H(u - p["theta_v"])
        Hw = H(u - p["theta_w"])
        Hvm = H(u - p["theta_vm"])
        Ho = H(u - p["theta_o"])

        tau_vm = jnp.where(u >= p["theta_vm"], p["tau_v2m"], p["tau_v1m"])
        tau_wm = p["tau_w1m"] + (p["tau_w2m"] - p["tau_w1m"]) * 0.5 * (
            1.0 + jnp.tanh(p["k_wm"] * (u - p["u_wm"])))
        tau_so = p["tau_so1"] + (p["tau_so2"] - p["tau_so1"]) * 0.5 * (
            1.0 + jnp.tanh(p["k_so"] * (u - p["u_so"])))
        tau_s = jnp.where(u >= p["theta_w"], p["tau_s2"], p["tau_s1"])
        tau_o = jnp.where(u >= p["theta_o"], p["tau_o2"], p["tau_o1"])

        v_inf = jnp.where(u < p["theta_vm"], 1.0, 0.0)
        w_inf = (1.0 - Ho) * (1.0 - u / p["tau_winf"]) + Ho * p["w_infstar"]

        J_fi = -v * Hv * (u - p["theta_v"]) * (p["u_u"] - u) / p["tau_fi"]
        J_so = (u - p["u_o"]) * (1.0 - Hw) / tau_o + Hw / tau_so
        J_si = -Hw * w * s / p["tau_si"]

        du = -(J_fi + J_so + J_si)
        dv = (1.0 - Hv) * (v_inf - v) / tau_vm - Hv * v / p["tau_vp"]
        dw = (1.0 - Hw) * (w_inf - w) / tau_wm - Hw * w / p["tau_wp"]
        ds = (0.5 * (1.0 + jnp.tanh(p["k_s"] * (u - p["u_s"]))) - s) / tau_s
        return du, jnp.stack([dv, dw, ds], axis=1)


_MODELS = {
    "fitzhugh_nagumo": _FitzHughNagumo,
    "aliev_panfilov": _AlievPanfilov,
    "minimal": _Minimal,
}
