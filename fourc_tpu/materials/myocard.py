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

    def ode_substep(self, V, w, h, stim):
        """One membrane-ODE substep of size h.  Models with stiff HH
        gates (tentusscher) provide a Rush-Larsen update; the default is
        the forward-Euler step the simple models need."""
        inner = getattr(self._m, "ode_substep", None)
        if inner is not None:
            return inner(V, w, h, stim)
        dV, dw = self._m.rhs(V, w)
        return V + h * (dV + stim), w + h * dw


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


class _TenTusscher:
    """ten Tusscher & Panfilov 2006 human-ventricle ionic model (TP06),
    epicardial parameter set — 12 membrane currents, full intracellular
    Na/K/Ca dynamics with SR release (19 states: V + 18 gates/ions).
    Units: mV, ms, mM (ref capability: 4C_mat_myocard_tentusscher.*;
    equations from the published model, ten Tusscher & Panfilov,
    Am J Physiol 291:H1088, 2006).

    Gate layout (n_gates = 18):
      [Xr1, Xr2, Xs, m, h, j, d, f, f2, fCass, s, r,
       Ca_i, Ca_SR, Ca_ss, Rbar, Na_i, K_i]
    """

    n_gates = 18
    v_rest = -85.23
    w_rest = [0.00621, 0.4712, 0.0095, 0.00172, 0.7444, 0.7045,
              3.373e-5, 0.7888, 0.9755, 0.9953, 0.999998, 2.42e-8,
              0.000126, 3.64, 0.00036, 0.9073, 8.604, 136.89]

    def __init__(self, celltype="epi", **p):
        d = dict(
            R=8314.472, T=310.0, F=96485.3415, Cm=0.185, V_c=0.016404,
            V_sr=0.001094, V_ss=0.00005468, K_o=5.4, Na_o=140.0, Ca_o=2.0,
            g_Na=14.838, g_K1=5.405, g_Kr=0.153, g_bna=0.00029,
            g_CaL=0.0000398, g_bca=0.000592, P_NaK=2.724, K_mk=1.0,
            K_mNa=40.0, k_NaCa=1000.0, K_sat=0.1, alpha=2.5, gamma=0.35,
            Km_Ca=1.38, Km_Nai=87.5, g_pCa=0.1238, K_pCa=0.0005,
            g_pK=0.0146, P_kna=0.03, Buf_c=0.2, K_buf_c=0.001, Buf_sr=10.0,
            K_buf_sr=0.3, Buf_ss=0.4, K_buf_ss=0.00025, Vmax_up=0.006375,
            K_up=0.00025, V_rel=0.102, k1p=0.15, k2p=0.045, k3=0.06,
            k4=0.005, EC=1.5, max_sr=2.5, min_sr=1.0, V_leak=0.00036,
            V_xfer=0.0038,
        )
        ct = str(celltype).lower()
        # transient-outward + IKs conductances differ per wall layer
        d["g_to"] = {"epi": 0.294, "endo": 0.073, "m": 0.294}[ct]
        d["g_Ks"] = {"epi": 0.392, "endo": 0.392, "m": 0.098}[ct]
        d.update(p)
        self.p = d
        self.celltype = ct

    def rhs(self, V, g):
        dV, dconc, inf, tau = self._eval(V, g)
        dgates = (inf - g[:, :12]) / tau
        return dV, jnp.concatenate([dgates, dconc], axis=1)

    def ode_substep(self, V, g, h, stim):
        """Rush-Larsen gate update + forward Euler for V and the ionic
        concentrations: the m-gate time constant reaches ~1 µs at rest,
        far below any practical explicit dt — RL integrates each HH gate
        exactly against frozen (inf, tau), the standard integrator for
        this model family (the reference's myocard materials do the same
        per-GP internal update, ref: 4C_mat_myocard.cpp)."""
        dV, dconc, inf, tau = self._eval(V, g)
        gates = inf + (g[:, :12] - inf) * jnp.exp(-h / tau)
        conc = g[:, 12:] + h * dconc
        return (V + h * (dV + stim),
                jnp.concatenate([gates, conc], axis=1))

    def _eval(self, V, g):
        p = self.p
        RTF = p["R"] * p["T"] / p["F"]
        Xr1, Xr2, Xs = g[:, 0], g[:, 1], g[:, 2]
        m, h, j = g[:, 3], g[:, 4], g[:, 5]
        d_, f, f2, fCass = g[:, 6], g[:, 7], g[:, 8], g[:, 9]
        s, r = g[:, 10], g[:, 11]
        Ca_i, Ca_SR, Ca_ss = g[:, 12], g[:, 13], g[:, 14]
        Rbar, Na_i, K_i = g[:, 15], g[:, 16], g[:, 17]
        exp = jnp.exp

        E_Na = RTF * jnp.log(p["Na_o"] / Na_i)
        E_K = RTF * jnp.log(p["K_o"] / K_i)
        E_Ks = RTF * jnp.log((p["K_o"] + p["P_kna"] * p["Na_o"])
                             / (K_i + p["P_kna"] * Na_i))
        E_Ca = 0.5 * RTF * jnp.log(p["Ca_o"] / Ca_i)

        I_Na = p["g_Na"] * m**3 * h * j * (V - E_Na)
        I_bNa = p["g_bna"] * (V - E_Na)
        # L-type Ca (GHK-type driving term); the V = 15 singularity is
        # removable — clamp the exponent argument away from 0
        vf = 2.0 * (V - 15.0) / RTF
        vf_safe = jnp.where(jnp.abs(vf) < 1e-6, 1e-6, vf)
        I_CaL = (p["g_CaL"] * d_ * f * f2 * fCass
                 * 4.0 * (V - 15.0) * p["F"] / RTF
                 * (0.25 * Ca_ss * exp(vf_safe) - p["Ca_o"])
                 / (exp(vf_safe) - 1.0))
        I_bCa = p["g_bca"] * (V - E_Ca)
        I_to = p["g_to"] * r * s * (V - E_K)
        I_Kr = p["g_Kr"] * jnp.sqrt(p["K_o"] / 5.4) * Xr1 * Xr2 * (V - E_K)
        I_Ks = p["g_Ks"] * Xs**2 * (V - E_Ks)
        a_K1 = 0.1 / (1.0 + exp(0.06 * (V - E_K - 200.0)))
        b_K1 = ((3.0 * exp(0.0002 * (V - E_K + 100.0))
                 + exp(0.1 * (V - E_K - 10.0)))
                / (1.0 + exp(-0.5 * (V - E_K))))
        I_K1 = p["g_K1"] * a_K1 / (a_K1 + b_K1) \
            * jnp.sqrt(p["K_o"] / 5.4) * (V - E_K)
        en = exp(p["gamma"] * V / RTF)
        en1 = exp((p["gamma"] - 1.0) * V / RTF)
        I_NaCa = (p["k_NaCa"]
                  * (en * Na_i**3 * p["Ca_o"]
                     - en1 * p["Na_o"]**3 * Ca_i * p["alpha"])
                  / ((p["Km_Nai"]**3 + p["Na_o"]**3)
                     * (p["Km_Ca"] + p["Ca_o"])
                     * (1.0 + p["K_sat"] * en1)))
        I_NaK = (p["P_NaK"] * p["K_o"] * Na_i
                 / ((p["K_o"] + p["K_mk"]) * (Na_i + p["K_mNa"])
                    * (1.0 + 0.1245 * exp(-0.1 * V / RTF)
                       + 0.0353 * exp(-V / RTF))))
        I_pCa = p["g_pCa"] * Ca_i / (Ca_i + p["K_pCa"])
        I_pK = p["g_pK"] * (V - E_K) / (1.0 + exp((25.0 - V) / 5.98))

        # gate kinetics (Hodgkin-Huxley rates, epi s-gate)
        xr1_inf = 1.0 / (1.0 + exp((-26.0 - V) / 7.0))
        tau_xr1 = (450.0 / (1.0 + exp((-45.0 - V) / 10.0))
                   * 6.0 / (1.0 + exp((V + 30.0) / 11.5)))
        xr2_inf = 1.0 / (1.0 + exp((V + 88.0) / 24.0))
        tau_xr2 = (3.0 / (1.0 + exp((-60.0 - V) / 20.0))
                   * 1.12 / (1.0 + exp((V - 60.0) / 20.0)))
        xs_inf = 1.0 / (1.0 + exp((-5.0 - V) / 14.0))
        tau_xs = (1400.0 / jnp.sqrt(1.0 + exp((5.0 - V) / 6.0))
                  * 1.0 / (1.0 + exp((V - 35.0) / 15.0)) + 80.0)
        m_inf = 1.0 / (1.0 + exp((-56.86 - V) / 9.03)) ** 2
        tau_m = (1.0 / (1.0 + exp((-60.0 - V) / 5.0))
                 * (0.1 / (1.0 + exp((V + 35.0) / 5.0))
                    + 0.1 / (1.0 + exp((V - 50.0) / 200.0))))
        h_inf = 1.0 / (1.0 + exp((V + 71.55) / 7.43)) ** 2
        lo = V < -40.0
        a_h = jnp.where(lo, 0.057 * exp(-(V + 80.0) / 6.8), 0.0)
        b_h = jnp.where(lo, 2.7 * exp(0.079 * V) + 3.1e5 * exp(0.3485 * V),
                        0.77 / (0.13 * (1.0 + exp(-(V + 10.66) / 11.1))))
        tau_h = 1.0 / (a_h + b_h)
        j_inf = h_inf
        a_j = jnp.where(
            lo,
            ((-2.5428e4 * exp(0.2444 * V) - 6.948e-6 * exp(-0.04391 * V))
             * (V + 37.78)) / (1.0 + exp(0.311 * (V + 79.23))), 0.0)
        b_j = jnp.where(
            lo,
            0.02424 * exp(-0.01052 * V)
            / (1.0 + exp(-0.1378 * (V + 40.14))),
            0.6 * exp(0.057 * V) / (1.0 + exp(-0.1 * (V + 32.0))))
        tau_j = 1.0 / (a_j + b_j)
        d_inf = 1.0 / (1.0 + exp((-8.0 - V) / 7.5))
        tau_d = ((1.4 / (1.0 + exp((-35.0 - V) / 13.0)) + 0.25)
                 * 1.4 / (1.0 + exp((V + 5.0) / 5.0))
                 + 1.0 / (1.0 + exp((50.0 - V) / 20.0)))
        f_inf = 1.0 / (1.0 + exp((V + 20.0) / 7.0))
        tau_f = (1102.5 * exp(-((V + 27.0) ** 2) / 225.0)
                 + 200.0 / (1.0 + exp((13.0 - V) / 10.0))
                 + 180.0 / (1.0 + exp((V + 30.0) / 10.0)) + 20.0)
        f2_inf = 0.67 / (1.0 + exp((V + 35.0) / 7.0)) + 0.33
        tau_f2 = (562.0 * exp(-((V + 27.0) ** 2) / 240.0)
                  + 31.0 / (1.0 + exp((25.0 - V) / 10.0))
                  + 80.0 / (1.0 + exp((V + 30.0) / 10.0)))
        fCass_inf = 0.6 / (1.0 + (Ca_ss / 0.05) ** 2) + 0.4
        tau_fCass = 80.0 / (1.0 + (Ca_ss / 0.05) ** 2) + 2.0
        if self.celltype == "endo":
            s_inf = 1.0 / (1.0 + exp((V + 28.0) / 5.0))
            tau_s = (1000.0 * exp(-((V + 67.0) ** 2) / 1000.0) + 8.0)
        else:
            s_inf = 1.0 / (1.0 + exp((V + 20.0) / 5.0))
            tau_s = (85.0 * exp(-((V + 45.0) ** 2) / 320.0)
                     + 5.0 / (1.0 + exp((V - 20.0) / 5.0)) + 3.0)
        r_inf = 1.0 / (1.0 + exp((20.0 - V) / 6.0))
        tau_r = 9.5 * exp(-((V + 40.0) ** 2) / 1800.0) + 0.8

        # calcium dynamics
        kcasr = p["max_sr"] - (p["max_sr"] - p["min_sr"]) \
            / (1.0 + (p["EC"] / Ca_SR) ** 2)
        k1 = p["k1p"] / kcasr
        k2 = p["k2p"] * kcasr
        dRbar = -k2 * Ca_ss * Rbar + p["k4"] * (1.0 - Rbar)
        O = k1 * Ca_ss**2 * Rbar / (p["k3"] + k1 * Ca_ss**2)
        I_rel = p["V_rel"] * O * (Ca_SR - Ca_ss)
        I_up = p["Vmax_up"] / (1.0 + p["K_up"] ** 2 / Ca_i**2)
        I_leak = p["V_leak"] * (Ca_SR - Ca_i)
        I_xfer = p["V_xfer"] * (Ca_ss - Ca_i)
        CmF = p["Cm"] / p["F"]
        bufc = 1.0 / (1.0 + p["Buf_c"] * p["K_buf_c"]
                      / (Ca_i + p["K_buf_c"]) ** 2)
        dCa_i = bufc * ((I_leak - I_up) * p["V_sr"] / p["V_c"] + I_xfer
                        - (I_bCa + I_pCa - 2.0 * I_NaCa)
                        * CmF / (2.0 * p["V_c"]))
        bufsr = 1.0 / (1.0 + p["Buf_sr"] * p["K_buf_sr"]
                       / (Ca_SR + p["K_buf_sr"]) ** 2)
        dCa_SR = bufsr * (I_up - I_rel - I_leak)
        bufss = 1.0 / (1.0 + p["Buf_ss"] * p["K_buf_ss"]
                       / (Ca_ss + p["K_buf_ss"]) ** 2)
        dCa_ss = bufss * (-I_CaL * CmF / (2.0 * p["V_ss"])
                          + I_rel * p["V_sr"] / p["V_ss"]
                          - I_xfer * p["V_c"] / p["V_ss"])
        dNa_i = -(I_Na + I_bNa + 3.0 * I_NaK + 3.0 * I_NaCa) \
            * CmF / p["V_c"]
        dK_i = -(I_K1 + I_to + I_Kr + I_Ks - 2.0 * I_NaK + I_pK) \
            * CmF / p["V_c"]

        dV = -(I_K1 + I_to + I_Kr + I_Ks + I_CaL + I_NaK + I_Na + I_bNa
               + I_NaCa + I_bCa + I_pK + I_pCa)
        inf = jnp.stack([xr1_inf, xr2_inf, xs_inf, m_inf, h_inf, j_inf,
                         d_inf, f_inf, f2_inf, fCass_inf, s_inf, r_inf],
                        axis=1)
        tau = jnp.stack([tau_xr1, tau_xr2, tau_xs, tau_m, tau_h, tau_j,
                         tau_d, tau_f, tau_f2, tau_fCass, tau_s, tau_r],
                        axis=1)
        dconc = jnp.stack([dCa_i, dCa_SR, dCa_ss, dRbar, dNa_i, dK_i],
                          axis=1)
        return dV, dconc, inf, tau


_MODELS = {
    "fitzhugh_nagumo": _FitzHughNagumo,
    "aliev_panfilov": _AlievPanfilov,
    "minimal": _Minimal,
    "tentusscher": _TenTusscher,
}
