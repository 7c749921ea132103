"""Closed-loop systemic + pulmonary 0D circulation (syspul).

Counterpart of the reference's full circulation model
(ref: src/cardiovascular0d/4C_cardiovascular0d_syspulcirculation.* —
four time-varying-elastance chambers, diode valves, systemic and
pulmonary RC arterial/venous compartments, closed loop).  The repo's
Windkessel-cavity coupling (physics/cardio0d_driver.py) covers the
3D-coupled case; this module supplies the CLOSED-LOOP network the
reference uses for whole-heart boundary conditions.

State y (8): [V_la, V_lv, V_ra, V_rv, p_ar_sys, p_ven_sys, p_ar_pul,
p_ven_pul].  Chamber pressures are algebraic: p = E(t) (V - V0) with a
two-bump activation (atria lead ventricles).  Valves are smooth diodes
q = (dp + sqrt(dp^2 + eps^2))/(2 R).  One step = backward Euler solved
by a dense 8x8 Newton (jax.jacfwd) — the whole beat runs inside
lax.scan on device.

Exact invariant: total blood volume
    sum V_chambers + sum C_i p_i
is conserved by the continuous model AND by backward Euler (the flow
terms telescope around the loop) — the primary test oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class SysPulParams:
    # chamber elastances (kPa/ml) and rest volumes (ml)
    E_lv_max: float = 0.30
    E_lv_min: float = 0.008
    E_la_max: float = 0.045
    E_la_min: float = 0.009
    E_rv_max: float = 0.06
    E_rv_min: float = 0.005
    E_ra_max: float = 0.035
    E_ra_min: float = 0.006
    V0_lv: float = 10.0
    V0_la: float = 4.0
    V0_rv: float = 12.0
    V0_ra: float = 4.0
    # valve resistances (kPa s/ml)
    R_mv: float = 0.002
    R_av: float = 0.0035
    R_tv: float = 0.0018
    R_pv: float = 0.003
    # systemic circuit
    C_ar_sys: float = 15.0
    R_ar_sys: float = 0.12
    C_ven_sys: float = 300.0
    R_ven_sys: float = 0.024
    # pulmonary circuit
    C_ar_pul: float = 25.0
    R_ar_pul: float = 0.02
    C_ven_pul: float = 120.0
    R_ven_pul: float = 0.015
    # timing (s)
    period: float = 0.8
    t_sys: float = 0.30  # ventricular systole duration
    t_atr_lead: float = 0.12  # atrial kick leads ventricular systole
    eps_valve: float = 1e-4  # diode smoothing (kPa)


def _act(t_in_beat, t0, dur, period):
    """Smooth half-sine activation bump starting at t0 (periodic)."""
    s = jnp.mod(t_in_beat - t0, period)
    x = s / dur
    return jnp.where(x < 1.0, jnp.sin(jnp.pi * jnp.clip(x, 0.0, 1.0)) ** 2,
                     0.0)


def chamber_pressures(y, t, prm: SysPulParams):
    V_la, V_lv, V_ra, V_rv = y[0], y[1], y[2], y[3]
    a_v = _act(t, 0.0, prm.t_sys, prm.period)
    a_a = _act(t, prm.period - prm.t_atr_lead, 0.18, prm.period)
    E_lv = prm.E_lv_min + (prm.E_lv_max - prm.E_lv_min) * a_v
    E_rv = prm.E_rv_min + (prm.E_rv_max - prm.E_rv_min) * a_v
    E_la = prm.E_la_min + (prm.E_la_max - prm.E_la_min) * a_a
    E_ra = prm.E_ra_min + (prm.E_ra_max - prm.E_ra_min) * a_a
    return (E_la * (V_la - prm.V0_la), E_lv * (V_lv - prm.V0_lv),
            E_ra * (V_ra - prm.V0_ra), E_rv * (V_rv - prm.V0_rv))


def _diode(dp, R, eps):
    return (dp + jnp.sqrt(dp * dp + eps * eps)) / (2.0 * R)


def flows(y, t, prm: SysPulParams):
    """All network flows at state y, time t."""
    p_la, p_lv, p_ra, p_rv = chamber_pressures(y, t, prm)
    p_ar_s, p_ven_s, p_ar_p, p_ven_p = y[4], y[5], y[6], y[7]
    e = prm.eps_valve
    q_mv = _diode(p_la - p_lv, prm.R_mv, e)
    q_av = _diode(p_lv - p_ar_s, prm.R_av, e)
    q_tv = _diode(p_ra - p_rv, prm.R_tv, e)
    q_pv = _diode(p_rv - p_ar_p, prm.R_pv, e)
    q_ar_s = (p_ar_s - p_ven_s) / prm.R_ar_sys
    q_ven_s = (p_ven_s - p_ra) / prm.R_ven_sys
    q_ar_p = (p_ar_p - p_ven_p) / prm.R_ar_pul
    q_ven_p = (p_ven_p - p_la) / prm.R_ven_pul
    return dict(q_mv=q_mv, q_av=q_av, q_tv=q_tv, q_pv=q_pv,
                q_ar_s=q_ar_s, q_ven_s=q_ven_s,
                q_ar_p=q_ar_p, q_ven_p=q_ven_p)


def rhs(y, t, prm: SysPulParams):
    q = flows(y, t, prm)
    dV_la = q["q_ven_p"] - q["q_mv"]
    dV_lv = q["q_mv"] - q["q_av"]
    dV_ra = q["q_ven_s"] - q["q_tv"]
    dV_rv = q["q_tv"] - q["q_pv"]
    dp_ar_s = (q["q_av"] - q["q_ar_s"]) / prm.C_ar_sys
    dp_ven_s = (q["q_ar_s"] - q["q_ven_s"]) / prm.C_ven_sys
    dp_ar_p = (q["q_pv"] - q["q_ar_p"]) / prm.C_ar_pul
    dp_ven_p = (q["q_ar_p"] - q["q_ven_p"]) / prm.C_ven_pul
    return jnp.stack([dV_la, dV_lv, dV_ra, dV_rv,
                      dp_ar_s, dp_ven_s, dp_ar_p, dp_ven_p])


def total_volume(y, prm: SysPulParams):
    return (y[0] + y[1] + y[2] + y[3]
            + prm.C_ar_sys * y[4] + prm.C_ven_sys * y[5]
            + prm.C_ar_pul * y[6] + prm.C_ven_pul * y[7])


def initial_state(prm: SysPulParams):
    return jnp.asarray([60.0, 120.0, 60.0, 120.0, 11.0, 0.9, 2.2, 0.9])


def make_step(prm: SysPulParams, dt: float, newton_iters: int = 6):
    """Backward-Euler step y_n -> y_{n+1} (dense 8x8 Newton via jacfwd)."""

    def step(y_n, t_new):
        def res(y):
            return y - y_n - dt * rhs(y, t_new, prm)

        def body(y, _):
            J = jax.jacfwd(res)(y)
            return y - jnp.linalg.solve(J, res(y)), None

        y, _ = jax.lax.scan(body, y_n, None, length=newton_iters)
        return y

    return step


def run_beats(prm: SysPulParams, n_beats=3, steps_per_beat=400, y0=None):
    """Integrate n heart beats on device; returns (times, trajectory)."""
    dt = prm.period / steps_per_beat
    y0 = initial_state(prm) if y0 is None else y0
    step = make_step(prm, dt)
    n = n_beats * steps_per_beat
    ts = (jnp.arange(n) + 1) * dt

    def scan_fn(y, t):
        y1 = step(y, t)
        return y1, y1

    _, traj = jax.lax.scan(scan_fn, y0, ts)
    return np.asarray(ts), np.asarray(traj)
