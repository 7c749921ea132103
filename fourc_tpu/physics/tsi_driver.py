"""TSI problem driver: deck -> TsiField -> coupled time loop.

Analog of the reference's `tsi_dyn_drt` (ref: src/tsi/4C_tsi_dyn.cpp) with
the coupling algorithm chosen by TSI DYNAMIC / COUPALGO:
  oneway      : thermo solve -> structure solve per step (no back-coupling)
  partitioned : staggered fixed point with outer convergence check
                (ref: TSI::Partitioned, 4C_tsi_partitioned.cpp)
  monolithic  : one Newton-Krylov on the stacked residual; jvp supplies the
                full 2x2 block tangent (ref: TSI::Monolithic::newton_full,
                4C_tsi_monolithic.cpp:367-560)

Structure side: statics or one-step-theta; thermo side: one-step-theta
(stationary if thermal_dynamic says statics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.materials import make_material
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import scalar_driver
from fourc_tpu.physics import scalar_transport as st
from fourc_tpu.physics import solid as ps
from fourc_tpu.physics import structure_driver
from fourc_tpu.physics.newton import newton_solve
from fourc_tpu.physics.tsi import TsiField, TsiParams
from fourc_tpu.utils.timer import Timers


def build_field(deck) -> TsiField:
    solid = structure_driver.build_field(deck, next(iter(deck.disc)))
    thermo = scalar_driver.build_field(deck, "thermal_dynamic", "thermo")
    tsi_cfg = deck.sections["tsi_dynamic"]
    params = TsiParams(
        coupling=tsi_cfg["coupling"],
        dt=tsi_cfg["timestep"],
        n_steps=tsi_cfg["numstep"],
        itemax_outer=tsi_cfg["itemax_outer"],
        convtol_outer=tsi_cfg["convtol_outer"],
    )
    return TsiField(solid, thermo, params)


def init_state(f: TsiField):
    s = ps.init_state(f.solid)
    t = st.init_state(f.thermo)
    T = t["phi"]
    if not f.thermo.params.initial_funct:
        # default initial temperature = material reference temperature
        # (ref: THERMAL DYNAMIC INITIALFIELD field_by_function / inittemp)
        t0s = [m.inittemp for m in f.solid.block_mat.values()
               if getattr(m, "kind", "") == "thermo_solid"]
        if t0s:
            T = f.thermo.dbc.apply(jnp.full_like(T, t0s[0]), 0.0)
    return {
        "d": s["d"], "v": s["v"], "a": s["a"], "fint": s["fint"], "fext": s["fext"],
        "T": T, "Tdot": t["phidot"],
        "t": s["t"], "step": s["step"], "hist": s["hist"],
    }


def _coupled_residuals(f: TsiField, state, dt, d_new, T_new, t1):
    """(r_s, r_t) at t_{n+1} for one-step-theta/statics semantics."""
    sol, th = f.solid, f.thermo
    d_n, v_n, a_n = state["d"], state["v"], state["a"]
    T_n, Tdot_n = state["T"], state["Tdot"]
    sp = sol.params
    theta_s = sp.theta if sp.dyntype == "onesteptheta" else 1.0
    theta_t = th.params.theta if th.params.dyntype == "onesteptheta" else 1.0

    temps = f.temps_at_gps(T_new)
    fint, _ = sol.internal_force(d_new, history=state["hist"] or None, dt=dt,
                                 temps=temps)
    fext = sol.external_force(t1, d_new)
    if sp.dyntype == "statics":
        v_new = (d_new - d_n) / dt
        r_s = fint - fext
    else:  # onesteptheta dynamics
        v_new = (d_new - d_n) / (theta_s * dt) - (1 - theta_s) / theta_s * v_n
        a_mid = (v_new - v_n) / dt
        r_s = (
            sol.mass_matvec(a_mid)
            + theta_s * fint + (1 - theta_s) * state["fint"]
            - (theta_s * fext + (1 - theta_s) * state["fext"])
        )

    if th.params.dyntype == "stationary":
        Tdot_new = jnp.zeros_like(T_new)
    else:
        Tdot_new = (T_new - T_n) / (theta_t * dt) - (1 - theta_t) / theta_t * Tdot_n
    heating = f.heating_at_gps(v_new)
    r_t = th.residual_transient(T_new, Tdot_new, t1, dt=dt,
                                extra_source=heating or None)
    return r_s, r_t, v_new, Tdot_new, fint, fext


def _finish_state(f, state, dt, d, T, t1):
    r_s, r_t, v_new, Tdot_new, fint, fext = _coupled_residuals(f, state, dt, d, T, t1)
    sp = f.solid.params
    new = dict(state)
    if sp.dyntype == "statics":
        v1 = jnp.zeros_like(d)
        a1 = jnp.zeros_like(d)
    else:
        v1 = v_new
        a1 = (v1 - state["v"]) / (sp.theta * dt) - (1 - sp.theta) / sp.theta * state["a"]
    new.update(
        d=d, v=v1, a=a1, T=T, Tdot=f.thermo.dbc.mask(Tdot_new),
        fint=fint, fext=fext, t=t1, step=state["step"] + 1,
    )
    return new


def make_monolithic_step(f: TsiField, dt: float):
    sol, th = f.solid, f.thermo

    def step(state):
        t1 = state["t"] + dt

        def residual(y):
            d, T = f.split(y)
            r_s, r_t, *_ = _coupled_residuals(f, state, dt, d, T, t1)
            return f.join(r_s, f.params.thermo_scale * r_t)

        d0 = sol.dbc.apply(state["d"], t1)
        T0 = th.dbc.apply(state["T"], t1)
        y0 = f.join(d0, T0)
        sp = sol.params
        mass_shift = 0.0 if sp.dyntype == "statics" else 1.0 / (sp.theta * dt * dt)
        tt = th.params
        t_fac = 0.0 if tt.dyntype == "stationary" else 1.0 / (max(tt.theta, 1e-300) * dt)
        M = f.block_precond(d0, dt, solid_mass_shift=mass_shift, thermo_dt_factor=t_fac)
        # coupled system is nonsymmetric (K_st != K_ts^T): use gmres/bicgstab
        nw = sol.params.newton
        if nw.lin_method == "cg":
            from dataclasses import replace

            nw = replace(nw, lin_method="bicgstab")
        y, stats = newton_solve(residual, y0, f.free_mask, M, nw)
        d, T = f.split(y)
        return _finish_state(f, state, dt, d, T, t1), stats

    return jax.jit(step)


def make_staggered_solvers(f: TsiField, dt: float):
    """Jitted single-field solvers for the partitioned/oneway loop."""
    sol, th = f.solid, f.thermo

    @jax.jit
    def solve_structure(state, T_fixed):
        t1 = state["t"] + dt

        def residual(d):
            r_s, *_ = _coupled_residuals(f, state, dt, d, T_fixed, t1)
            return r_s

        d0 = sol.dbc.apply(state["d"], t1)
        M = sol.build_preconditioner(
            d0, dt=dt,
            mass_shift=0.0 if sol.params.dyntype == "statics"
            else 1.0 / (sol.params.theta * dt * dt),
        )
        return newton_solve(residual, d0, sol.dbc.free_mask, M, sol.params.newton)

    @jax.jit
    def solve_thermo(state, d_fixed):
        t1 = state["t"] + dt

        def residual(T):
            _, r_t, *_ = _coupled_residuals(f, state, dt, d_fixed, T, t1)
            return r_t

        T0 = th.dbc.apply(state["T"], t1)
        tt = th.params
        t_fac = 0.0 if tt.dyntype == "stationary" else 1.0 / (max(tt.theta, 1e-300) * dt)
        M = th.build_preconditioner(dt_factor=t_fac)
        return newton_solve(residual, T0, th.dbc.free_mask, M, th.params.newton)

    return solve_structure, solve_thermo


def make_step(f: TsiField, dt: float):
    if f.params.coupling == "monolithic":
        return make_monolithic_step(f, dt)
    solve_structure, solve_thermo = make_staggered_solvers(f, dt)
    oneway = f.params.coupling == "oneway"

    def step(state):
        t1 = state["t"] + dt
        d, T = state["d"], state["T"]
        tot_newton, tot_lin = 0, 0
        converged = True
        # Aitken Delta^2 relaxation on the temperature iterate: the
        # staggered thermo<->structure fixed point can have gain > 1
        # (measured 1.8x growth/iteration on the heated-bar deck through
        # the thermoelastic-heating backcoupling) — the reference's
        # TSI::Partitioned stabilizes the same loop with relaxation
        # (ref: 4C_tsi_partitioned.cpp Aitken/fixed relaxation options)
        omega = 1.0
        r_prev = None
        for it in range(1 if oneway else f.params.itemax_outer):
            T_solved, stat_t = solve_thermo(state, d)
            r = T_solved - T
            if not oneway and r_prev is not None:
                dr = r - r_prev
                denom = float(jnp.vdot(dr, dr))
                if denom > 0.0:
                    omega = -omega * float(jnp.vdot(r_prev, dr)) / denom
                    omega = min(max(omega, 0.05), 1.0)
            T_new = T + omega * r
            r_prev = r
            d_new, stat_s = solve_structure(state, T_new)
            tot_newton += int(stat_t["iters"]) + int(stat_s["iters"])
            tot_lin += int(stat_t["lin_iters"]) + int(stat_s["lin_iters"])
            converged = bool(stat_t["converged"]) and bool(stat_s["converged"])
            dT = float(jnp.linalg.norm(T_new - T))
            dd = float(jnp.linalg.norm(d_new - d))
            d, T = d_new, T_new
            if oneway or max(dT, dd) < f.params.convtol_outer:
                break
        else:
            converged = False
        new = _finish_state(f, state, dt, d, T, t1)
        stats = {
            "iters": jnp.asarray(tot_newton), "lin_iters": jnp.asarray(tot_lin),
            "resnorm": stat_s["resnorm"], "dispnorm": stat_s["dispnorm"],
            "converged": jnp.asarray(converged),
        }
        return new, stats

    return step


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    with timers("setup"):
        f = build_field(deck)
        state = init_state(f)
        # consistent initial forces for OST structure
        temps = f.temps_at_gps(state["T"])
        fint0, _ = f.solid.internal_force(state["d"], history=state["hist"] or None,
                                          temps=temps)
        state["fint"] = fint0
        state["fext"] = f.solid.external_force(state["t"], state["d"])
    cfg = deck.sections["tsi_dynamic"]
    cbs = list(callbacks or [])
    state, n_steps, cbs = drv.setup_restart(deck, "tsi", state, cfg["numstep"], cbs)
    # NP>1 deck variant: shard BOTH participating fields over the same mesh
    state = drv.maybe_shard(deck, [f.solid, f.thermo], state)

    state, agg = drv.time_loop(
        "tsi", state, lambda dt: make_step(f, dt), cfg["timestep"],
        n_steps, divercont="stop", callbacks=cbs,
        timers=timers,
    )
    solid_view = structure_driver.SolidFieldView(f.solid)
    return drv.RunResult(
        deck=deck,
        fields={"tsi": TsiFieldView(f), "structure": solid_view, "thermo": TsiThermoView(f)},
        states={"tsi": state,
                "structure": {"d": state["d"], "v": state["v"], "a": state["a"],
                              "hist": state["hist"]},
                "thermo": {"phi": state["T"], "phidot": state["Tdot"]}},
        stats={"tsi": agg, "structure": agg, "thermo": agg},
        timers=timers,
    )


class TsiFieldView:
    def __init__(self, f: TsiField):
        self.f = f
        self._solid = structure_driver.SolidFieldView(f.solid)

    def node_value(self, state, quantity: str, node: int):
        q = quantity.lower()
        if q in ("temp", "t"):
            return float(np.asarray(state["T"])[node])
        return self._solid.node_value(state, quantity, node)


class TsiThermoView:
    def __init__(self, f: TsiField):
        self.f = f

    def node_value(self, state, quantity: str, node: int):
        if quantity.lower() in ("temp", "t", "phi"):
            return float(np.asarray(state["phi"])[node])
        raise KeyError(quantity)
