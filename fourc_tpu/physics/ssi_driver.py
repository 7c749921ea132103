"""SSI (scatra-structure interaction): deck -> coupled time loop.

Counterpart of the reference's ssi module (ref: src/ssi — `SSI::SSIPart`
partitioned and `SSI::SSIMono` monolithic scatra-structure interaction,
4C_ssi_monolithic.cpp).  Coupling physics (round 1):

  structure <- scalar: isotropic swelling eigenstrain
               S = C : (E - beta (c - c0) I)   (scatra_stvenantkirchhoff)
  scalar <- structure: transport evaluated on the DEFORMED configuration
               (diffusion follows the deforming body)

Like TSI, the monolithic tangent (incl. both off-diagonal blocks) is
jax.jvp through the stacked residual — no block matrices assembled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import scalar_driver
from fourc_tpu.physics import scalar_transport as st
from fourc_tpu.physics import solid as ps
from fourc_tpu.physics import structure_driver
from fourc_tpu.physics.newton import newton_solve
from fourc_tpu.physics.tsi import TsiParams
from fourc_tpu.utils.timer import Timers


class SsiField:
    def __init__(self, solid, scatra, params):
        assert solid.disc.n_nodes == scatra.disc.n_nodes
        self.solid = solid
        self.scatra = scatra
        self.params = params
        self.nd = solid.ndof
        self.nc = scatra.ndof

    def conc_at_gps(self, c):
        out = {}
        for key in self.solid.dofmap.blocks:
            cell = self.solid._cell(key)
            conn = self.solid.dofmap.blocks[key].conn
            out[key] = jnp.einsum("ga,ea->eg", jnp.asarray(cell.N, c.dtype), c[conn])
        return out

    def split(self, y):
        return y[: self.nd], y[self.nd:]

    def join(self, d, c):
        return jnp.concatenate([d, c])

    @property
    def free_mask(self):
        return jnp.concatenate([self.solid.dbc.free_mask, self.scatra.dbc.free_mask])


def build_field(deck) -> SsiField:
    solid = structure_driver.build_field(deck, next(iter(deck.disc)))
    scatra = scalar_driver.build_field(deck, "scatra_dynamic", "scatra")
    cfg = deck.sections["ssi_dynamic"]
    params = TsiParams(
        coupling=cfg["coupling"], dt=cfg["timestep"], n_steps=cfg["numstep"],
        itemax_outer=cfg["itemax_outer"], convtol_outer=cfg["convtol_outer"],
    )
    return SsiField(solid, scatra, params)


def init_state(f: SsiField):
    s = ps.init_state(f.solid)
    t = st.init_state(f.scatra)
    c = t["phi"]
    if not f.scatra.params.initial_funct:
        c0s = [m.refconc for m in f.solid.block_mat.values()
               if getattr(m, "kind", "") == "scatra_solid"]
        if c0s:
            c = f.scatra.dbc.apply(jnp.full_like(c, c0s[0]), 0.0)
    return {
        "d": s["d"], "v": s["v"], "a": s["a"], "fint": s["fint"], "fext": s["fext"],
        "c": c, "cdot": t["phidot"],
        "t": s["t"], "step": s["step"], "hist": s["hist"],
    }


def _coupled_residuals(f: SsiField, state, dt, d_new, c_new, t1):
    sol, sc = f.solid, f.scatra
    d_n, v_n = state["d"], state["v"]
    c_n, cdot_n = state["c"], state["cdot"]
    sp = sol.params
    theta_s = sp.theta if sp.dyntype == "onesteptheta" else 1.0
    theta_c = sc.params.theta if sc.params.dyntype == "onesteptheta" else 1.0

    conc = f.conc_at_gps(c_new)
    fint, _ = sol.internal_force(d_new, history=state["hist"] or None, dt=dt,
                                 temps=conc)
    fext = sol.external_force(t1, d_new)
    if sp.dyntype == "statics":
        r_s = fint - fext
        v_new = (d_new - d_n) / dt
    else:
        v_new = (d_new - d_n) / (theta_s * dt) - (1 - theta_s) / theta_s * v_n
        a_mid = (v_new - v_n) / dt
        r_s = (sol.mass_matvec(a_mid) + theta_s * fint + (1 - theta_s) * state["fint"]
               - (theta_s * fext + (1 - theta_s) * state["fext"]))

    if sc.params.dyntype == "stationary":
        cdot_new = jnp.zeros_like(c_new)
    else:
        cdot_new = (c_new - c_n) / (theta_c * dt) - (1 - theta_c) / theta_c * cdot_n
    # transport on the deformed configuration (the d -> c coupling block)
    r_c = sc.residual_transient(c_new, cdot_new, t1, dt=dt,
                                mesh_disp=d_new.reshape(-1, sol.ndpn))
    return r_s, r_c, v_new, cdot_new, fint, fext


def make_monolithic_step(f: SsiField, dt: float):
    sol, sc = f.solid, f.scatra

    def step(state):
        t1 = state["t"] + dt

        def residual(y):
            d, c = f.split(y)
            r_s, r_c, *_ = _coupled_residuals(f, state, dt, d, c, t1)
            return f.join(r_s, r_c)

        d0 = sol.dbc.apply(state["d"], t1)
        c0 = sc.dbc.apply(state["c"], t1)
        y0 = f.join(d0, c0)
        sp = sol.params
        ms = 0.0 if sp.dyntype == "statics" else 1.0 / (sp.theta * dt * dt)
        tt = sc.params
        cf = 0.0 if tt.dyntype == "stationary" else 1.0 / (max(tt.theta, 1e-300) * dt)
        Ms = sol.build_preconditioner(d0, mass_shift=ms, dt=dt)
        Mc = sc.build_preconditioner(dt_factor=cf)

        def M(r):
            rs, rc = f.split(r)
            return f.join(Ms(rs), Mc(rc))

        from dataclasses import replace

        nw = sol.params.newton
        if nw.lin_method == "cg":
            nw = replace(nw, lin_method="bicgstab")
        y, stats = newton_solve(residual, y0, f.free_mask, M, nw)
        d, c = f.split(y)
        new = _finish(f, state, dt, d, c, t1)
        return new, stats

    return jax.jit(step)


def _finish(f, state, dt, d, c, t1):
    r_s, r_c, v_new, cdot_new, fint, fext = _coupled_residuals(f, state, dt, d, c, t1)
    sp = f.solid.params
    new = dict(state)
    if sp.dyntype == "statics":
        v1 = jnp.zeros_like(d)
        a1 = jnp.zeros_like(d)
    else:
        v1 = v_new
        a1 = (v1 - state["v"]) / (sp.theta * dt) - (1 - sp.theta) / sp.theta * state["a"]
    new.update(d=d, v=v1, a=a1, c=c, cdot=f.scatra.dbc.mask(cdot_new),
               fint=fint, fext=fext, t=t1, step=state["step"] + 1)
    return new


def make_step(f: SsiField, dt: float):
    if f.params.coupling == "monolithic":
        return make_monolithic_step(f, dt)

    sol, sc = f.solid, f.scatra

    @jax.jit
    def solve_structure(state, c_fixed):
        t1 = state["t"] + dt

        def residual(d):
            return _coupled_residuals(f, state, dt, d, c_fixed, t1)[0]

        d0 = sol.dbc.apply(state["d"], t1)
        sp = sol.params
        ms = 0.0 if sp.dyntype == "statics" else 1.0 / (sp.theta * dt * dt)
        M = sol.build_preconditioner(d0, dt=dt, mass_shift=ms)
        return newton_solve(residual, d0, sol.dbc.free_mask, M, sp.newton)

    @jax.jit
    def solve_scatra(state, d_fixed):
        t1 = state["t"] + dt

        def residual(c):
            return _coupled_residuals(f, state, dt, d_fixed, c, t1)[1]

        c0 = sc.dbc.apply(state["c"], t1)
        tt = sc.params
        cf = 0.0 if tt.dyntype == "stationary" else 1.0 / (max(tt.theta, 1e-300) * dt)
        M = sc.build_preconditioner(dt_factor=cf)
        return newton_solve(residual, c0, sc.dbc.free_mask, M, sc.params.newton)

    oneway = f.params.coupling == "oneway"

    def step(state):
        t1 = state["t"] + dt
        d, c = state["d"], state["c"]
        tot_n, tot_l, converged = 0, 0, True
        for it in range(1 if oneway else f.params.itemax_outer):
            c_new, st_c = solve_scatra(state, d)
            d_new, st_s = solve_structure(state, c_new)
            tot_n += int(st_c["iters"]) + int(st_s["iters"])
            tot_l += int(st_c["lin_iters"]) + int(st_s["lin_iters"])
            converged = bool(st_c["converged"]) and bool(st_s["converged"])
            dn = float(jnp.linalg.norm(d_new - d))
            cn = float(jnp.linalg.norm(c_new - c))
            d, c = d_new, c_new
            if oneway or max(dn, cn) < f.params.convtol_outer:
                break
        else:
            converged = False
        new = _finish(f, state, dt, d, c, t1)
        stats = {"iters": jnp.asarray(tot_n), "lin_iters": jnp.asarray(tot_l),
                 "resnorm": st_s["resnorm"], "dispnorm": st_s["dispnorm"],
                 "converged": jnp.asarray(converged)}
        return new, stats

    return step


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    with timers("setup"):
        f = build_field(deck)
        state = init_state(f)
        conc = f.conc_at_gps(state["c"])
        fint0, _ = f.solid.internal_force(state["d"], history=state["hist"] or None,
                                          temps=conc)
        state["fint"] = fint0
        state["fext"] = f.solid.external_force(state["t"], state["d"])
    cfg = deck.sections["ssi_dynamic"]
    cbs = list(callbacks or [])
    state, n_steps, cbs = drv.setup_restart(deck, "ssi", state, cfg["numstep"], cbs)

    state, agg = drv.time_loop(
        "ssi", state, lambda dt: make_step(f, dt), cfg["timestep"],
        n_steps, divercont="stop", callbacks=cbs, timers=timers,
    )
    solid_view = structure_driver.SolidFieldView(f.solid)
    return drv.RunResult(
        deck=deck,
        fields={"ssi": solid_view, "structure": solid_view,
                "scatra": _ScView()},
        states={"ssi": state,
                "structure": {"d": state["d"], "v": state["v"], "a": state["a"],
                              "hist": state["hist"]},
                "scatra": {"phi": state["c"], "phidot": state["cdot"]}},
        stats={"ssi": agg, "structure": agg, "scatra": agg},
        timers=timers,
    )


class _ScView:
    def node_value(self, state, quantity, node):
        if quantity.lower() in ("phi", "c", "conc"):
            return float(np.asarray(state["phi"])[node])
        raise KeyError(quantity)
