"""FPSI: fluid - poroelastic-structure interaction.

Counterpart of the reference's fpsi module (ref: src/fpsi —
`FPSI::MonolithicPlain` / partitioned variants: free flow coupled to a
poroelastic (Biot) domain; interface conditions are the FSI kinematic/
dynamic pair PLUS pore-pressure continuity with the fluid pressure at the
interface, 4C_fpsi_coupling.*).

Partitioned per-step fixed point (Aitken accelerated), reusing the ALE +
matched-interface machinery of the FSI driver and the monolithic u-p Biot
solve of the poroelasticity driver:

  1. ALE mesh from the interface displacement; fluid solve with interface
     velocity = mesh velocity;
  2. extract the fluid interface REACTION (traction on the skeleton) and
     the fluid interface PRESSURE;
  3. poro solve: skeleton loaded by the fluid traction, pore pressure tied
     to the fluid pressure at the interface (penalty continuity);
  4. interface displacement <- skeleton displacement, Aitken relax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import fluid as pf
from fourc_tpu.physics import fluid_driver
from fourc_tpu.physics import fsi_driver
from fourc_tpu.physics import poro_driver
from fourc_tpu.physics import scalar_transport as st
from fourc_tpu.physics import solid as ps
from fourc_tpu.physics import structure_driver
from fourc_tpu.physics.newton import newton_solve
from fourc_tpu.utils.timer import Timers
from fourc_tpu.physics import ale as ale_mod
from fourc_tpu.coupling.adapter import MatchedCoupling


def run(deck, callbacks=None) -> drv.RunResult:
    from fourc_tpu.core.conditions import DirichletBC

    timers = Timers()
    cfg = deck.sections["fsi_dynamic"]
    fp = deck.sections["fpsi_dynamic"]
    dt = float(cfg["timestep"])
    with timers("setup"):
        iface = deck.conditions.get("__global__", {}).get("fsi_interface")
        if not iface:
            raise ValueError("fpsi deck needs a conditions: fsi_interface")
        item = iface[0]
        fdisc = deck.disc["fluid"]
        f_nodes = fdisc.node_sets[item["fluid"]]
        dim = fdisc.dim
        if_dbc = DirichletBC(f_nodes, [1] * dim + [0], [0.0] * (dim + 1))
        fluid = fluid_driver.build_field(deck, "fluid",
                                         extra_dirichlet=[if_dbc])
        poro = poro_driver.build_field(deck)
        sdisc = poro.solid.disc
        s_nodes = sdisc.node_sets[item["structure"]]
        coupling = MatchedCoupling(sdisc.coords, s_nodes, fdisc.coords,
                                   f_nodes)
        bnd = np.unique(np.concatenate([
            ids for nm, ids in fdisc.node_sets.items()
            if nm not in ("all",) and len(ids)]))
        ale = ale_mod.AleField(fdisc, coupling.slave_nodes, bnd)
        fsi_like = fsi_driver.FsiField(poro.solid, fluid, ale, coupling, cfg)
        solve_ale, solve_fluid, _ = fsi_driver.make_substeps(fsi_like, dt)
        k_pen = float(fp["pressure_penalty"])
        s_if = jnp.asarray(coupling.master_nodes)
        f_if = jnp.asarray(coupling.slave_nodes)

    state = poro_driver.init_state(poro)
    state_f = pf.init_state(fluid)
    nw = poro.solid.params.newton
    from dataclasses import replace

    if nw.lin_method == "cg":
        nw = replace(nw, lin_method="gmres")

    @jax.jit
    def solve_poro(state, if_load, p_fluid_if, t1):
        sol, pr = poro.solid, poro.pres
        fload = jnp.zeros((sol.ndof,), state["d"].dtype).reshape(-1, sol.ndpn)
        fload = fload.at[s_if].add(if_load)
        fload = fload.reshape(-1)

        def residual(y):
            d, p = poro.split(y)
            r_u, r_p, *_ = poro_driver._coupled_residuals(
                poro, state, dt, d, p, t1)
            r_u = r_u - fload
            # pore-pressure continuity with the fluid (penalty tie)
            r_p = r_p.at[s_if].add(k_pen * (p[s_if] - p_fluid_if))
            return poro.join(r_u, r_p)

        d0 = sol.dbc.apply(state["d"], t1)
        p0 = pr.dbc.apply(state["p"], t1)
        y0 = poro.join(d0, p0)
        M = poro.block_precond(d0, dt, pres_dt_factor=1.0 / dt)
        y, stats = newton_solve(residual, y0, poro.free_mask, M, nw)
        d, p = poro.split(y)
        return d, p, stats

    mesh_disp_n = jnp.zeros((fluid.disc.n_nodes, dim))
    d_if = jnp.zeros((len(coupling.slave_nodes), dim))
    agg = {"steps": 0, "outer_iters": 0, "newton_iters": 0, "lin_iters": 0}
    t = 0.0
    cbs = list(callbacks or [])
    combo = {"s": state, "f": state_f, "mesh_disp": mesh_disp_n,
             "d_if": d_if, "step": jnp.asarray(0), "t": jnp.asarray(0.0)}
    combo, n_steps_rem, cbs = drv.setup_restart(deck, "fpsi", combo,
                                                cfg["numstep"], cbs)
    state, state_f = combo["s"], combo["f"]
    mesh_disp_n, d_if, t = combo["mesh_disp"], combo["d_if"], float(combo["t"])
    for _step in range(n_steps_rem):
        t1 = t + dt
        omega = cfg.get("omega", 0.5)
        r_prev = None
        for it in range(cfg["itemax"]):
            mesh_disp = solve_ale(d_if)
            mesh_vel = (mesh_disp - mesh_disp_n) / dt
            state_f_new, react, stat_f = solve_fluid(state_f, mesh_disp,
                                                     mesh_vel, t1)
            p_fluid = state_f_new["x"].reshape(-1, fluid.ndpn)[f_if, dim]
            d_new, p_new, stat_s = solve_poro(state, -react, p_fluid, t1)
            d_tilde = d_new.reshape(-1, poro.solid.ndpn)[s_if, :dim]
            r = d_tilde - d_if
            rn = float(jnp.linalg.norm(r))
            agg["outer_iters"] += 1
            agg["newton_iters"] += int(stat_f["iters"]) + int(stat_s["iters"])
            agg["lin_iters"] += int(stat_f["lin_iters"]) + int(stat_s["lin_iters"])
            if r_prev is not None:
                drr = (r - r_prev).reshape(-1)
                den = float(drr @ drr)
                if den > 0:
                    omega = -omega * float(r_prev.reshape(-1) @ drr) / den
                    omega = min(max(omega, 0.05), 1.5)
            d_if = d_if + omega * r
            r_prev = r
            if rn < cfg["convtol"]:
                break
        mesh_disp = solve_ale(d_if)
        mesh_vel = (mesh_disp - mesh_disp_n) / dt
        state_f, react, _ = solve_fluid(state_f, mesh_disp, mesh_vel, t1)
        p_fluid = state_f["x"].reshape(-1, fluid.ndpn)[f_if, dim]
        d_new, p_new, _ = solve_poro(state, -react, p_fluid, t1)
        # _finish_state already bumps step/t (double-bump desynced the
        # restart checkpoint numbering)
        state = poro_driver._finish_state(poro, state, dt, d_new, p_new, t1)
        state_f = dict(state_f, t=jnp.asarray(t1), step=state_f["step"] + 1)
        mesh_disp_n = mesh_disp
        t = t1
        agg["steps"] += 1
        if cbs:
            combo = {"s": state, "f": state_f, "mesh_disp": mesh_disp_n,
                     "d_if": d_if, "step": state["step"], "t": jnp.asarray(t)}
            for cb in cbs:
                cb("fpsi", combo, agg)
    print(f"[fpsi] {agg['steps']} steps, {agg['outer_iters']} outer its")

    return drv.RunResult(
        deck=deck,
        fields={"structure": structure_driver.SolidFieldView(poro.solid),
                "fluid": fluid_driver.FluidFieldView(fluid),
                "fpsi": FpsiView(poro)},
        states={"structure": state, "fluid": state_f,
                "fpsi": {"d": state["d"], "p": state["p"],
                         "t": jnp.asarray(t)}},
        stats={"fpsi": agg, "structure": agg, "fluid": agg},
        timers=timers,
    )


class FpsiView:
    def __init__(self, poro):
        self.poro = poro

    def node_value(self, state, quantity, node):
        q = quantity.lower()
        if q in ("p", "pressure", "porepressure"):
            return float(np.asarray(state["p"])[node])
        comp = {"x": 0, "y": 1, "z": 2}
        if q.startswith("disp"):
            return float(np.asarray(state["d"]).reshape(
                -1, self.poro.solid.ndpn)[node, comp[q[-1]]])
        raise KeyError(quantity)
