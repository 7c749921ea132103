"""Low-Mach-number flow driver (thermally expanding gas).

Counterpart of the reference's loma algorithm
(ref: src/loma — `LowMach::Algorithm`, partitioned fluid + scatra
(temperature) iteration with the loma fluid element variant: variable
density rho = p_thermo/(R T) at constant thermodynamic pressure and the
continuity source div u = (1/T) DT/Dt; materials 4C_mat_sutherland.*).

Per time step (Godunov-partitioned, the reference's non-iterative option):
  1. temperature: backward-Euler advection-diffusion with the fluid
     velocity (ScalarField with numeric convective velocity);
  2. fluid: one-step-theta Navier-Stokes with rho(T) at the Gauss points
     and the thermal-expansion continuity source from the fresh T.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.materials import make_material
from fourc_tpu.ops import common as gm
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import fluid as pf
from fourc_tpu.physics import scalar_transport as st
from fourc_tpu.physics.newton import NewtonParams, newton_solve
from fourc_tpu.utils.timer import Timers


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    dyn = deck.sections["loma_dynamic"]
    solver = deck.sections["solver"]
    dt = float(dyn["timestep"])
    p0 = float(dyn["p_thermo"])
    Rgas = float(dyn["gas_constant"])

    with timers("setup"):
        disc = next(iter(deck.disc.values()))
        mats = {mid: make_material(s) for mid, s in deck.materials.items()}
        fluid_mats = {k: m for k, m in mats.items()
                      if getattr(m, "kind", "") == "fluid"}
        scat_mats = {k: m for k, m in mats.items()
                     if getattr(m, "kind", "") in ("scatra", "thermo")}
        fieldname = next(iter(deck.disc))
        conds = deck.conditions.get(fieldname, {})
        tconds = deck.conditions.get("thermo", {})

        fparams = pf.FluidParams(dyntype="onesteptheta", theta=1.0, dt=dt,
                                 newton=drv.newton_params_from(
                                     deck.sections["fluid_dynamic"], solver),
                                 dtype=deck.problem["dtype"])
        if fparams.newton.lin_method == "cg":
            fparams.newton.lin_method = "gmres"
        ff = pf.FluidField(disc, fluid_mats or mats, fparams,
                           dirichlet=conds.get("dirichlet", ()),
                           functions=deck.functions)

        sparams = st.ScalarParams(dyntype="onesteptheta", theta=1.0, dt=dt,
                                  initial_funct=dyn.get("initial_t_funct", 0),
                                  dtype=deck.problem["dtype"])
        # the mesh blocks carry the FLUID material id; the temperature field
        # uses the thermo material for every block (ref: loma's cloned
        # scatra discretization with its own material assignment)
        thermo_mat = next(iter(scat_mats.values())) if scat_mats else None
        scat_by_block = {
            int(np.asarray(blk.mat_id)[0]): thermo_mat
            for blk in disc.blocks.values()
        } if thermo_mat else mats
        fs = st.ScalarField(disc, scat_by_block, sparams,
                            dirichlet=tconds.get("dirichlet", ()),
                            neumann=tconds.get("neumann", ()),
                            body_forces=tconds.get("body_force", ()),
                            functions=deck.functions)

    dtype = (jnp.float64 if deck.problem["dtype"] == "float64"
             and jax.config.jax_enable_x64 else jnp.float32)
    x0 = pf.init_state(ff)
    T0 = st.init_state(fs)["phi"].astype(dtype)
    state = {"x": x0["x"], "xdot": x0["xdot"], "T": T0,
             "t": jnp.asarray(0.0, dtype), "step": jnp.asarray(0)}

    nw_T = NewtonParams(max_iter=5, tol_res=dyn["tolres"], tol_disp=1e-30,
                        combine="or", lin_method="bicgstab",
                        lin_maxiter=solver["maxiter"],
                        lin_rtol=solver["rtol"])
    M_T = fs.build_preconditioner(dt_factor=1.0 / dt)
    M_F = ff.build_preconditioner(dt_factor=1.0 / dt, dt=dt)

    def gp_interp(f_nodes):
        """Nodal scalar -> {block: (e, g)} GP values."""
        out = {}
        for key in ff.dofmap.blocks:
            cell = ff._cell(key)
            conn = ff.dofmap.blocks[key].conn
            out[key] = jnp.einsum("ga,ea->eg",
                                  jnp.asarray(cell.N, dtype), f_nodes[conn])
        return out

    @jax.jit
    def step(state):
        t1 = state["t"] + dt
        Tn = state["T"]
        xn, xdn = state["x"], state["xdot"]
        un = xn.reshape(-1, ff.ndpn)[:, : ff.dim]

        # 1) temperature with the current velocity
        def res_T(T1):
            return fs.residual_transient(T1, (T1 - Tn) / dt, t1, dt=dt,
                                         vel_nodes=un)

        T1 = fs.dbc.apply(Tn, t1)
        T1, stats_T = newton_solve(res_T, T1, fs.dbc.free_mask, M_T, nw_T)

        # 2) fluid with rho(T1) and the expansion source (1/T) DT/Dt
        rho_gp = {k: p0 / (Rgas * v) for k, v in gp_interp(T1).items()}
        # material derivative at nodes, then to GPs
        gradT_gp = {}
        for key in ff.dofmap.blocks:
            cell = ff._cell(key)
            conn = ff.dofmap.blocks[key].conn
            G, _ = gm.iso_gradients(ff.block_X[key], cell.dN)
            gradT_gp[key] = jnp.einsum("egad,ea->egd", G, T1[conn])
        u_gp = {k: jnp.einsum("ga,ead->egd", jnp.asarray(ff._cell(k).N, dtype),
                              un[ff.dofmap.blocks[k].conn])
                for k in ff.dofmap.blocks}
        Tdot_gp = gp_interp((T1 - Tn) / dt)
        T_gp = gp_interp(T1)
        src = {k: (Tdot_gp[k] + jnp.einsum("egd,egd->eg", u_gp[k],
                                           gradT_gp[k])) / T_gp[k]
               for k in ff.dofmap.blocks}

        def res_F(x1):
            return ff.residual_transient(x1, (x1 - xn) / dt, t1, dt=dt,
                                         rho_gp=rho_gp, cont_src_gp=src)

        x1 = ff.dbc.apply(xn, t1)
        x1, stats_F = newton_solve(res_F, x1, ff.dbc.free_mask, M_F,
                                   ff.params.newton)
        new = dict(state)
        new.update(x=x1, xdot=(x1 - xn) / dt, T=T1, t=t1,
                   step=state["step"] + 1)
        stats = {
            "iters": stats_F["iters"] + stats_T["iters"],
            "lin_iters": stats_F["lin_iters"] + stats_T["lin_iters"],
            "resnorm": jnp.maximum(stats_F["resnorm"], stats_T["resnorm"]),
            "converged": jnp.logical_and(stats_F["converged"],
                                         stats_T["converged"]),
        }
        return new, stats

    cbs = list(callbacks or [])
    state, _nsteps, cbs = drv.setup_restart(deck, "loma", state, dyn["numstep"], cbs)
    state, agg = drv.time_loop(
        "loma", state, lambda _dt: step, dt, _nsteps,
        divercont="stop", callbacks=cbs, timers=timers,
    )
    return drv.RunResult(
        deck=deck, fields={"loma": LomaView(ff, fs)},
        states={"loma": state}, stats={"loma": agg}, timers=timers,
    )


class LomaView:
    def __init__(self, ff, fs):
        self.f = ff
        self.fs = fs

    def node_value(self, state, quantity, node):
        q = quantity.lower()
        if q in ("t", "temp", "temperature", "phi"):
            return float(np.asarray(state["T"])[node])
        x = np.asarray(state["x"]).reshape(-1, self.f.ndpn)
        if q == "velx":
            return float(x[node, 0])
        if q == "vely":
            return float(x[node, 1])
        if q in ("p", "pressure", "pres"):
            return float(x[node, self.f.dim])
        raise KeyError(quantity)
