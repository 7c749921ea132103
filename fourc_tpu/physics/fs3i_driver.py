"""FS3I: fluid-structure interaction + scalar transport in both domains.

Counterpart of the reference's fs3i module (ref: src/fs3i —
`FS3I::PartFS3I`: partitioned FSI plus one scalar field per subdomain,
coupled across the interface by a PERMEABILITY law (membrane gas
exchange), 4C_fs3i_partitioned.*; interface transfer with permeability
coefficients from the scatra coupling conditions).

Per time step:
  1. the partitioned FSI step (reused from fsi_driver's substeps, with
     Aitken-accelerated interface fixed point);
  2. ONE monolithic backward-Euler solve for the stacked concentrations
     y = [c_fluid; c_solid]: fluid scatra advected by the fresh fluid
     velocity on the deformed (ALE) mesh, solid scatra on the deformed
     solid, coupled by the antisymmetric interface flux

         q = P (c_f - c_s)       (membrane permeability P)

     applied at the matched interface nodes — conservative by
     construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import fluid_driver
from fourc_tpu.physics import fsi_driver
from fourc_tpu.physics import scalar_driver
from fourc_tpu.physics import scalar_transport as st
from fourc_tpu.physics import solid as ps
from fourc_tpu.physics import structure_driver
from fourc_tpu.physics.newton import NewtonParams, newton_solve
from fourc_tpu.utils.timer import Timers


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    cfg = deck.sections["fsi_dynamic"]
    s3 = deck.sections["fs3i_dynamic"]
    dt = float(cfg["timestep"])
    with timers("setup"):
        from fourc_tpu.materials import make_material

        f = fsi_driver.build_field(deck)
        solve_ale, solve_fluid, solve_structure = fsi_driver.make_substeps(f, dt)

        # one scalar field per subdomain; the deck names the scatra material
        # for each (the meshes' own mat ids point at fluid/solid materials)
        def scalar_on(disc_name, mat_id):
            disc = deck.disc[disc_name]
            m = make_material(deck.materials[int(mat_id)])
            mats = {int(np.asarray(blk.mat_id)[0]): m
                    for blk in disc.blocks.values()}
            conds = deck.conditions.get("scatra_" + disc_name, {})
            params = st.ScalarParams(dyntype="onesteptheta", theta=1.0, dt=dt,
                                     dtype=deck.problem["dtype"])
            return st.ScalarField(disc, mats, params,
                                  dirichlet=conds.get("dirichlet", ()),
                                  functions=deck.functions)

        sca_f = scalar_on("fluid", s3["scatra_mat_fluid"])
        sca_s = scalar_on("structure", s3["scatra_mat_structure"])
        perm = float(s3["permeability"])
        f_if = jnp.asarray(f.coupling.slave_nodes)
        s_if = jnp.asarray(f.coupling.master_nodes)

    from fourc_tpu.physics import fluid as pf

    state_s = ps.compute_initial_state(f.solid, ps.init_state(f.solid))
    state_f = pf.init_state(f.fluid)
    cf = st.init_state(sca_f)["phi"]
    if s3.get("c0_fluid"):
        cf = jnp.full_like(cf, float(s3["c0_fluid"]))
    cs = st.init_state(sca_s)["phi"]

    nf, ns = sca_f.ndof, sca_s.ndof
    free = jnp.concatenate([sca_f.dbc.free_mask, sca_s.dbc.free_mask])
    nw_c = NewtonParams(max_iter=5, tol_res=float(s3["tolres"]),
                        tol_disp=1e-30, combine="or", lin_method="bicgstab",
                        lin_maxiter=2000, lin_rtol=1e-10)
    Mf = sca_f.build_preconditioner(dt_factor=1.0 / dt)
    Ms = sca_s.build_preconditioner(dt_factor=1.0 / dt)

    @jax.jit
    def solve_scalars(cf_n, cs_n, un, mesh_disp, d_solid, t1):
        def residual(y):
            c_f, c_s = y[:nf], y[nf:]
            r_f = sca_f.residual_transient(c_f, (c_f - cf_n) / dt, t1, dt=dt,
                                           vel_nodes=un, mesh_disp=mesh_disp)
            r_s = sca_s.residual_transient(
                c_s, (c_s - cs_n) / dt, t1, dt=dt,
                mesh_disp=d_solid.reshape(-1, f.solid.ndpn))
            # membrane permeability flux (antisymmetric -> conservative)
            q = perm * (c_f[f_if] - c_s[s_if])
            r_f = r_f.at[f_if].add(q)
            r_s = r_s.at[s_if].add(-q)
            return jnp.concatenate([r_f, r_s])

        y0 = jnp.concatenate([sca_f.dbc.apply(cf_n, t1),
                              sca_s.dbc.apply(cs_n, t1)])

        def M(r):
            return jnp.concatenate([Mf(r[:nf]), Ms(r[nf:])])

        y, stats = newton_solve(residual, y0, free, M, nw_c)
        return y[:nf], y[nf:], stats

    dim = f.fluid.dim
    mesh_disp_n = jnp.zeros((f.fluid.disc.n_nodes, dim))
    d_if = jnp.zeros((len(f.coupling.slave_nodes), dim))
    agg = {"steps": 0, "newton_iters": 0, "lin_iters": 0, "outer_iters": 0}
    t = 0.0
    cbs = list(callbacks or [])
    combo = {"s": state_s, "f": state_f, "cf": cf, "cs": cs,
             "mesh_disp": mesh_disp_n, "d_if": d_if,
             "step": jnp.asarray(0), "t": jnp.asarray(0.0)}
    combo, n_steps_rem, cbs = drv.setup_restart(deck, "fs3i", combo,
                                                cfg["numstep"], cbs)
    state_s, state_f, cf, cs = combo["s"], combo["f"], combo["cf"], combo["cs"]
    mesh_disp_n, d_if, t = combo["mesh_disp"], combo["d_if"], float(combo["t"])
    step0 = int(combo["step"])
    for _step in range(n_steps_rem):
        t1 = t + dt
        omega = cfg.get("omega", 0.5)
        r_prev = None
        for it in range(cfg["itemax"]):
            mesh_disp = solve_ale(d_if)
            mesh_vel = (mesh_disp - mesh_disp_n) / dt
            state_f_new, react, stat_f = solve_fluid(state_f, mesh_disp,
                                                     mesh_vel, t1)
            state_s_new, stat_s = solve_structure(state_s, -react, t1)
            d_tilde = state_s_new["d"].reshape(-1, f.solid.ndpn)[
                f.coupling.master_nodes, :dim]
            r = d_tilde - d_if
            rn = float(jnp.linalg.norm(r))
            agg["outer_iters"] += 1
            if r_prev is not None:
                dr = (r - r_prev).reshape(-1)
                den = float(dr @ dr)
                if den > 0:
                    omega = -omega * float(r_prev.reshape(-1) @ dr) / den
                    omega = min(max(omega, 0.05), 1.5)
            d_if = d_if + omega * r
            r_prev = r
            if rn < cfg["convtol"]:
                break
        mesh_disp = solve_ale(d_if)
        mesh_vel = (mesh_disp - mesh_disp_n) / dt
        state_f, react, _ = solve_fluid(state_f, mesh_disp, mesh_vel, t1)
        state_s, _ = solve_structure(state_s, -react, t1)
        un = state_f["x"].reshape(-1, f.fluid.ndpn)[:, :dim]
        cf, cs, stat_c = solve_scalars(cf, cs, un, mesh_disp,
                                       state_s["d"], t1)
        agg["newton_iters"] += int(stat_c["iters"])
        agg["lin_iters"] += int(stat_c["lin_iters"])
        mesh_disp_n = mesh_disp
        t = t1
        agg["steps"] += 1
        if cbs:
            combo = {"s": state_s, "f": state_f, "cf": cf, "cs": cs,
                     "mesh_disp": mesh_disp_n, "d_if": d_if,
                     "step": jnp.asarray(step0 + agg["steps"]), "t": jnp.asarray(t)}
            for cb in cbs:
                cb("fs3i", combo, agg)
    print(f"[fs3i] {agg['steps']} steps, {agg['outer_iters']} outer FSI its")

    return drv.RunResult(
        deck=deck,
        fields={"structure": structure_driver.SolidFieldView(f.solid),
                "fluid": fluid_driver.FluidFieldView(f.fluid),
                "fs3i": Fs3iView(sca_f, sca_s)},
        states={"structure": state_s, "fluid": state_f,
                "fs3i": {"cf": cf, "cs": cs, "t": jnp.asarray(t)}},
        stats={"fs3i": agg, "structure": agg, "fluid": agg},
        timers=timers,
    )


class Fs3iView:
    def __init__(self, sca_f, sca_s):
        self.sca_f = sca_f
        self.sca_s = sca_s

    def node_value(self, state, quantity, node):
        q = quantity.lower()
        if q in ("cf", "phi_fluid"):
            return float(np.asarray(state["cf"])[node])
        if q in ("cs", "phi_structure"):
            return float(np.asarray(state["cs"])[node])
        raise KeyError(quantity)
