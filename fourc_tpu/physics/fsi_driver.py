"""FSI: partitioned Dirichlet-Neumann coupling with Aitken relaxation.

Counterpart of the reference's fsi module (ref: src/fsi —
`FSI::Partitioned` Dirichlet-Neumann fixed point with Aitken/IQN
acceleration, partitioned/4C_fsi_partitioned.cpp; ALE mesh motion; the
monolithic variants live in monolithic/).

Per time step (fixed-point iteration i):
  1. interface displacement iterate d_G -> ALE mesh solve on the fluid mesh
  2. fluid one-step-theta solve on the moving mesh with interface velocity
     Dirichlet u_G = (d_G - d_G_n)/dt
  3. interface reaction from the unmasked fluid momentum residual -> Neumann
     load on the structure -> structure solve -> new interface displacement
  4. Aitken update of d_G until the interface increment drops below tol

All three substeps are jitted; the fixed point is a host loop (compile
once, ~3-10 iterations/step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.coupling.adapter import MatchedCoupling
from fourc_tpu.materials import make_material
from fourc_tpu.physics import ale as ale_mod
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import fluid as pf
from fourc_tpu.physics import fluid_driver
from fourc_tpu.physics import solid as ps
from fourc_tpu.physics import structure_driver
from fourc_tpu.physics.newton import newton_solve
from fourc_tpu.utils.timer import Timers


class FsiField:
    def __init__(self, solid, fluid, ale, coupling, params):
        self.solid = solid
        self.fluid = fluid
        self.ale = ale
        self.coupling = coupling  # structure=master, fluid=slave
        self.params = params


def build_field(deck) -> FsiField:
    from fourc_tpu.core.conditions import DirichletBC

    cfg = deck.sections["fsi_dynamic"]
    iface = deck.conditions.get("__global__", {}).get("fsi_interface")
    if not iface:
        raise ValueError("fsi deck needs a conditions: fsi_interface entry")
    item = iface[0]
    fdisc = deck.disc["fluid"]
    f_nodes = fdisc.node_sets[item["fluid"]]
    dim = fdisc.dim
    # fluid interface velocity is Dirichlet-driven by the mesh velocity
    if_dbc = DirichletBC(f_nodes, [1] * dim + [0], [0.0] * (dim + 1))
    solid = structure_driver.build_field(deck, "structure")
    fluid = fluid_driver.build_field(deck, "fluid", extra_dirichlet=[if_dbc])

    sdisc = solid.disc
    s_nodes = sdisc.node_sets[item["structure"]]
    coupling = MatchedCoupling(sdisc.coords, s_nodes, fdisc.coords, f_nodes)

    # ALE: fluid boundary = all fluid boundary node sets; interface moves
    bnd = np.unique(np.concatenate([
        ids for nm, ids in fdisc.node_sets.items()
        if nm not in ("all",) and len(ids)
    ]))
    ale = ale_mod.AleField(fdisc, coupling.slave_nodes, bnd)
    return FsiField(solid, fluid, ale, coupling, cfg)


def make_monolithic_step(f: FsiField, dt: float):
    """Monolithic FSI: one Newton-Krylov on the stacked unknowns
    y = [d_s; x_f; d_m] (structure displacement, fluid vel+pressure, ALE
    mesh displacement).

    Counterpart of the reference's FSI::Monolithic 3-field block Newton
    (ref: src/fsi/src/monolithic/4C_fsi_monolithic.cpp:424,935-1099 with
    interface condensation).  TPU-native condensation: fluid interface
    velocity dofs and ALE interface dofs are SLAVES of the structure
    interface motion (u_G = (d_G - d_G_n)/dt backward-difference-consistent
    with the fluid OST step, d_m|G = d_G); their residual rows transfer to
    the structure interface rows (like mesh tying across fields), and the
    exact coupled tangent — including shape derivatives through the ALE
    block — is jax.jvp through the stacked residual.
    """
    solid, fluid, ale = f.solid, f.fluid, f.ale
    th_f = fluid.params.theta if fluid.params.dyntype == "onesteptheta" else 1.0
    sp = solid.params
    th_s = sp.theta if sp.dyntype == "onesteptheta" else 1.0
    dim = fluid.dim
    nd, nf = solid.ndof, fluid.ndof
    nm = ale.disc.n_nodes * dim
    s_if = f.coupling.master_nodes  # structure interface nodes
    f_if = f.coupling.slave_nodes  # fluid/ALE interface nodes

    # masks for the stacked vector
    free_s = solid.dbc.free_mask
    free_f = fluid.dbc.free_mask  # interface vel dofs already constrained
    ale_free = ale.free  # (n_nodes,) node-level
    free_m = jnp.repeat(ale_free, dim)

    def split(y):
        return y[:nd], y[nd:nd + nf], y[nd + nf:]

    def step(state):
        t1 = state["t"] + dt
        d_n = state["d"]
        x_n, xdot_n = state["xf"], state["xfdot"]
        dm_n = state["mesh_disp"].reshape(-1)

        d_if_n = d_n.reshape(-1, solid.ndpn)[s_if, :dim]

        def residual(y):
            d, x, m3 = split(y)
            mdisp = m3.reshape(-1, dim)
            # slave values driven by the structure interface motion
            d_if = d.reshape(-1, solid.ndpn)[s_if, :dim]
            mdisp = mdisp.at[f_if].set(d_if)
            mesh_vel = (mdisp - dm_n.reshape(-1, dim)) / dt
            x = x.reshape(-1, fluid.ndpn).at[f_if, :dim].set(mesh_vel[f_if]) \
                .reshape(-1)

            # structure residual (+ fluid interface reaction added below)
            fint, _ = solid.internal_force(d, history=state["hist"] or None, dt=dt)
            r_s = fint - solid.external_force(t1, d)
            if sp.dyntype != "statics":
                v_new = (d - d_n) / (th_s * dt) - (1 - th_s) / th_s * state["v"]
                a_mid = (v_new - state["v"]) / dt
                r_s = r_s + solid.mass_matvec(a_mid)

            # fluid residual on the moving mesh
            xdot = (x - x_n) / (th_f * dt) - (1 - th_f) / th_f * xdot_n
            xdot = pf._zero_pressure_rate(fluid, xdot)
            r_f = fluid.residual_transient(x, xdot, t1, dt=dt,
                                           mesh_disp=mdisp, mesh_vel=mesh_vel)

            # interface condensation: fluid momentum rows at the interface
            # transfer onto the structure interface rows (equilibrium)
            rf_n = r_f.reshape(-1, fluid.ndpn)
            react = rf_n[f_if, :dim]  # (n_if, dim)
            rs_n = r_s.reshape(-1, solid.ndpn)
            rs_n = rs_n.at[s_if, :dim].add(react)
            r_s = rs_n.reshape(-1)

            # ALE residual (Laplace) on free mesh nodes
            r_m = jnp.stack(
                [ale._laplace(mdisp[:, c]) for c in range(dim)], axis=-1
            ).reshape(-1)

            r_s = jnp.where(free_s, r_s, 0.0)
            r_f = jnp.where(free_f, r_f, 0.0)
            r_m = jnp.where(free_m, r_m, 0.0)
            return jnp.concatenate([r_s, r_f, r_m])

        d0 = solid.dbc.apply(d_n, t1)
        x0 = jnp.where(free_f, x_n, fluid.dbc.values(t1))
        y0 = jnp.concatenate([d0, x0, dm_n])
        mask = jnp.concatenate([free_s, free_f, free_m])

        ms = 0.0 if sp.dyntype == "statics" else 1.0 / (th_s * dt * dt)
        Ms = solid.build_preconditioner(d0, dt=dt, mass_shift=ms)
        Mf = fluid.build_preconditioner(dt_factor=1.0 / (th_f * dt), dt=dt)
        dinv_m = jnp.repeat(ale._dinv, dim)
        Mm = lambda rm: dinv_m * rm  # noqa: E731

        from fourc_tpu.linalg import blockprec

        # AMGnxn-analog block preconditioning (linalg/blockprec.py):
        # "diag" = field-decoupled; "bgs" = coupling-aware forward sweep
        # with matrix-free jvp off-diagonal blocks
        if str(f.params.get("block_precond", "diag")) == "bgs":
            M = blockprec.block_gauss_seidel(
                residual, y0, [Ms, Mf, Mm], [nd, nf, nm], mask,
                sweeps=int(f.params.get("bgs_sweeps", 1)))
        else:
            M = blockprec.block_diagonal([Ms, Mf, Mm], [nd, nf, nm])

        from dataclasses import replace

        nw = sp.newton
        if nw.lin_method == "cg":
            nw = replace(nw, lin_method="gmres")
        y, stats = newton_solve(residual, y0, mask, M, nw)
        d, x, m3 = split(y)
        # spread the slave values for the accepted state
        mdisp = m3.reshape(-1, dim)
        d_if = d.reshape(-1, solid.ndpn)[s_if, :dim]
        mdisp = mdisp.at[f_if].set(d_if)
        mesh_vel = (mdisp - dm_n.reshape(-1, dim)) / dt
        x = x.reshape(-1, fluid.ndpn).at[f_if, :dim].set(mesh_vel[f_if]).reshape(-1)
        xdot1 = pf._zero_pressure_rate(
            fluid, (x - x_n) / (th_f * dt) - (1 - th_f) / th_f * xdot_n)

        new = dict(state)
        if sp.dyntype == "statics":
            v1 = jnp.zeros_like(d)
            a1 = jnp.zeros_like(d)
        else:
            v1 = (d - d_n) / (th_s * dt) - (1 - th_s) / th_s * state["v"]
            a1 = (v1 - state["v"]) / (th_s * dt) - (1 - th_s) / th_s * state["a"]
        new.update(d=d, v=v1, a=a1, xf=x, xfdot=fluid.dbc.mask(xdot1),
                   mesh_disp=mdisp, t=t1, step=state["step"] + 1)
        return new, stats

    return jax.jit(step)


def make_substeps(f: FsiField, dt: float):
    solid, fluid = f.solid, f.fluid
    th_f = fluid.params.theta if fluid.params.dyntype == "onesteptheta" else 1.0
    sp = solid.params
    th_s = sp.theta if sp.dyntype == "onesteptheta" else 1.0
    dim = fluid.dim

    @jax.jit
    def solve_ale(if_disp):
        return f.ale.solve(if_disp)

    @jax.jit
    def solve_fluid(state_f, mesh_disp, mesh_vel, t1):
        x_n, xdot_n = state_f["x"], state_f["xdot"]
        # Dirichlet values: deck BCs + interface velocity = mesh velocity
        uD = fluid.dbc.values(t1).reshape(-1, fluid.ndpn)
        uD = uD.at[f.coupling.slave_nodes, :dim].set(
            mesh_vel[f.coupling.slave_nodes]
        ).reshape(-1)

        def residual(x):
            xdot = (x - x_n) / (th_f * dt) - (1 - th_f) / th_f * xdot_n
            xdot = pf._zero_pressure_rate(fluid, xdot)
            return fluid.residual_transient(x, xdot, t1, dt=dt,
                                            mesh_disp=mesh_disp, mesh_vel=mesh_vel)

        x0 = jnp.where(fluid.dbc.free_mask, x_n, uD)
        M = fluid.build_preconditioner(dt_factor=1.0 / (th_f * dt), dt=dt)
        x, stats = newton_solve(residual, x0, fluid.dbc.free_mask, M,
                                pf._nonsym(fluid.params.newton))
        xdot1 = pf._zero_pressure_rate(
            fluid, (x - x_n) / (th_f * dt) - (1 - th_f) / th_f * xdot_n)
        # interface reaction: unmasked momentum residual at interface dofs
        r_full = fluid.residual_transient(x, fluid.dbc.mask(xdot1), t1, dt=dt,
                                          mesh_disp=mesh_disp, mesh_vel=mesh_vel)
        react = r_full.reshape(-1, fluid.ndpn)[f.coupling.slave_nodes, :dim]
        new = dict(state_f)
        new.update(x=x, xdot=fluid.dbc.mask(xdot1), x_nm1=x_n)
        return new, react, stats

    @jax.jit
    def solve_structure(state_s, if_force_structure_nodes, t1):
        d_n, v_n, a_n = state_s["d"], state_s["v"], state_s["a"]
        hist = state_s["hist"] or None
        fload = jnp.zeros((solid.ndof,), d_n.dtype).reshape(-1, solid.ndpn)
        fload = fload.at[f.coupling.master_nodes].add(if_force_structure_nodes)
        fload = fload.reshape(-1)

        def residual(d):
            fi, _ = solid.internal_force(d, history=hist, dt=dt)
            r = fi - solid.external_force(t1, d) - fload
            if sp.dyntype != "statics":
                v_new = (d - d_n) / (th_s * dt) - (1 - th_s) / th_s * v_n
                a_mid = (v_new - v_n) / dt
                r = r + solid.mass_matvec(a_mid)
            return r

        u0 = solid.dbc.apply(d_n, t1)
        ms = 0.0 if sp.dyntype == "statics" else 1.0 / (th_s * dt * dt)
        M = solid.build_preconditioner(u0, history=hist, dt=dt, mass_shift=ms)
        d, stats = newton_solve(residual, u0, solid.dbc.free_mask, M, sp.newton)
        new = dict(state_s)
        if sp.dyntype == "statics":
            v1 = jnp.zeros_like(d)
            a1 = jnp.zeros_like(d)
        else:
            v1 = (d - d_n) / (th_s * dt) - (1 - th_s) / th_s * v_n
            a1 = (v1 - v_n) / (th_s * dt) - (1 - th_s) / th_s * a_n
        fint_new, hist_new = solid.internal_force(d, history=hist, dt=dt)
        new.update(d=d, v=v1, a=a1, fint=fint_new,
                   fext=solid.external_force(t1, d) + fload,
                   hist=hist_new or state_s["hist"])
        return new, stats

    return solve_ale, solve_fluid, solve_structure


def run(deck, callbacks=None) -> drv.RunResult:
    if deck.sections["fsi_dynamic"]["coupling"] == "monolithic":
        return _run_monolithic(deck, callbacks)
    timers = Timers()
    with timers("setup"):
        f = build_field(deck)
        cfg = f.params
        dt = cfg["timestep"]
        state_s = ps.compute_initial_state(f.solid, ps.init_state(f.solid))
        state_f = pf.init_state(f.fluid)
        solve_ale, solve_fluid, solve_structure = make_substeps(f, dt)

    dim = f.fluid.dim
    n_if = len(f.coupling.slave_nodes)
    mesh_disp_n = jnp.zeros((f.fluid.disc.n_nodes, dim))
    d_if = jnp.zeros((n_if, dim))  # interface displacement (interface order)
    agg = {"steps": 0, "outer_iters": 0, "newton_iters": 0, "lin_iters": 0}
    t = 0.0

    # restart: checkpoint the COMBINED partitioned state (both fields +
    # interface/mesh history) under one name (ref: every field implements
    # read_restart; 4C_fsi_partitionedmonolithic restart flow)
    cbs = list(callbacks or [])
    combo = {"s": state_s, "f": state_f, "mesh_disp": mesh_disp_n,
             "d_if": d_if, "step": jnp.asarray(0), "t": jnp.asarray(0.0)}
    combo, n_steps_rem, cbs = drv.setup_restart(
        deck, "fsi", combo, cfg["numstep"], cbs)
    state_s, state_f = combo["s"], combo["f"]
    mesh_disp_n, d_if, t = combo["mesh_disp"], combo["d_if"], float(combo["t"])

    import time as _time

    t_wall = _time.perf_counter()
    for step in range(n_steps_rem):
        t1 = t + dt
        d_if_n = d_if
        omega = cfg.get("omega", 0.5)
        r_prev = None
        for it in range(cfg["itemax"]):
            mesh_disp = solve_ale(d_if)
            mesh_vel = (mesh_disp - mesh_disp_n) / dt
            state_f_new, react, stat_f = solve_fluid(state_f, mesh_disp, mesh_vel, t1)
            # force fluid exerts on the wall = -reaction; interface order
            load = -react
            state_s_new, stat_s = solve_structure(state_s, load, t1)
            d_if_tilde = state_s_new["d"].reshape(-1, f.solid.ndpn)[
                f.coupling.master_nodes, :dim]
            r = d_if_tilde - d_if
            rn = float(jnp.linalg.norm(r))
            agg["outer_iters"] += 1
            agg["newton_iters"] += int(stat_f["iters"]) + int(stat_s["iters"])
            agg["lin_iters"] += int(stat_f["lin_iters"]) + int(stat_s["lin_iters"])
            if r_prev is not None:
                dr = (r - r_prev).reshape(-1)
                denom = float(dr @ dr)
                if denom > 0:
                    omega = -omega * float(r_prev.reshape(-1) @ dr) / denom
                    omega = min(max(omega, 0.05), 1.5)
            d_if = d_if + omega * r
            r_prev = r
            if rn < cfg["convtol"]:
                break
        else:
            raise RuntimeError(f"FSI fixed point did not converge at t={t1:g} "
                               f"(last interface increment {rn:g})")
        # accept step with the converged interface position
        mesh_disp = solve_ale(d_if)
        mesh_vel = (mesh_disp - mesh_disp_n) / dt
        state_f, react, _ = solve_fluid(state_f, mesh_disp, mesh_vel, t1)
        state_s, _ = solve_structure(state_s, -react, t1)
        state_f = dict(state_f, t=jnp.asarray(t1), step=state_f["step"] + 1)
        state_s = dict(state_s, t=jnp.asarray(t1), step=state_s["step"] + 1)
        mesh_disp_n = mesh_disp
        t = t1
        agg["steps"] += 1
        if cbs:
            combo = {"s": state_s, "f": state_f, "mesh_disp": mesh_disp_n,
                     "d_if": d_if, "step": state_s["step"],
                     "t": jnp.asarray(t)}
            for cb in cbs:
                cb("fsi", combo, agg)
    agg["walltime"] = _time.perf_counter() - t_wall
    print(f"[fsi] {agg['steps']} steps, {agg['outer_iters']} outer its, "
          f"{agg['newton_iters']} Newton its, {agg['walltime']:.3f}s wall")

    return drv.RunResult(
        deck=deck,
        fields={
            "structure": structure_driver.SolidFieldView(f.solid),
            "fluid": fluid_driver.FluidFieldView(f.fluid),
            "fsi": FsiView(f),
        },
        states={"structure": state_s, "fluid": state_f,
                "fsi": {"mesh_disp": mesh_disp_n, "d_if": d_if}},
        stats={"structure": agg, "fluid": agg, "fsi": agg},
        timers=timers,
    )


def _run_monolithic(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    with timers("setup"):
        f = build_field(deck)
        cfg = f.params
        dt = cfg["timestep"]
        s = ps.compute_initial_state(f.solid, ps.init_state(f.solid))
        fl = pf.init_state(f.fluid)
        dim = f.fluid.dim
        state = {
            "d": s["d"], "v": s["v"], "a": s["a"], "hist": s["hist"],
            "xf": fl["x"], "xfdot": fl["xdot"],
            "mesh_disp": jnp.zeros((f.fluid.disc.n_nodes, dim), s["d"].dtype),
            "t": s["t"], "step": s["step"],
        }

    cbs = list(callbacks or [])
    state, _nsteps, cbs = drv.setup_restart(deck, "fsi", state,
                                            cfg["numstep"], cbs)
    state, agg = drv.time_loop(
        "fsi", state, lambda dtt: make_monolithic_step(f, dtt), dt,
        _nsteps, divercont="stop", callbacks=cbs,
        timers=timers,
    )
    return drv.RunResult(
        deck=deck,
        fields={"structure": structure_driver.SolidFieldView(f.solid),
                "fluid": fluid_driver.FluidFieldView(f.fluid),
                "fsi": FsiView(f)},
        states={"structure": {"d": state["d"], "v": state["v"], "a": state["a"],
                              "hist": state["hist"]},
                "fluid": {"x": state["xf"], "xdot": state["xfdot"]},
                "fsi": state},
        stats={"structure": agg, "fluid": agg, "fsi": agg},
        timers=timers,
    )


class FsiView:
    def __init__(self, f):
        self.f = f

    def node_value(self, state, quantity, node):
        raise KeyError("query structure/fluid fields directly")
