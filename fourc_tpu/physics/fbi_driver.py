"""FBI: fluid-beam interaction (immersed flexible fibers).

Counterpart of the reference's fbi module (ref: src/fbi — fluid-beam
immersed coupling: beams embedded in an Eulerian fluid mesh, coupled by a
drag/penalty force along the centerline, 4C_fbi_*.cpp with the
beam-to-fluid meshtying pairs from src/fluid_beam_interaction).

Partitioned per step (weak/explicit exchange, the reference's default):
  1. interpolate the fluid velocity at the beam nodes (host-precomputed
     element pairing + in-element parametric coordinates, re-evaluated
     batched on device);
  2. beam solve with the distributed drag load
         f = c_d (u_fluid(x_b) - v_beam)   per unit length;
  3. the opposite force enters the fluid momentum as point sources at the
     hosting elements' nodes (delta-function spreading by shape value).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.physics import beam as pb
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import fluid as pf
from fourc_tpu.physics import fluid_driver
from fourc_tpu.physics import solid as ps
from fourc_tpu.physics import structure_driver
from fourc_tpu.physics.newton import newton_solve
from fourc_tpu.utils.timer import Timers
from fourc_tpu.cut.levelset import _inv_map, _quad_N


def _pair_points(points, coords, conn):
    """Host: find hosting quad4 + shape values for each point (2D)."""
    X = np.asarray(coords)[:, :2]
    conn = np.asarray(conn)
    lo = X[conn].min(axis=1)
    hi = X[conn].max(axis=1)
    host = np.full(len(points), -1, np.int32)
    wts = np.zeros((len(points), conn.shape[1]))
    for b, p in enumerate(np.asarray(points)[:, :2]):
        cand = np.where(np.all((p >= lo - 1e-9) & (p <= hi + 1e-9), 1))[0]
        for e in cand:
            xi = _inv_map(X[conn[e]], p)
            if np.all(np.abs(xi) <= 1 + 1e-8):
                host[b] = e
                wts[b] = _quad_N(xi)
                break
    return host, wts


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    cfg = deck.sections["fbi_dynamic"]
    dt = float(cfg["timestep"])
    cd = float(cfg["drag"])
    with timers("setup"):
        fluid = fluid_driver.build_field(deck, "fluid")
        from fourc_tpu.materials import make_material

        mats = {mid: make_material(s) for mid, s in deck.materials.items()}
        bconds = deck.conditions.get("beams", {})
        from fourc_tpu.physics.solid import SolidParams

        bdyn = deck.sections["structural_dynamic"]
        bparams = SolidParams(dyntype="onesteptheta", theta=1.0, dt=dt,
                              newton=drv.newton_params_from(
                                  bdyn, deck.sections["solver"]))
        beam = pb.BeamField(deck.disc["beams"], mats, bparams,
                            dirichlet=bconds.get("dirichlet", ()),
                            functions=deck.functions)
        fconn = next(iter(fluid.dofmap.blocks.values())).conn
        host, wts = _pair_points(np.asarray(beam.disc.coords),
                                 fluid.disc.coords, fconn)
        sel = host >= 0
        b_nodes = jnp.asarray(np.where(sel)[0].astype(np.int32))
        h_conn = jnp.asarray(np.asarray(fconn)[host[sel]])
        h_wts = jnp.asarray(wts[sel])
        # tributary beam length per node
        bcoords = np.asarray(beam.disc.coords)
        bconn = np.concatenate([np.asarray(b.conn)
                                for b in beam.disc.blocks.values()])
        L = np.linalg.norm(bcoords[bconn[:, 1]] - bcoords[bconn[:, 0]], 1)
        trib = np.zeros(beam.disc.n_nodes)
        np.add.at(trib, bconn.reshape(-1), np.repeat(
            np.linalg.norm(bcoords[bconn[:, 1]] - bcoords[bconn[:, 0]],
                           axis=1) / 2.0, 2))
        trib_j = jnp.asarray(trib)

    dim = fluid.dim
    state_f = pf.init_state(fluid)
    state_b = ps.compute_initial_state(beam, pb.init_state(beam))

    M_beam = beam.build_preconditioner(mass_shift=1.0 / (dt * dt))

    @jax.jit
    def solve_beam(state, fext_extra, t1):
        """One-step-theta (theta=1) beam step with the drag load threaded
        as an argument (keeps the program static across steps)."""
        d_n, v_n = state["d"], state["v"]

        def residual(d):
            fi, _ = beam.internal_force(d)
            v_new = (d - d_n) / dt
            return (fi + beam.mass_matvec((v_new - v_n) / dt)
                    - beam.external_force(t1) - fext_extra)

        u0 = beam.dbc.apply(d_n, t1)
        M = M_beam
        d, stats = newton_solve(residual, u0, beam.dbc.free_mask, M,
                                beam.params.newton)
        v1 = (d - d_n) / dt
        new = dict(state)
        new.update(d=d, v=v1, a=(v1 - v_n) / dt)
        return new, stats

    @jax.jit
    def fluid_vel_at_beams(xf):
        u = xf.reshape(-1, fluid.ndpn)[:, :dim]
        return jnp.einsum("bk,bkd->bd", h_wts, u[h_conn])

    @jax.jit
    def solve_fluid(state, f_beam_nodes, t1):
        x_n, xdot_n = state["x"], state["xdot"]
        fsrc = jnp.zeros((fluid.disc.n_nodes, dim))
        fsrc = fsrc.at[h_conn.reshape(-1)].add(
            (h_wts[..., None] * f_beam_nodes[:, None, :]).reshape(-1, dim))

        def residual(x):
            xdot = (x - x_n) / dt
            xdot = pf._zero_pressure_rate(fluid, xdot)
            r = fluid.residual_transient(x, xdot, t1, dt=dt)
            rm = r.reshape(-1, fluid.ndpn)
            rm = rm.at[:, :dim].add(-fsrc)
            return rm.reshape(-1)

        x0 = fluid.dbc.apply(x_n, t1)
        M = fluid.build_preconditioner(dt_factor=1.0 / dt, dt=dt)
        x, stats = newton_solve(residual, x0, fluid.dbc.free_mask, M,
                                pf._nonsym(fluid.params.newton))
        new = dict(state)
        new.update(x=x, xdot=pf._zero_pressure_rate(fluid, (x - x_n) / dt))
        return new, stats

    agg = {"steps": 0, "newton_iters": 0, "lin_iters": 0}
    t = 0.0
    drag_nodes = jnp.zeros((len(np.where(sel)[0]), dim))
    cbs = list(callbacks or [])
    combo = {"f": state_f, "b": state_b, "drag": drag_nodes,
             "step": jnp.asarray(0), "t": jnp.asarray(0.0)}
    combo, n_steps_rem, cbs = drv.setup_restart(deck, "fbi", combo,
                                                cfg["numstep"], cbs)
    state_f, state_b = combo["f"], combo["b"]
    drag_nodes, t = combo["drag"], float(combo["t"])
    for _ in range(n_steps_rem):
        t1 = t + dt
        # 1) fluid with last step's (opposite) beam drag
        state_f, st_f = solve_fluid(state_f, -drag_nodes, t1)
        # 2) drag on the beams from the fresh fluid velocity
        uf = fluid_vel_at_beams(state_f["x"])
        vb = state_b["v"].reshape(-1, 6)[b_nodes, :dim]
        drag_nodes = cd * trib_j[b_nodes][:, None] * (uf - vb)
        fext = jnp.zeros((beam.ndof,)).reshape(-1, 6)
        fext = fext.at[b_nodes, :dim].add(drag_nodes)
        state_b, st_b = solve_beam(state_b, fext.reshape(-1),
                                   jnp.asarray(t1))
        agg["newton_iters"] += int(st_f["iters"]) + int(st_b["iters"])
        agg["lin_iters"] += int(st_f["lin_iters"]) + int(st_b["lin_iters"])
        t = t1
        agg["steps"] += 1
        state_f = dict(state_f, t=jnp.asarray(t1), step=state_f["step"] + 1)
        state_b = dict(state_b, t=jnp.asarray(t1), step=state_b["step"] + 1)
        if cbs:
            combo = {"f": state_f, "b": state_b, "drag": drag_nodes,
                     "step": state_f["step"], "t": jnp.asarray(t)}
            for cb in cbs:
                cb("fbi", combo, agg)
    print(f"[fbi] {agg['steps']} steps")

    return drv.RunResult(
        deck=deck,
        fields={"fluid": fluid_driver.FluidFieldView(fluid),
                "beams": structure_driver.SolidFieldView(beam)},
        states={"fluid": state_f, "beams": state_b},
        stats={"fluid": agg, "beams": agg}, timers=timers,
    )
