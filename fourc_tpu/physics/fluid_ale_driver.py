"""fluid_ale problem driver: Navier-Stokes on a moving (ALE) mesh.

Counterpart of the reference's fluid-on-ALE problem type
(ref: ProblemType::fluid_ale in
4C_legacy_enum_definitions_problem_type.hpp; src/fluid
4C_fluid_timint_ale.* — convective velocity u - u_grid, geometry at the
displaced configuration).

Deck semantics: ``ale_dirichlet`` conditions prescribe the mesh motion
(VAL*FUNCT per component, all components constrained); the interior mesh
displacement follows the ALE smoother (physics/ale.py).  The fluid solves
the one-step-theta ALE form: residual evaluated on the displaced geometry
with grid-velocity convection, mesh velocity by backward difference —
exactly the transfer the partitioned FSI driver uses
(physics/fsi_driver.py), but with *prescribed* motion instead of a
structure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.core.conditions import DirichletHandler
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import fluid as pf
from fourc_tpu.physics.ale import AleField
from fourc_tpu.physics.fluid_driver import FluidFieldView, build_field
from fourc_tpu.physics.newton import newton_solve
from fourc_tpu.utils.timer import Timers


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    dyn = deck.sections["fluid_dynamic"]
    if dyn["dynamictype"] != "onesteptheta":
        raise NotImplementedError("fluid_ale supports onesteptheta")
    name = next(iter(deck.disc))
    disc = deck.disc[name]
    dim = disc.dim
    conds = deck.conditions.get(name, {})
    ale_bcs = list(conds.get("ale_dirichlet", ()))
    if not ale_bcs:
        raise ValueError("fluid_ale needs ale_dirichlet conditions "
                         "(the prescribed mesh motion)")
    for c in ale_bcs:
        if any(not o for o in c.onoff[:dim]):
            raise ValueError("ale_dirichlet must constrain all mesh-"
                             "displacement components")

    with timers("setup"):
        f = build_field(deck, disc_name=name)
        handler = DirichletHandler(ale_bcs, np.asarray(disc.coords), dim,
                                   deck.functions)
        fixed = ~np.asarray(handler.free_mask).reshape(-1, dim)
        moving = np.nonzero(fixed.any(axis=1))[0].astype(np.int32)
        ale = AleField(disc, interface_nodes=moving,
                       boundary_nodes=np.zeros((0,), np.int32),
                       method="laplace")
        state = pf.init_state(f)
        state["mesh_disp"] = jnp.zeros((disc.n_nodes, dim))

    dt = float(dyn["timestep"])
    th = float(dyn["theta"])
    n_steps = int(dyn["numstep"])

    @jax.jit
    def step(state):
        t1 = state["t"] + dt
        uD = handler.values(t1).reshape(-1, dim)[moving]
        mdisp = ale.solve(uD)
        mvel = (mdisp - state["mesh_disp"]) / dt
        x_n, xdot_n = state["x"], state["xdot"]

        def residual(x):
            xdot = (x - x_n) / (th * dt) - (1 - th) / th * xdot_n
            xdot = pf._zero_pressure_rate(f, xdot)
            return f.residual_transient(x, xdot, t1, dt=dt,
                                        mesh_disp=mdisp, mesh_vel=mvel)

        x0 = f.dbc.apply(state["x"], t1)
        M = f.build_preconditioner(dt_factor=1.0 / (th * dt))
        x, stats = newton_solve(residual, x0, f.dbc.free_mask, M,
                                pf._nonsym(f.params.newton))
        xdot1 = (x - x_n) / (th * dt) - (1 - th) / th * xdot_n
        xdot1 = pf._zero_pressure_rate(f, xdot1)
        new = dict(state)
        new.update(x=x, xdot=xdot1, x_nm1=x_n, mesh_disp=mdisp, t=t1,
                   step=state["step"] + 1)
        return new, stats

    cbs = list(callbacks or [])
    state, _nsteps, cbs = drv.setup_restart(deck, "fluid_ale", state, n_steps, cbs)
    state, agg = drv.time_loop(
        "fluid_ale", state, lambda _dt: step, dt, _nsteps,
        divercont=dyn["divercont"], callbacks=cbs,
        timers=timers,
    )
    return drv.RunResult(
        deck=deck, fields={"fluid_ale": FluidAleView(f)},
        states={"fluid_ale": state}, stats={"fluid_ale": agg},
        timers=timers,
    )


class FluidAleView(FluidFieldView):
    def node_value(self, state, quantity, node):
        q = quantity.lower()
        if q.startswith("mdisp"):
            comp = "xyz".index(q[5])
            return float(np.asarray(state["mesh_disp"])[node, comp])
        return super().node_value(state, quantity, node)
