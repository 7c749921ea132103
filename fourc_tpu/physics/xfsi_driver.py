"""fsi_xfem problem driver: partitioned cut-FSI (embedded rigid wall).

Counterpart of the reference's XFEM FSI problem type
(ref: ProblemType::fsi_xfem in
4C_legacy_enum_definitions_problem_type.hpp; src/fsi_xfem XFSCoupling —
fluid on a fixed background mesh cut by the structure boundary, weak
Nitsche interface coupling, consistent traction transfer back).

Deck semantics: the level-set FUNCT embeds a rigid, spring-mounted wall
(mass m, stiffness k, sliding tangentially in x) in the CutFEM fluid.
Each step runs one Dirichlet-Neumann transfer (cut/fsi_cut.py): the wall
velocity is the fluid's embedded Dirichlet datum; the Nitsche-consistent
interface traction drives the wall's semi-implicit momentum update

    v <- v + dt/m (F_x(v) - k d),   d <- d + dt v.

This is the deck-facing slice of the cut-FSI engine; the deformable-
structure variant runs through the same transfer operators in
tests/test_fsi_cut.py and physics/fsi_driver.py's partitioned loop.
"""

from __future__ import annotations

import numpy as np

from fourc_tpu.cut.fsi_cut import step_partitioned
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics.xfluid_driver import _component_fn
from fourc_tpu.utils.timer import Timers


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    dyn = deck.sections["xfsi_dynamic"]
    name = next(iter(deck.disc))
    disc = deck.disc[name]
    if disc.dim != 2:
        raise NotImplementedError("fsi_xfem deck driver is 2D (quad4)")
    X = np.asarray(disc.coords)
    fm = deck.functions

    phi = np.asarray(fm.get(int(dyn["levelset_funct"]))(X, 0.0, component=0))
    conds = deck.conditions.get(name, {})
    strong = []
    for c in conds.get("dirichlet", ()):
        for k in range(min(2, len(c.onoff))):
            if c.onoff[k]:
                strong.append((c.nodes, k,
                               _component_fn(fm, c.funct[k], k, c.val[k], 0.0)))

    mat = next(iter(deck.materials.values()))
    mu = float(mat.get("viscosity", 1.0))
    conn = np.asarray(next(iter(disc.blocks.values())).conn)

    m = float(dyn["mass"])
    kspr = float(dyn["stiffness"])
    dt = float(dyn["timestep"])
    n_steps = int(dyn["numstep"])
    nitsche = float(dyn["nitsche"])

    d_w, v_w = 0.0, 0.0
    state = {"t": 0.0, "step": 0}
    agg = {"steps": 0}
    # restart: the cut-fluid solve is stationary per step — the wall ODE
    # state (d_w, v_w) IS the full persistent state
    cbs = list(callbacks or [])
    import jax.numpy as jnp

    combo = {"d_w": jnp.asarray(0.0), "v_w": jnp.asarray(0.0),
             "step": jnp.asarray(0), "t": jnp.asarray(0.0)}
    combo, n_steps, cbs = drv.setup_restart(deck, "xfsi", combo, n_steps, cbs)
    d_w, v_w = float(combo["d_w"]), float(combo["v_w"])
    state = {"t": float(combo["t"]), "step": int(combo["step"])}
    with timers("step"):
        for _ in range(n_steps):
            vel, p, cm, F = step_partitioned(
                X, conn, phi, mu, lambda x, y: (v_w, 0.0),
                strong_dirichlet=strong, nitsche=nitsche)
            v_w = v_w + dt / m * (float(F[0]) - kspr * d_w)
            d_w = d_w + dt * v_w
            state = {"vel": vel, "p": p, "t": state["t"] + dt,
                     "step": state["step"] + 1}
            agg["steps"] += 1
            if cbs:
                combo = {"d_w": jnp.asarray(d_w), "v_w": jnp.asarray(v_w),
                         "step": jnp.asarray(state["step"]),
                         "t": jnp.asarray(state["t"])}
                for cb in cbs:
                    cb("xfsi", combo, agg)
    agg.update(wall_disp=d_w, wall_vel=v_w, force_x=float(F[0]),
               force_y=float(F[1]))
    from fourc_tpu.physics.xfluid_driver import XFluidView

    return drv.RunResult(
        deck=deck, fields={"xfsi": XFluidView(cm, 2)},
        states={"xfsi": state}, stats={"xfsi": agg}, timers=timers,
    )
