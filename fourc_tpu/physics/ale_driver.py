"""Pure ALE problem driver: deck -> AleField -> prescribed-motion loop.

Counterpart of the reference's standalone ALE problem type
(ref: src/ale/4C_ale_dyn.cpp `dyn_ale_drt` — pure mesh-motion problem
driven by Dirichlet conditions; ProblemType::ale in
4C_legacy_enum_definitions_problem_type.hpp).

Deck semantics: every Dirichlet-constrained node is a *moving-interface*
node whose displacement follows VAL*FUNCT(x, t); the interior mesh
displacement solves the chosen smoothing operator (ALE_TYPE laplace |
elastic, see physics/ale.py) each step.  The solve is a single jitted
matrix-free CG per step — no host assembly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.core.conditions import DirichletHandler
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics.ale import AleField
from fourc_tpu.utils.timer import Timers


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    dyn = deck.sections["ale_dynamic"]
    name = next(iter(deck.disc))
    disc = deck.disc[name]
    dim = disc.dim
    conds = deck.conditions.get(name, {})
    dbcs = list(conds.get("dirichlet", ()))
    if not dbcs:
        raise ValueError("ale problem needs at least one Dirichlet "
                         "condition (the moving interface)")
    for c in dbcs:
        if any(not o for o in c.onoff[:dim]):
            raise ValueError(
                "ale Dirichlet conditions must constrain all mesh-"
                "displacement components (onoff = all ones); per-component"
                " sliding interfaces are not supported yet")

    with timers("setup"):
        handler = DirichletHandler(dbcs, np.asarray(disc.coords), dim,
                                   deck.functions)
        fixed = ~np.asarray(handler.free_mask).reshape(-1, dim)
        moving = np.nonzero(fixed.any(axis=1))[0].astype(np.int32)
        field = AleField(disc, interface_nodes=moving,
                         boundary_nodes=np.zeros((0,), np.int32),
                         method=dyn["method"])

    dt = float(dyn["timestep"])
    n_steps = int(dyn["numstep"])
    tol = float(dyn["tolres"])
    maxiter = int(dyn["maxiter"])

    @jax.jit
    def solve_at(t):
        uD = handler.values(t).reshape(-1, dim)[moving]
        return field.solve(uD, tol=tol, maxiter=maxiter)

    n = disc.n_nodes
    state = {
        "d": jnp.zeros((n, dim)),
        "v": jnp.zeros((n, dim)),
        "t": 0.0,
        "step": 0,
    }
    agg = {"steps": 0}
    cbs = list(callbacks or [])
    state, n_steps, cbs = drv.setup_restart(deck, "ale", state, n_steps, cbs)
    state = dict(state, t=float(state["t"]), step=int(state["step"]))
    callbacks = cbs
    with timers("step"):
        for _ in range(n_steps):
            t1 = state["t"] + dt
            d1 = solve_at(t1)
            state = {
                "d": d1,
                "v": (d1 - state["d"]) / dt,  # mesh velocity (BDF1)
                "t": t1,
                "step": state["step"] + 1,
            }
            agg["steps"] += 1
            if callbacks:
                for cb in callbacks:
                    cb("ale", state, agg)
    return drv.RunResult(
        deck=deck, fields={"ale": AleView(field)}, states={"ale": state},
        stats={"ale": agg}, timers=timers,
    )


class AleView:
    def __init__(self, f: AleField):
        self.f = f

    def node_value(self, state, quantity, node):
        q = quantity.lower()
        arrs = {"disp": state["d"], "vel": state["v"]}
        for prefix, arr in arrs.items():
            if q.startswith(prefix):
                comp = "xyz".index(q[len(prefix)])
                return float(np.asarray(arr)[node, comp])
        raise KeyError(quantity)
