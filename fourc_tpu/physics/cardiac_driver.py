"""Cardiac monodomain driver (operator-split reaction-diffusion).

Counterpart of the reference's cardiac-monodomain scatra variant
(ref: src/scatra/4C_scatra_timint_cardiac_monodomain.* — advection-free
scatra with a myocard reaction material whose internal (gating) variables
are integrated at the material level; driver dispatch
4C_global_full_cal_control.cpp 'cardiac_monodomain').

TPU-native design — Godunov splitting per step of size dt:
  1. cell-model substep: the membrane ODEs dV/dt = R(V, w) + I_stim,
     dw/dt = G(V, w) are advanced with `ode_substeps` explicit-Euler
     substeps simultaneously at ALL nodes (pure vmappable arithmetic on
     (n,) arrays — the analog of the reference's per-GP internal-variable
     update, but batched instead of looped);
  2. diffusion substep: backward-Euler solve of C dV/dt = div(D grad V)
     with the standard scalar-transport machinery (matrix-free CG).

The stimulus I_stim(x, t) comes from `body_force` conditions (FUNCT
expressions), evaluated nodally in the ODE substep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.materials import make_material
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import scalar_transport as st
from fourc_tpu.physics.newton import NewtonParams, newton_solve
from fourc_tpu.utils.timer import Timers


def build_field(deck):
    disc = next(iter(deck.disc.values()))
    dyn = deck.sections["cardiac_dynamic"]
    materials = {mid: make_material(spec) for mid, spec in deck.materials.items()}
    fieldname = next(iter(deck.disc))
    conds = deck.conditions.get(fieldname, {})
    params = st.ScalarParams(dyntype="onesteptheta", dt=dyn["timestep"],
                             n_steps=dyn["numstep"], theta=1.0,
                             dtype=deck.problem["dtype"])
    f = st.ScalarField(
        disc, materials, params,
        dirichlet=conds.get("dirichlet", ()),
        neumann=conds.get("neumann", ()),
        functions=deck.functions,
    )
    # stimulus conditions evaluated NODALLY in the ODE substep
    f.stim = list(conds.get("body_force", ()))
    f.myocard = next(iter(f.block_mat.values()))
    return f


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    with timers("setup"):
        f = build_field(deck)
    dyn = deck.sections["cardiac_dynamic"]
    solver = deck.sections["solver"]
    dt = float(dyn["timestep"])
    n_sub = int(dyn["ode_substeps"])
    mat = f.myocard

    nw = NewtonParams(max_iter=3, tol_res=dyn["tolres"], tol_disp=1e-30,
                      combine="or", lin_method="cg",
                      lin_maxiter=solver["maxiter"], lin_rtol=solver["rtol"])

    dtype = (jnp.float64 if deck.problem["dtype"] == "float64"
             and jax.config.jax_enable_x64 else jnp.float32)
    n = f.ndof
    V0 = jnp.full((n,), mat.v_rest, dtype)
    w0 = jnp.broadcast_to(mat.w_rest().astype(dtype), (n, mat.n_gates))
    state = {"phi": f.dbc.apply(V0, 0.0), "gates": w0,
             "t": jnp.asarray(0.0, dtype), "step": jnp.asarray(0)}

    X = jnp.asarray(f.disc.coords, dtype)
    cap = f.lumped_capacity()
    M = f.build_preconditioner(dt_factor=1.0 / dt)

    def stim_at(t):
        s = jnp.zeros((n,), dtype)
        for bf in f.stim:
            fn = f.functions.get(bf.funct[0])
            s = s + bf.val[0] * fn(X, t, component=0)
        return s

    @jax.jit
    def step(state):
        t0, V, w = state["t"], state["phi"], state["gates"]
        t1 = t0 + dt
        h = dt / n_sub

        def sub(i, carry):
            V, w = carry
            ti = t0 + i.astype(dtype) * h
            # material-level integrator: Rush-Larsen for stiff HH-gate
            # models (tentusscher), forward Euler otherwise (the analog
            # of the reference's per-material internal-variable update)
            return mat.ode_substep(V, w, h, stim_at(ti))

        V, w = jax.lax.fori_loop(0, n_sub, sub, (V, w))

        # diffusion: backward Euler, C (V1 - V*)/dt + K V1 = 0
        Vstar = V

        def residual(V1):
            r = f.residual_transient(V1, (V1 - Vstar) / dt, t1, dt=dt)
            return r

        V1 = f.dbc.apply(Vstar, t1)
        V1, stats = newton_solve(residual, V1, f.dbc.free_mask, M, nw)
        new = dict(state)
        new.update(phi=V1, gates=w, t=t1, step=state["step"] + 1)
        return new, stats

    cbs = list(callbacks or [])
    state, _nsteps, cbs = drv.setup_restart(deck, "cardiac", state, dyn["numstep"], cbs)
    state, agg = drv.time_loop(
        "cardiac", state, lambda _dt: step, dt, _nsteps,
        divercont="stop", callbacks=cbs, timers=timers,
    )
    return drv.RunResult(
        deck=deck, fields={"cardiac": CardiacView(f)},
        states={"cardiac": state}, stats={"cardiac": agg}, timers=timers,
    )


class CardiacView:
    def __init__(self, f):
        self.f = f

    def node_value(self, state, quantity, node):
        q = quantity.lower()
        if q in ("phi", "v", "vm"):
            return float(np.asarray(state["phi"])[node])
        if q.startswith("gate"):
            return float(np.asarray(state["gates"])[node, int(q[4:] or 0)])
        raise KeyError(quantity)
