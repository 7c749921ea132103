"""Global problem driver: deck -> fields -> time loop -> result tests.

Counterpart of the reference's global driver
(ref: apps/global_full/4C_global_full_cal_control.cpp:43-200 — `ntacal`
problem-type dispatch; src/adapter/4C_adapter_str_timeloop.cpp:20-79 — the
field time loop with prepare/solve/update/output; divergence handling
`perform_error_action`, 4C_structure_new_timint_implicit.cpp:230-350).

The host loop ONLY dispatches jitted step functions, checks the returned
convergence flag, handles DIVERCONT time-step refinement and triggers
output; all numerics stay on device.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.io import deck as deck_mod
from fourc_tpu.physics.newton import NewtonParams
from fourc_tpu.utils.timer import Timers


@dataclass
class RunResult:
    deck: object
    fields: dict  # name -> physics field object
    states: dict  # name -> final state pytree
    stats: dict = field(default_factory=dict)  # special quantities
    timers: object = None

    def query(self, fieldname, quantity, node):
        name = fieldname or next(iter(self.fields))
        f = self.fields[name]
        return f.node_value(self.states[name], quantity, node)

    def query_special(self, fieldname, quantity):
        name = fieldname or next(iter(self.fields))
        return self.stats[name][quantity]


def run(deck_src, callbacks=None) -> RunResult:
    """Run a deck end to end. deck_src: path | yaml str | dict | Deck."""
    deck = deck_src if isinstance(deck_src, deck_mod.Deck) else deck_mod.load(deck_src)
    if deck.problem.get("dtype") == "float64" and not jax.config.jax_enable_x64:
        # honor the deck's requested precision when run through the API
        # (the CLI's --x64 and the test conftest set this up front);
        # without it float64 decks silently downcast to f32 and absolute
        # tolerances below the f32 floor can never converge
        jax.config.update("jax_enable_x64", True)
    ptype = deck.problem_type
    if ptype == "structure":
        from fourc_tpu.physics import structure_driver

        return structure_driver.run(deck, callbacks=callbacks)
    if ptype in ("scatra", "elch"):
        if ptype == "elch" and any(
            str(spec.get("type", "")).lower() in ("elchmat", "newman",
                                                  "electrode")
            for spec in deck.materials.values()
        ):
            # multi-species Nernst-Planck + potential (ENC closure) or
            # binary diffusion-conduction (Newman)
            from fourc_tpu.physics import elch_driver

            return elch_driver.run(deck, callbacks)
        from fourc_tpu.physics import scalar_driver

        return scalar_driver.run_scatra(deck, callbacks=callbacks)
    if ptype == "fluid_ale":
        from fourc_tpu.physics import fluid_ale_driver

        return fluid_ale_driver.run(deck, callbacks=callbacks)
    if ptype == "fluid_xfem":
        from fourc_tpu.physics import xfluid_driver

        return xfluid_driver.run(deck, callbacks=callbacks)
    if ptype == "fsi_xfem":
        from fourc_tpu.physics import xfsi_driver

        return xfsi_driver.run(deck, callbacks=callbacks)
    if ptype == "ale":
        from fourc_tpu.physics import ale_driver

        return ale_driver.run(deck, callbacks=callbacks)
    if ptype == "thermo":
        from fourc_tpu.physics import scalar_driver

        return scalar_driver.run_thermo(deck, callbacks=callbacks)
    if ptype == "fluid":
        from fourc_tpu.physics import fluid_driver

        return fluid_driver.run(deck, callbacks=callbacks)
    if ptype == "tsi":
        from fourc_tpu.physics import tsi_driver

        return tsi_driver.run(deck, callbacks=callbacks)
    if ptype == "fsi":
        from fourc_tpu.physics import fsi_driver

        return fsi_driver.run(deck, callbacks=callbacks)
    if ptype == "poroelast_scatra":
        from fourc_tpu.physics import poro_scatra_driver

        return poro_scatra_driver.run(deck, callbacks)
    if ptype == "poroelasticity":
        from fourc_tpu.physics import poro_driver

        return poro_driver.run(deck, callbacks)
    if ptype == "cardiovascular0d":
        from fourc_tpu.physics import cardio0d_driver

        return cardio0d_driver.run(deck, callbacks)
    if ptype == "lubrication":
        from fourc_tpu.physics import lubrication_driver

        return lubrication_driver.run(deck, callbacks)
    if ptype == "levelset":
        from fourc_tpu.physics import levelset_driver

        return levelset_driver.run(deck, callbacks)
    if ptype == "fbi":
        from fourc_tpu.physics import fbi_driver

        return fbi_driver.run(deck, callbacks)
    if ptype == "immersed_fsi":
        from fourc_tpu.physics import immersed_driver

        return immersed_driver.run(deck, callbacks)
    if ptype == "fpsi":
        from fourc_tpu.physics import fpsi_driver

        return fpsi_driver.run(deck, callbacks)
    if ptype == "fs3i":
        from fourc_tpu.physics import fs3i_driver

        return fs3i_driver.run(deck, callbacks)
    if ptype == "ehl":
        from fourc_tpu.physics import ehl_driver

        return ehl_driver.run(deck, callbacks)
    if ptype == "sti":
        from fourc_tpu.physics import sti_driver

        return sti_driver.run(deck, callbacks)
    if ptype == "ssti":
        from fourc_tpu.physics import ssti_driver

        return ssti_driver.run(deck, callbacks)
    if ptype == "loma":
        from fourc_tpu.physics import loma_driver

        return loma_driver.run(deck, callbacks)
    if ptype == "porofluidmultiphase":
        from fourc_tpu.physics import porofluid_driver

        return porofluid_driver.run(deck, callbacks)
    if ptype in ("porofluid_elast", "porofluid_elast_scatra"):
        from fourc_tpu.physics import porofluid_elast_driver

        return porofluid_elast_driver.run(deck, callbacks)
    if ptype == "red_airways":
        from fourc_tpu.physics import airway_driver

        return airway_driver.run(deck, callbacks)
    if ptype == "artery":
        from fourc_tpu.physics import artery_driver

        return artery_driver.run(deck, callbacks)
    if ptype == "cardiac_monodomain":
        from fourc_tpu.physics import cardiac_driver

        return cardiac_driver.run(deck, callbacks)
    if ptype == "ssi":
        from fourc_tpu.physics import ssi_driver

        return ssi_driver.run(deck, callbacks=callbacks)
    if ptype == "pasi":
        from fourc_tpu.physics import pasi_driver

        return pasi_driver.run(deck, callbacks=callbacks)
    if ptype == "particle":
        from fourc_tpu.physics import particle_driver

        return particle_driver.run(deck, callbacks=callbacks)
    if ptype == "browniandyn":
        from fourc_tpu.physics import browniandyn_driver

        return browniandyn_driver.run(deck, callbacks=callbacks)
    raise NotImplementedError(f"problem type {ptype!r} not implemented yet")


# ---------------------------------------------------------------------------
# generic implicit time loop with DIVERCONT (shared by all fields)
# ---------------------------------------------------------------------------


def time_loop(
    fieldname,
    state,
    make_step,  # dt -> jitted step fn (state -> (state, stats))
    dt0: float,
    n_steps: int,
    divercont: str = "stop",
    max_levels: int = 5,
    callbacks=None,
    timers: Timers | None = None,
    verbose: bool = True,
):
    """Run n_steps of size dt0, refining dt on divergence per DIVERCONT.

    Returns (state, aggregate_stats dict).
    """
    timers = timers or Timers()
    step_fns = {}

    def get_step(dt):
        if dt not in step_fns:
            with timers("compile"):
                step_fns[dt] = make_step(dt)
        return step_fns[dt]

    agg = {"newton_iters": 0, "lin_iters": 0, "steps": 0, "substeps": 0,
           "resnorm": 0.0, "halvings": 0}

    def try_advance(state, dt, level):
        """Advance by dt, recursively halving on divergence."""
        st_new, stats = get_step(dt)(state)
        ok = bool(stats["converged"])
        if ok:
            agg["newton_iters"] += int(stats["iters"])
            agg["lin_iters"] += int(stats["lin_iters"])
            agg["substeps"] += 1
            agg["resnorm"] = float(stats["resnorm"])
            return st_new
        if divercont == "continue":
            agg["substeps"] += 1
            return st_new
        if divercont in ("halve_step", "adapt_step") and level < max_levels:
            agg["halvings"] += 1
            half = try_advance(state, dt / 2, level + 1)
            return try_advance(half, dt / 2, level + 1)
        raise RuntimeError(
            f"{fieldname}: nonlinear solver diverged at t={float(state['t']):g} "
            f"(resnorm={float(stats['resnorm']):g}); DIVERCONT={divercont} exhausted"
        )

    t_wall = time.perf_counter()
    for k in range(n_steps):
        with timers("step"):
            state = try_advance(state, dt0, 0)
        agg["steps"] += 1
        if callbacks:
            for cb in callbacks:
                cb(fieldname, state, agg)
    agg["walltime"] = time.perf_counter() - t_wall
    if verbose:
        print(
            f"[{fieldname}] {agg['steps']} steps ({agg['substeps']} substeps), "
            f"{agg['newton_iters']} Newton its, {agg['lin_iters']} Krylov its, "
            f"{agg['walltime']:.3f}s wall"
        )
    return state, agg


def time_loop_adaptive(
    fieldname,
    state,
    make_step,  # dt -> jitted step fn (state -> (state, stats))
    dt0: float,
    t_end: float,
    error_fn,  # (state_old, state_new, dt) -> scalar local-error estimate
    tol: float = 1e-4,
    dtmin: float | None = None,
    dtmax: float | None = None,
    safety: float = 0.9,
    order: int = 3,
    callbacks=None,
    timers: Timers | None = None,
    verbose: bool = True,
):
    """Error-controlled adaptive time stepping (Zienkiewicz-Xie style).

    Counterpart of the reference's TimAda / TimAdaZienXie wrappers
    (ref: src/timestepping/4C_timestepping_zienkiewicz_xie.* +
    src/adapter/4C_adapter_str_timeada.cpp): after each converged step the
    a-posteriori local error estimate ``error_fn`` is compared to ``tol``;
    steps with err > tol are REJECTED and retried with a smaller dt; after
    accepted steps dt grows toward ``dt * safety*(tol/err)^(1/order)``.

    TPU-native twist: every distinct dt is a separate compiled program, so
    dt is quantized to the halving grid {dtmax / 2^j} — the controller
    rounds its proposal down to the grid, bounding the number of compiles
    to log2(dtmax/dtmin) + 1 instead of one per step (the reference's C++
    integrators pay nothing per new dt; XLA would).
    """
    timers = timers or Timers()
    dtmax = dtmax if dtmax is not None else dt0
    dtmin = dtmin if dtmin is not None else dt0 / 64.0
    step_fns = {}

    def get_step(dt):
        if dt not in step_fns:
            with timers("compile"):
                step_fns[dt] = make_step(dt)
        return step_fns[dt]

    def quantize(dt):
        j = int(np.ceil(np.log2(dtmax / max(dt, dtmin)) - 1e-12))
        return dtmax / 2 ** max(0, j)

    agg = {"newton_iters": 0, "lin_iters": 0, "steps": 0, "substeps": 0,
           "resnorm": 0.0, "halvings": 0, "rejections": 0, "dt_levels": set()}
    t = float(state["t"])
    dt = quantize(dt0)
    t_wall = time.perf_counter()
    while t < t_end - 1e-12 * max(1.0, abs(t_end)):
        dt = min(dt, t_end - t)  # final partial step may be off-grid
        st_new, stats = get_step(dt)(state)
        if not bool(stats["converged"]):
            if dt / 2 < dtmin:
                raise RuntimeError(
                    f"{fieldname}: diverged at t={t:g} with dt=dtmin={dtmin:g}")
            agg["halvings"] += 1
            dt = quantize(dt / 2)
            continue
        err = float(error_fn(state, st_new, dt))
        if err > tol and dt > dtmin * (1 + 1e-12):
            agg["rejections"] += 1
            dt = quantize(max(
                dtmin, dt * max(0.25, safety * (tol / err) ** (1.0 / order))))
            continue
        state = st_new
        t = float(state["t"])
        agg["newton_iters"] += int(stats["iters"])
        agg["lin_iters"] += int(stats["lin_iters"])
        agg["substeps"] += 1
        agg["steps"] += 1
        agg["resnorm"] = float(stats["resnorm"])
        agg["dt_levels"].add(dt)
        if callbacks:
            for cb in callbacks:
                cb(fieldname, state, agg)
        fac = safety * (tol / max(err, 1e-300)) ** (1.0 / order)
        dt = quantize(min(dtmax, dt * min(4.0, max(0.25, fac))))
    agg["walltime"] = time.perf_counter() - t_wall
    agg["dt_levels"] = sorted(agg["dt_levels"])
    if verbose:
        print(
            f"[{fieldname}] adaptive: {agg['steps']} steps, "
            f"{agg['rejections']} rejections, dt levels {agg['dt_levels']}, "
            f"{agg['newton_iters']} Newton its, {agg['walltime']:.3f}s wall"
        )
    return state, agg


def maybe_shard(deck, field, state=None):
    """Deck-driven domain decomposition: problem.nshard = N shards the
    field's node/element/dof arrays over an N-device jax Mesh (the analog
    of the reference's NP 1-4 deck variants,
    ref: tests/list_of_tests.cmake:12).  Returns the (possibly sharded)
    state; no-op when nshard <= 1.

    ``field`` may be a single field or a list of fields (coupled problems
    shard every participating field over the SAME mesh — the reference
    distributes every Discretization of a coupled problem)."""
    n = int(deck.problem.get("nshard", 0) or 0)
    if n <= 1:
        return state
    import jax

    from fourc_tpu.parallel import sharding as sh

    if len(jax.devices()) < n:
        raise ValueError(
            f"problem.nshard={n} but only {len(jax.devices())} devices")
    mesh = sh.make_mesh(n)
    for fld in (field if isinstance(field, (list, tuple)) else [field]):
        sh._shard_common(fld, mesh)
    return sh.shard_state(state, mesh) if state is not None else None


def setup_restart(deck, fieldname, state, n_steps, callbacks):
    """Common restart/checkpoint wiring for all field drivers.

    Analog of the reference's restart control flow (CLI restart=<step> ->
    DiscretizationReader per field; ref: 4C_global_full_inp_control.cpp +
    4C_io.hpp:65) and per-step result writing.

    Returns (state, remaining_steps, callbacks).
    """
    from fourc_tpu.io.checkpoint import Checkpointer, CheckpointCallback

    restart = int(deck.problem.get("restart", 0) or 0)
    io_cfg = deck.sections["io"]
    interval = int(io_cfg.get("restart_interval", 0) or 0)
    if not restart and not interval:
        return state, n_steps, callbacks
    ckpt = Checkpointer(io_cfg["output_dir"], prefix=fieldname, deck=deck)
    if restart:
        state = ckpt.load(restart, {fieldname: state})[fieldname]
        n_steps = max(0, n_steps - restart)
    if interval:
        callbacks = list(callbacks) + [CheckpointCallback(ckpt, interval)]
    return state, n_steps, callbacks


def newton_params_from(dyn: dict, solver: dict, io: dict | None = None) -> NewtonParams:
    return NewtonParams(
        debug=(io or {}).get("verbosity") == "debug",
        max_iter=dyn["maxiter"],
        tol_res=dyn["tolres"],
        tol_res_rel=dyn.get("tolres_rel", 0.0),
        tol_disp=dyn["toldisp"],
        combine=dyn["normcombi"],
        lin_method=solver["method"],
        lin_maxiter=solver["maxiter"],
        lin_rtol=solver["rtol"],
        lin_adaptive=solver["adaptive"],
        gmres_restart=solver["gmres_restart"],
        line_search=dyn.get("linesearch", False),
        ptc=dyn.get("nlnsol", "fullnewton") == "ptc",
        ptc_dt0=dyn.get("ptc_dt0", 1.0),
    )
