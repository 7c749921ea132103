"""Fluid problem driver: deck -> FluidField -> time loop.

Analog of the reference's `dyn_fluid_drt` (ref: src/fluid/4C_fluid_dyn_nln_drt.cpp).
"""

from __future__ import annotations

import numpy as np

from fourc_tpu.materials import make_material
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import fluid as pf
from fourc_tpu.utils.timer import Timers


def build_field(deck, disc_name="fluid", extra_dirichlet=()) -> pf.FluidField:
    cond_name = disc_name
    if disc_name not in deck.disc and len(deck.disc) == 1:
        disc_name = next(iter(deck.disc))
    disc = deck.disc[disc_name]
    dyn = deck.sections["fluid_dynamic"]
    solver = deck.sections["solver"]

    params = pf.FluidParams(
        dyntype=dyn["dynamictype"],
        dt=dyn["timestep"],
        n_steps=dyn["numstep"],
        theta=dyn["theta"],
        rho_inf=dyn["rho_inf"],
        newton=drv.newton_params_from(dyn, solver, deck.sections.get("io")),
        initial_funct=dyn.get("initialfield_funct", 0),
        smagorinsky_cs=dyn.get("smagorinsky_cs", 0.0) or 0.0,
        turbulence_model=dyn.get("turbulence_model", "none"),
        csgs=dyn.get("csgs", 0.25) or 0.25,
        sampling_start=dyn.get("sampling_start", 0) or 0,
        supg=dyn.get("stab", "taylor") != "zero",
        pspg=dyn.get("stab", "taylor") != "zero",
        graddiv=dyn.get("stab", "taylor") != "zero",
        divercont=dyn["divercont"],
        max_halvings=dyn["maxdivconrefinementlevel"],
        dtype=deck.problem["dtype"],
    )
    materials = {mid: make_material(spec) for mid, spec in deck.materials.items()}
    conds = deck.conditions.get(cond_name, {})
    return pf.FluidField(
        disc,
        materials,
        params,
        dirichlet=list(conds.get("dirichlet", ())) + list(extra_dirichlet),
        neumann=conds.get("neumann", ()),
        body_forces=conds.get("body_force", ()),
        functions=deck.functions,
        windkessel=conds.get("windkessel", ()),
    )


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    with timers("setup"):
        f = build_field(deck)
        state = pf.init_state(f)
        state = drv.maybe_shard(deck, f, state)
    dyn = deck.sections["fluid_dynamic"]
    n_steps = dyn["numstep"]
    if dyn["maxtime"] is not None:
        n_steps = int(round(dyn["maxtime"] / dyn["timestep"]))
    cbs = list(callbacks or [])
    state, n_steps, cbs = drv.setup_restart(deck, "fluid", state, n_steps, cbs)

    state, agg = drv.time_loop(
        "fluid", state, lambda dt: pf.make_step(f, dt), dyn["timestep"],
        n_steps, divercont=dyn["divercont"],
        max_levels=dyn["maxdivconrefinementlevel"],
        callbacks=cbs, timers=timers,
    )
    return drv.RunResult(
        deck=deck, fields={"fluid": FluidFieldView(f)}, states={"fluid": state},
        stats={"fluid": agg}, timers=timers,
    )


class FluidFieldView:
    """Result-test access (analog of FLD::FluidResultTest)."""

    _COMP = {"x": 0, "y": 1, "z": 2}

    def __init__(self, f: pf.FluidField):
        self.f = f

    def node_value(self, state, quantity: str, node: int):
        q = quantity.lower()
        xn = np.asarray(state["x"]).reshape(-1, self.f.ndpn)
        if q in ("pressure", "p"):
            return float(xn[node, self.f.dim])
        if q.startswith("vel"):
            comp = self._COMP[q[-1]]
            if comp >= self.f.dim:  # e.g. velz on a 2D fluid
                raise KeyError(f"no component {quantity!r} in {self.f.dim}D")
            return float(xn[node, comp])
        raise KeyError(f"unknown fluid quantity {quantity!r}")
