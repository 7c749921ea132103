"""Scatra / thermo problem drivers: deck -> ScalarField -> time loop.

Analog of the reference's `scatra_dyn` driver (ref: src/scatra/4C_scatra_dyn.cpp)
and `thermo_dyn_drt` (ref: src/thermo/src/4C_thermo_dyn.cpp).
"""

from __future__ import annotations

import numpy as np

from fourc_tpu.materials import make_material
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import scalar_transport as st
from fourc_tpu.utils.timer import Timers


def build_field(deck, section: str, disc_name: str) -> st.ScalarField:
    # TSI decks may only generate a "structure" mesh; clone it (ref: the
    # reference's field-cloning map, global_data_read.cpp read_cloning_map).
    # Conditions stay keyed by the FIELD name.
    cond_name = disc_name
    if disc_name not in deck.disc:
        if len(deck.disc) == 1:
            disc_name = next(iter(deck.disc))
        elif "structure" in deck.disc:
            disc_name = "structure"  # cloned from the structure mesh (FPSI)
    disc = deck.disc[disc_name]
    dyn = deck.sections[section]
    solver = deck.sections["solver"]

    params = st.ScalarParams(
        dyntype=dyn["dynamictype"],
        dt=dyn["timestep"],
        n_steps=dyn["numstep"],
        theta=dyn["theta"],
        genalpha=st.GenAlphaScalarParams(
            rho_inf=dyn["rho_inf"], alpha_f_in=dyn.get("alpha_f"),
            alpha_m_in=dyn.get("alpha_m"), gamma_in=dyn.get("gamma"),
        ),
        newton=drv.newton_params_from(dyn, solver, deck.sections.get("io")),
        stab=dyn.get("stab", "taylor"),
        velocity=dyn.get("velocity"),
        initial_funct=dyn.get("initialfield_funct", 0),
        divercont=dyn["divercont"],
        max_halvings=dyn["maxdivconrefinementlevel"],
        dtype=deck.problem["dtype"],
    )
    # convection makes the tangent nonsymmetric: CG would silently stall
    if params.velocity is not None and params.newton.lin_method == "cg":
        params.newton.lin_method = "bicgstab"

    materials = {mid: make_material(spec) for mid, spec in deck.materials.items()}
    conds = deck.conditions.get(cond_name, {})
    return st.ScalarField(
        disc,
        materials,
        params,
        dirichlet=conds.get("dirichlet", ()),
        neumann=conds.get("neumann", ()),
        body_forces=conds.get("body_force", ()),
        functions=deck.functions,
    )


def _run_generic(deck, fieldname: str, section: str, callbacks=None):
    timers = Timers()
    with timers("setup"):
        f = build_field(deck, section, fieldname)
        state = st.compute_initial_state(f, st.init_state(f))
        state = drv.maybe_shard(deck, f, state)
    dyn = deck.sections[section]
    n_steps = dyn["numstep"]
    if dyn["maxtime"] is not None:
        n_steps = int(round(dyn["maxtime"] / dyn["timestep"]))
    cbs = list(callbacks or [])
    state, n_steps, cbs = drv.setup_restart(deck, fieldname, state, n_steps, cbs)

    state, agg = drv.time_loop(
        fieldname, state, lambda dt: st.make_step(f, dt), dyn["timestep"],
        n_steps, divercont=dyn["divercont"],
        max_levels=dyn["maxdivconrefinementlevel"],
        callbacks=cbs, timers=timers,
    )
    return drv.RunResult(
        deck=deck,
        fields={fieldname: ScalarFieldView(f, fieldname)},
        states={fieldname: state},
        stats={fieldname: agg},
        timers=timers,
    )


def run_scatra(deck, callbacks=None):
    return _run_generic(deck, "scatra", "scatra_dynamic", callbacks)


def run_thermo(deck, callbacks=None):
    return _run_generic(deck, "thermo", "thermal_dynamic", callbacks)


class ScalarFieldView:
    """Result-test access (analog of ScaTra::ScaTraResultTest /
    Thermo::ResultTest)."""

    def __init__(self, f: st.ScalarField, fieldname: str):
        self.f = f
        self.names = {"phi", "scalar"} if fieldname == "scatra" else {"temp", "t"}

    def node_value(self, state, quantity: str, node: int):
        q = quantity.lower()
        K = getattr(self.f, "ndpn", 1)
        if q in self.names or q in ("phi", "temp"):
            return float(np.asarray(state["phi"]).reshape(-1, K)[node, 0])
        if q.startswith("phi") and q[3:].isdigit():
            # multi-species: phi1..phiK (ref: SCATRA RESULT DESCRIPTION
            # QUANTITY phi<n>, 1-based species index)
            return float(np.asarray(state["phi"]).reshape(-1, K)[node,
                                                                 int(q[3:]) - 1])
        if q in ("phidot", "rate", "tempdot"):
            return float(np.asarray(state["phidot"]).reshape(-1, K)[node, 0])
        raise KeyError(f"unknown scalar quantity {quantity!r}")
