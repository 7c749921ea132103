"""Structure problem driver: deck -> SolidField -> time loop.

Analog of the reference's `caldyn_drt`/`dyn_nlnstructural_drt`
(ref: src/structure/4C_structure_dyn_nln_drt.cpp:36-160) wiring input
sections into the integrator + nonlinear solver.
"""

from __future__ import annotations

import numpy as np

from fourc_tpu.materials import make_material
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import solid as ps
from fourc_tpu.utils.timer import Timers


def solid_params_from(deck) -> "ps.SolidParams":
    dyn = deck.sections["structural_dynamic"]
    solver = deck.sections["solver"]
    return ps.SolidParams(
        kinem=dyn["kinem"],
        tech=dyn["tech"],
        dyntype=dyn["dynamictype"],
        dt=dyn["timestep"],
        n_steps=dyn["numstep"],
        theta=dyn["theta"],
        genalpha=ps.GenAlphaParams(rho_inf=dyn["rho_inf"]),
        newton=drv.newton_params_from(dyn, solver, deck.sections.get("io")),
        precond=solver["precond"],
        mass="lumped" if dyn["lumpmass"] else "consistent",
        rayleigh_alpha=dyn["m_damp"],
        rayleigh_beta=dyn["k_damp"],
        divercont=dyn["divercont"],
        max_halvings=dyn["maxdivconrefinementlevel"],
        predictor=dyn["predict"],
        dtype=deck.problem["dtype"],
    )


def build_field(deck, disc_name="structure"):
    disc = deck.disc[disc_name]
    dyn = deck.sections["structural_dynamic"]
    params = solid_params_from(deck)
    materials = {mid: make_material(spec) for mid, spec in deck.materials.items()}
    conds = deck.conditions.get(disc_name, {})
    _beam_kinds = ("beam", "truss", "torsion_spring", "rigidsphere")
    if disc.blocks and (all(b.cell == "line2" for b in disc.blocks.values()) or all(
            getattr(materials[int(np.asarray(b.mat_id)[0])], "kind", "")
            in _beam_kinds for b in disc.blocks.values())):
        from fourc_tpu.physics.beam import BeamField

        bc = conds.get("beam_contact")
        return BeamField(
            disc, materials, params,
            dirichlet=conds.get("dirichlet", ()),
            point_neumann=conds.get("point_neumann", ()),
            beam_contact=bc[0] if bc else None,
            functions=deck.functions,
        )
    if any(getattr(m, "kind", "") == "klshell" for m in materials.values()):
        from fourc_tpu.physics.shell import KLShellField

        patch = getattr(disc, "_kl_patch", None)
        if patch is None:
            raise ValueError("kl_shell material requires a kl_patch "
                             "geometry generator")
        m = next(mm for mm in materials.values()
                 if getattr(mm, "kind", "") == "klshell")
        return KLShellField(
            patch,
            {"youngs": m.youngs, "nue": m.nue, "thickness": m.thickness},
            params,
            dirichlet=conds.get("dirichlet", ()),
            point_neumann=conds.get("point_neumann", ()),
            functions=deck.functions,
        )
    if any(getattr(m, "kind", "") == "shell7p" for m in materials.values()):
        from fourc_tpu.physics.shell import Shell7pField

        return Shell7pField(
            disc, materials, params,
            dirichlet=conds.get("dirichlet", ()),
            point_neumann=conds.get("point_neumann", ()),
            functions=deck.functions,
        )
    if any(getattr(m, "kind", "") == "shell" for m in materials.values()):
        from fourc_tpu.physics.shell import ShellField

        return ShellField(
            disc, materials, params,
            dirichlet=conds.get("dirichlet", ()),
            point_neumann=conds.get("point_neumann", ()),
            functions=deck.functions,
        )
    f = ps.SolidField(
        disc,
        materials,
        params,
        dirichlet=conds.get("dirichlet", ()),
        neumann=conds.get("neumann", ()),
        point_neumann=conds.get("point_neumann", ()),
        body_forces=conds.get("body_force", ()),
        contact=conds.get("contact", ()),
        mortar_contact=conds.get("mortar_contact", ()),
        meshtying=conds.get("meshtying", ()),
        springs=conds.get("spring_dashpot", ()),
        embedded_mesh=conds.get("embedded_mesh", ()),
        constraints=_build_constraints(conds.get("constraint", ()), disc,
                                       deck.functions),
        functions=deck.functions,
    )
    return f


def _build_constraints(items, disc, functions):
    out = []
    for it in items:
        from fourc_tpu.physics.constraints import (MultiPointConstraint,
                                                   VolumeConstraint)

        kind = str(it.get("kind", "volume")).lower()
        if kind == "volume":
            out.append(VolumeConstraint(
                it["faces"], disc.coords, disc.dim,
                it.get("penalty", 1e6), it.get("funct", 0), functions,
                enforcement=it.get("enforcement", "penalty")))
        elif kind == "inclined_support":
            # locsys analog (ref: core/fem condition locsys — rotated
            # boundary frames): u . n = 0 per node, penalty-enforced
            nrm = np.asarray(it["normal"], float)
            nrm = nrm / np.linalg.norm(nrm)
            for nd in np.asarray(it["nodes"]):
                out.append(MultiPointConstraint(
                    [int(nd)] * disc.dim, list(range(disc.dim)),
                    nrm[: disc.dim], disc.dim,
                    it.get("penalty", 1e8), 0.0, 0, functions))
        elif kind == "mpc":
            out.append(MultiPointConstraint(
                it["nodes"], it["comps"], it["coeffs"], disc.dim,
                it.get("penalty", 1e6), it.get("amplitude", 0.0),
                it.get("funct", 0), functions,
                enforcement=it.get("enforcement", "penalty")))
        else:
            raise ValueError(f"unknown constraint kind {kind!r}")
    return out


def run(deck, callbacks=None) -> drv.RunResult:
    from fourc_tpu.physics import beam as pb

    timers = Timers()
    with timers("setup"):
        from fourc_tpu.physics.beam_solid import BeamSolidField
        from fourc_tpu.physics.shell import (KLShellField, Shell7pField,
                                             ShellField)

        if "beams" in deck.disc and "structure" in deck.disc:
            # embedded fibers: solid + beams + volume mesh tying
            # (ref: src/beaminteraction BTS-VMT)
            f_solid = build_field(deck, "structure")
            materials = {mid: make_material(spec)
                         for mid, spec in deck.materials.items()}
            bconds = deck.conditions.get("beams", {})
            f_beam = pb.BeamField(
                deck.disc["beams"], materials, f_solid.params,
                dirichlet=bconds.get("dirichlet", ()),
                point_neumann=bconds.get("point_neumann", ()),
                functions=deck.functions)
            dyn = deck.sections["structural_dynamic"]
            sconds = deck.conditions.get("structure", {})
            sc = (sconds.get("bts_surface_contact") or [None])[0]
            if sc is not None:
                sc = dict(sc)
                sc["faces"] = list(sc["faces"])
            f = BeamSolidField(f_solid, f_beam,
                               penalty=dyn.get("bts_penalty", 1e4) or 1e4,
                               surface_contact=sc)
        else:
            f = build_field(deck)
        if isinstance(f, (pb.BeamField, ShellField, Shell7pField,
                          KLShellField, BeamSolidField)):
            state = ps.compute_initial_state(f, pb.init_state(f))
            mkstep = lambda dt: pb.make_step(f, dt)  # noqa: E731
        else:
            state = ps.compute_initial_state(f, ps.init_state(f))
            state = drv.maybe_shard(deck, f, state)
            mkstep = lambda dt: ps.make_step(f, dt)  # noqa: E731
            lag_cons = [c for c in getattr(f, "constraints", [])
                        if getattr(c, "enforcement", "") == "lagrange"]
            if lag_cons:
                # Uzawa augmented-Lagrangian outer loop (ref: the
                # reference's ConstraintSolver Uzawa strategy,
                # 4C_constraint_solver.*): multiplier buffers are hoisted,
                # so the re-solves reuse the compiled step
                import jax.numpy as _jnp

                def mkstep(dt, _mk=ps.make_step):  # noqa: F811
                    raw = _mk(f, dt)

                    def uzawa_step(state0):
                        st, stats = raw(state0)
                        for _ in range(12):
                            t1 = float(st["t"])
                            errs = [float(c.error(st["d"], t1))
                                    for c in lag_cons]
                            if max(abs(e) for e in errs) < 1e-8:
                                break
                            for c, e in zip(lag_cons, errs):
                                c.lam_buf = c.lam_buf + _jnp.asarray(
                                    c.k * e)
                            st, stats = raw(state0)
                        return st, stats

                    return uzawa_step
    dyn = deck.sections["structural_dynamic"]
    n_steps = dyn["numstep"]
    if dyn["maxtime"] is not None:
        n_steps = int(round(dyn["maxtime"] / dyn["timestep"]))

    out_cbs = list(callbacks or [])
    io_cfg = deck.sections["io"]
    if io_cfg["write_vtu"]:
        from fourc_tpu.io.vtu import VtuWriterCallback

        out_cbs.append(VtuWriterCallback(f, io_cfg))
    if io_cfg.get("write_ensight"):
        from fourc_tpu.io.ensight import EnsightWriterCallback

        out_cbs.append(EnsightWriterCallback(f, io_cfg))
    if io_cfg.get("monitor"):
        from fourc_tpu.io.monitor import CsvMonitorCallback

        mcfg = dict(io_cfg["monitor"])
        out_cbs.append(CsvMonitorCallback(
            SolidFieldView(f),
            mcfg.get("file", io_cfg["output_dir"] + "/monitor.csv"),
            nodes=mcfg.get("nodes", ()),
            quantities=mcfg.get("quantities", ("dispx",)),
        ))
    # MULF prestress phase: run N steps, folding each converged deformation
    # into the per-GP prestretch and resetting displacements
    if dyn.get("prestress") == "mulf" and dyn.get("prestress_steps"):
        for _ in range(int(dyn["prestress_steps"])):
            state, _ = drv.time_loop(
                "prestress", state, mkstep, dyn["timestep"], 1,
                divercont=dyn["divercont"], callbacks=[], timers=timers,
                verbose=False)
            state = ps.update_prestress(f, state)

    state, n_steps, out_cbs = drv.setup_restart(deck, "structure", state, n_steps, out_cbs)

    if dyn.get("timada_kind", "none") == "zienkiewicz_xie":
        state, agg = drv.time_loop_adaptive(
            "structure", state, mkstep, dyn["timestep"],
            t_end=float(state["t"]) + n_steps * dyn["timestep"],
            error_fn=ps.make_zienxie_error_fn(f),
            tol=dyn["timada_tol"], dtmin=dyn["timada_dtmin"],
            dtmax=dyn["timada_dtmax"], safety=dyn["timada_safety"],
            callbacks=out_cbs, timers=timers,
        )
    else:
        state, agg = drv.time_loop(
            "structure", state, mkstep, dyn["timestep"],
            n_steps, divercont=dyn["divercont"], max_levels=dyn["maxdivconrefinementlevel"],
            callbacks=out_cbs, timers=timers,
        )
    return drv.RunResult(
        deck=deck, fields={"structure": SolidFieldView(f)},
        states={"structure": state},
        stats={"structure": agg}, timers=timers,
    )


class SolidFieldView:
    """Result-test / output access for a solid field
    (the analog of Solid::ResultTest,
    ref: structure_new/src/utils/4C_structure_new_resulttest.cpp:179)."""

    _VEC = {"disp": "d", "vel": "v", "acc": "a", "rot": "d"}
    _COMP = {"x": 0, "y": 1, "z": 2}
    _ROT_OFFSET = 3  # rotation dofs for beams (6 dofs/node)

    def __init__(self, f):
        self.f = f

    def node_value(self, state, quantity: str, node: int):
        q = quantity.lower()
        if q[:-1] in self._VEC:
            key = self._VEC[q[:-1]]
            comp = self._COMP[q[-1]]
            if q.startswith("rot"):
                comp += self._ROT_OFFSET
            return float(np.asarray(state[key]).reshape(-1, self.f.ndpn)[node, comp])
        if q.startswith("stress_"):
            # stress_xx / stress_xy ...
            ij = q.split("_")[1]
            i, j = self._COMP[ij[0]], self._COMP[ij[1]]
            sig = np.asarray(self.f.nodal_stresses(state["d"], history=state["hist"] or None))
            return float(sig[node, i, j])
        raise KeyError(f"unknown structure quantity {quantity!r}")
