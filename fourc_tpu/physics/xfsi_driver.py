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
    if disc.dim == 3:
        return _run3d(deck, dyn, disc, timers, callbacks)
    if disc.dim != 2:
        raise NotImplementedError("fsi_xfem deck driver is 2D/3D")
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


def _cutter_surface(spec, shift=0.0):
    """Deck cutter -> (verts, tris), x-shifted by the wall displacement."""
    from fourc_tpu.cut import cut3d

    kind = str(spec.get("kind", "plate")).lower()
    if kind == "plate":
        lo = np.asarray(spec["lo"], float).copy()
        hi = np.asarray(spec["hi"], float).copy()
        lo[0] += shift
        hi[0] += shift
        return cut3d.box_surface(lo, hi, n=int(spec.get("n", 3)))
    if kind == "sphere":
        c = np.asarray(spec["center"], float).copy()
        c[0] += shift
        return cut3d.icosphere(c, float(spec["radius"]),
                               subdiv=int(spec.get("subdiv", 2)))
    raise ValueError(f"unknown cutter kind {kind!r}")


def _run3d(deck, dyn, disc, timers, callbacks):
    """3D XFSI: background hex8 channel cut by a MOVING triangulated
    cutter surface (mesh-mesh cut, re-cut every step) — the 3D embedded
    elastic wall (rigid plate on an elastic x-mounting) in channel flow.
    ref: the reference's fsi_xfem flagship — XFLUID on cut volume cells
    with a structure-boundary cutter discretization
    (4C_cut_cutwizard.hpp:207 add_cutter_state) + XFSCoupling transfer.
    """
    import jax.numpy as jnp

    from fourc_tpu.cut import cut3d
    from fourc_tpu.cut.fsi_cut import total_interface_force3d
    from fourc_tpu.cut.xfluid3d import solve_stokes_cut3d
    from fourc_tpu.physics import driver as drv
    from fourc_tpu.physics.xfluid_driver import XFluidView, _component_fn

    name = next(iter(deck.disc))
    X = np.asarray(disc.coords)
    conn = np.asarray(next(iter(disc.blocks.values())).conn)
    fm = deck.functions
    conds = deck.conditions.get(name, {})
    strong = []
    for c in conds.get("dirichlet", ()):
        for k in range(min(3, len(c.onoff))):
            if c.onoff[k]:
                strong.append((c.nodes, k,
                               _component_fn(fm, c.funct[k], k, c.val[k],
                                             0.0)))

    mat = next(iter(deck.materials.values()))
    mu = float(mat.get("viscosity", 1.0))
    m = float(dyn["mass"])
    kspr = float(dyn["stiffness"])
    dt = float(dyn["timestep"])
    n_steps = int(dyn["numstep"])
    nitsche = float(dyn["nitsche"])
    cutter = dyn["cutter"]

    h = np.max(np.linalg.norm(X[conn[:, 6]] - X[conn[:, 0]], axis=1)) \
        / np.sqrt(3.0)
    gamma = nitsche * mu / max(h, 1e-14)

    cbs = list(callbacks or [])
    combo = {"d_w": jnp.asarray(0.0), "v_w": jnp.asarray(0.0),
             "step": jnp.asarray(0), "t": jnp.asarray(0.0)}
    combo, n_steps, cbs = drv.setup_restart(deck, "xfsi", combo, n_steps,
                                            cbs)
    d_w, v_w = float(combo["d_w"]), float(combo["v_w"])
    state = {"t": float(combo["t"]), "step": int(combo["step"])}
    agg = {"steps": 0}
    with timers("step"):
        for _ in range(n_steps):
            verts, tris = _cutter_surface(cutter, shift=d_w)
            cm, phi = cut3d.cut_by_surfaces(X, conn, [(verts, tris)])
            g = lambda x, y, z: (v_w, 0.0, 0.0)  # noqa: E731
            vel, p, cm = solve_stokes_cut3d(
                X, conn, phi, g, strong_dirichlet=strong, mu=mu,
                nitsche=nitsche)
            F = total_interface_force3d(cm, vel, p, mu, g, gamma)
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
               force_y=float(F[1]), force_z=float(F[2]))
    return drv.RunResult(
        deck=deck, fields={"xfsi": XFluidView(cm, 3)},
        states={"xfsi": state}, stats={"xfsi": agg}, timers=timers,
    )
