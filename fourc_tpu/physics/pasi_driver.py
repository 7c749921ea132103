"""PASI: partitioned particle-structure interaction.

Counterpart of the reference's pasi module (ref: src/pasi —
PASI::PartitionedAlgo one-way/two-way coupling of the particle field to a
structural field via particle-wall contact on the structure surface;
particle_wall provides the wall-discretization contact, 4C_pasi_*.cpp).

Staggered scheme per time step (the reference's Partitioned TwoWay):
  1. evaluate particle-wall contact on the CURRENT deformed surface
  2. advance the structure one dynamic step carrying the wall reactions
     (hoisted pasi_force slot — no recompile)
  3. advance the particles (DEM velocity-Verlet substeps) against the
     newly deformed, moving wall

Deck:
  problem: {type: pasi}
  particles: {positions: [...], radii: ..., mass: ..., dem: {...}}
  conditions: {particle_wall: [{faces: zmax}]}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import solid as ps
from fourc_tpu.utils.timer import Timers


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    from fourc_tpu.io.deck import _resolve_faces
    from fourc_tpu.materials import make_material
    from fourc_tpu.particles import engine as pe
    from fourc_tpu.particles.wall import ParticleWall
    from fourc_tpu.physics import structure_driver

    with timers("setup"):
        disc_name = "structure"
        if disc_name not in deck.disc:
            disc_name = next(iter(deck.disc))
        disc = deck.disc[disc_name]
        dyn = deck.sections["structural_dynamic"]
        conds = deck.conditions.get(disc_name, {})
        materials = {m: make_material(spec) for m, spec in deck.materials.items()}
        f = ps.SolidField(
            disc,
            materials,
            structure_driver.solid_params_from(deck),
            dirichlet=conds.get("dirichlet", ()),
            neumann=conds.get("neumann", ()),
            body_forces=conds.get("body_force", ()),
            functions=deck.functions,
            extra_force_hook=True,
        )

        psec = dict(deck.sections.get("particles") or deck.raw.get("particles") or {})
        x0 = jnp.asarray(np.asarray(psec["positions"], float))
        n_p = x0.shape[0]
        radii = jnp.asarray(np.broadcast_to(
            np.asarray(psec.get("radii", 0.1), float), (n_p,)))
        masses = jnp.asarray(np.broadcast_to(
            np.asarray(psec.get("mass", 1.0), float), (n_p,)))
        v0 = psec.get("velocities")
        v0 = None if v0 is None else jnp.asarray(np.asarray(v0, float))
        dem = dict(psec.get("dem") or {})
        dem_params = pe.DemParams(
            k_normal=float(dem.get("k_normal", 1e4)),
            damp_normal=float(dem.get("damp_normal", 0.0)),
            friction_mu=float(dem.get("friction_mu", 0.0)),
            gravity=tuple(dem.get("gravity", (0.0, 0.0, 0.0))),
        )
        n_sub = int(psec.get("substeps", 10))

        wall_conds = (deck.conditions.get("__global__", {}).get("particle_wall")
                      or conds.get("particle_wall") or [])
        if not wall_conds:
            raise ValueError("pasi needs a particle_wall condition")
        face_blocks = []
        for item in wall_conds:
            face_blocks += list(item["faces"] if not isinstance(item["faces"], str)
                                else _resolve_faces(disc, item["faces"]))
        wall = ParticleWall(face_blocks, np.asarray(disc.coords), np.asarray(x0))

        dt = float(dyn["timestep"])
        n_steps = int(dyn["numstep"])

        state_s = ps.compute_initial_state(f, ps.init_state(f))
        step_s = ps.make_step(f, dt)
        pstate = pe.init_state(x0, v0)

        g = jnp.asarray(dem_params.gravity)

        @jax.jit
        def particle_phase(px, pv, pa, wall_x, wall_v):
            """n_sub velocity-Verlet substeps against the moving wall."""
            def accel(x, v):
                fpp, _ = pe.dem_forces(x, v, radii, dem_params)
                fw, _ = wall.forces(x, v, radii, wall_x, wall_v,
                                    dem_params.k_normal,
                                    dem_params.damp_normal,
                                    dem_params.friction_mu)
                return (fpp + fw) / masses[:, None] + g[None, :]

            def body(i, s):
                x, v, a = s
                vh = v + 0.5 * (dt / n_sub) * a
                xn = x + (dt / n_sub) * vh
                an = accel(xn, vh)
                return (xn, vh + 0.5 * (dt / n_sub) * an, an)

            return jax.lax.fori_loop(0, n_sub, body, (px, pv, pa))

        @jax.jit
        def wall_reaction(px, pv, wall_x, wall_v):
            _, fw = wall.forces(px, pv, radii, wall_x, wall_v,
                                dem_params.k_normal, dem_params.damp_normal,
                                dem_params.friction_mu)
            return fw.reshape(-1)

    stats = {"newton_iters": 0, "lin_iters": 0, "substeps": 0}
    cbs = list(callbacks or [])
    combo = {"s": state_s, "p": pstate, "step": jnp.asarray(0)}
    combo, n_steps, cbs = drv.setup_restart(deck, "pasi", combo, n_steps, cbs)
    state_s, pstate = combo["s"], combo["p"]
    with timers("step"):
        for _ in range(n_steps):
            d = state_s["d"].reshape(-1, 3)
            vw = state_s["v"].reshape(-1, 3)
            wall_x = f.coords + d
            # 1. wall reactions from current particle state
            f.pasi_force = wall_reaction(pstate["x"], pstate["v"], wall_x, vw)
            # 2. structure step
            state_s, st = step_s(state_s)
            stats["newton_iters"] += int(st["iters"])
            stats["lin_iters"] += int(st["lin_iters"])
            stats["substeps"] += 1
            # 3. particles vs the newly deformed, moving wall
            wall_x = f.coords + state_s["d"].reshape(-1, 3)
            vw = state_s["v"].reshape(-1, 3)
            px, pv, pa = particle_phase(pstate["x"], pstate["v"], pstate["a"],
                                        wall_x, vw)
            pstate = dict(pstate, x=px, v=pv, a=pa, t=pstate["t"] + dt)
            # refresh the broad phase for the next step
            wall.cand = wall.build_candidates(np.asarray(wall_x), np.asarray(px))
            if cbs:
                combo = {"s": state_s, "p": pstate, "step": state_s["step"]}
                for cb in cbs:
                    cb("pasi", combo, stats)

    stats["resnorm"] = float(st["resnorm"])
    print(f"[pasi] {n_steps} steps, {stats['newton_iters']} Newton its, "
          f"{n_p} particles")

    class PasiView:
        def __init__(self, f, pstate):
            self.f = f
            self.disc = f.disc
            self.pstate = pstate

        def node_value(self, state, quantity, node):
            q = quantity.lower()
            comp = {"x": 0, "y": 1, "z": 2}
            if q.startswith("disp"):
                return float(np.asarray(state["d"]).reshape(-1, 3)[node, comp[q[-1]]])
            if q.startswith("part"):  # partx/party/partz: particle positions
                return float(np.asarray(self.pstate["x"])[node, comp[q[-1]]])
            raise KeyError(quantity)

    view = PasiView(f, pstate)
    struct_view = type("S", (), {})()
    struct_view.f = f
    struct_view.node_value = view.node_value
    return drv.RunResult(
        deck=deck,
        fields={"pasi": view, "structure": struct_view},
        states={"pasi": state_s, "structure": state_s},
        stats={"pasi": stats, "structure": stats},
        timers=timers,
    )
