"""Brownian-dynamics problem driver: deck -> BeamField -> Langevin loop.

Deck-driven entry for the browniandyn module (ref: src/browniandyn —
the reference drives Brownian dynamics through the structural time
integrator with a BROWNIAN DYNAMICS input section; here the
`brownian_dynamics` deck section supplies kT, viscosity, drag and the
optional crosslinking submodel parameters).
"""

from __future__ import annotations

import numpy as np

from fourc_tpu.physics import browniandyn as bd
from fourc_tpu.physics import driver as drv


def run(deck, callbacks=None):
    from fourc_tpu.physics import structure_driver as sd
    from fourc_tpu.utils.timer import Timers

    timers = Timers()
    f = sd.build_field(deck)
    cfg = deck.sections["brownian_dynamics"]
    params = bd.BrownianParams(
        kt=cfg["kt"], viscosity=cfg["viscosity"],
        damping_coeff=cfg["damping_coeff"], seed=cfg["seed"])
    crosslink = None
    if cfg["crosslinking"]:
        from fourc_tpu.coupling import crosslinking as xl

        xcfg = dict(cfg["crosslinking"])
        crosslink = xl.CrosslinkParams(**{
            k: xcfg[k] for k in ("n_linkers", "k_on", "k_off", "k_spring",
                                 "l0", "r_reach", "diffusivity", "seed")
            if k in xcfg})
    cbs = list(callbacks or [])
    state0 = bd.init_state(f, params)
    if crosslink is not None:
        from fourc_tpu.coupling import crosslinking as xl

        X = np.asarray(f.disc.coords)
        state0["linkers"] = xl.init_linkers(crosslink, X.min(0), X.max(0))
    state0, n_rem, cbs = drv.setup_restart(
        deck, "browniandyn", state0, cfg["numstep"], cbs)
    # checkpointing chunks the scan at the restart interval so the
    # CheckpointCallback sees the intermediate states (the scan itself
    # stays on device within each chunk)
    interval = int(deck.sections["io"].get("restart_interval", 0) or 0)
    chunk = interval if interval > 0 else n_rem
    with timers("browniandyn"):
        final, trajs = state0, []
        done = 0
        while done < n_rem:
            k = min(chunk, n_rem - done)
            final, traj = bd.run(f, params, dt=cfg["timestep"],
                                 numstep=k, state=final,
                                 crosslink=crosslink)
            trajs.append(np.asarray(traj))
            done += k
            for cb in cbs:
                cb("browniandyn", final, None)
        traj = np.concatenate(trajs, axis=0) if trajs else np.zeros(
            (0, f.ndof))
    ux = np.asarray(traj)
    agg = {
        "steps": int(cfg["numstep"]),
        # trajectory statistics (the reference's runtime statistics output):
        # mean-square displacement of translational dofs at the final step
        "msd": float((ux[-1].reshape(-1, f.ndpn)[:, :3] ** 2)
                     .sum(axis=1).mean()),
    }
    for cb in callbacks or []:
        cb(final, None)
    return drv.RunResult(
        deck=deck, fields={"structure": sd.SolidFieldView(f)},
        states={"structure": final}, stats={"structure": agg},
        timers=timers)
