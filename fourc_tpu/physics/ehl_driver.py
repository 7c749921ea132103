"""EHL (elasto-hydrodynamic lubrication): structure + Reynolds film.

Counterpart of the reference's ehl module (ref: src/ehl —
`EHL::Base/Partitioned/Monolithic`: structure and lubrication fields
coupled through (a) the film thickness carrying the elastic deflection of
the lubricated surface and (b) the film pressure loading that surface;
mortar-mapped in the reference, matched-node here).

Partitioned fixed-point per (quasi-static) step:
  1. film:      h(x) = h0(x, t) + u_n(x)      (deflection opens the gap)
  2. Reynolds:  solve p on the film line mesh  (lubrication field)
  3. structure: solve with the film pressure as consistent surface load
  4. relax, repeat until the film increment stalls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import lubrication_driver as lub
from fourc_tpu.physics import structure_driver
from fourc_tpu.physics.newton import NewtonParams, newton_solve
from fourc_tpu.utils.timer import Timers


def run(deck, callbacks=None) -> drv.RunResult:
    from fourc_tpu.core import gridgen

    timers = Timers()
    cfg = deck.sections["ehl_dynamic"]
    dt = float(cfg["timestep"])
    with timers("setup"):
        sol = structure_driver.build_field(deck, next(iter(deck.disc)))
        X = np.asarray(sol.disc.coords)
        bottom = np.asarray(sol.disc.node_sets[cfg["surface"]])
        order = np.argsort(X[bottom, 0], kind="stable")
        surf = bottom[order]  # structure node ids along the film, by x
        xs = X[surf, 0]
        # film line mesh co-located with the surface nodes
        ldisc = gridgen.line(len(surf) - 1, p0=(float(xs[0]), 0, 0),
                             p1=(float(xs[-1]), 0, 0), name="lubrication")
        ldisc.coords[:, 0] = xs  # exact co-location (nonuniform spacing ok)
        lparams = {"viscosity": cfg["viscosity"],
                   "height_funct": cfg["height_funct"],
                   "velocity": cfg.get("velocity")}
        from fourc_tpu.core.conditions import DirichletBC

        lf = lub.LubricationField(
            ldisc, lparams,
            dirichlet=[DirichletBC(ldisc.node_sets["start"], [1], [0.0]),
                       DirichletBC(ldisc.node_sets["end"], [1], [0.0])],
            functions=deck.functions)
        surf_j = jnp.asarray(surf)
        seg_len = jnp.asarray(np.diff(xs))

    solver = deck.sections["solver"]
    nw_lub = NewtonParams(max_iter=4, tol_res=1e-11, tol_disp=1e-30,
                          combine="or", lin_method="cg",
                          lin_maxiter=solver["maxiter"], lin_rtol=1e-12)
    nw_s = sol.params.newton

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    d = jnp.zeros((sol.ndof,), dtype)
    p = jnp.zeros((lf.ndof,), dtype)
    state = {"d": d, "p": p, "t": jnp.asarray(0.0, dtype),
             "step": jnp.asarray(0)}
    Xl = jnp.asarray(xs)

    def film_from(d, t):
        """h = h0(x, t) + u_y of the surface nodes."""
        h0 = lf.h_fn(jnp.stack([Xl, 0 * Xl, 0 * Xl], 1), t, component=0)
        uy = d.reshape(-1, sol.ndpn)[surf_j, 1]
        return h0 + uy

    def pressure_load(p):
        """Consistent nodal upward forces from the film pressure (linear
        line elements): f_i = int N_i p dx."""
        pl, pr = p[:-1], p[1:]
        f = jnp.zeros((p.shape[0],), p.dtype)
        f = f.at[:-1].add(seg_len * (2 * pl + pr) / 6.0)
        f = f.at[1:].add(seg_len * (pl + 2 * pr) / 6.0)
        fvec = jnp.zeros((sol.ndof,), p.dtype)
        fvec = fvec.at[surf_j * sol.ndpn + 1].add(f)  # +y (lift)
        return fvec

    M_s0 = sol.build_preconditioner(d, dt=dt)

    def step(state):
        t1 = float(state["t"]) + dt
        d = state["d"]
        p = state["p"]
        it = 0
        newton_tot = 0
        lin_tot = 0
        conv = False
        h_prev = None
        for it in range(int(cfg["itemax_outer"])):
            h = film_from(d, t1)
            p, st_l = newton_solve(
                lambda q, hh=h: lf.residual(q, t1, h_nodes=hh),
                lf.dbc.apply(p, t1), lf.dbc.free_mask,
                lf.build_preconditioner(t1), nw_lub)
            fp = pressure_load(p)
            d, st_s = newton_solve(
                lambda u, fpp=fp: sol.internal_force(u)[0]
                - sol.external_force(t1, u) - fpp,
                sol.dbc.apply(d, t1), sol.dbc.free_mask, M_s0, nw_s)
            newton_tot += int(st_s["iters"]) + int(st_l["iters"])
            lin_tot += int(st_s["lin_iters"]) + int(st_l["lin_iters"])
            h_new = film_from(d, t1)
            dh = float(jnp.max(jnp.abs(h_new - (h_prev if h_prev is not None
                                                else h))))
            h_prev = h_new
            if it > 0 and dh < float(cfg["convtol_outer"]):
                conv = True
                break
        new = dict(state)
        new.update(d=d, p=p, t=jnp.asarray(t1, d.dtype),
                   step=state["step"] + 1)
        stats = {"iters": jnp.asarray(newton_tot),
                 "lin_iters": jnp.asarray(lin_tot),
                 "resnorm": st_s["resnorm"],
                 "converged": jnp.asarray(bool(conv) and bool(st_s["converged"]))}
        return new, stats

    cbs = list(callbacks or [])
    state, _nsteps, cbs = drv.setup_restart(deck, "ehl", state, cfg["numstep"], cbs)
    state, agg = drv.time_loop(
        "ehl", state, lambda _dt: step, dt, _nsteps,
        divercont="stop", callbacks=cbs, timers=timers,
    )
    return drv.RunResult(
        deck=deck, fields={"ehl": EhlView(sol, lf, surf)},
        states={"ehl": state}, stats={"ehl": agg}, timers=timers,
    )


class EhlView:
    def __init__(self, sol, lf, surf):
        self.f = sol
        self.lf = lf
        self.surf = surf

    def node_value(self, state, quantity, node):
        q = quantity.lower()
        if q in ("p", "pres", "pressure"):
            return float(np.asarray(state["p"])[node])
        comp = {"x": 0, "y": 1, "z": 2}
        if q.startswith("disp"):
            return float(np.asarray(state["d"]).reshape(-1, self.f.ndpn)[
                node, comp[q[-1]]])
        raise KeyError(quantity)
