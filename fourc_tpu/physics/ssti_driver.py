"""SSTI (scatra-structure-thermo interaction).

Counterpart of the reference's ssti module (ref: src/ssti —
`SSTI::SSTIMono` monolithic 3-field scatra-structure-thermo coupling,
4C_ssti_monolithic.cpp).  Couplings implemented:

  structure <- scalar:  swelling eigenstrain (scatra_stvenantkirchhoff)
  structure <- thermo:  thermal eigenstrain  S_th = -3 K alpha dT I
                        (additive stress term assembled in the driver)
  scalar/thermo <- structure: transport on the DEFORMED configuration

The stacked y = [d, c, T] residual is solved by ONE matrix-free
Newton-Krylov — all six off-diagonal coupling blocks come from jax.jvp
through the residual (the reference assembles each block by hand).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.ops import common as gm
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import scalar_driver
from fourc_tpu.physics import scalar_transport as st
from fourc_tpu.physics import solid as ps
from fourc_tpu.physics import structure_driver
from fourc_tpu.physics.newton import newton_solve
from fourc_tpu.utils.timer import Timers


def _thermal_eigenforce(sol, d, T, alpha, bulk3, T0):
    """- int B^T (3K alpha dT I): additive thermal-eigenstrain force."""
    dm = sol.dofmap
    per = {}
    Tn = T.reshape(-1)
    for key in dm.blocks:
        cell = sol._cell(key)
        conn = dm.blocks[key].conn
        Xe = sol.block_X[key]
        G, detJ = gm.iso_gradients(Xe, cell.dN)  # (e,g,a,dim), (e,g)
        wdet = gm.weighted(detJ, cell.gauss_weights)
        N = jnp.asarray(cell.N, Xe.dtype)
        Tg = jnp.einsum("ga,ea->eg", N, Tn[conn])
        coef = -bulk3 * alpha * (Tg - T0)  # (e,g) isotropic PK2
        # kinematics-consistent first PK: P = F S_th = coef * F
        de = d.reshape(-1, sol.ndpn)[conn]  # (e, nen, dim)
        H = jnp.einsum("egad,eai->egid", G, de)  # (e,g,i,d) du_i/dX_d
        F = H + jnp.eye(Xe.shape[-1], dtype=Xe.dtype)[None, None]
        fe = jnp.einsum("eg,eg,egid,egad->eai", wdet, coef, F, G)
        per[key] = fe.reshape(fe.shape[0], -1)
    return dm.scatter_add(per)


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    cfg = deck.sections["ssti_dynamic"]
    dt = float(cfg["timestep"])
    with timers("setup"):
        sol = structure_driver.build_field(deck, next(iter(deck.disc)))
        sca = scalar_driver.build_field(deck, "scatra_dynamic", "scatra")
        th = scalar_driver.build_field(deck, "thermal_dynamic", "thermo")
        alpha = float(cfg["thermal_expansion"])
        T0 = float(cfg["ref_temp"])
        mat = next(iter(sol.block_mat.values()))
        youngs = float(getattr(mat, "youngs"))
        nue = float(getattr(mat, "nue"))
        bulk3 = youngs / (1.0 - 2.0 * nue)  # 3K

    nd, nc, nt = sol.ndof, sca.ndof, th.ndof

    def split(y):
        return y[:nd], y[nd:nd + nc], y[nd + nc:]

    free = jnp.concatenate([sol.dbc.free_mask, sca.dbc.free_mask,
                            th.dbc.free_mask])

    s0 = ps.init_state(sol)
    c0 = st.init_state(sca)["phi"]
    T0v = st.init_state(th)["phi"]
    if not th.params.initial_funct:
        T0v = th.dbc.apply(jnp.full_like(T0v, T0), 0.0)
    state = {"d": s0["d"], "c": c0, "T": T0v,
             "t": s0["t"], "step": s0["step"]}

    def conc_at_gps(c):
        out = {}
        for key in sol.dofmap.blocks:
            cell = sol._cell(key)
            conn = sol.dofmap.blocks[key].conn
            out[key] = jnp.einsum("ga,ea->eg", jnp.asarray(cell.N, c.dtype),
                                  c[conn])
        return out

    @jax.jit
    def step(state):
        t1 = state["t"] + dt
        d_n, c_n, T_n = state["d"], state["c"], state["T"]

        def residual(y):
            d, c, T = split(y)
            # structure: quasistatic w/ swelling (via temps=conc) + thermal
            conc = conc_at_gps(c)
            fint, _ = sol.internal_force(d, temps=conc, dt=dt)
            fint = fint + _thermal_eigenforce(sol, d, T, alpha, bulk3, T0)
            r_s = fint - sol.external_force(t1, d)
            md = d.reshape(-1, sol.ndpn)
            r_c = sca.residual_transient(c, (c - c_n) / dt, t1, dt=dt,
                                         mesh_disp=md)
            r_T = th.residual_transient(T, (T - T_n) / dt, t1, dt=dt,
                                        mesh_disp=md)
            return jnp.concatenate([r_s, r_c, r_T])

        d0 = sol.dbc.apply(d_n, t1)
        cb = sca.dbc.apply(c_n, t1)
        Tb = th.dbc.apply(T_n, t1)
        y0 = jnp.concatenate([d0, cb, Tb])
        Ms = sol.build_preconditioner(d0, dt=dt)
        Mc = sca.build_preconditioner(dt_factor=1.0 / dt)
        Mt = th.build_preconditioner(dt_factor=1.0 / dt)

        def M(r):
            rs, rc, rt = split(r)
            return jnp.concatenate([Ms(rs), Mc(rc), Mt(rt)])

        from dataclasses import replace

        nw = sol.params.newton
        if nw.lin_method == "cg":
            nw = replace(nw, lin_method="bicgstab")
        y, stats = newton_solve(residual, y0, free, M, nw)
        d, c, T = split(y)
        new = dict(state)
        new.update(d=d, c=c, T=T, t=t1, step=state["step"] + 1)
        return new, stats

    cbs = list(callbacks or [])
    state, _nsteps, cbs = drv.setup_restart(deck, "ssti", state, cfg["numstep"], cbs)
    state, agg = drv.time_loop(
        "ssti", state, lambda _dt: step, dt, _nsteps,
        divercont="stop", callbacks=cbs, timers=timers,
    )
    return drv.RunResult(
        deck=deck, fields={"ssti": SstiView(sol)},
        states={"ssti": state}, stats={"ssti": agg}, timers=timers,
    )


class SstiView:
    def __init__(self, sol):
        self.f = sol

    def node_value(self, state, quantity, node):
        q = quantity.lower()
        comp = {"x": 0, "y": 1, "z": 2}
        if q.startswith("disp"):
            return float(np.asarray(state["d"]).reshape(-1, self.f.ndpn)[
                node, comp[q[-1]]])
        if q in ("c", "phi", "conc"):
            return float(np.asarray(state["c"])[node])
        if q in ("t", "temp", "temperature"):
            return float(np.asarray(state["T"])[node])
        raise KeyError(quantity)
