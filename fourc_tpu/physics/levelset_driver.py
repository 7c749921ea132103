"""Level-set transport + reinitialization.

Counterpart of the reference's levelset module (ref: src/levelset —
level-set transport built on scatra (`ScaTra::LevelSetAlgorithm`,
4C_levelset_algorithm.*) with periodic REINITIALIZATION by the
Sussman pseudo-time PDE  d_tau phi = S(phi0)(1 - |grad phi|)).

TPU-native: the transport step is the standard SUPG-stabilized scatra
solve with zero diffusivity (pure advection) and a prescribed velocity
field; reinitialization runs a fixed number of explicit pseudo-time
steps with nodal (lumped-projection) gradients — all inside one jitted
step function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.ops import common as gm
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import scalar_driver
from fourc_tpu.physics import scalar_transport as st
from fourc_tpu.physics.newton import NewtonParams, newton_solve
from fourc_tpu.utils.timer import Timers


def nodal_gradient(f: st.ScalarField, phi):
    """Lumped L2 projection of grad(phi) to the nodes: (n, dim)."""
    dm = f.dofmap
    dim = f.disc.dim
    num = jnp.zeros((f.disc.n_nodes, dim), phi.dtype)
    den = jnp.zeros((f.disc.n_nodes,), phi.dtype)
    for key in dm.blocks:
        cell = f._cell(key)
        conn = dm.blocks[key].conn
        G, detJ = gm.iso_gradients(f.block_X[key], cell.dN)
        wdet = gm.weighted(detJ, cell.gauss_weights)
        N = jnp.asarray(cell.N, phi.dtype)
        pe = phi[conn]
        gphi = jnp.einsum("egad,ea->egd", G, pe)  # (e, g, d)
        num = num.at[conn.reshape(-1)].add(
            jnp.einsum("eg,ga,egd->ead", wdet, N, gphi).reshape(-1, dim))
        den = den.at[conn.reshape(-1)].add(
            jnp.einsum("eg,ga->ea", wdet, N).reshape(-1))
    return num / jnp.maximum(den, 1e-300)[:, None]


def _nodal_laplacian(f: st.ScalarField, phi, mlump):
    """(K_lap phi) / M_lump — consistent smoothing operator."""
    dm = f.dofmap
    out = jnp.zeros_like(phi)
    for key in dm.blocks:
        cell = f._cell(key)
        conn = dm.blocks[key].conn
        G, detJ = gm.iso_gradients(f.block_X[key], cell.dN)
        wdet = gm.weighted(detJ, cell.gauss_weights)
        gphi = jnp.einsum("egad,ea->egd", G, phi[conn])
        fe = jnp.einsum("eg,egad,egd->ea", wdet, G, gphi)
        out = out.at[conn.reshape(-1)].add(fe.reshape(-1))
    return out / jnp.maximum(mlump, 1e-300)


def reinitialize(f: st.ScalarField, phi, n_sweeps=10, dtau=None, eps=None):
    """Sussman pseudo-time reinitialization toward |grad phi| = 1,
    stabilized by an O(h) artificial viscosity (the central nodal gradient
    alone is an unstable Eikonal discretization — the FEM analog of the
    Godunov upwinding the reference's reinitialization uses)."""
    X = np.asarray(f.disc.coords)
    hs = []
    for blk in f.disc.blocks.values():
        c = np.asarray(blk.conn)
        hs.append(np.linalg.norm(X[c[:, 1]] - X[c[:, 0]], axis=1).min())
    h = float(min(hs))  # smallest element edge
    dtau = dtau or 0.3 * h
    eps = eps or 1.5 * h
    phi0 = phi
    S = phi0 / jnp.sqrt(phi0 * phi0 + eps * eps)
    mlump = f.lumped_capacity()
    nu = 0.1 * h
    # the artificial viscosity must not act ON the interface (it would
    # erode the zero level set): fade it out inside a band of ~2h
    fade = 1.0 - jnp.exp(-(phi0 / (2.0 * h)) ** 2)

    def sweep(i, p):
        g = nodal_gradient(f, p)
        gmag = jnp.sqrt(jnp.sum(g * g, axis=1) + 1e-30)
        return p - dtau * (S * (gmag - 1.0)
                           + fade * nu * _nodal_laplacian(f, p, mlump))

    return jax.lax.fori_loop(0, n_sweeps, sweep, phi)


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    dyn = deck.sections["scatra_dynamic"]
    ls_cfg = deck.sections["levelset_dynamic"]
    with timers("setup"):
        f = scalar_driver.build_field(deck, "scatra_dynamic",
                                     next(iter(deck.disc)))
    dt = float(dyn["timestep"])
    reinit_every = int(ls_cfg["reinit_every"])
    sweeps = int(ls_cfg["reinit_sweeps"])
    solver = deck.sections["solver"]
    nw = NewtonParams(max_iter=4, tol_res=dyn["tolres"], tol_disp=1e-30,
                      combine="or", lin_method="gmres",
                      gmres_restart=solver.get("gmres_restart", 60),
                      lin_maxiter=solver["maxiter"],
                      lin_rtol=solver["rtol"], lin_adaptive=False)
    state = st.init_state(f)
    M = f.build_preconditioner(dt_factor=1.0 / dt)

    @jax.jit
    def step(state):
        t1 = state["t"] + dt
        phi_n = state["phi"]

        def residual(p1):
            return f.residual_transient(p1, (p1 - phi_n) / dt, t1, dt=dt)

        p1, stats = newton_solve(residual, phi_n, f.dbc.free_mask, M, nw)
        do_reinit = (state["step"] + 1) % reinit_every == 0
        p1 = jax.lax.cond(do_reinit,
                          lambda p: reinitialize(f, p, n_sweeps=sweeps),
                          lambda p: p, p1)
        new = dict(state)
        new.update(phi=p1, t=t1, step=state["step"] + 1)
        return new, stats

    cbs = list(callbacks or [])
    state, _nsteps, cbs = drv.setup_restart(deck, "levelset", state, dyn["numstep"], cbs)
    state, agg = drv.time_loop(
        "levelset", state, lambda _dt: step, dt, _nsteps,
        divercont="stop", callbacks=cbs, timers=timers,
    )
    return drv.RunResult(
        deck=deck, fields={"levelset": LevelSetView(f)},
        states={"levelset": state}, stats={"levelset": agg}, timers=timers,
    )


class LevelSetView:
    def __init__(self, f):
        self.f = f

    def node_value(self, state, quantity, node):
        if quantity.lower() in ("phi", "levelset"):
            return float(np.asarray(state["phi"])[node])
        raise KeyError(quantity)
