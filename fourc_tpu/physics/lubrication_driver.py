"""Lubrication (Reynolds equation) field solver.

Counterpart of the reference's lubrication module (ref: src/lubrication —
`Lubrication::TimIntImpl` Reynolds-equation time integration,
element kernels 4C_lubrication_ele_calc.*; material 4C_mat_lubrication_mat.*).

Physics (thin-film incompressible Reynolds equation for pressure p):

    div( h^3/(12 mu) grad p ) = div( U h / 2 ) + dh/dt

  h(x, t): film thickness (deck FUNCT expression — the gap geometry),
  U: relative tangential sliding velocity, mu: dynamic viscosity.
  Weak form: int grad N . (h^3/(12 mu)) grad p  -  int grad N . (U h / 2)
             + int N dh/dt = 0; dh/dt from AD through the height function.

TPU-native: one batched element kernel over the lattice, matrix-free CG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.ops import common as gm
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics.newton import newton_solve
from fourc_tpu.utils.timer import Timers


class LubricationField:
    """Pressure field (1 dof/node) on a 1D/2D film domain."""

    def __init__(self, disc, params, dirichlet=(), functions=None):
        from fourc_tpu.core.conditions import DirichletHandler
        from fourc_tpu.core.functions import FunctionManager

        self.disc = disc
        self.params = params  # dict: viscosity, height_funct, velocity
        self.functions = functions or FunctionManager()
        self.ndpn = 1
        self.dofmap = disc.dofmap(1)
        self.ndof = self.dofmap.ndof
        dirichlet = list(dirichlet)
        if "__padding__" in disc.node_sets and len(disc.node_sets["__padding__"]):
            from fourc_tpu.core.conditions import DirichletBC

            dirichlet.append(DirichletBC(disc.node_sets["__padding__"], [1], [0.0]))
        self.dbc = DirichletHandler(dirichlet, disc.coords, 1, self.functions)
        # intrinsic film coordinates: drop constant axes so a line2 mesh
        # embedded in 3D integrates as a true 1D film (square Jacobians)
        cnp = np.asarray(disc.coords)
        span = np.ptp(cnp, axis=0) > 1e-14 * max(1.0, np.abs(cnp).max())
        if not span.any():
            span[0] = True
        self._span = np.where(span)[0]
        self.coords = jnp.asarray(cnp[:, self._span])
        self.block_X = {key: self.coords[self.dofmap.blocks[key].conn]
                        for key in self.dofmap.blocks}
        self.visc = float(params["viscosity"])
        self.U = jnp.asarray(params.get("velocity") or [0.0] * disc.dim)
        self.h_fn = self.functions.get(int(params["height_funct"]))

    def _cell(self, key):
        from fourc_tpu.core.cells import get_cell

        return get_cell(self.dofmap.blocks[key].cell)

    def residual(self, p, t, h_nodes=None, hdot_nodes=None):
        """h_nodes: optional nodal film thickness OVERRIDE (EHL: the film
        carries the elastic deflection; ref: src/ehl coupling of the
        Reynolds gap to the structural deformation)."""
        dm = self.dofmap
        per = {}
        for key in dm.blocks:
            cell = self._cell(key)
            Xe = self.block_X[key]
            G, detJ = gm.iso_gradients(Xe, cell.dN)  # (e,g,a,d), (e,g)
            wdet = gm.weighted(detJ, cell.gauss_weights)
            N = jnp.asarray(cell.N, Xe.dtype)
            xg = jnp.einsum("ga,ead->egd", N, Xe)  # GP coords
            if h_nodes is not None:
                conn = dm.blocks[key].conn
                h = jnp.einsum("ga,ea->eg", N, h_nodes[conn])
                hdot = (jnp.einsum("ga,ea->eg", N, hdot_nodes[conn])
                        if hdot_nodes is not None else jnp.zeros_like(h))
            else:
                h = self.h_fn(xg, t, component=0)  # (e,g)
                # squeeze term dh/dt by AD through the height function
                hdot = jax.jacfwd(lambda tt: self.h_fn(xg, tt, component=0))(
                    jnp.asarray(t, xg.dtype))
            pe = dm.gather(p, key)[..., 0]
            gp = jnp.einsum("egad,ea->egd", G, pe)
            coef = h**3 / (12.0 * self.visc)
            f = jnp.einsum("eg,eg,egad,egd->ea", wdet, coef, G, gp)
            # wedge (Couette) term: - int grad N . (U h / 2)
            f = f - 0.5 * jnp.einsum("eg,eg,egad,d->ea", wdet, h, G,
                                     self.U[: Xe.shape[-1]])
            # squeeze
            f = f + jnp.einsum("eg,ga,eg->ea", wdet, N, hdot)
            per[key] = f
        return dm.scatter_add(per)

    def build_preconditioner(self, t):
        from fourc_tpu.linalg.precond import jacobi

        dm = self.dofmap
        per = {}
        for key in dm.blocks:
            cell = self._cell(key)
            Xe = self.block_X[key]
            G, detJ = gm.iso_gradients(Xe, cell.dN)
            wdet = gm.weighted(detJ, cell.gauss_weights)
            N = jnp.asarray(cell.N, Xe.dtype)
            xg = jnp.einsum("ga,ead->egd", N, Xe)
            h = self.h_fn(xg, jnp.asarray(t), component=0)
            coef = h**3 / (12.0 * self.visc)
            per[key] = jnp.einsum("eg,eg,egad,egad->ea", wdet, coef, G, G)
        diag = dm.scatter_add(per)
        diag = jnp.where(self.dbc.free_mask, jnp.maximum(diag, 1e-300), 1.0)
        return jacobi(diag)


def build_field(deck) -> LubricationField:
    disc = next(iter(deck.disc.values()))
    dyn = deck.sections["lubrication_dynamic"]
    fieldname = next(iter(deck.disc))
    conds = deck.conditions.get(fieldname, {})
    return LubricationField(disc, dyn, dirichlet=conds.get("dirichlet", ()),
                            functions=deck.functions)


def run(deck, callbacks=None) -> drv.RunResult:
    from fourc_tpu.physics.newton import NewtonParams

    timers = Timers()
    with timers("setup"):
        f = build_field(deck)
    dyn = deck.sections["lubrication_dynamic"]
    solver = deck.sections["solver"]
    nw = NewtonParams(
        max_iter=5, tol_res=dyn["tolres"], tol_disp=1e-30, combine="or",
        lin_method="cg", lin_maxiter=solver["maxiter"], lin_rtol=solver["rtol"],
    )
    dt = dyn["timestep"]
    p = jnp.zeros((f.ndof,),
                  jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    state = {"p": p, "t": jnp.asarray(0.0, p.dtype), "step": jnp.asarray(0)}

    @jax.jit
    def step(state):
        t1 = state["t"] + dt
        M = f.build_preconditioner(t1)
        p0 = f.dbc.apply(state["p"], t1)
        # Reynolds is linear in p: one Newton iteration = the linear solve
        pn, stats = newton_solve(lambda q: f.residual(q, t1), p0,
                                 f.dbc.free_mask, M, nw)
        new = dict(state)
        new.update(p=pn, t=t1, step=state["step"] + 1)
        return new, stats

    cbs = list(callbacks or [])
    state, _nsteps, cbs = drv.setup_restart(deck, "lubrication", state, dyn["numstep"], cbs)
    state, agg = drv.time_loop(
        "lubrication", state, lambda _dt: step, dt, _nsteps,
        divercont="stop", callbacks=cbs, timers=timers,
    )
    return drv.RunResult(
        deck=deck, fields={"lubrication": LubricationView(f)},
        states={"lubrication": state}, stats={"lubrication": agg},
        timers=timers,
    )


class LubricationView:
    def __init__(self, f):
        self.f = f

    def node_value(self, state, quantity, node):
        if quantity.lower() in ("p", "pres", "pressure"):
            return float(np.asarray(state["p"])[node])
        raise KeyError(quantity)
