"""Pressure-based multiphase porous-media flow.

Counterpart of the reference's porofluid_pressure_based family
(ref: src/porofluid_pressure_based + porofluid_pressure_based_ele —
`POROFLUIDMULTIPHASE` problem: multiphase flow with phase pressures as
primary variables, saturation closed by capillary-pressure laws, relative
permeabilities per phase; material 4C_mat_fluidporo_multiphase.*).

Implemented: two incompressible phases (wetting w / non-wetting n) on the
standard element machinery.  Dofs per node: (p_w, p_n).

  phi dS_a/dt  -  div( (k_r,a(S_w)/mu_a) K grad p_a )  =  q_a,  a = w, n
  S_w = S_e(p_c) (van Genuchten, p_c = p_n - p_w),  S_n = 1 - S_w

The whole residual is one batched kernel; saturations are evaluated AT
GAUSS POINTS from the pressure dofs, the consistent tangent (including
dS/dp_c) is jax.jvp through the residual — replacing the reference's
hand-derived phase-manager linearizations
(4C_porofluid_pressure_based_ele_phasemanager.*).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.ops import common as gm
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics.newton import NewtonParams, newton_solve
from fourc_tpu.utils.timer import Timers


class PorofluidField:
    """(p_w, p_n) field on the standard discretization."""

    def __init__(self, disc, materials, dirichlet=(), neumann=(),
                 body_forces=(), functions=None):
        from fourc_tpu.core.conditions import DirichletHandler
        from fourc_tpu.core.functions import FunctionManager

        self.disc = disc
        self.functions = functions or FunctionManager()
        self.ndpn = 2
        self.dofmap = disc.dofmap(2)
        self.ndof = self.dofmap.ndof
        self.dbc = DirichletHandler(list(dirichlet), disc.coords, 2,
                                    self.functions)
        self.coords = jnp.asarray(disc.coords)
        self.block_mat = {}
        self.block_X = {}
        for key, blk in disc.blocks.items():
            self.block_mat[key] = materials[int(np.asarray(blk.mat_id)[0])]
            self.block_X[key] = self.coords[self.dofmap.blocks[key].conn]
        self.neumann = list(neumann)
        self._neumann_data = []
        for nb in self.neumann:
            from fourc_tpu.core.cells import get_cell

            for fb in nb.faces:
                fc = get_cell(fb.cell)
                conn = jnp.asarray(fb.conn)
                self._neumann_data.append((nb, fc, conn, self.coords[conn]))

    def _cell(self, key):
        from fourc_tpu.core.cells import get_cell

        return get_cell(self.dofmap.blocks[key].cell)

    def residual(self, x, x_old, dt, t, extra_source=None):
        """Backward-Euler residual; x = interleaved (p_w, p_n) per node.

        extra_source: optional {block_key: (e, g, 2)} Gauss-point volumetric
        source per phase, added as ``+ int N_a s_c`` — the hook the
        porofluid_elast coupling uses to inject the skeleton volume-rate
        term S_a * alpha * dJ/dt (ref: porofluid_pressure_based_elast
        off-diagonal coupling blocks)."""
        dm = self.dofmap
        per = {}
        for key in dm.blocks:
            cell = self._cell(key)
            m = self.block_mat[key]
            Xe = self.block_X[key]
            G, detJ = gm.iso_gradients(Xe, cell.dN)  # (e,g,a,d), (e,g)
            wdet = gm.weighted(detJ, cell.gauss_weights)
            N = jnp.asarray(cell.N, Xe.dtype)

            xe = dm.gather(x, key)  # (e, nen, 2)
            xo = dm.gather(x_old, key)

            def sat(xx):
                p = jnp.einsum("ga,eac->egc", N, xx)  # (e,g,2)
                pc = p[..., 1] - p[..., 0]
                return m.s_w(pc)

            sw, sw_o = sat(xe), sat(xo)
            gp = jnp.einsum("egad,eac->egcd", G, xe)  # (e,g,2,d) grad p_a

            lam_w = m.kr(sw) / m.mu_w
            lam_n = m.kr(1.0 - sw) / m.mu_n
            K = m.permeability

            # storage: phi dS_a/dt (w: +dS_w, n: -dS_w)
            ds = m.porosity * (sw - sw_o) / dt
            f_w = jnp.einsum("eg,ga,eg->ea", wdet, N, ds)
            f_n = -f_w
            # Darcy fluxes
            f_w = f_w + K * jnp.einsum("eg,eg,egad,egd->ea", wdet, lam_w, G,
                                       gp[:, :, 0])
            f_n = f_n + K * jnp.einsum("eg,eg,egad,egd->ea", wdet, lam_n, G,
                                       gp[:, :, 1])
            if extra_source is not None and key in extra_source:
                s = extra_source[key]  # (e, g, 2)
                f_w = f_w + jnp.einsum("eg,ga,eg->ea", wdet, N, s[..., 0])
                f_n = f_n + jnp.einsum("eg,ga,eg->ea", wdet, N, s[..., 1])
            per[key] = jnp.stack([f_w, f_n], axis=-1).reshape(
                f_w.shape[0], -1)
        r = dm.scatter_add(per)
        # prescribed phase-flux (Neumann) boundaries: val = [q_w, q_n]
        for nb, fc, conn, Xf in self._neumann_data:
            fn = self.functions.get(nb.funct[0])
            xg = gm.interp_field(Xf, fc.N)
            dA, _ = gm.surface_measure(Xf, fc.dN)
            w = jnp.asarray(fc.gauss_weights)
            Nf = jnp.asarray(fc.N)
            for c in range(2):
                if c < len(nb.val) and nb.val[c]:
                    q = nb.val[c] * fn(xg, t, component=0)
                    fe = jnp.einsum("g,eg,ga,eg->ea", w, dA, Nf,
                                    jnp.broadcast_to(q, dA.shape))
                    r = r.at[conn.reshape(-1) * 2 + c].add(-fe.reshape(-1))
        return r

    def build_preconditioner(self, dt):
        from fourc_tpu.linalg.precond import jacobi

        dm = self.dofmap
        per = {}
        for key in dm.blocks:
            cell = self._cell(key)
            m = self.block_mat[key]
            G, detJ = gm.iso_gradients(self.block_X[key], cell.dN)
            wdet = gm.weighted(detJ, cell.gauss_weights)
            gg = jnp.einsum("eg,egad,egad->ea", wdet, G, G)
            lam = 0.5 * (1.0 / m.mu_w + 1.0 / m.mu_n)
            kd = m.permeability * lam * gg
            per[key] = jnp.stack([kd, kd], axis=-1).reshape(kd.shape[0], -1)
        diag = dm.scatter_add(per)
        diag = jnp.where(self.dbc.free_mask, jnp.maximum(diag, 1e-300), 1.0)
        return jacobi(diag)


def run(deck, callbacks=None) -> drv.RunResult:
    from fourc_tpu.materials import make_material

    timers = Timers()
    dyn = deck.sections["porofluid_dynamic"]
    solver = deck.sections["solver"]
    with timers("setup"):
        disc = next(iter(deck.disc.values()))
        mats = {mid: make_material(s) for mid, s in deck.materials.items()}
        fieldname = next(iter(deck.disc))
        conds = deck.conditions.get(fieldname, {})
        f = PorofluidField(disc, mats,
                           dirichlet=conds.get("dirichlet", ()),
                           neumann=conds.get("neumann", ()),
                           functions=deck.functions)
    dt = float(dyn["timestep"])
    nw = NewtonParams(max_iter=dyn["maxiter"], tol_res=dyn["tolres"],
                      tol_disp=1e-30, combine="or", lin_method="gmres",
                      lin_maxiter=solver["maxiter"], lin_rtol=solver["rtol"],
                      gmres_restart=solver["gmres_restart"], line_search=True)

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    x = jnp.zeros((f.ndof,), dtype)
    if dyn.get("initialfield_funct"):
        fn = f.functions.get(int(dyn["initialfield_funct"]))
        X = jnp.asarray(f.disc.coords, dtype)
        x = jnp.stack([fn(X, 0.0, component=0), fn(X, 0.0, component=1)],
                      axis=1).reshape(-1)
    x = f.dbc.apply(x, 0.0)
    state = {"x": x, "t": jnp.asarray(0.0, dtype), "step": jnp.asarray(0)}
    M = f.build_preconditioner(dt)

    @jax.jit
    def step(state):
        t1 = state["t"] + dt
        x_old = state["x"]

        def residual(x1):
            return f.residual(x1, x_old, dt, t1)

        x0 = f.dbc.apply(x_old, t1)
        x1, stats = newton_solve(residual, x0, f.dbc.free_mask, M, nw)
        new = dict(state)
        new.update(x=x1, t=t1, step=state["step"] + 1)
        return new, stats

    cbs = list(callbacks or [])
    state, _nsteps, cbs = drv.setup_restart(deck, "porofluid", state, dyn["numstep"], cbs)
    state, agg = drv.time_loop(
        "porofluid", state, lambda _dt: step, dt, _nsteps,
        divercont="stop", callbacks=cbs, timers=timers,
    )
    return drv.RunResult(
        deck=deck, fields={"porofluid": PorofluidView(f)},
        states={"porofluid": state}, stats={"porofluid": agg}, timers=timers,
    )


class PorofluidView:
    def __init__(self, f):
        self.f = f

    def node_value(self, state, quantity, node):
        q = quantity.lower()
        x = np.asarray(state["x"]).reshape(-1, 2)
        if q in ("pw", "pressure_w", "pres"):
            return float(x[node, 0])
        if q in ("pn", "pressure_n"):
            return float(x[node, 1])
        if q in ("sw", "saturation"):
            m = next(iter(self.f.block_mat.values()))
            return float(np.asarray(m.s_w(jnp.asarray(x[node, 1] - x[node, 0]))))
        raise KeyError(quantity)
