"""Incompressible fluid field: stabilized N-S time integration.

Counterpart of the reference's fluid module
(ref: src/fluid/4C_fluid_implicit_integration.cpp — `FluidImplicitTimeInt`,
`integrate()` :546, `time_loop()` :569, `solve()` :767; schemes
4C_fluid_timint_{ost,bdf2,stationary}.*).  Equal-order velocity/pressure
interpolation with SUPG/PSPG/grad-div stabilization (kernels in
ops/fluid.py); dof layout per node: [u_1..u_dim, p] (ndpn = dim+1).

The reference reassembles the stabilized system each fixed-point/Newton
iteration; here the full Newton tangent (convective + stabilization
linearizations) is jax.jvp through the residual inside one jitted
Newton-Krylov while_loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.core.conditions import DirichletHandler
from fourc_tpu.core.functions import FunctionManager
from fourc_tpu.core.mesh import Discretization
from fourc_tpu.ops import common as gm
from fourc_tpu.ops import fluid as ops
from fourc_tpu.physics.newton import NewtonParams, newton_solve


@dataclass
class FluidParams:
    dyntype: str = "onesteptheta"  # stationary|onesteptheta|bdf2|genalpha
    dt: float = 1.0
    n_steps: int = 1
    theta: float = 0.5
    rho_inf: float = 0.5  # gen-alpha spectral radius (JWH)
    newton: NewtonParams = field(default_factory=NewtonParams)
    supg: bool = True
    pspg: bool = True
    graddiv: bool = True
    smagorinsky_cs: float = 0.0  # LES constant-Smagorinsky Cs (0 = laminar)
    turbulence_model: str = "none"  # none|smagorinsky|dynamic_smagorinsky|multifractal|avm3
    csgs: float = 0.25  # multifractal SGS coefficient (ref: CSGS)
    initial_funct: int = 0
    divercont: str = "stop"
    max_halvings: int = 5
    dtype: str = "float64"
    # turbulence statistics sampling (ref: TURBULENCE statistics manager,
    # SAMPLING_START): 0 = off; N = accumulate nodal (u, p) moments from
    # step N on, inside the jitted step (physics/turbulence_stats.py)
    sampling_start: int = 0


class FluidField:
    quantity = "velocity"

    def __init__(
        self,
        disc: Discretization,
        materials: dict,
        params: FluidParams,
        dirichlet=(),
        neumann=(),
        body_forces=(),
        functions: FunctionManager | None = None,
        windkessel=(),
    ):
        self.disc = disc
        self.params = params
        self.functions = functions or FunctionManager()
        self.dim = disc.dim
        self.ndpn = disc.dim + 1  # velocity + pressure
        self.dofmap = disc.dofmap(self.ndpn)
        self.ndof = self.dofmap.ndof
        dirichlet = list(dirichlet)
        if "__padding__" in disc.node_sets and len(disc.node_sets["__padding__"]):
            from fourc_tpu.core.conditions import DirichletBC

            dirichlet.append(
                DirichletBC(disc.node_sets["__padding__"],
                            [1] * self.ndpn, [0.0] * self.ndpn)
            )
        self.dbc = DirichletHandler(dirichlet, disc.coords, self.ndpn, self.functions)
        self.body_forces = list(body_forces)
        self.neumann = list(neumann)

        # Windkessel (RCR) outflow impedance conditions (ref:
        # src/fluid/4C_fluid_impedancecondition.* — 3-element Windkessel
        # lumped outflow): each condition couples the outflow flux
        # Q = int_face u.n dA to an applied boundary pressure
        # p = p_d + R1*Q, with the distal pressure ODE C dp_d/dt =
        # Q - p_d/R2 discretized backward-Euler INSIDE the Newton
        # residual, so the flux coupling is implicit and the tangent is
        # exact via AD.
        self.windkessel = []
        for wk in windkessel:
            from fourc_tpu.core.cells import get_cell

            blocks = []
            for fb in wk["faces"]:
                fc = get_cell(fb.cell)
                conn = jnp.asarray(np.asarray(fb.conn))
                blocks.append((fc, conn))
            self.windkessel.append(dict(
                blocks=blocks,
                r1=float(wk.get("r1", 0.0)),
                r2=float(wk.get("r2", 1.0)),
                c=float(wk.get("c", 1.0)),
                p0=float(wk.get("p0", 0.0)),
            ))

        self.coords = jnp.asarray(disc.coords)
        self.block_mat = {}
        self.block_X = {}
        for key, blk in disc.blocks.items():
            mid = int(np.asarray(blk.mat_id)[0])
            self.block_mat[key] = materials[mid]
            self.block_X[key] = self.coords[self.dofmap.blocks[key].conn]

    def _cell(self, key):
        from fourc_tpu.core.cells import get_cell

        return get_cell(self.dofmap.blocks[key].cell)

    def split(self, x):
        """Global vector -> (vel (n_nodes, dim), p (n_nodes,))."""
        xn = x.reshape(-1, self.ndpn)
        return xn[:, : self.dim], xn[:, self.dim]

    def body_at_gps(self, key, t):
        if not self.body_forces:
            return None
        cell = self._cell(key)
        xg = gm.interp_field(self.block_X[key], cell.N)
        out = jnp.zeros(xg.shape[:2] + (self.dim,), xg.dtype)
        for bf in self.body_forces:
            comps = []
            for k in range(self.dim):
                if k < len(bf.val) and bf.val[k] != 0:
                    fn = self.functions.get(bf.funct[k])
                    comps.append(bf.val[k] * fn(xg, t, component=0))
                else:
                    comps.append(jnp.zeros(xg.shape[:2]))
            out = out + jnp.stack(comps, axis=-1)
        return out

    def residual_transient(self, x, xdot, t, dt=None, mesh_disp=None,
                           mesh_vel=None, rho_gp=None, cont_src_gp=None):
        """Global stabilized N-S residual; x = interleaved [u, p] per node.

        mesh_disp/mesh_vel: (n_nodes, dim) ALE mesh motion (or None) — the
        residual is evaluated on the deformed mesh with convective velocity
        u - u_grid (ref: 4C_fluid_implicit_integration ALE path).
        """
        dm = self.dofmap
        p = self.params
        per_block = {}
        for key in dm.blocks:
            cell = self._cell(key)
            m = self.block_mat[key]
            conn = dm.blocks[key].conn
            xe = dm.gather(x, key)  # (e, nen, ndpn)
            xde = dm.gather(xdot, key)
            ue, pe = xe[..., : self.dim], xe[..., self.dim]
            udote = xde[..., : self.dim]
            Xe = self.block_X[key]
            gv = None
            if mesh_disp is not None:
                Xe = Xe + mesh_disp[conn]
            if mesh_vel is not None:
                gv = mesh_vel[conn]
            cs2 = None
            mfs_B = mfs_hat = avm3_fine = None
            if p.turbulence_model == "dynamic_smagorinsky":
                from fourc_tpu.ops import turbulence as tops

                # Picard treatment: the dynamic coefficient is frozen
                # within the Newton linearization (ref: dyn_smag applies
                # the filtered Cs of the last step)
                cs2 = jax.lax.stop_gradient(tops.dynamic_cs2(
                    Xe, ue, cell, conn, self.disc.n_nodes))
            elif p.turbulence_model == "multifractal":
                from fourc_tpu.ops import turbulence as tops

                # Picard-frozen B and hat_u (ref: MFS terms are evaluated
                # with the converged field of the last iterate)
                nu = float(m.visc()) / float(m.density)
                B, u_hat = tops.mfs_fields(Xe, ue, cell, jnp.asarray(conn),
                                           self.disc.n_nodes, nu,
                                           csgs=p.csgs)
                mfs_B = jax.lax.stop_gradient(B)
                mfs_hat = jax.lax.stop_gradient(u_hat[jnp.asarray(conn)])
            elif p.turbulence_model == "avm3":
                from fourc_tpu.ops import turbulence as tops

                if not hasattr(self, "_avm3"):
                    self._avm3 = tops.avm3_aggregates(self.disc)
                agg, counts = self._avm3
                uf = tops.avm3_fine_scales(
                    x.reshape(-1, self.ndpn)[:, : self.dim], agg, counts)
                avm3_fine = uf[jnp.asarray(conn)]
            f_mom, f_cont = ops.residual(
                Xe, ue, pe, udote, cell,
                mu=float(m.visc()), rho=float(m.density),
                body_gp=self.body_at_gps(key, t), dt=dt,
                supg=p.supg, pspg=p.pspg, graddiv=p.graddiv,
                grid_vel=gv, smagorinsky_cs=p.smagorinsky_cs, cs2_gp=cs2,
                mfs_B=mfs_B, mfs_ue_hat=mfs_hat, avm3_ue_fine=avm3_fine,
                avm3_cs=p.smagorinsky_cs or 0.1,
                rho_gp=None if rho_gp is None else rho_gp.get(key),
                cont_src_gp=(None if cont_src_gp is None
                             else cont_src_gp.get(key)),
            )
            fe = jnp.concatenate([f_mom, f_cont[..., None]], axis=-1)
            per_block[key] = fe.reshape(fe.shape[0], -1)
        r = dm.scatter_add(per_block)
        if self.neumann:
            r = r - self.external_traction(t)
        return r

    def external_traction(self, t):
        """Neumann surface tractions on the velocity dofs (ref: fluid
        NEUMANN conditions — prescribed boundary traction h = sigma.n;
        4C_fluid_ele_boundary_calc evaluate_neumann)."""
        from fourc_tpu.core.cells import get_cell

        f = jnp.zeros((self.disc.n_nodes, self.ndpn), self.coords.dtype)
        for nb in self.neumann:
            for fb in nb.faces:
                fc = get_cell(fb.cell)
                conn = jnp.asarray(np.asarray(fb.conn))
                Xf = self.coords[conn]
                dA, _ = gm.surface_measure(Xf, fc.dN)  # (e, g)
                w = jnp.asarray(fc.gauss_weights)
                N = jnp.asarray(fc.N)  # (g, a)
                xg = gm.interp_field(Xf, fc.N)
                comps = []
                for k in range(self.dim):
                    if k < len(nb.onoff) and nb.onoff[k]:
                        fn = self.functions.get(nb.funct[k])
                        comps.append(
                            nb.val[k] * fn(xg, t, component=0)
                            * jnp.ones(dA.shape, dA.dtype))
                    else:
                        comps.append(jnp.zeros(dA.shape, dA.dtype))
                trac = jnp.stack(comps, axis=-1)  # (e, g, dim)
                fe = jnp.einsum("g,eg,ga,egd->ead", w, dA, N, trac)
                pad = jnp.zeros(fe.shape[:2] + (1,), fe.dtype)
                f = f.at[conn].add(jnp.concatenate([fe, pad], axis=-1))
        return f.reshape(-1)

    # -- Windkessel outflow (lumped RCR impedance) -------------------------

    def _wk_flux_and_force(self, cond, x, p_app):
        """Returns (Q, nodal force residual contribution) for one
        condition: Q = int u.n dA and r += int N_a p_app n dA (the
        boundary traction -p n moved to the residual's LHS)."""
        u = x.reshape(-1, self.ndpn)[:, : self.dim]
        Q = 0.0
        contrib = jnp.zeros((self.disc.n_nodes, self.ndpn), x.dtype)
        for fc, conn in cond["blocks"]:
            Xf = self.coords[conn]
            dA, n = gm.surface_measure(Xf, fc.dN)  # (e,g), (e,g,d)
            w = jnp.asarray(fc.gauss_weights)
            N = jnp.asarray(fc.N)  # (g, a)
            ug = jnp.einsum("ga,ead->egd", N, u[conn])
            Q = Q + jnp.einsum("g,eg,egd,egd->", w, dA, ug, n)
            fe = jnp.einsum("g,eg,ga,egd->ead", w, dA, N, n) * p_app
            pad = jnp.zeros(fe.shape[:2] + (1,), fe.dtype)
            contrib = contrib.at[conn].add(
                jnp.concatenate([fe, pad], axis=-1))
        return Q, contrib.reshape(-1)

    def _wk_pressure(self, cond, Q, pd_old, dt):
        """Backward-Euler distal-pressure update and applied pressure."""
        if dt is None:  # stationary limit: C dp/dt = 0
            pd = cond["r2"] * Q
        else:
            pd = (pd_old + dt / cond["c"] * Q) / (
                1.0 + dt / (cond["r2"] * cond["c"]))
        return pd, pd + cond["r1"] * Q

    def windkessel_residual(self, x, pwk, dt):
        """Extra residual from all Windkessel conditions (implicit in x)."""
        r = jnp.zeros((self.ndof,), x.dtype)
        for i, cond in enumerate(self.windkessel):
            # flux needs no applied pressure; compute in two passes
            Q, _ = self._wk_flux_and_force(cond, x, 0.0)
            _, p_app = self._wk_pressure(cond, Q, pwk[i], dt)
            _, force = self._wk_flux_and_force(cond, x, p_app)
            r = r + force
        return r

    def windkessel_update(self, x, pwk, dt):
        """Post-solve distal pressure states."""
        new = []
        for i, cond in enumerate(self.windkessel):
            Q, _ = self._wk_flux_and_force(cond, x, 0.0)
            pd, _ = self._wk_pressure(cond, Q, pwk[i], dt)
            new.append(pd)
        return jnp.stack(new)

    def build_preconditioner(self, dt_factor=0.0, dt=None):
        """Physics-based Jacobi: velocity diag = mu*grad-grad + rho*mass*fac;
        pressure diag = PSPG tau/rho grad-grad (mask-safe)."""
        from fourc_tpu.linalg.precond import jacobi

        dm = self.dofmap
        nn = self.disc.n_nodes
        diag = jnp.zeros((nn, self.ndpn), self.coords.dtype)
        for key in dm.blocks:
            cell = self._cell(key)
            m = self.block_mat[key]
            mu, rho = float(m.visc()), float(m.density)
            G, detJ = gm.iso_gradients(self.block_X[key], cell.dN)
            wdet = gm.weighted(detJ, cell.gauss_weights)
            gg = jnp.einsum("eg,egad,egad->ea", wdet, G, G)
            mm = jnp.einsum("eg,ga,ga->ea", wdet, jnp.asarray(cell.N), jnp.asarray(cell.N))
            vdiag = mu * gg + rho * dt_factor * mm
            u0 = jnp.zeros(wdet.shape + (self.dim,), wdet.dtype)
            tau_m, _ = ops.stab_params(u0, mu, rho, G, wdet, self.dim, dt)
            pdiag = jnp.einsum("eg,eg,egad,egad->ea", wdet, tau_m, G, G) / rho
            conn = dm.blocks[key].conn
            contrib = jnp.concatenate(
                [jnp.repeat(vdiag[..., None], self.dim, axis=-1), pdiag[..., None]],
                axis=-1,
            )
            diag = diag.at[conn.reshape(-1)].add(contrib.reshape(-1, self.ndpn))
        diag = diag.reshape(-1)
        diag = jnp.where(self.dbc.free_mask, jnp.maximum(diag, 1e-300), 1.0)
        return jacobi(diag)


def init_state(f: FluidField):
    want64 = f.params.dtype == "float64" and jax.config.jax_enable_x64
    dtype = jnp.float64 if want64 else jnp.float32
    z = jnp.zeros((f.ndof,), dtype=dtype)
    x0 = z
    if f.params.initial_funct:
        fn = f.functions.get(f.params.initial_funct)
        vals = fn(jnp.asarray(f.disc.coords, dtype), 0.0)  # (n, ncomp)
        if vals.ndim == 1:
            vals = vals[:, None]
        pad = f.ndpn - vals.shape[1]
        if pad > 0:
            vals = jnp.concatenate([vals, jnp.zeros((vals.shape[0], pad), dtype)], 1)
        x0 = vals[:, : f.ndpn].reshape(-1)
    x0 = f.dbc.apply(x0, 0.0)
    state = {
        "x": x0,
        "xdot": z,
        "x_nm1": x0,
        "t": jnp.asarray(0.0, dtype),
        "step": jnp.asarray(0),
    }
    if f.windkessel:
        state["pwk"] = jnp.asarray([c["p0"] for c in f.windkessel], dtype)
    if f.params.sampling_start:
        from fourc_tpu.physics import turbulence_stats as ts

        state["tstat"] = ts.init_stats(f.disc.n_nodes, f.ndpn - 1, dtype)
    return state


def make_step(f: FluidField, dt: float | None = None):
    dt = float(dt if dt is not None else f.params.dt)
    typ = f.params.dyntype
    if typ == "stationary":
        raw = _make_stationary_step(f, dt)
    elif typ == "onesteptheta":
        raw = _make_ost_step(f, dt)
    elif typ == "bdf2":
        raw = _make_bdf2_step(f, dt)
    elif typ == "genalpha":
        raw = _make_genalpha_step(f, dt)
    else:
        raise ValueError(f"unknown FLUID DYNAMICTYPE {typ!r}")
    if f.params.sampling_start:
        from fourc_tpu.physics import turbulence_stats as ts

        start = int(f.params.sampling_start)
        inner = raw

        def raw(state):  # noqa: F811 — statistics-sampling wrapper
            new, stats = inner(state)
            w = (new["step"] >= start).astype(new["x"].dtype)
            new["tstat"] = ts.accumulate(new["tstat"], new["x"], f.ndpn,
                                         weight=w)
            return new, stats

    return jax.jit(raw)


def _nonsym(params: NewtonParams) -> NewtonParams:
    if params.lin_method == "cg":
        from dataclasses import replace

        return replace(params, lin_method="gmres")
    return params


def _make_stationary_step(f: FluidField, dt: float):
    def step(state):
        t1 = state["t"] + dt
        zero = jnp.zeros_like(state["x"])

        def residual(x):
            r = f.residual_transient(x, zero, t1, dt=None)
            if f.windkessel:
                r = r + f.windkessel_residual(x, state["pwk"], None)
            return r

        x0 = f.dbc.apply(state["x"], t1)
        M = f.build_preconditioner()
        x, stats = newton_solve(residual, x0, f.dbc.free_mask, M, _nonsym(f.params.newton))
        new = dict(state)
        if f.windkessel:
            new["pwk"] = f.windkessel_update(x, state["pwk"], None)
        new.update(x=x, x_nm1=state["x"], t=t1, step=state["step"] + 1)
        return new, stats

    return step


def _make_ost_step(f: FluidField, dt: float):
    th = f.params.theta

    def step(state):
        t1 = state["t"] + dt
        x_n, xdot_n = state["x"], state["xdot"]

        def residual(x):
            xdot = (x - x_n) / (th * dt) - (1 - th) / th * xdot_n
            # pressure is not a dynamic variable: zero its rate
            xdot = _zero_pressure_rate(f, xdot)
            r = f.residual_transient(x, xdot, t1, dt=dt)
            if f.windkessel:
                r = r + f.windkessel_residual(x, state["pwk"], dt)
            return r

        x0 = f.dbc.apply(x_n, t1)
        M = f.build_preconditioner(dt_factor=1.0 / (th * dt), dt=dt)
        x, stats = newton_solve(residual, x0, f.dbc.free_mask, M, _nonsym(f.params.newton))
        xdot1 = _zero_pressure_rate(f, (x - x_n) / (th * dt) - (1 - th) / th * xdot_n)
        new = dict(state)
        if f.windkessel:
            new["pwk"] = f.windkessel_update(x, state["pwk"], dt)
        new.update(x=x, xdot=f.dbc.mask(xdot1), x_nm1=x_n, t=t1, step=state["step"] + 1)
        return new, stats

    return step


def _make_bdf2_step(f: FluidField, dt: float):
    def step(state):
        t1 = state["t"] + dt
        x_n, x_nm1 = state["x"], state["x_nm1"]
        first = state["step"] == 0

        def residual(x):
            xdot_be = (x - x_n) / dt
            xdot_b2 = (3.0 * x - 4.0 * x_n + x_nm1) / (2.0 * dt)
            xdot = _zero_pressure_rate(f, jnp.where(first, xdot_be, xdot_b2))
            r = f.residual_transient(x, xdot, t1, dt=dt)
            if f.windkessel:
                r = r + f.windkessel_residual(x, state["pwk"], dt)
            return r

        x0 = f.dbc.apply(x_n, t1)
        M = f.build_preconditioner(dt_factor=1.5 / dt, dt=dt)
        x, stats = newton_solve(residual, x0, f.dbc.free_mask, M, _nonsym(f.params.newton))
        xdot1 = _zero_pressure_rate(
            f, jnp.where(first, (x - x_n) / dt, (3.0 * x - 4.0 * x_n + x_nm1) / (2.0 * dt))
        )
        new = dict(state)
        if f.windkessel:
            new["pwk"] = f.windkessel_update(x, state["pwk"], dt)
        new.update(x=x, xdot=f.dbc.mask(xdot1), x_nm1=x_n, t=t1, step=state["step"] + 1)
        return new, stats

    return step


def _make_genalpha_step(f: FluidField, dt: float):
    """Generalized-alpha for first-order systems (Jansen-Whiting-Hulbert;
    ref: 4C_fluid_timint_genalpha.* — the reference's TIMEINTEGR GenAlpha
    fluid scheme).  rho_inf parameterization:
      alpha_m = (3 - rho)/(2 (1 + rho)), alpha_f = 1/(1 + rho),
      gamma = 1/2 + alpha_m - alpha_f.
    The Newton unknown is x_{n+1}; the residual is evaluated at the
    intermediate state (x_{n+af}, xdot_{n+am}, t_{n+af})."""
    rho = f.params.rho_inf
    am = 0.5 * (3.0 - rho) / (1.0 + rho)
    af = 1.0 / (1.0 + rho)
    gam = 0.5 + am - af

    def step(state):
        t1 = state["t"] + dt
        t_af = state["t"] + af * dt
        x_n, xdot_n = state["x"], state["xdot"]

        def rates(x):
            xdot1 = (x - x_n) / (gam * dt) + (1.0 - 1.0 / gam) * xdot_n
            return _zero_pressure_rate(f, xdot1)

        def residual(x):
            xdot1 = rates(x)
            x_af = (1.0 - af) * x_n + af * x
            xdot_am = (1.0 - am) * xdot_n + am * xdot1
            r = f.residual_transient(x_af, xdot_am, t_af, dt=dt)
            if f.windkessel:
                r = r + f.windkessel_residual(x, state["pwk"], dt)
            return r

        x0 = f.dbc.apply(x_n, t1)
        M = f.build_preconditioner(dt_factor=am / (af * gam * dt), dt=dt)
        x, stats = newton_solve(residual, x0, f.dbc.free_mask, M,
                                _nonsym(f.params.newton))
        new = dict(state)
        if f.windkessel:
            new["pwk"] = f.windkessel_update(x, state["pwk"], dt)
        new.update(x=x, xdot=f.dbc.mask(rates(x)), x_nm1=x_n, t=t1,
                   step=state["step"] + 1)
        return new, stats

    return step


def _zero_pressure_rate(f: FluidField, xdot):
    xn = xdot.reshape(-1, f.ndpn)
    return xn.at[:, f.dim].set(0.0).reshape(-1)
