"""Multiphase porous flow in an elastic skeleton (+ optional transport).

Counterpart of the reference's porofluid_pressure_based_elast family
(ref: src/porofluid_pressure_based_elast — `PorofluidElast::Monolithic`
with the [K_uu K_up; K_pu K_pp] block system over displacement and phase
pressures; src/porofluid_pressure_based_elast_scatra — the additional
species transport advected by the phase Darcy fluxes).

TPU-native design (same recipe as poro_driver / tsi_driver): the coupled
residual

    r(y) = [ r_u(d, p_w, p_n) ;  r_f(p_w, p_n, d) ]    y = [d; x]

is one pure function of the stacked state and jax.jvp supplies the full
block tangent — including the off-diagonal blocks the reference assembles
by hand (K_up from the solid-pressure term, K_pu from the skeleton
volume-rate term).  One Newton-Krylov while_loop on device.

Physics:
  momentum:    div(F S_eff) - grad-term(alpha p_s),
               p_s = S_w p_w + S_n p_n   (saturation-weighted solid
               pressure; ref: 4C_porofluid_pressure_based_elast evaluation
               of the solid pressure from the phase manager)
  mass (a=w,n): phi dS_a/dt + S_a alpha dJ/dt
               - div((k_r,a/mu_a) K grad p_a) = q_a

The _scatra variant chains a one-step-theta transport solve advected by
the wetting-phase Darcy flux after each coupled step (1WC, the pattern of
the reference's porofluid elast scatra regression decks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.ops import common as gm
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import porofluid_driver as pf
from fourc_tpu.physics import scalar_driver
from fourc_tpu.physics import scalar_transport as st
from fourc_tpu.physics import solid as ps
from fourc_tpu.physics import structure_driver
from fourc_tpu.physics.newton import NewtonParams, newton_solve
from fourc_tpu.utils.timer import Timers


class PorofluidElastField:
    """Solid skeleton (structporo) + (p_w, p_n) porofluid on cloned meshes."""

    def __init__(self, solid: ps.SolidField, fluid: pf.PorofluidField,
                 scatra: st.ScalarField | None = None):
        assert solid.disc.n_nodes == fluid.disc.n_nodes, (
            "porofluid_elast needs cloned meshes")
        self.solid = solid
        self.fluid = fluid
        self.scatra = scatra
        self.disc = solid.disc
        self.nd = solid.ndof
        self.nf = fluid.ndof

    def split(self, y):
        return y[: self.nd], y[self.nd:]

    def join(self, d, x):
        return jnp.concatenate([d, x])

    @property
    def free_mask(self):
        return jnp.concatenate([self.solid.dbc.free_mask,
                                self.fluid.dbc.free_mask])

    # -- coupling terms -------------------------------------------------------

    def solid_pressure_at_gps(self, x):
        """p_s = S_w p_w + S_n p_n at solid Gauss points, {key: (e, g)}."""
        out = {}
        sol = self.solid
        for key in sol.dofmap.blocks:
            cell = sol._cell(key)
            conn = sol.dofmap.blocks[key].conn
            m = self.fluid.block_mat[key]
            N = jnp.asarray(cell.N, x.dtype)
            pe = x.reshape(-1, 2)[conn]  # (e, nen, 2)
            p = jnp.einsum("ga,eac->egc", N, pe)  # (e, g, 2)
            sw = m.s_w(p[..., 1] - p[..., 0])
            out[key] = sw * p[..., 0] + (1.0 - sw) * p[..., 1]
        return out

    def volrate_at_gps(self, u, v, x):
        """Skeleton volume-rate source per phase: S_a alpha dJ/dt,
        {key: (e, g, 2)} on the fluid mesh (same connectivity)."""
        out = {}
        sol = self.solid
        d = sol.ndpn
        for key in sol.dofmap.blocks:
            m = sol.block_mat[key]
            alpha = getattr(m, "biot_alpha", 1.0)
            cell = sol._cell(key)
            G, _ = gm.iso_gradients(sol.block_X[key], cell.dN)
            ue = sol.dofmap.gather(u, key)
            ve = sol.dofmap.gather(v, key)
            Hu = gm.grad_field(ue, G)
            Hv = gm.grad_field(ve, G)
            if sol.params.kinem == "linear":
                jdot = jnp.einsum("egii->eg", Hv)
            else:
                eye = jnp.eye(d, dtype=Hu.dtype)
                F = Hu + eye
                J = jnp.linalg.det(F)
                Finv = jnp.linalg.inv(F)
                jdot = J * jnp.einsum("egij,egji->eg", Finv, Hv)
            # saturations at the fluid GPs
            mfl = self.fluid.block_mat[key]
            conn = self.fluid.dofmap.blocks[key].conn
            N = jnp.asarray(cell.N, u.dtype)
            pe = x.reshape(-1, 2)[conn]
            p = jnp.einsum("ga,eac->egc", N, pe)
            sw = mfl.s_w(p[..., 1] - p[..., 0])
            src = alpha * jdot
            out[key] = jnp.stack([sw * src, (1.0 - sw) * src], axis=-1)
        return out

    def darcy_w_nodes(self, x):
        """Mass-lumped L2 projection of the wetting-phase Darcy flux
        q_w = -(k_r,w/mu_w) K grad p_w to the nodes, (n_nodes, dim)."""
        fl = self.fluid
        dim = fl.disc.dim
        num = jnp.zeros((fl.disc.n_nodes, dim), x.dtype)
        den = jnp.zeros((fl.disc.n_nodes,), x.dtype)
        for key in fl.dofmap.blocks:
            cell = fl._cell(key)
            m = fl.block_mat[key]
            conn = jnp.asarray(fl.dofmap.blocks[key].conn)
            G, detJ = gm.iso_gradients(fl.block_X[key], cell.dN)
            wdet = gm.weighted(detJ, cell.gauss_weights)
            N = jnp.asarray(cell.N, x.dtype)
            pe = x.reshape(-1, 2)[conn]
            p = jnp.einsum("ga,eac->egc", N, pe)
            sw = m.s_w(p[..., 1] - p[..., 0])
            gpw = jnp.einsum("egad,ea->egd", G, pe[..., 0])
            q = -(m.permeability / m.mu_w) * m.kr(sw)[..., None] * gpw
            fe = jnp.einsum("eg,ga,egd->ead", wdet, N, q)
            me = jnp.einsum("eg,ga->ea", wdet, N)
            num = num.at[conn.reshape(-1)].add(fe.reshape(-1, dim))
            den = den.at[conn.reshape(-1)].add(me.reshape(-1))
        return num / jnp.maximum(den, 1e-300)[:, None]


def build_field(deck) -> PorofluidElastField:
    from fourc_tpu.materials import make_material

    solid = structure_driver.build_field(deck, "structure")
    mats = {mid: make_material(s) for mid, s in deck.materials.items()}
    fname = "porofluid" if "porofluid" in deck.disc else "structure"
    conds = deck.conditions.get(fname, {})
    fluid = pf.PorofluidField(
        deck.disc[fname], mats,
        dirichlet=conds.get("dirichlet", ()) if fname != "structure" else
        deck.conditions.get("porofluid", {}).get("dirichlet", ()),
        neumann=conds.get("neumann", ()) if fname != "structure" else (),
        functions=deck.functions)
    scat = None
    if deck.problem_type.endswith("scatra"):
        scat = scalar_driver.build_field(deck, "scatra_dynamic", "scatra")
    return PorofluidElastField(solid, fluid, scat)


def _coupled_residual(f, state, dt, d_new, x_new, t1):
    sol = f.solid
    d_n, v_n = state["d"], state["v"]
    v_new = (d_new - d_n) / dt

    psg = f.solid_pressure_at_gps(x_new)
    fint, _ = sol.internal_force(d_new, history=state["hist"] or None,
                                 dt=dt, temps=psg)
    fext = sol.external_force(t1, d_new)
    r_u = fint - fext  # quasi-static skeleton (consolidation regime)

    src = f.volrate_at_gps(d_new, v_new, x_new)
    r_f = f.fluid.residual(x_new, state["x"], dt, t1, extra_source=src)
    return r_u, r_f, fint, fext


def make_monolithic_step(f: PorofluidElastField, dt: float, nw: NewtonParams):
    sol, fl = f.solid, f.fluid

    def step(state):
        t1 = state["t"] + dt

        def residual(y):
            d, x = f.split(y)
            r_u, r_f, *_ = _coupled_residual(f, state, dt, d, x, t1)
            return f.join(r_u, r_f)

        d0 = sol.dbc.apply(state["d"], t1)
        x0 = fl.dbc.apply(state["x"], t1)
        y0 = f.join(d0, x0)
        Ms = sol.build_preconditioner(d0, dt=dt)
        Mf = fl.build_preconditioner(dt)

        def M(r):
            ru, rf = f.split(r)
            return f.join(Ms(ru), Mf(rf))

        y, stats = newton_solve(residual, y0, f.free_mask, M, nw)
        d, x = f.split(y)
        r_u, r_f, fint, fext = _coupled_residual(f, state, dt, d, x, t1)
        new = dict(state)
        new.update(d=d, v=(d - state["d"]) / dt, x=x, fint=fint, fext=fext,
                   t=t1, step=state["step"] + 1)
        return new, stats

    return jax.jit(step)


def make_scatra_step(f: PorofluidElastField, dt: float, nw: NewtonParams):
    """1WC transport through the wetting phase (ref: porofluid elast scatra
    part_1wc: flow-mechanics step first, then advected transport)."""
    sc = f.scatra
    theta = sc.params.theta

    def step(state, d_new, x_new):
        t1 = state["t"] + dt
        vel = f.darcy_w_nodes(x_new)
        c_n, cdot_n = state["c"], state["cdot"]

        def residual(c):
            cdot = (c - c_n) / (theta * dt) - (1 - theta) / theta * cdot_n
            return sc.residual_transient(c, cdot, t1, dt=dt, vel_nodes=vel)

        c0 = sc.dbc.apply(c_n, t1)
        M = sc.build_preconditioner(dt_factor=1.0 / (theta * dt))
        c, stats = newton_solve(residual, c0, sc.dbc.free_mask, M, nw)
        cdot = (c - c_n) / (theta * dt) - (1 - theta) / theta * cdot_n
        return c, sc.dbc.mask(cdot), stats

    return jax.jit(step)


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    with timers("setup"):
        f = build_field(deck)
    cfg = deck.sections["porofluid_dynamic"]
    solver = deck.sections["solver"]
    dt = float(cfg["timestep"])
    nw = NewtonParams(max_iter=cfg["maxiter"], tol_res=cfg["tolres"],
                      tol_disp=1e-30, combine="or", lin_method="gmres",
                      lin_maxiter=solver["maxiter"], lin_rtol=solver["rtol"],
                      gmres_restart=solver["gmres_restart"], line_search=True)

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    s = ps.init_state(f.solid)
    x = jnp.zeros((f.nf,), dtype)
    if cfg.get("initialfield_funct"):
        fn = f.fluid.functions.get(int(cfg["initialfield_funct"]))
        X = jnp.asarray(f.fluid.disc.coords, dtype)
        x = jnp.stack([fn(X, 0.0, component=0), fn(X, 0.0, component=1)],
                      axis=1).reshape(-1)
    x = f.fluid.dbc.apply(x, 0.0)
    state = {"d": s["d"], "v": s["v"], "x": x, "fint": s["fint"],
             "fext": s["fext"], "hist": s["hist"],
             "t": jnp.asarray(0.0, dtype), "step": jnp.asarray(0)}
    if f.scatra is not None:
        t0 = st.init_state(f.scatra)
        state["c"], state["cdot"] = t0["phi"], t0["phidot"]

    mono = make_monolithic_step(f, dt, nw)
    scstep = make_scatra_step(f, dt, nw) if f.scatra is not None else None

    def make_step(_dt):
        def step(state):
            new, stats = mono(state)
            if scstep is not None:
                c, cdot, _ = scstep(state, new["d"], new["x"])
                new = dict(new)
                new.update(c=c, cdot=cdot)
            return new, stats

        return step

    cbs = list(callbacks or [])
    state, _nsteps, cbs = drv.setup_restart(deck, "porofluid_elast", state, cfg["numstep"], cbs)
    state, agg = drv.time_loop(
        "porofluid_elast", state, make_step, dt, _nsteps,
        divercont="stop", callbacks=cbs, timers=timers,
    )
    view = PorofluidElastView(f)
    fields = {"porofluid_elast": view, "structure": view}
    if f.scatra is not None:
        fields["scatra"] = view
    return drv.RunResult(deck=deck, fields=fields,
                         states={k: state for k in fields},
                         stats={k: agg for k in fields}, timers=timers)


class PorofluidElastView:
    def __init__(self, f: PorofluidElastField):
        self.f = f
        self.disc = f.solid.disc

    def node_value(self, state, quantity, node):
        q = quantity.lower()
        if q in ("dispx", "dispy", "dispz"):
            return float(np.asarray(state["d"]).reshape(-1, 3)[
                node, "xyz".index(q[-1])])
        x = np.asarray(state["x"]).reshape(-1, 2)
        if q in ("pw", "pressure", "pres"):
            return float(x[node, 0])
        if q in ("pn", "pressure_n"):
            return float(x[node, 1])
        if q in ("sw", "saturation"):
            m = next(iter(self.f.fluid.block_mat.values()))
            return float(np.asarray(m.s_w(jnp.asarray(x[node, 1] - x[node, 0]))))
        if q in ("phi", "c", "concentration") and self.f.scatra is not None:
            return float(np.asarray(state["c"])[node])
        raise KeyError(quantity)
