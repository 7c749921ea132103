"""Poroelasticity (Biot) driver: deck -> coupled u-p time loop.

Counterpart of the reference's poroelast module (ref: src/poroelast —
`PoroElast::Monolithic` 4C_poroelast_monolithic.cpp with the 2x2 block
system [K_uu K_up; K_pu K_pp], `PoroElast::Partitioned` staggered variant;
driver 4C_poroelast_dyn.cpp).

TPU-native design mirrors TSI: the coupled residual

    r(y) = [ r_u(d, p) ;  w_p * r_p(p, d) ]       y = [d; p]

is one pure function of the stacked state; jax.jvp through it supplies the
exact block tangent (including the off-diagonal Biot-coupling blocks
K_up = -alpha B^T (p J C^{-1}) and K_pu = alpha d(Jdot)/dd).  One
Newton-Krylov loop on device replaces the block-matrix + preconditioner
machinery.

Physics (finite-strain Biot with compressible storage):
  momentum:      div( F S_eff ) - alpha grad-term(p)    (effective stress,
                 total PK2 = S_eff(E) - alpha p J C^{-1}; StructPoro)
  mass balance:  S0 pdot + alpha dJ/dt - div((k/mu_f) grad p) = 0
(ref: 4C_mat_structporo.*, 4C_mat_fluidporo.*, poroelast monolithic
residuals.)
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
from fourc_tpu.physics.tsi import TsiParams
from fourc_tpu.utils.timer import Timers


class PoroField:
    """Solid skeleton + pore-pressure fields on the same (cloned) mesh."""

    def __init__(self, solid: ps.SolidField, pres: st.ScalarField, params):
        assert solid.disc.n_nodes == pres.disc.n_nodes, "poro needs cloned meshes"
        self.solid = solid
        self.pres = pres
        self.params = params
        self.nd = solid.ndof
        self.np_ = pres.ndof

    def p_at_gps(self, p):
        """Nodal pressure -> {block: (e, g)} on the solid mesh."""
        out = {}
        for key in self.solid.dofmap.blocks:
            cell = self.solid._cell(key)
            conn = self.solid.dofmap.blocks[key].conn
            out[key] = jnp.einsum("ga,ea->eg", jnp.asarray(cell.N, p.dtype), p[conn])
        return out

    def jdot_at_gps(self, u, v):
        """Biot volume-rate coupling at GPs: dJ/dt = J tr(F^-1 grad v).

        Linear-kinematics limit: tr(grad v) = div(udot)."""
        out = {}
        sol = self.solid
        d = sol.ndpn
        for key in sol.dofmap.blocks:
            m = sol.block_mat[key]
            if getattr(m, "kind", "") != "poro_solid":
                continue
            cell = sol._cell(key)
            G, _ = gm.iso_gradients(sol.block_X[key], cell.dN)  # (e,g,a,d)
            ue = sol.dofmap.gather(u, key)
            ve = sol.dofmap.gather(v, key)
            Hu = gm.grad_field(ue, G)  # (e,g,d,d)
            Hv = gm.grad_field(ve, G)
            if sol.params.kinem == "linear":
                jdot = jnp.einsum("egii->eg", Hv)
            else:
                eye = jnp.eye(d, dtype=Hu.dtype)
                F = Hu + eye
                J = jnp.linalg.det(F)
                Finv = jnp.linalg.inv(F)
                jdot = J * jnp.einsum("egij,egji->eg", Finv, Hv)
            out[key] = m.biot_alpha * jdot
        return out

    def split(self, y):
        return y[: self.nd], y[self.nd:]

    def join(self, d, p):
        return jnp.concatenate([d, p])

    @property
    def free_mask(self):
        return jnp.concatenate([self.solid.dbc.free_mask, self.pres.dbc.free_mask])

    def block_precond(self, u0, dt, solid_mass_shift=0.0, pres_dt_factor=0.0):
        Ms = self.solid.build_preconditioner(u0, mass_shift=solid_mass_shift, dt=dt)
        Mp = self.pres.build_preconditioner(dt_factor=pres_dt_factor)

        def M(r):
            ru, rp = self.split(r)
            return self.join(Ms(ru), Mp(rp))

        return M


def build_field(deck) -> PoroField:
    sname = "structure" if "structure" in deck.disc else next(iter(deck.disc))
    solid = structure_driver.build_field(deck, sname)
    pres = scalar_driver.build_field(deck, "poro_pressure_dynamic", "pressure")
    cfg = deck.sections["poroelasticity_dynamic"]
    params = TsiParams(
        coupling=cfg["coupling"], dt=cfg["timestep"], n_steps=cfg["numstep"],
        itemax_outer=cfg["itemax_outer"], convtol_outer=cfg["convtol_outer"],
    )
    return PoroField(solid, pres, params)


def init_state(f: PoroField):
    s = ps.init_state(f.solid)
    t = st.init_state(f.pres)
    return {
        "d": s["d"], "v": s["v"], "a": s["a"], "fint": s["fint"], "fext": s["fext"],
        "p": t["phi"], "pdot": t["phidot"],
        "t": s["t"], "step": s["step"], "hist": s["hist"],
    }


def _coupled_residuals(f: PoroField, state, dt, d_new, p_new, t1):
    """(r_u, r_p) at t_{n+1}; OST/statics semantics like the TSI driver."""
    sol, pr = f.solid, f.pres
    d_n, v_n = state["d"], state["v"]
    p_n, pdot_n = state["p"], state["pdot"]
    sp = sol.params
    theta_s = sp.theta if sp.dyntype == "onesteptheta" else 1.0
    theta_p = pr.params.theta if pr.params.dyntype == "onesteptheta" else 1.0

    pgp = f.p_at_gps(p_new)
    fint, _ = sol.internal_force(d_new, history=state["hist"] or None, dt=dt,
                                 temps=pgp)
    fext = sol.external_force(t1, d_new)
    if sp.dyntype == "statics":
        v_new = (d_new - d_n) / dt
        r_u = fint - fext
    else:
        v_new = (d_new - d_n) / (theta_s * dt) - (1 - theta_s) / theta_s * v_n
        a_mid = (v_new - v_n) / dt
        r_u = (
            sol.mass_matvec(a_mid)
            + theta_s * fint + (1 - theta_s) * state["fint"]
            - (theta_s * fext + (1 - theta_s) * state["fext"])
        )

    pdot_new = (p_new - p_n) / (theta_p * dt) - (1 - theta_p) / theta_p * pdot_n
    src = f.jdot_at_gps(d_new, v_new)
    src = {k: -v for k, v in src.items()}  # source enters with minus sign
    r_p = pr.residual_transient(p_new, pdot_new, t1, dt=dt,
                                extra_source=src or None)
    return r_u, r_p, v_new, pdot_new, fint, fext


def _finish_state(f, state, dt, d, p, t1):
    r_u, r_p, v_new, pdot_new, fint, fext = _coupled_residuals(
        f, state, dt, d, p, t1)
    sp = f.solid.params
    new = dict(state)
    if sp.dyntype == "statics":
        v1 = jnp.zeros_like(d)
        a1 = jnp.zeros_like(d)
    else:
        v1 = v_new
        a1 = (v1 - state["v"]) / (sp.theta * dt) - (1 - sp.theta) / sp.theta * state["a"]
    new.update(
        d=d, v=v1, a=a1, p=p, pdot=f.pres.dbc.mask(pdot_new),
        fint=fint, fext=fext, t=t1, step=state["step"] + 1,
    )
    return new


def make_monolithic_step(f: PoroField, dt: float):
    sol, pr = f.solid, f.pres

    def step(state):
        t1 = state["t"] + dt

        def residual(y):
            d, p = f.split(y)
            r_u, r_p, *_ = _coupled_residuals(f, state, dt, d, p, t1)
            return f.join(r_u, f.params.thermo_scale * r_p)

        d0 = sol.dbc.apply(state["d"], t1)
        p0 = pr.dbc.apply(state["p"], t1)
        y0 = f.join(d0, p0)
        sp = sol.params
        mass_shift = 0.0 if sp.dyntype == "statics" else 1.0 / (sp.theta * dt * dt)
        tp = pr.params
        p_fac = 1.0 / (max(tp.theta, 1e-300) * dt)
        M = f.block_precond(d0, dt, solid_mass_shift=mass_shift, pres_dt_factor=p_fac)
        # Biot block system is nonsymmetric (and indefinite): gmres/bicgstab
        nw = sol.params.newton
        if nw.lin_method == "cg":
            from dataclasses import replace

            nw = replace(nw, lin_method="gmres")
        y, stats = newton_solve(residual, y0, f.free_mask, M, nw)
        d, p = f.split(y)
        return _finish_state(f, state, dt, d, p, t1), stats

    return jax.jit(step)


def make_step(f: PoroField, dt: float):
    if f.params.coupling == "monolithic":
        return make_monolithic_step(f, dt)

    # partitioned FIXED-STRESS split: pressure solve at frozen volumetric
    # total stress (a stabilizing alpha^2/K_dr pseudo-storage against the
    # previous outer iterate — exactly cancelled at convergence), then
    # structure at frozen pressure.  The naive drained split contracts at
    # ~tau/(1+tau) and stalls for strong Biot coupling; fixed-stress is the
    # standard unconditionally-stable choice (ref: PoroElast::Partitioned
    # relaxation).
    sol, pr = f.solid, f.pres
    # drained bulk modulus per (single-material) field
    m0 = next(m for m in sol.block_mat.values()
              if getattr(m, "kind", "") == "poro_solid")
    K_dr = m0.youngs / (3.0 * (1.0 - 2.0 * m0.nue))
    stab = m0.biot_alpha**2 / K_dr
    S0_ref = max(float(m0.storage), 1e-30)

    def _int_source(src):
        """{key: (e,g)} GP values -> nodal integral int N_a s (ndof,)."""
        dm = pr.dofmap
        per = {}
        for key, s in src.items():
            cell = pr._cell(key)
            G, detJ = gm.iso_gradients(pr.block_X[key], cell.dN)
            wdet = gm.weighted(detJ, cell.gauss_weights)
            N = jnp.asarray(cell.N, wdet.dtype)
            per[key] = jnp.einsum("eg,ga,eg->ea", wdet, N, s)
        return dm.scatter_add(per)

    @jax.jit
    def solve_pressure(state, d_fixed, p_prev):
        t1 = state["t"] + dt
        theta_p = pr.params.theta
        pprev_gp = f.p_at_gps(p_prev)

        def residual(p):
            _, r_p, *_ = _coupled_residuals(f, state, dt, d_fixed, p, t1)
            # fixed-stress stabilization: + stab*(p - p_prev)/(theta dt)
            pgp = f.p_at_gps(p)
            extra = {k: stab * (pgp[k] - pprev_gp[k]) / (theta_p * dt)
                     for k in pgp}
            return r_p + _int_source(extra)

        p0 = pr.dbc.apply(state["p"], t1)
        p_fac = (1.0 + stab / S0_ref) / (max(pr.params.theta, 1e-300) * dt)
        M = pr.build_preconditioner(dt_factor=p_fac)
        return newton_solve(residual, p0, pr.dbc.free_mask, M, pr.params.newton)

    @jax.jit
    def solve_structure(state, p_fixed):
        t1 = state["t"] + dt

        def residual(d):
            r_u, *_ = _coupled_residuals(f, state, dt, d, p_fixed, t1)
            return r_u

        d0 = sol.dbc.apply(state["d"], t1)
        M = sol.build_preconditioner(
            d0, dt=dt,
            mass_shift=0.0 if sol.params.dyntype == "statics"
            else 1.0 / (sol.params.theta * dt * dt),
        )
        return newton_solve(residual, d0, sol.dbc.free_mask, M, sol.params.newton)

    oneway = f.params.coupling == "oneway"

    def step(state):
        t1 = state["t"] + dt
        d, p = state["d"], state["p"]
        tot_newton, tot_lin = 0, 0
        converged = True
        for it in range(1 if oneway else f.params.itemax_outer):
            p_new, stat_p = solve_pressure(state, d, p)
            d_new, stat_s = solve_structure(state, p_new)
            tot_newton += int(stat_p["iters"]) + int(stat_s["iters"])
            tot_lin += int(stat_p["lin_iters"]) + int(stat_s["lin_iters"])
            converged = bool(stat_p["converged"]) and bool(stat_s["converged"])
            dp = float(jnp.linalg.norm(p_new - p))
            dd = float(jnp.linalg.norm(d_new - d))
            d, p = d_new, p_new
            if oneway or max(dp, dd) < f.params.convtol_outer:
                break
        else:
            converged = False
        new = _finish_state(f, state, dt, d, p, t1)
        stats = {
            "iters": jnp.asarray(tot_newton), "lin_iters": jnp.asarray(tot_lin),
            "resnorm": stat_s["resnorm"], "dispnorm": stat_s["dispnorm"],
            "converged": jnp.asarray(converged),
        }
        return new, stats

    return step


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    with timers("setup"):
        f = build_field(deck)
        state = init_state(f)
        pgp = f.p_at_gps(state["p"])
        fint0, _ = f.solid.internal_force(state["d"], history=state["hist"] or None,
                                          temps=pgp)
        state["fint"] = fint0
        state["fext"] = f.solid.external_force(state["t"], state["d"])
    cfg = deck.sections["poroelasticity_dynamic"]
    cbs = list(callbacks or [])
    state, n_steps, cbs = drv.setup_restart(deck, "poro", state, cfg["numstep"], cbs)

    state, agg = drv.time_loop(
        "poro", state, lambda dt: make_step(f, dt), cfg["timestep"],
        n_steps, divercont="stop", callbacks=cbs, timers=timers,
    )
    solid_view = structure_driver.SolidFieldView(f.solid)
    return drv.RunResult(
        deck=deck,
        fields={"poro": PoroFieldView(f), "structure": solid_view,
                "pressure": PoroPressureView(f)},
        states={"poro": state,
                "structure": {"d": state["d"], "v": state["v"], "a": state["a"],
                              "hist": state["hist"]},
                "pressure": {"phi": state["p"], "phidot": state["pdot"]}},
        stats={"poro": agg, "structure": agg, "pressure": agg},
        timers=timers,
    )


class PoroFieldView:
    def __init__(self, f: PoroField):
        self.f = f
        self._solid = structure_driver.SolidFieldView(f.solid)

    def node_value(self, state, quantity: str, node: int):
        q = quantity.lower()
        if q in ("pressure", "p", "pres"):
            return float(np.asarray(state["p"])[node])
        return self._solid.node_value(state, quantity, node)


class PoroPressureView:
    def __init__(self, f: PoroField):
        self.f = f

    def node_value(self, state, quantity: str, node: int):
        if quantity.lower() in ("pressure", "p", "phi", "pres"):
            return float(np.asarray(state["phi"])[node])
        raise KeyError(quantity)
