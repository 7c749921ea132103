"""STI: scatra-thermo interaction (monolithic).

Counterpart of the reference's sti module (ref: src/sti —
`STI::Monolithic` 4C_sti_monolithic.cpp: scalar transport thermally
coupled via the Soret effect, the thermo field sourced by the transport;
material 4C_mat_soret.*).

Physics:
  scalar:  rhoc_c dc/dt = div( D (grad c + S_T c grad T) )
           (thermodiffusion: the Soret flux drives solute down the
           thermal gradient for S_T > 0)
  thermo:  rho cp dT/dt = div( k grad T ) + Q_heat
           Q_heat = q_joule * |j|^2 / D  with j = -D (grad c + S_T c
           grad T)  (optional dissipative back-coupling; 0 = one-way)

TPU-native design mirrors TSI: one stacked residual over y = [c; T],
jax.jvp supplies the full 2x2 block tangent including the Soret
off-diagonal, one Newton-Krylov while_loop on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.ops import common as gm
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import scalar_driver
from fourc_tpu.physics import scalar_transport as st
from fourc_tpu.physics.newton import newton_solve
from fourc_tpu.utils.timer import Timers


class StiField:
    def __init__(self, scat: st.ScalarField, thermo: st.ScalarField,
                 q_joule: float = 0.0):
        assert scat.disc.n_nodes == thermo.disc.n_nodes
        self.scat = scat
        self.thermo = thermo
        self.q_joule = float(q_joule)
        self.nc = scat.ndof
        self.nt = thermo.ndof

    def split(self, y):
        return y[: self.nc], y[self.nc:]

    def join(self, c, T):
        return jnp.concatenate([c, T])

    @property
    def free_mask(self):
        return jnp.concatenate(
            [self.scat.dbc.free_mask, self.thermo.dbc.free_mask])

    def coupling_terms(self, c, T):
        """Per-block Soret flux (e,g,d) for the scalar residual and Joule
        source (e,g) for the thermo residual."""
        fs = self.scat
        flux, heat = {}, {}
        for key in fs.dofmap.blocks:
            m = fs.block_mat[key]
            S_T = float(getattr(m, "soret", 0.0))
            if S_T == 0.0 and self.q_joule == 0.0:
                continue
            cell = fs._cell(key)
            conn = fs.dofmap.blocks[key].conn
            G, _ = gm.iso_gradients(fs.block_X[key], cell.dN)
            N = jnp.asarray(cell.N, G.dtype)
            c_gp = jnp.einsum("ga,ea->eg", N, c[conn])
            gradc = jnp.einsum("egad,ea->egd", G, c[conn])
            gradT = jnp.einsum("egad,ea->egd", G, T[conn])
            D = m.diff()
            # scalar weak form already integrates D grad w . grad c; the
            # extra Soret part is D S_T c grad T
            flux[key] = D * S_T * c_gp[..., None] * gradT
            if self.q_joule:
                j = -D * (gradc + S_T * c_gp[..., None] * gradT)
                heat[key] = self.q_joule * jnp.einsum(
                    "egd,egd->eg", j, j) / D
        return flux or None, heat or None


def build_field(deck) -> StiField:
    scat = scalar_driver.build_field(deck, "scatra_dynamic", "scatra")
    thermo = scalar_driver.build_field(deck, "thermal_dynamic", "thermo")
    cfg = deck.sections.get("sti_dynamic", {})
    return StiField(scat, thermo, q_joule=float(cfg.get("q_joule", 0.0)))


def init_state(f: StiField):
    c = st.init_state(f.scat)
    T = st.init_state(f.thermo)
    return {"c": c["phi"], "cdot": c["phidot"],
            "T": T["phi"], "Tdot": T["phidot"],
            "t": c["t"], "step": c["step"]}


def make_step(f: StiField, dt: float):
    fs, ft = f.scat, f.thermo
    th_c = fs.params.theta if fs.params.dyntype == "onesteptheta" else 1.0
    th_T = ft.params.theta if ft.params.dyntype == "onesteptheta" else 1.0

    def step(state):
        t1 = state["t"] + dt
        c_n, cdot_n = state["c"], state["cdot"]
        T_n, Tdot_n = state["T"], state["Tdot"]

        def residual(y):
            c, T = f.split(y)
            flux, heat = f.coupling_terms(c, T)
            cdot = (c - c_n) / (th_c * dt) - (1 - th_c) / th_c * cdot_n
            Tdot = (T - T_n) / (th_T * dt) - (1 - th_T) / th_T * Tdot_n
            r_c = fs.residual_transient(c, cdot, t1, dt=dt, extra_flux=flux)
            r_T = ft.residual_transient(T, Tdot, t1, dt=dt,
                                        extra_source=heat)
            return f.join(r_c, r_T)

        c0 = fs.dbc.apply(c_n, t1)
        T0 = ft.dbc.apply(T_n, t1)
        y0 = f.join(c0, T0)
        Mc = fs.build_preconditioner(dt_factor=1.0 / (th_c * dt))
        MT = ft.build_preconditioner(dt_factor=1.0 / (th_T * dt))

        def M(r):
            rc, rT = f.split(r)
            return f.join(Mc(rc), MT(rT))

        nw = fs.params.newton
        if nw.lin_method == "cg":  # Soret coupling: nonsymmetric
            from dataclasses import replace

            nw = replace(nw, lin_method="gmres")
        y, stats = newton_solve(residual, y0, f.free_mask, M, nw)
        c, T = f.split(y)
        new = dict(state)
        new.update(
            c=c, T=T,
            cdot=fs.dbc.mask((c - c_n) / (th_c * dt)
                             - (1 - th_c) / th_c * cdot_n),
            Tdot=ft.dbc.mask((T - T_n) / (th_T * dt)
                             - (1 - th_T) / th_T * Tdot_n),
            t=t1, step=state["step"] + 1,
        )
        return new, stats

    return jax.jit(step)


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    with timers("setup"):
        f = build_field(deck)
        state = init_state(f)
    cfg = deck.sections["sti_dynamic"]
    cbs = list(callbacks or [])
    state, n_steps, cbs = drv.setup_restart(deck, "sti", state,
                                            cfg["numstep"], cbs)
    state, agg = drv.time_loop(
        "sti", state, lambda dt: make_step(f, dt), cfg["timestep"],
        n_steps, divercont="stop", callbacks=cbs, timers=timers,
    )
    return drv.RunResult(
        deck=deck,
        fields={"sti": StiView(f), "scatra": StiView(f), "thermo": StiView(f)},
        states={"sti": state, "scatra": state, "thermo": state},
        stats={"sti": agg, "scatra": agg, "thermo": agg},
        timers=timers,
    )


class StiView:
    def __init__(self, f: StiField):
        self.f = f

    def node_value(self, state, quantity: str, node: int):
        q = quantity.lower()
        if q in ("phi", "c", "conc", "concentration"):
            return float(np.asarray(state["c"])[node])
        if q in ("temp", "t", "temperature"):
            return float(np.asarray(state["T"])[node])
        raise KeyError(quantity)
