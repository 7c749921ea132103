"""Poroelasticity + scalar transport (poroelast_scatra).

Counterpart of the reference's poroelast_scatra module (ref:
src/poroelast_scatra — `PoroElastScaTra::PoroScatraPart1WC` /
`PoroScatraPart2WC` partitioned drivers, 4C_poroelast_scatra_part_1wc.cpp:
poroelastic u-p step first, then scalar transport through the deforming,
fluid-saturated skeleton, advected by the Darcy seepage flux).

TPU-native design: per time step
  1. the monolithic (or fixed-stress partitioned) Biot u-p step reused
     verbatim from poro_driver;
  2. nodal Darcy flux  q = -(k/mu) grad p  by mass-lumped L2 projection of
     the Gauss-point fluxes;
  3. one one-step-theta scatra solve with ``vel_nodes = q`` — the scalar
     equation  phi0 dc/dt + q . grad c - div(D_eff grad c) = 0  gets the
     porosity via the scatra material's ``capacity`` (phi0) and the
     effective (tortuosity-corrected) diffusivity via its ``diffusivity``,
     exactly how the reference's poro scatra elements pull porosity from
     the coupled poro material (ref: src/scatra_ele poro variants).

Two-way coupling (2WC: scalar feedback on the poro material) is exposed as
an outer fixed-point hook but the round-2 scope is the 1WC chain, which is
what the reference exercises in its poroelast_scatra regression decks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.ops import common as gm
from fourc_tpu.physics import driver as drv
from fourc_tpu.physics import poro_driver
from fourc_tpu.physics import scalar_driver
from fourc_tpu.physics import scalar_transport as st
from fourc_tpu.physics import structure_driver
from fourc_tpu.physics.newton import newton_solve
from fourc_tpu.utils.timer import Timers


class PoroScatraField:
    def __init__(self, poro: poro_driver.PoroField, scat: st.ScalarField):
        assert poro.solid.disc.n_nodes == scat.disc.n_nodes, (
            "poroelast_scatra needs cloned meshes")
        self.poro = poro
        self.scat = scat

    def darcy_nodes(self, p):
        """Nodal Darcy flux q = -(k/mu) grad p (mass-lumped L2 projection
        of GP fluxes; linear-kinematics reference configuration)."""
        pres = self.poro.pres
        dim = pres.disc.coords.shape[1]
        num = jnp.zeros((pres.disc.n_nodes, dim), p.dtype)
        den = jnp.zeros((pres.disc.n_nodes,), p.dtype)
        for key in pres.dofmap.blocks:
            cell = pres._cell(key)
            conn = pres.dofmap.blocks[key].conn
            G, detJ = gm.iso_gradients(pres.block_X[key], cell.dN)
            wdet = gm.weighted(detJ, cell.gauss_weights)
            kmu = pres.block_mat[key].diff()
            q_gp = -kmu * jnp.einsum("egad,ea->egd", G, p[conn])  # (e,g,d)
            N = jnp.asarray(cell.N, wdet.dtype)
            wN = jnp.einsum("eg,ga->ega", wdet, N)
            num = num.at[conn].add(jnp.einsum("ega,egd->ead", wN, q_gp))
            den = den.at[conn].add(jnp.einsum("ega->ea", wN))
        return num / jnp.maximum(den, 1e-30)[:, None]


def build_field(deck) -> PoroScatraField:
    poro = poro_driver.build_field(deck)
    scat = scalar_driver.build_field(deck, "scatra_dynamic", "scatra")
    return PoroScatraField(poro, scat)


def init_state(f: PoroScatraField):
    s = poro_driver.init_state(f.poro)
    c = st.init_state(f.scat)
    s["c"] = c["phi"]
    s["cdot"] = c["phidot"]
    return s


def make_scatra_step(f: PoroScatraField, dt: float):
    fs = f.scat
    theta = fs.params.theta if fs.params.dyntype == "onesteptheta" else 1.0

    # seepage velocity w = q / phi: the weak form multiplies the
    # convective term by the storage capacity (phi), so w recovers the
    # physical Darcy advection  phi dc/dt + q . grad c
    phi0 = float(next(iter(
        getattr(m, "capacity", 1.0) or 1.0
        for m in fs.block_mat.values())))

    @jax.jit
    def step(state, d_new, p_new):
        t1 = state["t"] + dt
        q = f.darcy_nodes(p_new) / phi0
        c_n, cdot_n = state["c"], state["cdot"]

        def residual(c):
            cdot = (c - c_n) / (theta * dt) - (1 - theta) / theta * cdot_n
            return fs.residual_transient(c, cdot, t1, dt=dt, vel_nodes=q)

        c0 = fs.dbc.apply(c_n, t1)
        M = fs.build_preconditioner(dt_factor=1.0 / (theta * dt))
        nw = fs.params.newton
        if nw.lin_method == "cg":  # convection: nonsymmetric tangent
            from dataclasses import replace

            nw = replace(nw, lin_method="bicgstab")
        c, stats = newton_solve(residual, c0, fs.dbc.free_mask, M, nw)
        cdot = fs.dbc.mask((c - c_n) / (theta * dt)
                           - (1 - theta) / theta * cdot_n)
        return c, cdot, stats

    return step


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    with timers("setup"):
        f = build_field(deck)
        state = init_state(f)
        pgp = f.poro.p_at_gps(state["p"])
        fint0, _ = f.poro.solid.internal_force(
            state["d"], history=state["hist"] or None, temps=pgp)
        state["fint"] = fint0
        state["fext"] = f.poro.solid.external_force(state["t"], state["d"])
    cfg = deck.sections["poroelasticity_dynamic"]
    cbs = list(callbacks or [])
    state, n_steps, cbs = drv.setup_restart(deck, "poro_scatra", state,
                                            cfg["numstep"], cbs)

    def make_step(dt):
        poro_step = poro_driver.make_step(f.poro, dt)
        scat_step = make_scatra_step(f, dt)

        def step(state):
            pstate = {k: v for k, v in state.items() if k not in ("c", "cdot")}
            pstate, stats = poro_step(pstate)
            c, cdot, sstats = scat_step(state, pstate["d"], pstate["p"])
            new = dict(pstate)
            new.update(c=c, cdot=cdot)
            stats = dict(stats)
            stats["scatra_iters"] = sstats["iters"]
            stats["converged"] = jnp.logical_and(stats["converged"],
                                                 sstats["converged"])
            return new, stats

        return step

    state, agg = drv.time_loop(
        "poro_scatra", state, make_step, cfg["timestep"], n_steps,
        divercont="stop", callbacks=cbs, timers=timers,
    )
    return drv.RunResult(
        deck=deck,
        fields={"poro_scatra": PoroScatraView(f),
                "structure": structure_driver.SolidFieldView(f.poro.solid),
                "scatra": PoroScatraView(f)},
        states={"poro_scatra": state,
                "structure": {"d": state["d"], "v": state["v"],
                              "a": state["a"], "hist": state["hist"]},
                "scatra": state},
        stats={"poro_scatra": agg, "structure": agg, "scatra": agg},
        timers=timers,
    )


class PoroScatraView:
    def __init__(self, f: PoroScatraField):
        self.f = f
        self._solid = structure_driver.SolidFieldView(f.poro.solid)

    def node_value(self, state, quantity: str, node: int):
        q = quantity.lower()
        if q in ("phi", "c", "conc", "concentration"):
            return float(np.asarray(state["c"])[node])
        if q in ("pressure", "p", "pres"):
            return float(np.asarray(state["p"])[node])
        return self._solid.node_value(state, quantity, node)
