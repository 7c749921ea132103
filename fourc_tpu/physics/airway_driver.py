"""Reduced-dimensional airway tree solver (lung ventilation).

Counterpart of the reference's red_airways module
(ref: src/red_airways — `Airway::RedAirwayImplicitTimeInt`; resistive
airway elements 4C_red_airways_airway_impl.*, compliant terminal acini
4C_red_airways_acinus_impl.* with MAT_0D_MAXWELL_ACINUS_*; driver dispatch
'reduced_dimensional_airways').

Model: pressure dofs at tree nodes.  Airway elements carry Poiseuille
resistance R = 8 mu L / (pi r^4) (flow Q = dP/R); terminal acinus elements
are RC units: C dP_alv/dt = (P_node - P_alv)/R_a.  Mass balance at every
node gives the (symmetric) weighted graph Laplacian; backward Euler in the
acinar pressures makes one SPD linear solve per step — here a matrix-free
CG over all branches at once.  Ventilation BC: prescribed trachea pressure
P(t) (FUNCT), the reference's pressure-driven breathing test setup.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.materials.base import Material, register_material
from fourc_tpu.physics import driver as drv
from fourc_tpu.utils.timer import Timers


@register_material("air_poiseuille")
class AirwayResistive(Material):
    """Poiseuille airway (ref: airway element w/ resistance law)."""

    kind = "airway"

    def __init__(self, radius, viscosity=1.8e-5):
        self.radius = float(radius)
        self.viscosity = float(viscosity)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)

    def resistance(self, length):
        return 8.0 * self.viscosity * length / (np.pi * self.radius**4)


@register_material("maxwell_0d_acinus")
class Acinus(Material):
    """Terminal RC acinus (ref: MAT_0D_MAXWELL_ACINUS_*)."""

    kind = "acinus"

    def __init__(self, compliance, resistance=0.0):
        self.compliance = float(compliance)
        self.r_a = float(resistance)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)


def run(deck, callbacks=None) -> drv.RunResult:
    from fourc_tpu.materials import make_material

    timers = Timers()
    dyn = deck.sections["airway_dynamic"]
    dt = float(dyn["timestep"])
    with timers("setup"):
        disc = next(iter(deck.disc.values()))
        mats = {mid: make_material(s) for mid, s in deck.materials.items()}
        coords = np.asarray(disc.coords)
        n = disc.n_nodes

        # split line2 elements into airways and acini by material kind
        aw_edges, aw_g = [], []
        ac_node, ac_C, ac_R = [], [], []
        for key, blk in disc.blocks.items():
            conn = np.asarray(blk.conn)
            mat_id = np.asarray(blk.mat_id)
            L = np.linalg.norm(coords[conn[:, 1]] - coords[conn[:, 0]], axis=1)
            for e in range(conn.shape[0]):
                m = mats[int(mat_id[e])]
                if m.kind == "airway":
                    aw_edges.append(conn[e])
                    aw_g.append(1.0 / m.resistance(L[e]))
                else:  # acinus: attaches the alveolar node conn[e,1]
                    ac_node.append(conn[e])
                    ac_C.append(m.compliance)
                    ac_R.append(m.r_a)
        aw_edges = jnp.asarray(np.array(aw_edges, np.int32))
        aw_g = jnp.asarray(np.array(aw_g))
        ac_node = jnp.asarray(np.array(ac_node, np.int32))  # (na, 2)
        ac_C = jnp.asarray(np.array(ac_C))
        ac_R = jnp.asarray(np.array(ac_R))
        # acinus branch conductance: series R_a with the C/dt "resistance"
        trachea = int(np.asarray(disc.node_sets["start"])[0])
        p_fn = deck.functions.get(int(dyn["p_in_funct"]))

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    P = jnp.zeros((n,), dtype)
    state = {"P": P, "t": jnp.asarray(0.0, dtype), "step": jnp.asarray(0)}
    free = jnp.ones((n,), bool).at[trachea].set(False)

    def laplacian(p, g_ac):
        """Weighted graph Laplacian action (airways + acinar branches)."""
        dp = p[aw_edges[:, 0]] - p[aw_edges[:, 1]]
        y = jnp.zeros_like(p)
        y = y.at[aw_edges[:, 0]].add(aw_g * dp)
        y = y.at[aw_edges[:, 1]].add(-aw_g * dp)
        dpa = p[ac_node[:, 0]] - p[ac_node[:, 1]]
        y = y.at[ac_node[:, 0]].add(g_ac * dpa)
        y = y.at[ac_node[:, 1]].add(-g_ac * dpa)
        return y

    @jax.jit
    def step(state):
        from fourc_tpu.linalg import solvers as ls

        t1 = state["t"] + dt
        P0 = state["P"]
        # backward Euler on the acinar charge: the alveolar node behaves as
        # a grounded capacitor through R_a: effective branch conductance
        # g = 1/(R_a + dt/C)... but keeping P_alv as a dof, the capacitor
        # contributes C/dt on its diagonal and C/dt * P0 on the rhs.
        g_ac = jnp.where(ac_R > 0, 1.0 / ac_R, 1e8)
        cdiag = jnp.zeros((n,), P0.dtype).at[ac_node[:, 1]].add(ac_C / dt)
        rhs = jnp.zeros((n,), P0.dtype).at[ac_node[:, 1]].add(
            ac_C / dt * P0[ac_node[:, 1]])
        p_in = p_fn(jnp.zeros((3,), dtype), t1, component=0)

        def A(p):
            pm = jnp.where(free, p, 0.0)
            y = laplacian(pm, g_ac) + cdiag * pm
            return jnp.where(free, y, p)

        # move the Dirichlet column to the rhs
        pbc = jnp.zeros((n,), dtype).at[trachea].set(p_in)
        b = jnp.where(free, rhs - laplacian(pbc, g_ac), p_in)
        res = ls.cg(A, b, tol=1e-12, maxiter=1000)
        P1 = jnp.where(free, res.x, p_in)
        new = dict(state)
        new.update(P=P1, t=t1, step=state["step"] + 1)
        stats = {"iters": jnp.asarray(1), "lin_iters": res.iters,
                 "resnorm": res.resnorm, "converged": res.converged}
        return new, stats

    state, agg = drv.time_loop(
        "airways", state, lambda _dt: step, dt, dyn["numstep"],
        divercont="stop", callbacks=list(callbacks or []), timers=timers,
    )
    return drv.RunResult(
        deck=deck, fields={"airways": AirwayView(disc)},
        states={"airways": state}, stats={"airways": agg}, timers=timers,
    )


class AirwayView:
    def __init__(self, disc):
        self.disc = disc

    def node_value(self, state, quantity, node):
        if quantity.lower() in ("p", "pressure"):
            return float(np.asarray(state["P"])[node])
        raise KeyError(quantity)
