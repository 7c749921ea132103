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


@register_material("air_pedley")
class AirwayPedley(Material):
    """Flow-dependent (Pedley) airway resistance (ref: reduced_lung
    AirwayType non-linear resistance / red_airways Pedley law):
    R(Q) = max(1, gamma * sqrt(Re * 2r/L)) * R_poiseuille with
    Re = 2 rho |Q| / (pi r mu) — entrance-flow losses in the upper
    airways.  Solved with in-jit Picard iterations on the conductances."""

    kind = "airway_pedley"

    def __init__(self, radius, viscosity=1.8e-5, density=1.2, gamma=0.327):
        self.radius = float(radius)
        self.viscosity = float(viscosity)
        self.density = float(density)
        self.gamma = float(gamma)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)

    def resistance(self, length):  # Poiseuille base value
        return 8.0 * self.viscosity * length / (np.pi * self.radius**4)


@register_material("maxwell_0d_acinus")
class Acinus(Material):
    """Terminal acinus (ref: MAT_0D_MAXWELL_ACINUS_* family).

    compliance > 0, stiffness == 0: RC unit (C dP/dt charge balance).
    stiffness E > 0: viscoelastic (Kelvin-Voigt) terminal unit
      P_alv = E V + eta dV/dt (ref: reduced_lung TerminalUnitType
      viscoelastic_RLC) with the acinar volume V as internal state.
    """

    kind = "acinus"

    def __init__(self, compliance=0.0, resistance=0.0, stiffness=0.0,
                 eta=0.0, two_node=False):
        self.compliance = float(compliance)
        self.r_a = float(resistance)
        self.stiffness = float(stiffness)
        self.eta = float(eta)
        # two_node: the compliance acts ACROSS the element (the
        # reference's MAT_0D_MAXWELL_ACINUS_NEOHOOKEAN element equation
        # NumOfAcini/(Stiffness1 dt) * (dp_np - dp_n) = Q,
        # ref: 4C_mat_maxwell_0d_acinus_NeoHookean.cpp:137-150), not as a
        # grounded capacitor at the alveolar node
        self.two_node = bool(two_node)

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
        aw_pedley = []  # (gamma * sqrt(2 rho /(pi r mu) * 2r/L), 0 = linear)
        ac_node, ac_C, ac_R = [], [], []
        ac_E, ac_eta = [], []
        ac2_edges, ac2_C = [], []  # two-node compliance elements
        for key, blk in disc.blocks.items():
            conn = np.asarray(blk.conn)
            mat_id = np.asarray(blk.mat_id)
            L = np.linalg.norm(coords[conn[:, 1]] - coords[conn[:, 0]], axis=1)
            for e in range(conn.shape[0]):
                m = mats[int(mat_id[e])]
                if m.kind in ("airway", "airway_pedley"):
                    aw_edges.append(conn[e])
                    aw_g.append(1.0 / m.resistance(L[e]))
                    if m.kind == "airway_pedley":
                        # R(Q) = gamma sqrt(Re 2r/L) R_p; Re = 2 rho|Q|/(pi r mu)
                        aw_pedley.append(m.gamma * np.sqrt(
                            4.0 * m.density * m.radius
                            / (np.pi * m.radius * m.viscosity * L[e])))
                    else:
                        aw_pedley.append(0.0)
                elif getattr(m, "two_node", False):
                    # compliance ACROSS the element (the reference's
                    # Maxwell0dAcinusNeoHookean element equation)
                    ac2_edges.append(conn[e])
                    ac2_C.append(m.compliance)
                else:  # acinus: attaches the alveolar node conn[e,1]
                    ac_node.append(conn[e])
                    ac_C.append(m.compliance)
                    ac_R.append(m.r_a)
                    ac_E.append(m.stiffness)
                    ac_eta.append(m.eta)
        aw_edges = jnp.asarray(np.array(aw_edges, np.int32).reshape(-1, 2))
        aw_g = jnp.asarray(np.array(aw_g))
        aw_pedley = jnp.asarray(np.array(aw_pedley))
        has_pedley = bool(np.any(np.array(aw_pedley) > 0))
        ac_node = jnp.asarray(np.array(ac_node, np.int32).reshape(-1, 2))
        ac_C = jnp.asarray(np.array(ac_C))
        ac_R = jnp.asarray(np.array(ac_R))
        ac_E = jnp.asarray(np.array(ac_E))
        ac_eta = jnp.asarray(np.array(ac_eta))
        ve = jnp.asarray(np.array(ac_E) > 0)  # viscoelastic terminal units
        ac2_edges = jnp.asarray(np.array(ac2_edges, np.int32).reshape(-1, 2))
        ac2_Cdt = jnp.asarray(np.array(ac2_C)) / dt
        # generalized nodal BCs (ref: DESIGN NODE Reduced D AIRWAYS
        # PRESCRIBED CONDITIONS): pressure pins + flow sources; legacy
        # decks fall back to p_in_funct at the 'start' node
        p_nodes, p_fns, q_nodes, q_fns = [], [], [], []
        for bc in (dyn.get("bcs") or ()):
            node = bc["node"]
            if isinstance(node, str):
                node = int(np.asarray(disc.node_sets[node])[0])
            fn = deck.functions.get(int(bc.get("funct", 1)))
            sc = float(bc.get("val", 1.0))
            if str(bc["type"]).lower() == "pressure":
                p_nodes.append(int(node))
                p_fns.append((fn, sc))
            else:
                q_nodes.append(int(node))
                q_fns.append((fn, sc))
        if not p_nodes:
            p_nodes = [int(np.asarray(disc.node_sets["start"])[0])]
            p_fns = [(deck.functions.get(int(dyn["p_in_funct"])), 1.0)]
        trachea = p_nodes[0]
        p_nodes_j = jnp.asarray(np.asarray(p_nodes, np.int32))
        q_nodes_j = jnp.asarray(np.asarray(q_nodes, np.int32))

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    P = jnp.zeros((n,), dtype)
    state = {"P": P, "V": jnp.zeros(ac_node.shape[:1], dtype),
             "t": jnp.asarray(0.0, dtype), "step": jnp.asarray(0)}
    free = jnp.ones((n,), bool).at[p_nodes_j].set(False)

    def laplacian(p, g_ac, g_aw):
        """Weighted graph Laplacian action (airways + acinar branches +
        two-node compliance edges with conductance C/dt)."""
        y = jnp.zeros_like(p)
        if aw_edges.shape[0]:
            dp = p[aw_edges[:, 0]] - p[aw_edges[:, 1]]
            y = y.at[aw_edges[:, 0]].add(g_aw * dp)
            y = y.at[aw_edges[:, 1]].add(-g_aw * dp)
        if ac_node.shape[0]:
            dpa = p[ac_node[:, 0]] - p[ac_node[:, 1]]
            y = y.at[ac_node[:, 0]].add(g_ac * dpa)
            y = y.at[ac_node[:, 1]].add(-g_ac * dpa)
        if ac2_edges.shape[0]:
            dp2 = p[ac2_edges[:, 0]] - p[ac2_edges[:, 1]]
            y = y.at[ac2_edges[:, 0]].add(ac2_Cdt * dp2)
            y = y.at[ac2_edges[:, 1]].add(-ac2_Cdt * dp2)
        return y

    n_picard = 4 if has_pedley else 1

    @jax.jit
    def step(state):
        from fourc_tpu.linalg import solvers as ls

        t1 = state["t"] + dt
        P0 = state["P"]
        V0 = state["V"]
        # backward Euler on the acinar charge: the alveolar node behaves as
        # a grounded capacitor through R_a: effective branch conductance
        # g = 1/(R_a + dt/C)... but keeping P_alv as a dof, the capacitor
        # contributes C/dt on its diagonal and C/dt * P0 on the rhs.
        # Viscoelastic (Kelvin) units instead contribute g_kv = 1/(E dt +
        # eta) on the diagonal and g_kv * E * V0 on the rhs (BE on
        # P_alv = E V + eta dV/dt with V as internal state).
        g_ac = jnp.where(ac_R > 0, 1.0 / ac_R, 1e8)
        g_kv = 1.0 / jnp.maximum(ac_E * dt + ac_eta, 1e-30)
        dcoef = jnp.where(ve, g_kv, ac_C / dt)
        rcoef = jnp.where(ve, g_kv * ac_E * V0,
                          ac_C / dt * P0[ac_node[:, 1]])
        cdiag = jnp.zeros((n,), P0.dtype)
        rhs = jnp.zeros((n,), P0.dtype)
        if ac_node.shape[0]:
            cdiag = cdiag.at[ac_node[:, 1]].add(dcoef)
            rhs = rhs.at[ac_node[:, 1]].add(rcoef)
        if ac2_edges.shape[0]:
            # history charge of the two-node capacitor: (C/dt) dp_n flows
            # as a source on both ends (backward Euler on Q = C d(dp)/dt)
            dp_n = P0[ac2_edges[:, 0]] - P0[ac2_edges[:, 1]]
            rhs = rhs.at[ac2_edges[:, 0]].add(ac2_Cdt * dp_n)
            rhs = rhs.at[ac2_edges[:, 1]].add(-ac2_Cdt * dp_n)
        # prescribed inflows Q(t1)
        for qi, (fn, sc) in zip(q_nodes, q_fns):
            rhs = rhs.at[qi].add(sc * fn(jnp.zeros((3,), dtype), t1,
                                         component=0))
        pbc = jnp.zeros((n,), dtype)
        for pi, (fn, sc) in zip(p_nodes, p_fns):
            pbc = pbc.at[pi].set(sc * fn(jnp.zeros((3,), dtype), t1,
                                         component=0))
        p_in = pbc[trachea]

        def solve(g_aw, P_guess):
            def A(p):
                pm = jnp.where(free, p, 0.0)
                y = laplacian(pm, g_ac, g_aw) + cdiag * pm
                return jnp.where(free, y, p)

            b = jnp.where(free, rhs - laplacian(pbc, g_ac, g_aw), pbc)
            res = ls.cg(A, b, tol=1e-12, maxiter=1000, x0=P_guess)
            return jnp.where(free, res.x, pbc), res

        # Picard on the Pedley flow-dependent resistances (linear case:
        # one pass, g_aw = aw_g)
        P1, res = solve(aw_g, P0)
        for _ in range(n_picard - 1):
            Q = aw_g * (P1[aw_edges[:, 0]] - P1[aw_edges[:, 1]])
            fac = jnp.maximum(1.0, aw_pedley * jnp.sqrt(jnp.abs(Q) + 1e-30))
            P1, res = solve(aw_g / fac, P1)

        # viscoelastic internal volume update: Q_in = g_kv (P_alv - E V0)
        P_alv = P1[ac_node[:, 1]]
        V1 = jnp.where(ve, V0 + dt * g_kv * (P_alv - ac_E * V0), V0)
        new = dict(state)
        new.update(P=P1, V=V1, t=t1, step=state["step"] + 1)
        stats = {"iters": jnp.asarray(n_picard), "lin_iters": res.iters,
                 "resnorm": res.resnorm, "converged": res.converged}
        return new, stats

    cbs = list(callbacks or [])
    state, _nsteps, cbs = drv.setup_restart(deck, "airways", state, dyn["numstep"], cbs)
    state, agg = drv.time_loop(
        "airways", state, lambda _dt: step, dt, _nsteps,
        divercont="stop", callbacks=cbs, timers=timers,
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
