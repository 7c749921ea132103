"""1D arterial network solver (nonlinear 1D blood flow, Taylor-Galerkin).

Counterpart of the reference's art_net module
(ref: src/art_net — `Arteries::ArtNetExplicitTimeInt` with the 2-step
explicit Taylor-Galerkin scheme, 4C_art_net_artery_ele_calc_lin_exp.*;
constant-property artery material 4C_mat_cnst_1d_art.*).

Physics — the 1D compliant-vessel equations in (A, Q):

    dA/dt + dQ/dx = 0
    dQ/dt + d/dx(Q^2/A) + A/rho dp/dx = -K_R Q/A
    p = p_ext + beta (sqrt(A) - sqrt(A0)) / A0,  beta = sqrt(pi) h E/(1-nu^2)

  pulse-wave speed c = sqrt(beta/(2 rho A0)) A^(1/4) (Moens-Korteweg at
  A = A0).  K_R = 8 pi nu (parabolic profile friction).

TPU-native: the two-step Taylor-Galerkin update (element-midpoint
predictor, nodal corrector with lumped mass) is a handful of batched
segment ops over all line2 elements of the whole tree at once — one jitted
step, lax.fori_loop over substeps.  Inlet: prescribed Q(t) (FUNCT), A from
the outgoing characteristic; outlet: non-reflecting (incoming
characteristic frozen at its initial value), as in the reference's
characteristic-based BC treatment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.materials.base import Material, register_material
from fourc_tpu.physics import driver as drv
from fourc_tpu.utils.timer import Timers


@register_material("cnst_art")
class ConstArtery(Material):
    """Constant-property 1D artery (ref: MAT_CNST_ART, 4C_mat_cnst_1d_art.*)."""

    kind = "artery"

    def __init__(self, youngs, nue, th, diam, density=1000.0,
                 viscosity=3.5e-3, pext=0.0):
        self.youngs = float(youngs)
        self.nue = float(nue)
        self.th = float(th)
        self.diam = float(diam)
        self.density = float(density)
        self.viscosity = float(viscosity)
        self.pext = float(pext)

    @classmethod
    def from_deck(cls, params):
        return cls(**params)

    @property
    def area0(self):
        return np.pi * (self.diam / 2.0) ** 2

    @property
    def beta(self):
        return np.sqrt(np.pi) * self.th * self.youngs / (1.0 - self.nue**2)

    def c0(self):
        """Moens-Korteweg pulse wave speed at A = A0."""
        return float(np.sqrt(self.beta / (2.0 * self.density *
                                          self.area0)) * self.area0**0.25)


class ArteryField:
    """(A, Q) on a line2 network."""

    def __init__(self, disc, mat: ConstArtery, functions=None):
        from fourc_tpu.core.functions import FunctionManager

        self.disc = disc
        self.mat = mat
        self.functions = functions or FunctionManager()
        conn = np.asarray(disc.blocks["line2"].conn)
        self.conn = jnp.asarray(conn)
        coords = np.asarray(disc.coords)
        # arc-length element sizes (works for curved/branched networks)
        self.h = jnp.asarray(np.linalg.norm(
            coords[conn[:, 1]] - coords[conn[:, 0]], axis=1))
        self.n_nodes = disc.n_nodes
        # lumped "mass" (tributary length) per node
        ml = np.zeros(self.n_nodes)
        np.add.at(ml, conn.reshape(-1),
                  np.repeat(np.asarray(self.h) / 2.0, 2))
        self.mlump = jnp.asarray(ml)
        self.inlet = int(np.asarray(disc.node_sets["start"])[0])
        self.outlet = int(np.asarray(disc.node_sets["end"])[0])

    # flux + source of the conservation form
    def flux(self, A, Q):
        m = self.mat
        FA = Q
        FQ = Q**2 / A + m.beta / (3.0 * m.density * m.area0) * A**1.5
        return FA, FQ

    def source(self, A, Q):
        m = self.mat
        KR = 8.0 * np.pi * m.viscosity / m.density
        return jnp.zeros_like(A), -KR * Q / A

    def celerity(self, A):
        m = self.mat
        return jnp.sqrt(m.beta / (2.0 * m.density * m.area0)) * A**0.25


def run(deck, callbacks=None) -> drv.RunResult:
    timers = Timers()
    dyn = deck.sections["artery_dynamic"]
    with timers("setup"):
        from fourc_tpu.materials import make_material

        disc = next(iter(deck.disc.values()))
        mat = make_material(deck.materials[1])
        f = ArteryField(disc, mat, functions=deck.functions)
    dt = float(dyn["timestep"])
    qin_fn = f.functions.get(int(dyn["q_in_funct"]))

    m = f.mat
    A0 = m.area0
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    A = jnp.full((f.n_nodes,), A0, dtype)
    Q = jnp.zeros((f.n_nodes,), dtype)
    state = {"A": A, "Q": Q, "t": jnp.asarray(0.0, dtype),
             "step": jnp.asarray(0)}
    W2_out0 = 0.0 - 4.0 * float(f.celerity(jnp.asarray(A0)))  # rest value

    conn = f.conn
    h = f.h.astype(dtype)
    ml = f.mlump.astype(dtype)

    @jax.jit
    def step(state):
        A, Q, t0 = state["A"], state["Q"], state["t"]
        t1 = t0 + dt

        # -- step 1: element midpoint predictor (Lax-Wendroff half step)
        AL, AR = A[conn[:, 0]], A[conn[:, 1]]
        QL, QR = Q[conn[:, 0]], Q[conn[:, 1]]
        FA_L, FQ_L = f.flux(AL, QL)
        FA_R, FQ_R = f.flux(AR, QR)
        Am = 0.5 * (AL + AR)
        Qm = 0.5 * (QL + QR)
        SA, SQ = f.source(Am, Qm)
        A_half = Am - 0.5 * dt / h * (FA_R - FA_L) + 0.5 * dt * SA
        Q_half = Qm - 0.5 * dt / h * (FQ_R - FQ_L) + 0.5 * dt * SQ

        # -- step 2: nodal corrector with lumped mass
        FA_h, FQ_h = f.flux(A_half, Q_half)
        SA_h, SQ_h = f.source(A_half, Q_half)
        rA = jnp.zeros_like(A)
        rQ = jnp.zeros_like(Q)
        # int dN/dx F dx = -F at left node, +F at right node  (dN/dx = ∓1/h)
        rA = rA.at[conn[:, 0]].add(-FA_h).at[conn[:, 1]].add(FA_h)
        rQ = rQ.at[conn[:, 0]].add(-FQ_h).at[conn[:, 1]].add(FQ_h)
        # source (element midpoint value distributed to both nodes)
        rA = rA.at[conn.reshape(-1)].add(
            jnp.repeat(0.5 * h * SA_h, 2))
        rQ = rQ.at[conn.reshape(-1)].add(
            jnp.repeat(0.5 * h * SQ_h, 2))
        # boundary fluxes [N F]: subtract at outlet, add at inlet
        FA_in, FQ_in = f.flux(A[f.inlet], Q[f.inlet])
        FA_out, FQ_out = f.flux(A[f.outlet], Q[f.outlet])
        rA = rA.at[f.inlet].add(FA_in).at[f.outlet].add(-FA_out)
        rQ = rQ.at[f.inlet].add(FQ_in).at[f.outlet].add(-FQ_out)

        A1 = A + dt * rA / ml
        Q1 = Q + dt * rQ / ml

        # -- characteristic BCs
        # inlet: Q prescribed; A from outgoing (left-running) characteristic
        # W2 = Q/A - 4c extrapolated from the interior state
        qin = qin_fn(jnp.zeros((3,), dtype), t1, component=0)
        W2 = Q[f.inlet] / A[f.inlet] - 4.0 * f.celerity(A[f.inlet])
        c_in = (qin / A1[f.inlet] - W2) / 4.0
        A_in = (c_in**2 * 2.0 * m.density * m.area0 / m.beta) ** 2
        A1 = A1.at[f.inlet].set(A_in)
        Q1 = Q1.at[f.inlet].set(qin)
        # outlet: non-reflecting — incoming W2 frozen at rest value
        W1 = Q[f.outlet] / A[f.outlet] + 4.0 * f.celerity(A[f.outlet])
        u_out = 0.5 * (W1 + W2_out0)
        c_out = (W1 - W2_out0) / 8.0
        A_out = (c_out**2 * 2.0 * m.density * m.area0 / m.beta) ** 2
        A1 = A1.at[f.outlet].set(A_out)
        Q1 = Q1.at[f.outlet].set(u_out * A_out)

        new = dict(state)
        new.update(A=A1, Q=Q1, t=t1, step=state["step"] + 1)
        stats = {"iters": jnp.asarray(0), "lin_iters": jnp.asarray(0),
                 "resnorm": jnp.asarray(0.0),
                 "converged": jnp.isfinite(A1).all()}
        return new, stats

    cbs = list(callbacks or [])
    state, _nsteps, cbs = drv.setup_restart(deck, "artery", state, dyn["numstep"], cbs)
    state, agg = drv.time_loop(
        "artery", state, lambda _dt: step, dt, _nsteps,
        divercont="stop", callbacks=cbs, timers=timers,
    )
    return drv.RunResult(
        deck=deck, fields={"artery": ArteryView(f)},
        states={"artery": state}, stats={"artery": agg}, timers=timers,
    )


class ArteryView:
    def __init__(self, f):
        self.f = f

    def node_value(self, state, quantity, node):
        q = quantity.lower()
        if q in ("a", "area"):
            return float(np.asarray(state["A"])[node])
        if q in ("q", "flow", "flowrate"):
            return float(np.asarray(state["Q"])[node])
        if q in ("p", "pressure"):
            m = self.f.mat
            A = float(np.asarray(state["A"])[node])
            return m.pext + m.beta * (np.sqrt(A) - np.sqrt(m.area0)) / m.area0
        raise KeyError(quantity)
