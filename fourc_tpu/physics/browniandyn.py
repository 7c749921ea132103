"""Brownian dynamics: overdamped stochastic structural time integration.

Counterpart of the reference's browniandyn module (ref: src/browniandyn —
Brownian dynamics on beams/rigid spheres: viscous background-fluid drag +
Gaussian thermal forces, no inertia, driven through the structural time
integrator with a stochastic RHS).

TPU-native design: the overdamped Langevin step

    Gamma (u_{n+1} - u_n) / dt + f_int(u_{n+1}) = f_ext + f_stoch,
    f_stoch ~ N(0, 2 kT Gamma / dt)  (fluctuation-dissipation)

is solved implicitly (backward Euler in the drift, Euler-Maruyama in the
noise) with the shared Newton-Krylov machinery — one jitted ``lax.scan``
over steps, ``jax.random`` threading the PRNG key through the state (the
reference uses a per-processor RNG seeded from input; here the key lives
in the state pytree so restarts reproduce trajectories).

Drag model: Stokes drag per rigid sphere (6 pi eta r translations,
8 pi eta r^3 rotations; ops/truss.py sphere_drag) and per-unit-length
cylinder drag for beam/truss nodes (gamma_t = 4 pi eta / ln(L/d) style
constants folded into ``damping_coeff``), matching the reference's
BrownianDynParams (viscosity, kT; ref 4C_browniandyn_input).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.physics.newton import newton_solve


@dataclass
class BrownianParams:
    kt: float = 0.0  # thermal energy (0 = deterministic relaxation)
    viscosity: float = 1.0
    # per-unit-length translational drag coefficient for line elements
    # (cylinder drag; rotations get damping_coeff * L^3 / 12 per node)
    damping_coeff: float = 1.0
    seed: int = 0


def node_drag(field_, params: BrownianParams):
    """(ndof,) diagonal drag Gamma: Stokes drag for rigid-sphere nodes,
    tributary-length cylinder drag for line-element nodes."""
    from fourc_tpu.ops import truss as tops

    disc = field_.disc
    gam = np.zeros((disc.n_nodes, 6))
    for key, blk in disc.blocks.items():
        conn = np.asarray(blk.conn)
        extra = field_.block_extra.get(key)
        if extra is not None and extra[0] == "rigidsphere":
            gt, gr = tops.sphere_drag(extra[2].radius, params.viscosity)
            gam[conn[:, 0], 0:3] += gt
            gam[conn[:, 0], 3:6] += gr
            continue
        if conn.shape[1] < 2:
            continue
        Xe = np.asarray(disc.coords)[conn]
        L = np.linalg.norm(Xe[:, 1] - Xe[:, 0], axis=1)
        half = 0.5 * params.damping_coeff * L
        for a in range(2):
            np.add.at(gam[:, 0:3], conn[:, a],
                      np.repeat(half[:, None], 3, 1))
            np.add.at(gam[:, 3:6], conn[:, a],
                      np.repeat((half * L * L / 12.0)[:, None], 3, 1))
    g = gam.reshape(-1)
    g[g == 0.0] = 1.0  # unconnected dofs: unit drag (keeps Gamma spd)
    return jnp.asarray(g)


def init_state(field_, params: BrownianParams):
    from fourc_tpu.physics import beam as pb

    state = pb.init_state(field_)
    state["key"] = jax.random.PRNGKey(params.seed)
    return state


def make_step(field_, params: BrownianParams, dt: float, crosslink=None):
    """One implicit Euler-Maruyama step as a jitted function of state.

    crosslink: optional CrosslinkParams — enables the crosslinking
    submodel (coupling/crosslinking.py): binding kinetics BETWEEN steps
    (bond topology frozen within the Newton solve, like the reference's
    submodel evaluator), linker spring forces inside the residual."""
    gamma = node_drag(field_, params)
    sigma = jnp.sqrt(2.0 * params.kt * gamma / dt)
    X = jnp.asarray(field_.disc.coords)
    ndpn = field_.ndpn
    if crosslink is not None:
        from fourc_tpu.coupling import crosslinking as xl

    def spots_of(u):
        return X + u.reshape(-1, ndpn)[:, :3]

    def step(state):
        t1 = state["t"] + dt
        key, sub, kx = jax.random.split(state["key"], 3)
        noise = sigma * jax.random.normal(sub, gamma.shape, gamma.dtype)
        if not params.kt:
            noise = jnp.zeros_like(gamma)
        u_n = state["d"]

        lstate = state.get("linkers")
        if crosslink is not None:
            # binding/unbinding kinetics on the CURRENT configuration
            lstate = xl.kinetics_step(kx, lstate, spots_of(u_n), dt,
                                      crosslink)

        def residual(u):
            drift = gamma * (u - u_n) / dt
            r = (drift + field_.internal_force(u)[0]
                 - field_.external_force(t1, u) - noise)
            if crosslink is not None:
                # linker springs are internal forces: residual -= F_nodes
                r = r - xl.link_forces(lstate, spots_of(u), X.shape[0],
                                       ndpn, crosslink, r.dtype)
            return r

        u0 = field_.dbc.apply(u_n, t1)
        # Jacobi on the dominant drag diagonal Gamma/dt (overdamped: the
        # drift term dominates the spectrum for practical dt)
        u, stats = newton_solve(residual, u0, field_.dbc.free_mask,
                                lambda r: (dt / gamma) * r,
                                field_.params.newton)
        new = dict(state)
        new.update(d=u, t=t1, step=state["step"] + 1, key=key)
        if crosslink is not None:
            new["linkers"] = lstate
        return new, stats

    return jax.jit(step)


def run(field_, params: BrownianParams, dt: float, numstep: int, state=None,
        crosslink=None, linker_box=None):
    """scan the step over numstep; returns (final_state, traj d (n, ndof))."""
    state = state if state is not None else init_state(field_, params)
    if crosslink is not None and "linkers" not in state:
        from fourc_tpu.coupling import crosslinking as xl

        X = np.asarray(field_.disc.coords)
        lo, hi = (X.min(0), X.max(0)) if linker_box is None else linker_box
        state["linkers"] = xl.init_linkers(crosslink, lo, hi)
    step = make_step(field_, params, dt, crosslink=crosslink)

    def body(s, _):
        s2, stats = step(s)
        return s2, s2["d"]

    final, traj = jax.lax.scan(body, state, None, length=numstep)
    return final, traj
