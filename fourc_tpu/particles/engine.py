"""Particle engine: containers, neighbor search, DEM + SPH interactions.

Counterpart of the reference's particle stack (ref: src/particle_engine —
spatial-bin neighbor search + SoA containers; src/particle_interaction —
SPH kernels/density/momentum and DEM spring-dashpot contact;
src/particle_algorithm — velocity-Verlet time loop, gravity).

TPU-native design:
- state is a pytree of (N, ...) arrays (SoA, like the reference's
  containers)
- neighbor search: all-pairs with distance masking for moderate N (a
  device-side grid hash with fixed-capacity cells is the planned upgrade —
  the reference's binning strategy analog); everything static-shaped
- DEM: linear spring-dashpot normal contact, plane walls
- SPH: cubic-spline kernel, summation density, weakly-compressible
  pressure (Tait/Cole equation of state) + Monaghan artificial viscosity
- integrator: velocity-Verlet inside one jitted lax.fori_loop
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class DemParams:
    """ref: particle_interaction DEM (4C_particle_interaction_dem_contact.*)."""

    k_normal: float = 1e4  # normal spring stiffness
    damp_normal: float = 0.0  # normal dashpot coefficient
    gravity: tuple = (0.0, 0.0, 0.0)


def dem_forces(x, v, radii, params: DemParams, walls=()):
    """Pairwise spring-dashpot contact forces: (N, d).

    walls: list of (point (d,), normal (d,)) half-spaces (particles stay on
    the +normal side).
    """
    N, d = x.shape
    diff = x[:, None, :] - x[None, :, :]  # (N, N, d)
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-30)
    rsum = radii[:, None] + radii[None, :]
    overlap = rsum - dist
    active = (overlap > 0) & ~jnp.eye(N, dtype=bool)
    n = diff / dist[..., None]
    vrel = v[:, None, :] - v[None, :, :]
    vn = jnp.sum(vrel * n, axis=-1)
    fmag = jnp.where(active, params.k_normal * overlap - params.damp_normal * vn, 0.0)
    f = jnp.sum(fmag[..., None] * n, axis=1)
    return f + _wall_forces(x, v, radii, params, walls)


def _wall_forces(x, v, radii, params, walls):
    f = jnp.zeros_like(x)
    for point, normal in walls:
        nw = jnp.asarray(normal, x.dtype)
        nw = nw / jnp.linalg.norm(nw)
        gap = jnp.einsum("nd,d->n", x - jnp.asarray(point, x.dtype), nw) - radii
        pen = jnp.maximum(-gap, 0.0)
        vn_w = jnp.einsum("nd,d->n", v, nw)
        fw = params.k_normal * pen - params.damp_normal * jnp.where(pen > 0, vn_w, 0.0)
        f = f + jnp.maximum(fw, 0.0)[:, None] * nw[None, :]
    return f


# ---------------------------------------------------------------------------
# SPH
# ---------------------------------------------------------------------------


def cubic_spline_w(q, h, dim):
    """Cubic spline kernel W(q=r/h) (ref: 4C_particle_interaction_sph_kernel)."""
    sigma = {1: 2.0 / 3.0, 2: 10.0 / (7.0 * np.pi), 3: 1.0 / np.pi}[dim] / h**dim
    return sigma * jnp.where(
        q < 1.0, 1.0 - 1.5 * q**2 + 0.75 * q**3,
        jnp.where(q < 2.0, 0.25 * (2.0 - q) ** 3, 0.0),
    )


def cubic_spline_dw(q, h, dim):
    """dW/dr."""
    sigma = {1: 2.0 / 3.0, 2: 10.0 / (7.0 * np.pi), 3: 1.0 / np.pi}[dim] / h**dim
    return sigma / h * jnp.where(
        q < 1.0, -3.0 * q + 2.25 * q**2,
        jnp.where(q < 2.0, -0.75 * (2.0 - q) ** 2, 0.0),
    )


@dataclass
class SphParams:
    """Weakly-compressible SPH (ref: particle_interaction SPH —
    equationofstate_genericcoeff / momentum w/ artificial viscosity)."""

    h: float = 0.1  # smoothing length
    rho0: float = 1000.0
    c0: float = 50.0  # artificial speed of sound
    gamma: float = 7.0  # Tait exponent
    alpha_visc: float = 0.1  # Monaghan artificial viscosity
    gravity: tuple = (0.0, 0.0, 0.0)


def sph_density(x, masses, params: SphParams):
    """Summation density: rho_i = sum_j m_j W_ij."""
    d = x.shape[1]
    diff = x[:, None, :] - x[None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-30)
    W = cubic_spline_w(r / params.h, params.h, d)
    return jnp.sum(masses[None, :] * W, axis=1)


def sph_pressure(rho, params: SphParams):
    """Tait/Cole EOS: p = rho0 c0^2/gamma ((rho/rho0)^gamma - 1)."""
    B = params.rho0 * params.c0**2 / params.gamma
    return B * ((rho / params.rho0) ** params.gamma - 1.0)


def sph_accel(x, v, masses, params: SphParams):
    """Momentum equation acceleration (pressure + artificial viscosity)."""
    d = x.shape[1]
    rho = sph_density(x, masses, params)
    p = sph_pressure(rho, params)
    diff = x[:, None, :] - x[None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-30)
    dW = cubic_spline_dw(r / params.h, params.h, d)
    gradW = dW[..., None] * diff / r[..., None]
    pij = p[:, None] / rho[:, None] ** 2 + p[None, :] / rho[None, :] ** 2
    # Monaghan artificial viscosity
    vij = v[:, None, :] - v[None, :, :]
    xv = jnp.sum(vij * diff, axis=-1)
    mu_ij = params.h * xv / (r**2 + 0.01 * params.h**2)
    rho_bar = 0.5 * (rho[:, None] + rho[None, :])
    Pi = jnp.where(xv < 0, -params.alpha_visc * params.c0 * mu_ij / rho_bar, 0.0)
    coeff = -(masses[None, :]) * (pij + Pi)
    mask = ~jnp.eye(x.shape[0], dtype=bool)
    a = jnp.sum(jnp.where(mask[..., None], coeff[..., None] * gradW, 0.0), axis=1)
    return a + jnp.asarray(params.gravity, x.dtype)[None, :], rho, p


# ---------------------------------------------------------------------------
# time integration (ref: particle_algorithm velocity-Verlet)
# ---------------------------------------------------------------------------


def make_dem_stepper(params: DemParams, radii, masses, walls=(), n_sub=1):
    g = jnp.asarray(params.gravity)

    def accel(x, v):
        return dem_forces(x, v, radii, params, walls) / masses[:, None] + g[None, :]

    def step(state, dt):
        def body(i, s):
            x, v, a = s
            v_half = v + 0.5 * dt * a
            x_new = x + dt * v_half
            a_new = accel(x_new, v_half)
            v_new = v_half + 0.5 * dt * a_new
            return (x_new, v_new, a_new)

        x, v, a = jax.lax.fori_loop(0, n_sub, body,
                                    (state["x"], state["v"], state["a"]))
        return dict(state, x=x, v=v, a=a, t=state["t"] + n_sub * dt)

    return jax.jit(step, static_argnums=())


def make_sph_stepper(params: SphParams, masses, n_sub=1):
    def step(state, dt):
        def body(i, s):
            x, v, a = s
            v_half = v + 0.5 * dt * a
            x_new = x + dt * v_half
            a_new, _, _ = sph_accel(x_new, v_half, masses, params)
            v_new = v_half + 0.5 * dt * a_new
            return (x_new, v_new, a_new)

        x, v, a = jax.lax.fori_loop(0, n_sub, body,
                                    (state["x"], state["v"], state["a"]))
        return dict(state, x=x, v=v, a=a, t=state["t"] + n_sub * dt)

    return jax.jit(step)


def init_state(x0, v0=None):
    x0 = jnp.asarray(x0, jnp.result_type(float))
    v0 = jnp.zeros_like(x0) if v0 is None else jnp.asarray(v0, x0.dtype)
    return {"x": x0, "v": v0, "a": jnp.zeros_like(x0),
            "t": jnp.asarray(0.0, x0.dtype)}


# ---------------------------------------------------------------------------
# rigid-body aggregates (ref: src/particle_rigidbody — rigid bodies made of
# affiliated particles: aggregated mass/inertia, forces/torques reduced onto
# the body, particle positions slaved to the body frame)
# ---------------------------------------------------------------------------


def _quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def _quat_rot(q, v):
    """Rotate v (..., 3) by unit quaternion q (4,)."""
    w, x, y, z = q
    R = jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return v @ R.T


class RigidBodies:
    """Rigid aggregates of DEM particles.

    body_of: (n,) int — body id per particle, -1 = free particle.
    Bodies aggregate mass, center of mass and inertia from their particles
    ONCE (reference configuration); each step reduces particle forces to
    body force + torque, advances the body (semi-implicit Euler +
    quaternion update) and slaves the member particles back.
    """

    def __init__(self, x0, masses, body_of, n_bodies):
        import numpy as np

        x0 = np.asarray(x0)
        m = np.asarray(masses)
        self.body_of = jnp.asarray(np.asarray(body_of, np.int32))
        self.n_bodies = int(n_bodies)
        M = np.zeros(n_bodies)
        com = np.zeros((n_bodies, 3))
        np.add.at(M, body_of[body_of >= 0], m[body_of >= 0])
        for b in range(n_bodies):
            sel = body_of == b
            com[b] = (m[sel, None] * x0[sel]).sum(0) / M[b]
        # body-frame offsets + inertia (point-mass particles)
        r = x0 - com[np.maximum(body_of, 0)]
        I = np.zeros((n_bodies, 3, 3))
        for b in range(n_bodies):
            sel = body_of == b
            rr = r[sel]
            for k in range(rr.shape[0]):
                d = rr[k]
                I[b] += m[sel][k] * ((d @ d) * np.eye(3) - np.outer(d, d))
        self.mass = jnp.asarray(M)
        self.inertia_inv = jnp.asarray(np.linalg.inv(
            I + 1e-12 * np.eye(3)[None]))
        self.r0 = jnp.asarray(r)  # reference offsets
        self.member = self.body_of >= 0

    def init_state(self, com0=None):
        import numpy as np

        return {
            "com": jnp.zeros((self.n_bodies, 3)) if com0 is None else jnp.asarray(com0),
            "vel": jnp.zeros((self.n_bodies, 3)),
            "quat": jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (self.n_bodies, 1)),
            "omega": jnp.zeros((self.n_bodies, 3)),
        }

    def reduce_forces(self, x, f):
        """Particle forces -> (body force (B,3), body torque (B,3))."""
        bid = jnp.maximum(self.body_of, 0)
        w = self.member[:, None]
        F = jnp.zeros((self.n_bodies, 3)).at[bid].add(jnp.where(w, f, 0.0))
        # torque about current COM
        com_x = jnp.zeros((self.n_bodies, 3)).at[bid].add(
            jnp.where(w, x, 0.0))
        cnt = jnp.zeros((self.n_bodies,)).at[bid].add(
            jnp.where(self.member, 1.0, 0.0))
        com = com_x / jnp.maximum(cnt, 1.0)[:, None]
        arm = x - com[bid]
        tau = jnp.zeros((self.n_bodies, 3)).at[bid].add(
            jnp.where(w, jnp.cross(arm, f), 0.0))
        return F, tau

    def step(self, bstate, F, tau, dt):
        """Semi-implicit Euler + incremental quaternion rotation."""
        vel = bstate["vel"] + dt * F / self.mass[:, None]
        omega = bstate["omega"] + dt * jnp.einsum(
            "bij,bj->bi", self.inertia_inv, tau)
        com = bstate["com"] + dt * vel
        # quaternion update: q <- dq(omega dt) * q
        th = jnp.linalg.norm(omega, axis=1, keepdims=True) * dt
        axis = omega / jnp.maximum(jnp.linalg.norm(omega, axis=1,
                                                   keepdims=True), 1e-30)
        half = 0.5 * th[:, 0]
        dq = jnp.concatenate([jnp.cos(half)[:, None],
                              jnp.sin(half)[:, None] * axis], axis=1)
        quat = jax.vmap(_quat_mul)(dq.T.T, bstate["quat"])
        quat = quat / jnp.linalg.norm(quat, axis=1, keepdims=True)
        return {"com": com, "vel": vel, "quat": quat, "omega": omega}

    def slave_particles(self, bstate, x, v):
        """Overwrite member particle positions/velocities from the bodies."""
        bid = jnp.maximum(self.body_of, 0)
        rot_r = jax.vmap(lambda q, r: _quat_rot(q, r))(
            bstate["quat"][bid], self.r0)
        x_new = bstate["com"][bid] + rot_r
        v_new = bstate["vel"][bid] + jnp.cross(bstate["omega"][bid], rot_r)
        sel = self.member[:, None]
        return jnp.where(sel, x_new, x), jnp.where(sel, v_new, v)
