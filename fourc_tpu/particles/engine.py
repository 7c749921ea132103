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
    """ref: particle_interaction DEM (4C_particle_interaction_dem_contact.*
    incl. tangential/rolling contact 4C_particle_interaction_dem_contact
    tangential + rolling variants and DMT-type adhesion
    4C_particle_interaction_dem_adhesion.*)."""

    k_normal: float = 1e4  # normal spring stiffness
    damp_normal: float = 0.0  # normal dashpot coefficient
    # normal contact law (ref NORMALCONTACTLAW,
    # 4C_particle_interaction_dem_contact_normal.cpp): "linear" spring,
    # "hertz" k*ov^1.5, "leeherrmann" + m_eff*d*vrel, "kuwabarakono"
    # + d*vrel*sqrt(ov), "tsuji" + d*vrel*ov^0.25
    normal_law: str = "linear"
    normal_damp: float = 0.0  # the nonlinear laws' NORMAL_DAMP
    # NormalLinearSpringDamp (ref: 4C_particle_interaction_dem_contact_
    # normal.cpp:99-134): damping derived from the restitution coefficient,
    # d = 2|ln e| sqrt(k m_eff/(ln^2 e + pi^2)) (e = 0 -> 2 sqrt(k m_eff)),
    # linearly regularized to full amplitude at |gap| = damp_reg_fac*r_min
    restitution: float = -1.0  # < 0: disabled (use damp_normal instead)
    damp_reg_fac: float = 0.0
    # ref TENSION_CUTOFF: clamp the damped normal force at zero (no
    # adhesive pull during rebound); the undamped spring is >= 0 anyway
    tension_cutoff: bool = True
    friction_mu: float = 0.0  # Coulomb sliding friction coefficient
    k_tangential: float = 0.0  # tangential dashpot (viscous regularization)
    rolling_mu: float = 0.0  # rolling resistance coefficient
    adhesion_f0: float = 0.0  # constant pull-off force (DMT-type)
    adhesion_gap: float = 0.0  # adhesion active for gap < adhesion_gap
    gravity: tuple = (0.0, 0.0, 0.0)

    @property
    def has_spin(self):
        return self.friction_mu > 0.0 or self.rolling_mu > 0.0


def _damp_normal_fac(params):
    """Restitution-based damping prefactor (x sqrt(m_eff) at the pair)."""
    e = params.restitution
    if e > 0.0:
        lne = abs(np.log(e))
        return 2.0 * lne * np.sqrt(params.k_normal / (lne**2 + np.pi**2))
    return 2.0 * np.sqrt(params.k_normal)


def _normal_law_force(params, overlap, vn, ri, rj, masses_ij):
    """Repulsive normal force magnitude by NORMALCONTACTLAW (see
    DemParams.normal_law); vn = (v_i - v_j)·n with n pointing j -> i
    (negative on approach)."""
    law = getattr(params, "normal_law", "linear")
    if law == "linear":
        return params.k_normal * overlap - params.damp_normal * vn
    ov = jnp.maximum(overlap, 0.0)
    f = params.k_normal * ov * jnp.sqrt(ov)
    d = params.normal_damp
    if law == "hertz" or not d:
        return f
    if law == "leeherrmann":
        if masses_ij is None:
            raise ValueError("leeherrmann law needs particle masses")
        mi, mj = masses_ij
        m_eff = mi * mj / jnp.maximum(mi + mj, 1e-300)
        return f - m_eff * d * vn
    if law == "kuwabarakono":
        return f - d * vn * jnp.sqrt(ov)
    if law == "tsuji":
        return f - d * vn * jnp.sqrt(jnp.sqrt(ov))
    raise ValueError(f"unknown normal_law {law!r}")


def dem_forces(x, v, radii, params: DemParams, walls=(), omega=None,
               masses=None):
    """Pairwise contact forces (N, d) and torques (N, 3) — spring-dashpot
    normal contact, Coulomb-capped viscous tangential friction (relative
    surface velocity incl. spin), rolling resistance, and DMT-type
    adhesion.

    walls: list of (point (d,), normal (d,)) half-spaces (particles stay on
    the +normal side).  Returns (force, torque); torque is None when spin
    is inactive (2D or frictionless).
    """
    N, d = x.shape
    diff = x[:, None, :] - x[None, :, :]  # (N, N, d)
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-30)
    rsum = radii[:, None] + radii[None, :]
    overlap = rsum - dist
    eye = jnp.eye(N, dtype=bool)
    active = (overlap > 0) & ~eye
    n = diff / dist[..., None]
    vrel = v[:, None, :] - v[None, :, :]
    vn = jnp.sum(vrel * n, axis=-1)
    fn = _normal_law_force(params, overlap, vn, radii[:, None],
                           radii[None, :],
                           None if masses is None else
                           (masses[:, None], masses[None, :]))
    if params.restitution >= 0.0 and masses is not None:
        m_eff = (masses[:, None] * masses[None, :]) / jnp.maximum(
            masses[:, None] + masses[None, :], 1e-300)
        d_n = _damp_normal_fac(params) * jnp.sqrt(m_eff)
        reg = 1.0
        if params.damp_reg_fac > 0.0:
            rmin = jnp.minimum(radii[:, None], radii[None, :])
            reg = jnp.minimum(
                1.0, jnp.abs(overlap) / (params.damp_reg_fac * rmin))
        # sign: ref v_rel_normal = (v_i - v_j)·e_(i->j) = -vn (our n points
        # j->i), so  -d·v_rel_normal  becomes  -d·vn: approach (vn < 0)
        # ADDS repulsion
        fn = fn - d_n * vn * reg
    fn = jnp.where(active, fn, 0.0)
    if params.tension_cutoff:
        fn = jnp.maximum(fn, 0.0)
    # DMT-type adhesion: constant attraction inside a gap band around touch
    if params.adhesion_f0:
        near = (overlap > -params.adhesion_gap) & ~eye
        fn = fn - jnp.where(near, params.adhesion_f0, 0.0)
    f = jnp.sum(fn[..., None] * n, axis=1)
    tau = None

    spin = params.has_spin and d == 3 and omega is not None
    if spin:
        # surface velocity at the contact point (branch midpoints)
        ri = radii[:, None, None] * (-n)
        rj = radii[None, :, None] * n
        vsurf = (vrel + jnp.cross(omega[:, None, :], ri)
                 - jnp.cross(omega[None, :, :], rj))
        vt = vsurf - jnp.sum(vsurf * n, axis=-1, keepdims=True) * n
        vtn = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + 1e-30)
        kt = params.k_tangential or params.k_normal * 0.1
        ft_mag = jnp.minimum(kt * vtn, params.friction_mu * jnp.maximum(fn, 0.0))
        ft = jnp.where(active[..., None], -ft_mag[..., None] * vt / vtn[..., None], 0.0)
        f = f + jnp.sum(ft, axis=1)
        # torque from the tangential force at the contact point
        tau = jnp.sum(jnp.cross(ri, ft), axis=1)
        if params.rolling_mu:
            wrel = omega[:, None, :] - omega[None, :, :]
            wn = jnp.sqrt(jnp.sum(wrel * wrel, axis=-1) + 1e-30)
            reff = (radii[:, None] * radii[None, :]) / rsum
            troll = jnp.where(
                active[..., None],
                -params.rolling_mu * (jnp.maximum(fn, 0.0) * reff / wn)[..., None] * wrel,
                0.0)
            tau = tau + jnp.sum(troll, axis=1)

    fw, tw = _wall_forces(x, v, radii, params, walls, omega if spin else None)
    f = f + fw
    if spin and tw is not None:
        tau = tau + tw
    return f, tau


def _wall_forces(x, v, radii, params, walls, omega=None):
    f = jnp.zeros_like(x)
    tau = jnp.zeros_like(x) if omega is not None else None
    for point, normal in walls:
        nw = jnp.asarray(normal, x.dtype)
        nw = nw / jnp.linalg.norm(nw)
        gap = jnp.einsum("nd,d->n", x - jnp.asarray(point, x.dtype), nw) - radii
        pen = jnp.maximum(-gap, 0.0)
        vn_w = jnp.einsum("nd,d->n", v, nw)
        fn = params.k_normal * pen - params.damp_normal * jnp.where(pen > 0, vn_w, 0.0)
        fn = jnp.maximum(fn, 0.0)
        if params.adhesion_f0:
            fn = fn - jnp.where(gap < params.adhesion_gap, params.adhesion_f0, 0.0)
        f = f + fn[:, None] * nw[None, :]
        if omega is not None and x.shape[1] == 3:
            rC = -radii[:, None] * nw[None, :]  # center -> contact point
            vsurf = v + jnp.cross(omega, rC)
            vt = vsurf - jnp.einsum("nd,d->n", vsurf, nw)[:, None] * nw[None, :]
            vtn = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + 1e-30)
            kt = params.k_tangential or params.k_normal * 0.1
            ftm = jnp.minimum(kt * vtn, params.friction_mu * jnp.maximum(fn, 0.0))
            ft = -ftm[:, None] * vt / vtn[:, None]
            active = (pen > 0)[:, None]
            f = f + jnp.where(active, ft, 0.0)
            tau = tau + jnp.where(active, jnp.cross(rC, ft), 0.0)
            if params.rolling_mu:
                wn = jnp.sqrt(jnp.sum(omega * omega, axis=-1) + 1e-30)
                troll = -params.rolling_mu * (
                    jnp.maximum(fn, 0.0) * radii / wn)[:, None] * omega
                tau = tau + jnp.where(active, troll, 0.0)
    return f, tau


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
    surface_tension: float = 0.0  # pairwise-cohesion coefficient (Akinci)
    gravity: tuple = (0.0, 0.0, 0.0)


def cohesion_kernel(r, h):
    """Akinci-type pairwise cohesion spline C(r) (ref capability:
    4C_particle_interaction_sph_surface_tension; this is the
    pairwise-force surface-tension model, which reproduces the same
    droplet-cohesion behavior as the reference's CSF without needing
    color-field second derivatives)."""
    c = 32.0 / (np.pi * h**9)
    hr3 = (h - r) ** 3 * r**3
    inner = 2.0 * hr3 - h**6 / 64.0
    return c * jnp.where(r > h, 0.0, jnp.where(2.0 * r > h, hr3, inner))


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
    if params.surface_tension:
        # pairwise cohesion: f_i = -sigma m_i m_j C(r) r_hat * 2 rho0/(ri+rj)
        C = cohesion_kernel(r, 2.0 * params.h)  # support = kernel support 2h
        kfac = 2.0 * params.rho0 / (rho[:, None] + rho[None, :])
        fst = -params.surface_tension * (
            masses[None, :] * C * kfac)[..., None] * diff / r[..., None]
        a = a + jnp.sum(jnp.where(mask[..., None], fst, 0.0), axis=1)
    return a + jnp.asarray(params.gravity, x.dtype)[None, :], rho, p


# ---------------------------------------------------------------------------
# time integration (ref: particle_algorithm velocity-Verlet)
# ---------------------------------------------------------------------------


def make_dem_stepper(params: DemParams, radii, masses, walls=(), n_sub=1):
    g = jnp.asarray(params.gravity)
    spin = params.has_spin
    # solid-sphere moment of inertia
    inertia = 0.4 * masses * radii**2

    def accel(x, v, omega):
        f, tau = dem_forces(x, v, radii, params, walls,
                            omega if spin else None, masses=masses)
        a = f / masses[:, None] + g[None, :]
        adot = tau / inertia[:, None] if (spin and tau is not None) else None
        return a, adot

    def step(state, dt):
        def body(i, s):
            x, v, a, w = s
            v_half = v + 0.5 * dt * a
            x_new = x + dt * v_half
            a_new, wdot = accel(x_new, v_half, w)
            v_new = v_half + 0.5 * dt * a_new
            w_new = w + dt * wdot if wdot is not None else w
            return (x_new, v_new, a_new, w_new)

        w0 = state.get("omega")
        if w0 is None:
            w0 = jnp.zeros((state["x"].shape[0], 3), state["x"].dtype)
        x, v, a, w = jax.lax.fori_loop(0, n_sub, body,
                                       (state["x"], state["v"], state["a"], w0))
        return dict(state, x=x, v=v, a=a, omega=w, t=state["t"] + n_sub * dt)

    stepper = jax.jit(step, static_argnums=())
    # initial accelerations a(x0, v0): velocity-Verlet's first half-kick
    # needs them (the reference evaluates forces once before the loop;
    # starting from a = 0 loses g*dt/2 of velocity — measured 2.5e-5
    # against the reference's quoted gravity-deck trajectory)
    stepper.initial_accel = jax.jit(
        lambda x, v, w=None: accel(x, v, w)[0])
    return stepper


@dataclass
class OpenBoundary:
    """SPH open (inflow/outflow) boundary along one axis.

    Counterpart of the reference's SPH open-boundary treatment (ref:
    src/particle_interaction 4C_particle_interaction_sph_open_boundary.*:
    inflow prescribes state, outflow removes particles).  TPU-native
    fixed-capacity form: a particle crossing the outflow plane is RECYCLED
    to the inflow side (shifted back by the channel length) with the
    prescribed inflow velocity — removal + emission with a static particle
    budget, so shapes never change and the stepper never re-jits.
    """

    axis: int = 0
    x_in: float = 0.0  # inflow plane coordinate
    x_out: float = 1.0  # outflow plane coordinate
    v_in: tuple = (1.0, 0.0)  # prescribed inflow velocity


def make_sph_stepper(params: SphParams, masses, n_sub=1, boundary=None,
                     open_bc: OpenBoundary = None):
    """boundary: optional (N,) bool mask of STATIC boundary particles (ref:
    sph boundary particle treatment — they contribute to density/pressure
    sums but never move; the wall-feeling analog of Adami dummy particles).
    open_bc: optional OpenBoundary (inflow/outflow recycling)."""
    bnd = None if boundary is None else jnp.asarray(boundary, bool)

    def freeze(x_new, v_new, a_new, x_old):
        if bnd is None:
            return x_new, v_new, a_new
        keep = bnd[:, None]
        return (jnp.where(keep, x_old, x_new),
                jnp.where(keep, 0.0, v_new),
                jnp.where(keep, 0.0, a_new))

    def recycle(x, v, a):
        if open_bc is None:
            return x, v, a
        ax = open_bc.axis
        L = open_bc.x_out - open_bc.x_in
        crossed = x[:, ax] > open_bc.x_out
        if bnd is not None:
            crossed = crossed & ~bnd  # static walls are never recycled
        c = crossed[:, None]
        shift = jnp.zeros(x.shape[1], x.dtype).at[ax].set(L)
        v_in = jnp.asarray(open_bc.v_in, x.dtype)
        if v_in.shape != (x.shape[1],):
            raise ValueError(
                f"OpenBoundary.v_in has {v_in.shape[0]} components but the "
                f"particle state is {x.shape[1]}-dimensional")
        return (jnp.where(c, x - shift, x),
                jnp.where(c, v_in, v),
                jnp.where(c, 0.0, a))

    def step(state, dt):
        def body(i, s):
            x, v, a = s
            v_half = v + 0.5 * dt * a
            x_new = x + dt * v_half
            a_new, _, _ = sph_accel(x_new, v_half, masses, params)
            v_new = v_half + 0.5 * dt * a_new
            return recycle(*freeze(x_new, v_new, a_new, x))

        x, v, a = jax.lax.fori_loop(0, n_sub, body,
                                    (state["x"], state["v"], state["a"]))
        return dict(state, x=x, v=v, a=a, t=state["t"] + n_sub * dt)

    stepper = jax.jit(step)
    stepper.initial_accel = jax.jit(
        lambda x, v, w=None: sph_accel(x, v, masses, params)[0])
    return stepper


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
