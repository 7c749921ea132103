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
