"""Batched incompressible Navier-Stokes element kernels (equal-order,
residual-based stabilized: SUPG / PSPG / grad-div).

TPU-native counterpart of the reference's fluid element calculus
(ref: src/fluid_ele/4C_fluid_ele_calc.cpp — `FluidEleCalc<distype>`
residual-based stabilized Galerkin; stabilization parameter
`calc_stab_parameter` :770-797, GP-level evaluation :914).

Weak form, test functions (w, q), unknowns (u, p), equal-order interp:

  momentum:   ∫ w·ρ(u̇ + (u·∇)u) + 2μ ε(w):ε(u) - p ∇·w - w·ρb dΩ
  continuity: ∫ q ∇·u dΩ
  SUPG:       ∫ τ_M ρ(u·∇w) · R_M dΩ
  PSPG:       ∫ τ_M ∇q · R_M dΩ
  grad-div:   ∫ τ_C (∇·w)(∇·u) dΩ
  R_M = ρ(u̇ + (u·∇)u) + ∇p - ρb    (viscous Laplacian dropped: linear cells)

The Gauss "loop" is a tensor axis; the Newton tangent (including the
convective linearization the reference hand-codes) is jax.jvp through this
function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fourc_tpu.core.cells import CellType
from fourc_tpu.ops import common as gm


def stab_params(u_gp, mu, rho, G, wdet, dim, dt):
    """(tau_M, tau_C) at GPs — Taylor-Hughes-Zarins transient form for tau_M
    (ref: calc_stab_parameter's tau definitions) and Tezduyar's tau_C.

    u_gp: (e,g,d); returns ((e,g), (e,g)).
    """
    # smoothed norm: jvp of ||u|| at u=0 is NaN (0/0); the epsilon makes the
    # tangent exactly 0 there, keeping the Newton linearization finite
    unorm = jnp.sqrt(jnp.sum(u_gp * u_gp, axis=-1) + 1e-30)
    vol = jnp.sum(wdet, axis=1)
    h_vol = jnp.broadcast_to((vol ** (1.0 / dim))[:, None], wdet.shape)
    uhat = u_gp / unorm[..., None]
    denom = jnp.sum(jnp.abs(jnp.einsum("egd,egad->ega", uhat, G)), axis=-1)
    h_stream = 2.0 / jnp.maximum(denom, 1e-300)
    h = jnp.where(unorm > 1e-12, jnp.minimum(h_stream, 10 * h_vol), h_vol)

    inv_dt = (2.0 * rho / dt) if dt else 0.0
    adv = 2.0 * rho * unorm / h
    dif = 4.0 * mu / h**2
    tau_m = 1.0 / jnp.sqrt(inv_dt**2 + adv**2 + 9.0 * dif**2)
    re_h = rho * unorm * h / jnp.maximum(2.0 * mu, 1e-300)
    z = jnp.minimum(re_h / 3.0, 1.0)
    tau_c = 0.5 * h * unorm * z
    # tau is treated as frozen in the Newton linearization (the reference's
    # usual practice; avoids the nonsmooth h/|u| derivative terms)
    return jax.lax.stop_gradient(tau_m), jax.lax.stop_gradient(tau_c)


def residual(
    Xe,
    ue,
    pe,
    udote,
    cell: CellType,
    mu: float,
    rho: float,
    body_gp=None,
    dt: float | None = None,
    supg: bool = True,
    pspg: bool = True,
    graddiv: bool = True,
    newton_convective: bool = True,
    grid_vel=None,
    smagorinsky_cs: float = 0.0,
    cs2_gp=None,
    rho_gp=None,
    cont_src_gp=None,
    mfs_B=None,
    mfs_ue_hat=None,
    avm3_ue_fine=None,
    avm3_cs: float = 0.0,
):
    """Element residual: (f_mom (e, nen, d), f_cont (e, nen)).

    Xe: (e, nen, d) CURRENT coordinates (caller adds ALE mesh displacement);
    ue/udote: (e, nen, d); pe: (e, nen).
    body_gp: (e, g, d) body acceleration or None.
    grid_vel: (e, nen, d) ALE mesh velocity or None — the convective
    velocity becomes c = u - u_grid (ref: fluid ALE variants,
    4C_fluid_timint_ale.*).
    """
    G, detJ = gm.iso_gradients(Xe, cell.dN)  # (e,g,a,d)
    wdet = gm.weighted(detJ, cell.gauss_weights)
    N = jnp.asarray(cell.N, Xe.dtype)
    dim = Xe.shape[-1]

    u = jnp.einsum("ga,eai->egi", N, ue)  # (e,g,d)
    udot = jnp.einsum("ga,eai->egi", N, udote)
    c = u
    if grid_vel is not None:
        c = u - jnp.einsum("ga,eai->egi", N, grid_vel)
    gradu = gm.grad_field(ue, G)  # (e,g,i,j) = du_i/dxj
    divu = jnp.einsum("egii->eg", gradu)
    p = jnp.einsum("ga,ea->eg", N, pe)
    gradp = jnp.einsum("egad,ea->egd", G, pe)

    # variable density (low-Mach: rho = p0/(R T); ref: src/loma + the
    # fluid_ele loma variant): Galerkin momentum/R_M use rho(x); the
    # stabilization parameters keep the constant reference rho
    rho_m = rho_gp[..., None] if rho_gp is not None else rho
    conv = jnp.einsum("egj,egij->egi", c, gradu)  # (c.grad)u, c = u - u_grid
    R_M = rho_m * (udot + conv) + gradp
    if body_gp is not None:
        R_M = R_M - rho_m * body_gp

    # Galerkin momentum: w.rho(udot+conv) - p div w + 2 mu eps(w):eps(u)
    f_mom = jnp.einsum("eg,ga,egi->eai", wdet, N, rho_m * (udot + conv))
    if body_gp is not None:
        f_mom = f_mom - jnp.einsum("eg,ga,egi->eai", wdet, N, rho_m * body_gp)
    f_mom = f_mom - jnp.einsum("eg,egai,eg->eai", wdet, G, p)
    eps = 0.5 * (gradu + jnp.swapaxes(gradu, -1, -2))
    mu_eff = mu
    if smagorinsky_cs or cs2_gp is not None:
        # Smagorinsky LES eddy viscosity (ref: src/fluid_ele turbulence
        # models / fluid_turbulence dynamic Smagorinsky):
        # nu_t = Cs^2 Delta^2 |S|, Delta = volume-based h; cs2_gp carries a
        # per-element DYNAMIC Cs^2 (Germano-Lilly; ops/turbulence.py)
        vol = jnp.sum(wdet, axis=1)
        delta = jnp.broadcast_to((vol ** (1.0 / dim))[:, None], wdet.shape)
        cs2 = cs2_gp[:, None] if cs2_gp is not None else smagorinsky_cs**2
        snorm = jnp.sqrt(2.0 * jnp.einsum("egij,egij->eg", eps, eps) + 1e-30)
        mu_eff = mu + rho * cs2 * delta**2 * snorm
        f_mom = f_mom + 2.0 * jnp.einsum(
            "eg,eg,egij,egaj->eai", wdet, mu_eff - mu, eps, G)
    f_mom = f_mom + 2.0 * mu * jnp.einsum("eg,egij,egaj->eai", wdet, eps, G)

    if mfs_B is not None:
        # multifractal subgrid scales (ref: src/fluid_turbulence MFS;
        # Rasthofer & Gravemeier): delta_u = B (u - hat_u); Galerkin cross
        # + Reynolds terms  c.grad(du) + du.grad(u) + du.grad(du)
        uh = jnp.einsum("ga,eai->egi", N, mfs_ue_hat)
        graduh = gm.grad_field(mfs_ue_hat, G)
        B = mfs_B[:, None, None]
        du = B * (u - uh)
        graddu = B[..., None] * (gradu - graduh)
        extra = (
            jnp.einsum("egj,egij->egi", c, graddu)
            + jnp.einsum("egj,egij->egi", du, gradu)
            + jnp.einsum("egj,egij->egi", du, graddu)
        )
        f_mom = f_mom + jnp.einsum("eg,ga,egi->eai", wdet, N,
                                   rho_m * extra)

    if avm3_ue_fine is not None:
        # AVM3: Smagorinsky eddy viscosity acting on the FINE scales only
        # (ref: fluid_ele avm3_assemble_mat_and_rhs — subgrid viscosity on
        # the scale-separated field S u)
        vol = jnp.sum(wdet, axis=1)
        delta = jnp.broadcast_to((vol ** (1.0 / dim))[:, None], wdet.shape)
        snorm = jnp.sqrt(2.0 * jnp.einsum("egij,egij->eg", eps, eps) + 1e-30)
        nu_sgs = (avm3_cs**2) * delta**2 * snorm  # (e, g)
        gradf = gm.grad_field(avm3_ue_fine, G)
        epsf = 0.5 * (gradf + jnp.swapaxes(gradf, -1, -2))
        f_mom = f_mom + 2.0 * rho * jnp.einsum(
            "eg,eg,egij,egaj->eai", wdet, nu_sgs, epsf, G)

    # Galerkin continuity: q div u (low-Mach: div u = thermal expansion src)
    f_cont = jnp.einsum("eg,ga,eg->ea", wdet, N, divu)
    if cont_src_gp is not None:
        f_cont = f_cont - jnp.einsum("eg,ga,eg->ea", wdet, N, cont_src_gp)

    if supg or pspg or graddiv:
        tau_m, tau_c = stab_params(
            c, jax.lax.stop_gradient(mu_eff), rho, G, wdet, dim, dt)
    if supg:
        ugw = jnp.einsum("egd,egad->ega", c, G)  # (c . grad) w_a
        f_mom = f_mom + rho * jnp.einsum("eg,eg,ega,egi->eai", wdet, tau_m, ugw, R_M)
    if graddiv:
        f_mom = f_mom + jnp.einsum("eg,eg,egai,eg->eai", wdet, tau_c, G, rho * divu)
    if pspg:
        f_cont = f_cont + jnp.einsum("eg,eg,egad,egd->ea", wdet, tau_m, G, R_M) / rho
    return f_mom, f_cont


def velocity_lumped_mass(Xe, cell: CellType, rho: float):
    """Row-sum lumped mass per element node (velocity dofs): (e, nen)."""
    _, detJ = gm.iso_gradients(Xe, cell.dN)
    wdet = gm.weighted(detJ, cell.gauss_weights)
    return rho * jnp.einsum("eg,ga->ea", wdet, jnp.asarray(cell.N, Xe.dtype))
