"""Batched scalar-transport element kernels (advection-diffusion-reaction).

TPU-native counterpart of the reference's scatra element calculus
(ref: src/scatra_ele/4C_scatra_ele_calc.cpp — `ScaTraEleCalc<distype>`
with SUPG-type stabilization, `calc_tau` :488-639) and the thermo element
kernels (ref: src/thermo/src/element/4C_thermo_element.hpp).

Weak form per scalar (test function w):

    ∫ w ρc φ̇  +  w (u·∇φ)  +  D ∇w·∇φ  +  w r(φ)  -  w f  dΩ
  + ∫ τ (u·∇w) R_strong dΩ                       (SUPG)
  R_strong = ρc φ̇ + u·∇φ + r(φ) - f              (∇²φ dropped for linear cells,
                                                   matching the reference's
                                                   low-order-element practice)

All elements of one cell type evaluate as one batched einsum chain; the
Gauss loop is a tensor axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fourc_tpu.core.cells import CellType
from fourc_tpu.ops import common as gm


def calc_tau(vel_gp, diff, rhoc, h, dt, kind: str = "taylor"):
    """Stabilization parameter per GP.

    ref: 4C_scatra_ele_calc.cpp:488-639 (TAU_FRANCA_VALENTIN,
    TAU_TAYLOR_HUGHES_ZARINS, TAU_ZERO...).

    vel_gp: (e, g, d) convective velocity at GPs; h: (e, g) char. length.
    Returns tau: (e, g).
    """
    if kind in ("zero", "none"):
        return jnp.zeros(vel_gp.shape[:2], vel_gp.dtype)
    unorm = jnp.linalg.norm(vel_gp, axis=-1)  # (e,g)
    if kind == "franca_valentin":
        # ref: Franca & Valentin (2000) as in calc_tau_franca_valentin
        mk = 1.0 / 3.0
        epe = mk * rhoc * unorm * h / jnp.maximum(2.0 * diff, 1e-300)
        xi = jnp.maximum(epe, 1.0)
        denom = (4.0 * diff / mk) * xi + 2.0 * rhoc * unorm * h * 0.0
        tau = (h**2) / jnp.maximum(denom / 1.0 + (h**2) * 0.0, 1e-300)
        # transient contribution folded in like the reference's
        # tau_{FV} with reaction coefficient sigma = rhoc/dt:
        sigma = rhoc / dt if dt else 0.0
        epe1 = 2.0 * diff / jnp.maximum(mk * sigma * h**2, 1e-300) if dt else 1.0
        xi1 = jnp.maximum(epe1, 1.0) if dt else 1.0
        tau = (h**2) / jnp.maximum(
            (h**2) * sigma * xi1 + (4.0 * diff / mk) * xi, 1e-300
        )
        return tau
    # default: Taylor-Hughes-Zarins transient form
    inv_dt = (2.0 * rhoc / dt) if dt else 0.0
    adv = 2.0 * rhoc * unorm / jnp.maximum(h, 1e-300)
    dif = 4.0 * diff / jnp.maximum(h**2, 1e-300)
    return 1.0 / jnp.sqrt(inv_dt**2 + adv**2 + 9.0 * dif**2 + 1e-300)


def char_length(vel_gp, G, wdet, dim):
    """Characteristic element length at GPs: (e, g).

    Streamlength definition where velocity is nonzero (the reference's
    `calc_char_ele_length` streamlength option, robust for high-aspect
    elements): h = 2|u| / sum_a |u_hat . grad N_a|; falls back to
    V^(1/dim) where |u| ~ 0.
    """
    vol = jnp.sum(wdet, axis=1)  # (e,)
    h_vol = jnp.broadcast_to((vol ** (1.0 / dim))[:, None], wdet.shape)
    if vel_gp is None:
        return h_vol
    unorm = jnp.linalg.norm(vel_gp, axis=-1)  # (e,g)
    uhat = vel_gp / jnp.maximum(unorm, 1e-300)[..., None]
    denom = jnp.sum(jnp.abs(jnp.einsum("egd,egad->ega", uhat, G)), axis=-1)
    h_stream = 2.0 / jnp.maximum(denom, 1e-300)
    return jnp.where(unorm > 1e-12, h_stream, h_vol)


def residual(
    Xe,
    phie,
    phidote,
    cell: CellType,
    diff,
    rhoc,
    vel_gp=None,
    reaction=None,
    source_gp=None,
    tau_kind: str = "zero",
    dt: float | None = None,
):
    """Element residual of the scalar weak form: (n_ele, nen).

    Xe: (e, nen, d) coords; phie/phidote: (e, nen) nodal scalar + rate.
    diff: scalar diffusivity; rhoc: scalar capacity (rho*c).
    vel_gp: (e, g, d) convective velocity at GPs or None.
    reaction: callable phi -> r(phi) (per GP, vectorised) or None.
    source_gp: (e, g) volumetric source at GPs or None.
    """
    G, detJ = gm.iso_gradients(Xe, cell.dN)  # (e,g,a,d), (e,g)
    wdet = gm.weighted(detJ, cell.gauss_weights)  # (e,g)
    N = jnp.asarray(cell.N, Xe.dtype)  # (g,a)

    phi = jnp.einsum("ga,ea->eg", N, phie)
    phidot = jnp.einsum("ga,ea->eg", N, phidote)
    gphi = jnp.einsum("egad,ea->egd", G, phie)  # (e,g,d)

    # strong terms at GPs
    R = rhoc * phidot
    if vel_gp is not None:
        R = R + rhoc * jnp.einsum("egd,egd->eg", vel_gp, gphi)
    if reaction is not None:
        R = R + reaction(phi)
    if source_gp is not None:
        R = R - source_gp

    # Galerkin: w * R + grad w . D grad phi (D scalar or a (d, d)
    # anisotropic conductivity tensor, ref: scatra_ele diffusion manager)
    f = jnp.einsum("eg,ga,eg->ea", wdet, N, R)
    if hasattr(diff, "ndim") and getattr(diff, "ndim", 0) == 2:
        Dg = jnp.einsum("dc,egc->egd", diff, gphi)
        f = f + jnp.einsum("eg,egad,egd->ea", wdet, G, Dg)
        diff_tau = jnp.trace(diff) / diff.shape[0]  # SUPG effective D
    else:
        f = f + diff * jnp.einsum("eg,egad,egd->ea", wdet, G, gphi)
        diff_tau = diff

    # SUPG
    if vel_gp is not None and tau_kind not in ("zero", "none"):
        h = char_length(vel_gp, G, wdet, Xe.shape[-1])
        tau = calc_tau(vel_gp, diff_tau, rhoc, h, dt, kind=tau_kind)
        ugw = jnp.einsum("egd,egad->ega", vel_gp, G)  # u . grad w
        f = f + rhoc * jnp.einsum("eg,eg,ega,eg->ea", wdet, tau, ugw, R)
    return f


def residual_multi(
    Xe,
    phie,
    phidote,
    cell: CellType,
    diff_list,
    cap_list,
    vel_gp=None,
    reaction_gp=None,
    source_gp=None,
):
    """K-species advection-diffusion-reaction element residual: (e, nen, K).

    Counterpart of the reference's multi-scalar AdvReac element calculus
    (ref: src/scatra_ele/4C_scatra_ele_calc_advanced_reaction.cpp) — all
    species of a block evaluate in ONE einsum chain with the species index
    as a trailing tensor axis (TPU lane-friendly; no per-species loop).

    phie/phidote: (e, nen, K); diff_list/cap_list: per-species scalars.
    reaction_gp: callable phi (e, g, K) -> (e, g, K) coupled reaction
    (already in residual sign convention). source_gp: (e, g, K) or None.
    """
    G, detJ = gm.iso_gradients(Xe, cell.dN)  # (e,g,a,d), (e,g)
    wdet = gm.weighted(detJ, cell.gauss_weights)  # (e,g)
    N = jnp.asarray(cell.N, Xe.dtype)  # (g,a)

    phi = jnp.einsum("ga,eak->egk", N, phie)
    phidot = jnp.einsum("ga,eak->egk", N, phidote)
    gphi = jnp.einsum("egad,eak->egdk", G, phie)
    cap = jnp.asarray(cap_list, Xe.dtype)  # (K,)

    R = cap * phidot
    if vel_gp is not None:
        R = R + cap * jnp.einsum("egd,egdk->egk", vel_gp, gphi)
    if reaction_gp is not None:
        R = R + reaction_gp(phi)
    if source_gp is not None:
        R = R - source_gp

    f = jnp.einsum("eg,ga,egk->eak", wdet, N, R)
    D = jnp.asarray(diff_list, Xe.dtype)  # (K,)
    f = f + jnp.einsum("eg,egad,egdk,k->eak", wdet, G, gphi, D)
    return f


def surface_flux(Xf, q_gp, face_cell: CellType):
    """Consistent nodal loads for a prescribed scalar flux on faces.

    Xf: (n_face, nen_f, d); q_gp: (n_face, ngp) flux (positive = inflow).
    Returns (n_face, nen_f).
    """
    dA, _ = gm.surface_measure(Xf, face_cell.dN)
    w = jnp.asarray(face_cell.gauss_weights)
    N = jnp.asarray(face_cell.N)
    return jnp.einsum("g,eg,ga,eg->ea", w, dA, N, q_gp)


def capacity_lumped(Xe, cell: CellType, rhoc: float):
    """Row-sum lumped capacity per element node: (n_ele, nen)."""
    _, detJ = gm.iso_gradients(Xe, cell.dN)
    wdet = gm.weighted(detJ, cell.gauss_weights)
    return rhoc * jnp.einsum("eg,ga->ea", wdet, jnp.asarray(cell.N, Xe.dtype))


def gp_coords(Xe, cell: CellType):
    """GP physical coordinates: (e, g, d)."""
    return gm.interp_field(Xe, cell.N)
