"""Batched solid element kernels (total-Lagrangian, displacement-based).

TPU-native counterpart of the reference's solid element calculus
(ref: src/solid_3D_ele/4C_solid_3D_ele_calc.cpp:112-230 — nodal coords →
for_each_gauss_point → deformation gradient / GL strain → material stress →
B^T S internal force + B^T C B + geometric stiffness + mass), and the action
dispatch (4C_solid_3D_ele_evaluate.cpp:84-148: nlnstiff / internalforce /
nlnstiffmass / stress / energy).

Design departures:
- One call evaluates ALL elements of a cell type as batched einsums; the
  Gauss "loop" is a tensor axis, not a loop.
- No B-matrix and no Voigt 6x6 cmat are ever built: internal force is the
  tensor contraction f[a,i] = sum_g w detJ P[i,j] G[a,j], and the tangent
  action K·v is jax.jvp through this function (exact consistent tangent,
  including the geometric part, for free).
- Element stiffness matrices (needed for preconditioners/direct solves) come
  from jax.jacfwd of the per-element residual, batched with vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fourc_tpu.core.cells import CellType
from fourc_tpu.ops import common as gm

_I3 = jnp.eye(3)


# ---------------------------------------------------------------------------
# internal force
# ---------------------------------------------------------------------------


def internal_force(Xe, ue, cell: CellType, material, kinem: str = "nonlinear",
                   history=None, dt=None, temps=None):
    """Internal force for one element block.

    Xe: (n_ele, nen, 3) reference coords; ue: (n_ele, nen, 3) displacements.
    Returns (f_int (n_ele, nen, 3), new_history or None).
    """
    G, detJ = gm.iso_gradients(Xe, cell.dN)  # (e,g,a,d), (e,g)
    wdet = gm.weighted(detJ, cell.gauss_weights)  # (e,g)
    H = gm.grad_field(ue, G)  # (e,g,d,d) displacement gradient

    d = Xe.shape[-1]
    if d == 2:
        # plane strain: embed the 2D gradient into 3D (H33 = 0 -> F33 = 1),
        # evaluate the 3D material, contract back the in-plane stress block
        # (analog of the reference's w1 plane-strain elements, ref: src/w1).
        H = jnp.pad(H, ((0, 0), (0, 0), (0, 1), (0, 1)))

    if kinem == "linear":
        eps = 0.5 * (H + jnp.swapaxes(H, -1, -2))
        sig, new_hist = _stress_small(material, eps, history, dt)
        f = jnp.einsum("eg,egij,egaj->eai", wdet, sig[..., :d, :d], G)
        return f, new_hist

    F = H + _I3
    C = jnp.einsum("egki,egkj->egij", F, F)
    S, new_hist = _stress_pk2(material, C, history, dt, temps)
    P = jnp.einsum("egik,egkj->egij", F, S)  # first PK
    f = jnp.einsum("eg,egij,egaj->eai", wdet, P[..., :d, :d], G)
    return f, new_hist


def _stress_pk2(material, C, history, dt, temps=None):
    e, g = C.shape[0], C.shape[1]
    Cf = C.reshape(e * g, 3, 3)
    if getattr(material, "kind", "solid") == "thermo_solid" and temps is not None:
        Tf = temps.reshape(e * g)
        S = jax.vmap(material.pk2)(Cf, Tf).reshape(e, g, 3, 3)
        return S, None
    if history is not None:
        hf = history.reshape(e * g, -1)
        if dt is not None and "dt" in material.evaluate.__code__.co_varnames:
            S, hnew = jax.vmap(lambda c, h: material.evaluate(c, h, dt))(Cf, hf)
        else:
            S, hnew = jax.vmap(material.evaluate)(Cf, hf)
        return S.reshape(e, g, 3, 3), hnew.reshape(e, g, -1)
    S = jax.vmap(material.pk2)(Cf).reshape(e, g, 3, 3)
    return S, None


def _stress_small(material, eps, history, dt):
    e, g = eps.shape[0], eps.shape[1]
    ef = eps.reshape(e * g, 3, 3)
    if history is not None:
        hf = history.reshape(e * g, -1)
        fn = material.evaluate_small
        if dt is not None and "dt" in fn.__code__.co_varnames:
            sig, hnew = jax.vmap(lambda x, h: fn(x, h, dt))(ef, hf)
        else:
            sig, hnew = jax.vmap(fn)(ef, hf)
        return sig.reshape(e, g, 3, 3), hnew.reshape(e, g, -1)
    sig = jax.vmap(material.stress_small)(ef).reshape(e, g, 3, 3)
    return sig, None


# ---------------------------------------------------------------------------
# mass
# ---------------------------------------------------------------------------


def lumped_mass(Xe, cell: CellType, rho: float):
    """Row-sum lumped mass per element node: (n_ele, nen)."""
    _, detJ = gm.iso_gradients(Xe, cell.dN)
    wdet = gm.weighted(detJ, cell.gauss_weights)
    N = jnp.asarray(cell.N)  # (g,a)
    # consistent row sums: m_a = rho * sum_g w detJ N_a * (sum_b N_b) = rho sum_g w detJ N_a
    return rho * jnp.einsum("eg,ga->ea", wdet, N)


def consistent_mass_matvec(Xe, ve, cell: CellType, rho: float):
    """(M v) element contribution: (n_ele, nen, c)."""
    _, detJ = gm.iso_gradients(Xe, cell.dN)
    wdet = gm.weighted(detJ, cell.gauss_weights)
    N = jnp.asarray(cell.N)
    vg = jnp.einsum("ga,eac->egc", N, ve)
    return rho * jnp.einsum("eg,ga,egc->eac", wdet, N, vg)


# ---------------------------------------------------------------------------
# element matrices (for assembled paths: preconditioners, coarse solves)
# ---------------------------------------------------------------------------


def element_stiffness(Xe, ue, cell: CellType, material, kinem="nonlinear",
                      history=None, dt=None):
    """Consistent element tangent K_e: (n_ele, nen*3, nen*3) via AD.

    Equivalent of the reference's `nlnstiff` action (material + geometric
    stiffness, 4C_solid_3D_ele_calc.cpp) but obtained by jacfwd of the
    element residual — exact by construction.
    """
    nen, d = Xe.shape[1], Xe.shape[2]

    def local_res(x, u, h):
        f, _ = internal_force(
            x[None], u.reshape(nen, d)[None], cell, material,
            kinem=kinem, history=None if h is None else h[None], dt=dt,
        )
        return f[0].reshape(nen * d)

    def per_elem(x, u, h):
        return jax.jacfwd(lambda uu: local_res(x, uu, h))(u.reshape(nen * d))

    if history is None:
        return jax.vmap(lambda x, u: per_elem(x, u, None))(Xe, ue)
    return jax.vmap(per_elem)(Xe, ue, history)


# ---------------------------------------------------------------------------
# stress / energy output (actions `stress`, `energy`)
# ---------------------------------------------------------------------------


def gp_stresses(Xe, ue, cell: CellType, material, kinem="nonlinear", history=None, dt=None):
    """Cauchy stress at GPs: (n_ele, ngp, 3, 3)."""
    G, detJ = gm.iso_gradients(Xe, cell.dN)
    H = gm.grad_field(ue, G)
    if kinem == "linear":
        eps = 0.5 * (H + jnp.swapaxes(H, -1, -2))
        sig, _ = _stress_small(material, eps, history, dt)
        return sig
    F = H + _I3
    C = jnp.einsum("egki,egkj->egij", F, F)
    S, _ = _stress_pk2(material, C, history, dt)
    J = gm.det3(F)
    return jnp.einsum("egik,egkl,egjl->egij", F, S, F) / J[..., None, None]


def strain_energy(Xe, ue, cell: CellType, material, kinem="nonlinear"):
    """Total strain energy of the block (scalar)."""
    G, detJ = gm.iso_gradients(Xe, cell.dN)
    wdet = gm.weighted(detJ, cell.gauss_weights)
    H = gm.grad_field(ue, G)
    if kinem == "linear":
        eps = 0.5 * (H + jnp.swapaxes(H, -1, -2))
        e, g = eps.shape[:2]
        psi = jax.vmap(material.psi_small)(eps.reshape(-1, 3, 3)).reshape(e, g)
    else:
        F = H + _I3
        C = jnp.einsum("egki,egkj->egij", F, F)
        e, g = C.shape[:2]
        psi = jax.vmap(material.psi)(C.reshape(-1, 3, 3)).reshape(e, g)
    return jnp.sum(wdet * psi)


def extrapolate_to_nodes(gp_vals, cell: CellType):
    """Average GP values to element nodes (simple L2-ish projection weights).

    gp_vals: (n_ele, ngp, ...) -> (n_ele, nen, ...) via shape-fn weighting
    (N^T diag(w) gp_vals / N^T w) — matches the reference's nodal stress
    averaging strategy for output.
    """
    N = jnp.asarray(cell.N)  # (g,a)
    w = jnp.asarray(cell.gauss_weights)
    wN = N * w[:, None]
    denom = wN.sum(axis=0)  # (a,)
    num = jnp.einsum("ga,eg...->ea...", wN, gp_vals)
    return num / denom.reshape((1, -1) + (1,) * (num.ndim - 2))


# ---------------------------------------------------------------------------
# surface loads (Neumann)
# ---------------------------------------------------------------------------


def surface_traction_force(Xf, traction, face_cell: CellType):
    """Consistent nodal forces for a traction field given at face GPs.

    Xf: (n_face, nen_f, d); traction: (n_face, ngp, d) or (d,) constant.
    Returns (n_face, nen_f, d).
    """
    dA, _ = gm.surface_measure(Xf, face_cell.dN)
    w = jnp.asarray(face_cell.gauss_weights)
    N = jnp.asarray(face_cell.N)
    t = jnp.broadcast_to(traction, dA.shape + (Xf.shape[-1],))
    return jnp.einsum("g,eg,ga,egd->ead", w, dA, N, t)


def surface_pressure_force(Xf, uf, p, face_cell: CellType, follower: bool = True):
    """Pressure load p (scalar per face GP or constant), optionally follower
    (evaluated on the deformed surface — the analog of the reference's
    follower Neumann loads)."""
    x = Xf + uf if follower else Xf
    dA, n = gm.surface_measure(x, face_cell.dN)
    w = jnp.asarray(face_cell.gauss_weights)
    N = jnp.asarray(face_cell.N)
    pg = jnp.broadcast_to(p, dA.shape)
    return -jnp.einsum("g,eg,ga,eg,egd->ead", w, dA, N, pg, n)
