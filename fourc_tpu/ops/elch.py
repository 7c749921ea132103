"""Batched Nernst-Planck element kernels (multi-species electrochemistry).

Counterpart of the reference's elch element calculus
(ref: src/scatra_ele/4C_scatra_ele_calc_elch.* — Nernst-Planck residuals
with migration term; src/elch drivers; MAT_ion valence/diffusivity,
4C_mat_ion.*).

Weak form per species k (concentration c_k) and potential phi:

  species:  int N_a cdot_k
            + int grad N_a . ( D_k grad c_k + z_k D_k frt c_k grad phi )
            [ + convection u . grad c_k ]            = 0
  closure:  electroneutrality sum_k z_k c_k = 0     (ENC; ref
            Inpar::ElCh::equpot_enc — the potential equation)

frt = F / (R T).  The coupled tangent (migration term is bilinear in
(c, grad phi)) is jax.jvp through this residual.
"""

from __future__ import annotations

import jax.numpy as jnp

from fourc_tpu.core.cells import CellType
from fourc_tpu.ops import common as gm


def residual_np(Xe, ce, cdote, phie, cell: CellType, valences, diffs, frt,
                vel_gp=None, enc_scale=1.0):
    """Nernst-Planck + ENC element residuals.

    Xe: (e, nen, d); ce/cdote: (e, nen, K); phie: (e, nen).
    valences/diffs: length-K floats. Returns (f_c (e,nen,K), f_phi (e,nen)).
    """
    G, detJ = gm.iso_gradients(Xe, cell.dN)  # (e,g,a,d), (e,g)
    wdet = gm.weighted(detJ, cell.gauss_weights)  # (e,g)
    N = jnp.asarray(cell.N, Xe.dtype)  # (g,a)

    c = jnp.einsum("ga,eak->egk", N, ce)  # (e,g,K)
    cdot = jnp.einsum("ga,eak->egk", N, cdote)
    gc = jnp.einsum("egad,eak->egdk", G, ce)  # (e,g,d,K)
    gphi = jnp.einsum("egad,ea->egd", G, phie)  # (e,g,d)

    z = jnp.asarray(valences, Xe.dtype)  # (K,)
    D = jnp.asarray(diffs, Xe.dtype)  # (K,)

    # strong (mass) term
    R = cdot
    if vel_gp is not None:
        R = R + jnp.einsum("egd,egdk->egk", vel_gp, gc)
    f_c = jnp.einsum("eg,ga,egk->eak", wdet, N, R)
    # diffusive + migration flux: D_k grad c_k + z_k D_k frt c_k grad phi
    flux = D * gc + (z * D * frt) * c[:, :, None, :] * gphi[..., None]
    f_c = f_c + jnp.einsum("eg,egad,egdk->eak", wdet, G, flux)

    # ENC: int N_a sum_k z_k c_k
    enc = jnp.einsum("egk,k->eg", c, z)
    f_phi = enc_scale * jnp.einsum("eg,ga,eg->ea", wdet, N, enc)
    return f_c, f_phi


def residual_diffcond(Xe, ce, cdote, phie, cell: CellType, mat):
    """Diffusion-conduction (Newman) elch residuals for a binary
    concentrated electrolyte (ref:
    src/scatra_ele/4C_scatra_ele_calc_elch_diffcond.* with
    MAT_newman, 4C_mat_newman.*).

    Current density   i = -kappa(c) grad phi
                          + (2RT/F) kappa(c) (1 - t+) f_th(c) grad ln c
    species (c):   int N_a cdot + int grad N_a . D(c) grad c
                   - (t+ / F) int grad N_a . i             = 0
    potential:     -(1/F) int grad N_a . i                 = 0

    Xe: (e, nen, d); ce/cdote/phie: (e, nen).  Returns (f_c, f_phi),
    each (e, nen).  Monovalent binary salt (z+ = 1) as in the
    reference's Newman material.
    """
    G, detJ = gm.iso_gradients(Xe, cell.dN)
    wdet = gm.weighted(detJ, cell.gauss_weights)
    N = jnp.asarray(cell.N, Xe.dtype)

    c = jnp.maximum(jnp.einsum("ga,ea->eg", N, ce), 1e-12)  # (e,g)
    cdot = jnp.einsum("ga,ea->eg", N, cdote)
    gc = jnp.einsum("egad,ea->egd", G, ce)     # (e,g,d)
    gphi = jnp.einsum("egad,ea->egd", G, phie)

    F = mat.faraday
    frt = mat.frt
    tp = mat.transference
    D = mat.diff_c(c)          # (e,g)
    kap = mat.kappa_c(c)
    fth = mat.thermfac_c(c)

    # i = -kappa grad phi + (2/ frt) kappa (1-t+) f_th grad c / c
    conc_coef = (2.0 / frt) * kap * (1.0 - tp) * fth / c  # (e,g)
    i_gp = -kap[..., None] * gphi + conc_coef[..., None] * gc

    f_c = jnp.einsum("eg,ga,eg->ea", wdet, N, cdot)
    f_c = f_c + jnp.einsum("eg,egad,egd->ea", wdet, G,
                           D[..., None] * gc - (tp / F) * i_gp)
    f_phi = -jnp.einsum("eg,egad,egd->ea", wdet, G, i_gp) / F
    return f_c, f_phi
