"""Fused Pallas TPU kernel for the hex8 solid residual + tangent matvec.

The hot loop of the whole framework (SURVEY §3.2): batched total-Lagrangian
internal force and its directional derivative (the Newton-Krylov matvec).
The XLA-fused unrolled form (ops/solid.py) lowers to thousands of small
VPU kernels — launch/HBM-roundtrip bound, ~70x below VPU speed of light at
1M dofs.  This kernel fuses the ENTIRE Gauss chain into one pallas_call:

  layout: elements on the LANE axis (tiles of T columns), the 8 Gauss
  points on the SUBLANE axis — every tensor entry (J, H, E, S, P) is one
  full (8, T) VPU block; per-node/per-component rows are (1, T) slices of
  the (24, T) input blocks.  All intermediates live in VMEM/registers: one
  kernel launch, one HBM read of (X, u[, v]) and one write of f per tile.

Supported materials: compressible Neo-Hooke (classic psi = mu/2 (I1-3)
- mu lnJ + lam/2 lnJ^2) and St. Venant-Kirchhoff — closed forms inlined;
the tangent kernel is the hand-propagated dual (jvp) of the same chain.

(ref counterpart: solid_3D_ele/4C_solid_3D_ele_calc.cpp Gauss loop; this
file is the TPU 'speed-of-light' path the reference's per-element C++
loop corresponds to.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE = 512  # elements per grid step (lane axis; multiple of 128)


def _hex8_tables():
    """dN + weights packed as one (8, 128) table (row g; col a*3+j -> dN,
    col 127 -> gauss weight) — passed as a broadcast kernel input because
    Pallas kernels may not capture constant arrays."""
    from fourc_tpu.core import cells

    cell = cells.get_cell("hex8")
    dN = np.asarray(cell.dN)  # (8, 8, 3)
    w = np.asarray(cell.gauss_weights)  # (8,)
    tab = np.zeros((8, 128), np.float32)
    tab[:, :24] = dN.reshape(8, 24)
    tab[:, 127] = w
    return tab


def _mm(a, b):
    """3x3 'matrix' (lists of (8,T) blocks) product."""
    return [[sum(a[i][k] * b[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)]


def _det(a):
    return (a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1])
            - a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0])
            + a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0]))


def _cof(a):
    """Cofactor matrix (= adj^T) of a 3x3 block matrix."""
    c = [[None] * 3 for _ in range(3)]
    c[0][0] = a[1][1] * a[2][2] - a[1][2] * a[2][1]
    c[0][1] = a[1][2] * a[2][0] - a[1][0] * a[2][2]
    c[0][2] = a[1][0] * a[2][1] - a[1][1] * a[2][0]
    c[1][0] = a[0][2] * a[2][1] - a[0][1] * a[2][2]
    c[1][1] = a[0][0] * a[2][2] - a[0][2] * a[2][0]
    c[1][2] = a[0][1] * a[2][0] - a[0][0] * a[2][1]
    c[2][0] = a[0][1] * a[1][2] - a[0][2] * a[1][1]
    c[2][1] = a[0][2] * a[1][0] - a[0][0] * a[1][2]
    c[2][2] = a[0][0] * a[1][1] - a[0][1] * a[1][0]
    return c


def _inv_from_cof(cof, det):
    inv_det = 1.0 / det
    # inv = adj / det = cof^T / det
    return [[cof[j][i] * inv_det for j in range(3)] for i in range(3)]


def _geometry(X_ref, tab_ref):
    """Shared geometric setup: G[a][i] (8,T) cartesian grads, wdet (8,T)."""
    X = [[X_ref[a * 3 + i, :][None, :] for i in range(3)] for a in range(8)]
    dNc = [[tab_ref[:, a * 3 + j][:, None] for j in range(3)]
           for a in range(8)]
    w = tab_ref[:, 127][:, None]
    J = [[sum(X[a][i] * dNc[a][j] for a in range(8)) for j in range(3)]
         for i in range(3)]
    detJ = _det(J)
    cofJ = _cof(J)
    Jinv = _inv_from_cof(cofJ, detJ)  # Jinv[j][i] rows param, cols cart
    G = [[sum(dNc[a][j] * Jinv[j][i] for j in range(3)) for i in range(3)]
         for a in range(8)]
    wdet = detJ * w
    return G, wdet


def _grad(u_ref, G):
    u = [[u_ref[a * 3 + i, :][None, :] for i in range(3)] for a in range(8)]
    return [[sum(u[a][i] * G[a][j] for a in range(8)) for j in range(3)]
            for i in range(3)]


def _strain_A(H):
    """A = 2 E_gl = H + H^T + H^T H (cancellation-free)."""
    return [[H[i][j] + H[j][i] + sum(H[k][i] * H[k][j] for k in range(3))
             for j in range(3)] for i in range(3)]


def _stress_neohooke(A, lam, mu):
    """S = C^-1 (mu A + lam lnJ I), lnJ = log1p(detC - 1)/2 — the f32-
    stable closed form (materials/elastic.py NeoHooke.pk2_from_E)."""
    eye = [[1.0 if i == j else 0.0 for j in range(3)] for i in range(3)]
    C = [[A[i][j] + eye[i][j] for j in range(3)] for i in range(3)]
    trA = A[0][0] + A[1][1] + A[2][2]
    trA2 = sum(A[i][j] * A[j][i] for i in range(3) for j in range(3))
    detA = _det(A)
    detC_m1 = trA + 0.5 * (trA * trA - trA2) + detA
    lnJ = 0.5 * jnp.log1p(detC_m1)
    cofC = _cof(C)
    Cinv = _inv_from_cof(cofC, 1.0 + detC_m1)
    M = [[mu * A[i][j] + (lam * lnJ if i == j else 0.0) for j in range(3)]
         for i in range(3)]
    return _mm(Cinv, M), (C, Cinv, detC_m1, lnJ)


def _stress_neohooke_dual(A, Ad, aux, lam, mu):
    C, Cinv, detC_m1, lnJ = aux
    trAd = Ad[0][0] + Ad[1][1] + Ad[2][2]
    trA = A[0][0] + A[1][1] + A[2][2]
    trA2d = 2.0 * sum(A[i][j] * Ad[i][j] for i in range(3) for j in range(3))
    cofA = _cof(A)
    detAd = sum(cofA[i][j] * Ad[i][j] for i in range(3) for j in range(3))
    detC_m1_d = trAd + trA * trAd - 0.5 * trA2d + detAd
    lnJd = 0.5 * detC_m1_d / (1.0 + detC_m1)
    CinvAd = _mm(Cinv, Ad)
    Cinvd = [[-sum(CinvAd[i][k] * Cinv[k][j] for k in range(3))
              for j in range(3)] for i in range(3)]
    M = [[mu * A[i][j] + (lam * lnJ if i == j else 0.0) for j in range(3)]
         for i in range(3)]
    Md = [[mu * Ad[i][j] + (lam * lnJd if i == j else 0.0) for j in range(3)]
          for i in range(3)]
    S1 = _mm(Cinvd, M)
    S2 = _mm(Cinv, Md)
    return [[S1[i][j] + S2[i][j] for j in range(3)] for i in range(3)]


def _stress_svk(A, lam, mu):
    trE = 0.5 * (A[0][0] + A[1][1] + A[2][2])
    return [[lam * trE * (1.0 if i == j else 0.0) + mu * A[i][j]
             for j in range(3)] for i in range(3)], None


def _stress_svk_dual(A, Ad, aux, lam, mu):
    trEd = 0.5 * (Ad[0][0] + Ad[1][1] + Ad[2][2])
    return [[lam * trEd * (1.0 if i == j else 0.0) + mu * Ad[i][j]
             for j in range(3)] for i in range(3)]


_STRESS = {"neohooke": (_stress_neohooke, _stress_neohooke_dual),
           "svk": (_stress_svk, _stress_svk_dual)}


def _accumulate(P, G, wdet, out_ref):
    for a in range(8):
        for i in range(3):
            row = sum(P[i][j] * G[a][j] for j in range(3)) * wdet
            out_ref[a * 3 + i, :] = jnp.sum(row, axis=0)


def _fwd_kernel(model, lam, mu, tab_ref, X_ref, u_ref, out_ref):
    G, wdet = _geometry(X_ref, tab_ref)
    H = _grad(u_ref, G)
    A = _strain_A(H)
    S, _aux = _STRESS[model][0](A, lam, mu)
    eye = [[1.0 if i == j else 0.0 for j in range(3)] for i in range(3)]
    F = [[H[i][j] + eye[i][j] for j in range(3)] for i in range(3)]
    P = _mm(F, S)
    _accumulate(P, G, wdet, out_ref)


def _jvp_kernel(model, lam, mu, tab_ref, X_ref, u_ref, v_ref, out_ref):
    G, wdet = _geometry(X_ref, tab_ref)
    H = _grad(u_ref, G)
    Hd = _grad(v_ref, G)
    A = _strain_A(H)
    Ad = [[Hd[i][j] + Hd[j][i]
           + sum(Hd[k][i] * H[k][j] + H[k][i] * Hd[k][j] for k in range(3))
           for j in range(3)] for i in range(3)]
    S, aux = _STRESS[model][0](A, lam, mu)
    Sd = _STRESS[model][1](A, Ad, aux, lam, mu)
    eye = [[1.0 if i == j else 0.0 for j in range(3)] for i in range(3)]
    F = [[H[i][j] + eye[i][j] for j in range(3)] for i in range(3)]
    # Pd = Fd S + F Sd,  Fd = Hd
    P1 = _mm(Hd, S)
    P2 = _mm(F, Sd)
    Pd = [[P1[i][j] + P2[i][j] for j in range(3)] for i in range(3)]
    _accumulate(Pd, G, wdet, out_ref)


def _pad24(x24, E):
    Ep = -(-E // TILE) * TILE
    if Ep == E:
        return x24, E
    return jnp.pad(x24, ((0, 0), (0, Ep - E))), Ep


@functools.partial(jax.jit, static_argnames=("lam", "mu", "model", "interpret"))
def _run_fwd(X24, u24, lam, mu, model="neohooke", interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E = X24.shape[1]
    X24, Ep = _pad24(X24, E)
    u24, _ = _pad24(u24, E)
    tab = jnp.asarray(_hex8_tables())
    kern = functools.partial(_fwd_kernel, model, float(lam), float(mu))
    out = pl.pallas_call(
        kern,
        grid=(Ep // TILE,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((24, TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((24, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((24, Ep), jnp.float32),
        interpret=interpret,
    )(tab, X24.astype(jnp.float32), u24.astype(jnp.float32))
    return out[:, :E]


@functools.partial(jax.jit, static_argnames=("lam", "mu", "model", "interpret"))
def _run_jvp(X24, u24, v24, lam, mu, model="neohooke", interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E = X24.shape[1]
    X24, Ep = _pad24(X24, E)
    u24, _ = _pad24(u24, E)
    v24, _ = _pad24(v24, E)
    tab = jnp.asarray(_hex8_tables())
    kern = functools.partial(_jvp_kernel, model, float(lam), float(mu))
    out = pl.pallas_call(
        kern,
        grid=(Ep // TILE,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((24, TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((24, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((24, Ep), jnp.float32),
        interpret=interpret,
    )(tab, X24.astype(jnp.float32), u24.astype(jnp.float32),
      v24.astype(jnp.float32))
    return out[:, :E]


def pallas_model_for(material) -> str | None:
    name = type(material).__name__.lower()
    if "neohooke" in name and "plastic" not in name:
        return "neohooke"
    if "stvenant" in name and "scatra" not in name and "thermo" not in name:
        return "svk"
    return None


def internal_force(Xe, ue, material, interpret=False):
    """Drop-in element force: (E, 8, 3) -> (E, 8, 3), custom-jvp'd so that
    Newton-Krylov matvecs hit the fused tangent kernel."""
    from fourc_tpu.materials.elastic import lame

    lam, mu = float(lame(material.youngs, material.nue)[0]), \
        float(lame(material.youngs, material.nue)[1])
    model = pallas_model_for(material)

    @jax.custom_jvp
    def f(u24):
        return _run_fwd(X24, u24, lam, mu, model=model, interpret=interpret)

    @f.defjvp
    def f_jvp(primals, tangents):
        (u24,) = primals
        (v24,) = tangents
        y = _run_fwd(X24, u24, lam, mu, model=model, interpret=interpret)
        dy = _run_jvp(X24, u24, v24, lam, mu, model=model,
                      interpret=interpret)
        return y, dy

    E = Xe.shape[0]
    X24 = jnp.transpose(Xe.reshape(E, 24))
    u24 = jnp.transpose(ue.reshape(E, 24))
    out = f(u24)
    return jnp.transpose(out).reshape(E, 8, 3)
