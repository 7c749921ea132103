"""Shared element-kernel geometry helpers (batched, einsum-formulated).

These replace the reference's per-Gauss-point Jacobian computations
(ref: 4C_fem_general_utils_fem_shapefunctions.hpp usage inside
solid_3D_ele/4C_solid_3D_ele_calc.cpp:112-230) with whole-batch einsums —
the batch dimensions (element, gauss point) stay leading so XLA tiles the
contractions onto the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def det3(a):
    """Determinant of (..., 3, 3) via cofactors (cheaper than linalg.det)."""
    return (
        a[..., 0, 0] * (a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1])
        - a[..., 0, 1] * (a[..., 1, 0] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 0])
        + a[..., 0, 2] * (a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0])
    )


def inv3(a, det=None):
    """Inverse of (..., 3, 3) via adjugate."""
    if det is None:
        det = det3(a)
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c02 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c10 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c20 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c21 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def det2(a):
    return a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]


def inv2(a, det=None):
    if det is None:
        det = det2(a)
    adj = jnp.stack(
        [
            jnp.stack([a[..., 1, 1], -a[..., 0, 1]], axis=-1),
            jnp.stack([-a[..., 1, 0], a[..., 0, 0]], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def iso_gradients(Xe, dN):
    """Isoparametric gradients for one element block.

    Xe: (n_ele, nen, d) nodal reference coords
    dN: (ngp, nen, d)   parametric shape derivatives (constant table)
    Returns (G, wdet):
      G:    (n_ele, ngp, nen, d) shape-function gradients w.r.t. X
      detJ: (n_ele, ngp)         Jacobian determinants (NOT weighted)
    """
    d = Xe.shape[-1]
    pdim = np.asarray(dN).shape[-1]
    # J[e,g,i,j] = d x_i / d xi_j
    J = jnp.einsum("eai,gaj->egij", Xe, jnp.asarray(dN))
    if pdim == 1 and d > 1:
        # curve element embedded in d-space (line2 transport/thermo meshes,
        # ref: scatra line2 decks): gradient lives along the unit tangent,
        # G[e,g,a,:] = (dN/ds) t_hat, detJ = arc-length jacobian |dx/dxi|.
        t = J[..., 0]  # (e, g, d) tangent dx/dxi
        detJ = jnp.linalg.norm(t, axis=-1)  # (e, g)
        that = t / jnp.maximum(detJ, 1e-300)[..., None]
        G = jnp.einsum("ga,eg,egi->egai", jnp.asarray(dN)[..., 0],
                       1.0 / jnp.maximum(detJ, 1e-300), that)
        return G, detJ
    if d == 3:
        detJ = det3(J)
        Jinv = inv3(J, detJ)
    elif d == 2:
        detJ = det2(J)
        Jinv = inv2(J, detJ)
    else:  # 1D (line elements with intrinsic coordinates)
        detJ = J[..., 0, 0]
        Jinv = 1.0 / detJ[..., None, None]
    G = jnp.einsum("gaj,egji->egai", jnp.asarray(dN), Jinv)
    return G, detJ


def grad_field(ue, G):
    """Gradient of a nodal field at GPs.

    ue: (n_ele, nen, c) nodal values; G: (n_ele, ngp, nen, d)
    -> (n_ele, ngp, c, d)
    """
    return jnp.einsum("eac,egad->egcd", ue, G)


def interp_field(ue, N):
    """Interpolate nodal field to GPs: (n_ele, nen, c), (ngp, nen) -> (n_ele, ngp, c)."""
    return jnp.einsum("eac,ga->egc", ue, jnp.asarray(N))


def surface_measure(Xf, dNf):
    """Area (3D faces) / length (2D edges) jacobian + unit normal at GPs.

    Xf: (n_face, nen_f, d) face nodal coords; dNf: (ngp, nen_f, d-1)
    Returns (dA, normal): (n_face, ngp), (n_face, ngp, d)
    Normal points per the face orientation (right-hand rule w.r.t. the
    parametric axes; grid/ mesh readers orient faces outward).
    """
    t = jnp.einsum("eai,gap->egip", Xf, jnp.asarray(dNf))  # tangents (d, d-1)
    d = Xf.shape[-1]
    if d == 3:
        n = jnp.cross(t[..., 0], t[..., 1])
    else:
        tx = t[..., 0]
        n = jnp.stack([tx[..., 1], -tx[..., 0]], axis=-1)
    dA = jnp.linalg.norm(n, axis=-1)
    return dA, n / (dA[..., None] + 1e-300)


def weighted(detJ, weights):
    """detJ (n_ele, ngp) * gauss weights (ngp,) -> (n_ele, ngp)."""
    return detJ * jnp.asarray(weights)[None, :]


def as_f64_tables(cell, dtype=jnp.float64):
    N = np.asarray(cell.N)
    dN = np.asarray(cell.dN)
    w = np.asarray(cell.gauss_weights)
    return N, dN, w


# ---------------------------------------------------------------------------
# element-LAST layout helpers (the TPU-fast path)
#
# TPU vector registers are (8 sublanes, 128 lanes) tiles over the LAST two
# axes.  A batch of 3x3 tensors stored (E, 3, 3) wastes 97% of every lane
# (3-wide rows pad to 128); stored (3, 3, E) the element axis fills the
# lanes and every small-tensor operation is a full-width VPU op.  Measured
# on v5e: 11x faster for the hex8 internal-force kernel, ~183 GFLOP/s at
# 330k elements.  All leading axes are tiny and static (i, j, gauss point,
# node), so XLA fuses the whole Gauss chain into a few kernels.
#
# Convention: tensors (3, 3, ..., E), vectors (3, ..., E), scalars (..., E).
# These helpers index LEADING axes and broadcast over the rest, so the same
# material code works for a single sample (3, 3) and a batch (3, 3, M).
# ---------------------------------------------------------------------------


def tr3l(a):
    """Trace over the two leading axes: (3, 3, ...) -> (...)."""
    return a[0, 0] + a[1, 1] + a[2, 2]


def det3l(a):
    """Determinant over leading axes: (3, 3, ...) -> (...)."""
    return (
        a[0, 0] * (a[1, 1] * a[2, 2] - a[1, 2] * a[2, 1])
        - a[0, 1] * (a[1, 0] * a[2, 2] - a[1, 2] * a[2, 0])
        + a[0, 2] * (a[1, 0] * a[2, 1] - a[1, 1] * a[2, 0])
    )


def inv3l(a, det=None):
    """Inverse via adjugate, leading layout: (3, 3, ...) -> (3, 3, ...)."""
    if det is None:
        det = det3l(a)
    rows = [
        [
            a[1, 1] * a[2, 2] - a[1, 2] * a[2, 1],
            a[0, 2] * a[2, 1] - a[0, 1] * a[2, 2],
            a[0, 1] * a[1, 2] - a[0, 2] * a[1, 1],
        ],
        [
            a[1, 2] * a[2, 0] - a[1, 0] * a[2, 2],
            a[0, 0] * a[2, 2] - a[0, 2] * a[2, 0],
            a[0, 2] * a[1, 0] - a[0, 0] * a[1, 2],
        ],
        [
            a[1, 0] * a[2, 1] - a[1, 1] * a[2, 0],
            a[0, 1] * a[2, 0] - a[0, 0] * a[2, 1],
            a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0],
        ],
    ]
    adj = jnp.stack([jnp.stack(r) for r in rows])
    return adj / det


def det2l(a):
    return a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]


def inv2l(a, det=None):
    if det is None:
        det = det2l(a)
    adj = jnp.stack(
        [jnp.stack([a[1, 1], -a[0, 1]]), jnp.stack([-a[1, 0], a[0, 0]])]
    )
    return adj / det


def eye3l(like):
    """eye(3) broadcast against a (3, 3, ...) array."""
    return jnp.eye(3, dtype=like.dtype).reshape((3, 3) + (1,) * (like.ndim - 2))


def matmul3l(a, b):
    """(3, 3, ...) @ (3, 3, ...) with leading matrix axes."""
    return jnp.einsum("ik...,kj...->ij...", a, b)


def iso_gradients_el(Xt, dN):
    """Element-last isoparametric gradients.

    Xt: (nen, d, E) nodal reference coords (element axis LAST)
    dN: (ngp, nen, d) parametric shape derivative table
    Returns (G, detJ): G (ngp, nen, d, E), detJ (ngp, E).
    """
    dN = jnp.asarray(dN, Xt.dtype)
    d = Xt.shape[1]
    J = jnp.einsum("aiE,gaj->ijgE", Xt, dN)  # (d, d, g, E)
    if d == 3:
        detJ = det3l(J)  # (g, E)
        Jinv = inv3l(J, detJ)  # (d, d, g, E) = J^{-1}[i,j]
    else:
        detJ = det2l(J)
        Jinv = inv2l(J, detJ)
    # G[g,a,i,E] = dN[g,a,j] * Jinv[j,i,g,E]
    G = jnp.einsum("gaj,jigE->gaiE", dN, Jinv)
    return G, detJ


def grad_field_el(ut, G):
    """Gradient of a nodal field, element-last.

    ut: (nen, c, E); G: (g, nen, d, E) -> (c, d, g, E)
    """
    return jnp.einsum("acE,gadE->cdgE", ut, G)


def interp_field_el(ut, N):
    """(nen, c, E), (g, nen) -> (c, g, E)."""
    return jnp.einsum("acE,ga->cgE", ut, jnp.asarray(N, ut.dtype))
