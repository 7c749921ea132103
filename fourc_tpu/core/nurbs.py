"""NURBS/B-spline patch discretizations.

Counterpart of the reference's NURBS machinery
(ref: src/core/fem/src/nurbs_discretization — knot vectors, NURBS shape
functions evaluated per knot span; used by nurbs fluid/scatra/structure
elements and the Kirchhoff-Love NURBS shell).

TPU-native design: a patch's knot spans are GROUPED BY BASIS SIGNATURE —
for an open knot vector only the (up to 2p-1) boundary-adjacent span
shapes differ, every interior span shares one basis table — and each group
becomes a standard element block whose CellType carries the tabulated
span basis (values + parametric derivatives at Gauss points).  All
existing batched kernels (scalar transport, solid, fluid) then work on
NURBS patches UNCHANGED: the "element" is a knot span, the "nodes" are the
control points in its support.  (Rational weights != 1 would make tables
element-dependent; B-spline patches — the common analysis case — share
them exactly.)
"""

from __future__ import annotations

import numpy as np

from fourc_tpu.core import cells as _cells
from fourc_tpu.core.mesh import Discretization, ElementBlock


def open_knot_vector(n_el: int, p: int) -> np.ndarray:
    """Open (clamped) uniform knot vector on [0, 1]."""
    inner = np.linspace(0.0, 1.0, n_el + 1)
    return np.concatenate([np.zeros(p), inner, np.ones(p)])


def _basis_1d(p, U, i_span, u):
    """Nonzero B-spline basis (p+1,) and du-derivatives at parameter u in
    span [U[k], U[k+1]] with k = i_span + p (Cox-de-Boor, host numpy)."""
    k = i_span + p
    left = np.empty(p + 1)
    right = np.empty(p + 1)
    N = np.zeros((p + 1, p + 1))  # N[j, r]: order-r basis
    N[0, 0] = 1.0
    for r in range(1, p + 1):
        left[r] = u - U[k + 1 - r]
        right[r] = U[k + r] - u
        saved = 0.0
        for j in range(r):
            den = right[j + 1] + left[r - j]
            temp = N[j, r - 1] / den if den != 0 else 0.0
            N[j, r] = saved + right[j + 1] * temp
            saved = left[r - j] * temp
        N[r, r] = saved
    vals = N[:, p].copy()
    # derivative from order p-1 basis
    ders = np.zeros(p + 1)
    for j in range(p + 1):
        d = 0.0
        if j > 0:
            den = U[k + j] - U[k + j - p]
            if den != 0:
                d += N[j - 1, p - 1] / den
        if j < p:
            den = U[k + j + 1] - U[k + j + 1 - p]
            if den != 0:
                d -= N[j, p - 1] / den
        ders[j] = p * d
    return vals, ders


def greville(U, p):
    """Greville abscissae (control point parameters)."""
    n = len(U) - p - 1
    return np.array([U[i + 1:i + p + 1].mean() for i in range(n)])


def _span_tables_1d(n_el, p, gp1, U=None):
    """Per-span Gauss tables: values (n_el, g, p+1), derivs (dN/dxi_local
    where xi_local in [-1,1] of the span), and a signature per span."""
    U = open_knot_vector(n_el, p) if U is None else U
    xs, ws = np.polynomial.legendre.leggauss(gp1)
    vals = np.zeros((n_el, gp1, p + 1))
    ders = np.zeros((n_el, gp1, p + 1))
    for e in range(n_el):
        a, b = U[e + p], U[e + p + 1]
        for g, x in enumerate(xs):
            u = 0.5 * (a + b) + 0.5 * (b - a) * x
            v, d = _basis_1d(p, U, e, u)
            vals[e, g] = v
            ders[e, g] = d * 0.5 * (b - a)  # du/dxi_local
    sig = [tuple(np.round(vals[e].ravel(), 12)) for e in range(n_el)]
    return vals, ders, sig, U


def patch_rectangle(nx, ny, degree=2, lo=(0.0, 0.0), hi=(1.0, 1.0),
                    name="structure", mat_id=1, gp1=None, weights=None,
                    control_points=None):
    """2D NURBS patch -> Discretization (control points as 'nodes', knot
    spans as elements grouped by basis signature).

    weights: optional (nbx*nby,) rational control-point weights (ref:
    nurbs_discretization ControlPoint weights) — the span basis becomes
    R_a = w_a N_a / sum_b w_b N_b (tabulated per weight signature, so
    uniform-weight regions still share one element block).
    control_points: optional explicit (nbx*nby, 2) control net (replaces
    the Greville rectangle; used for curved exact geometries)."""
    p = int(degree)
    gp1 = gp1 or (p + 1)
    vx, dx, sx, Ux = _span_tables_1d(nx, p, gp1)
    vy, dy, sy, Uy = _span_tables_1d(ny, p, gp1)
    nbx, nby = nx + p, ny + p

    gx = greville(Ux, p)
    gy = greville(Uy, p)
    lo = np.asarray(lo, float)
    hi = np.asarray(hi, float)
    if control_points is not None:
        coords = np.asarray(control_points, float).reshape(nbx * nby, 2)
    else:
        X, Y = np.meshgrid(lo[0] + (hi[0] - lo[0]) * gx,
                           lo[1] + (hi[1] - lo[1]) * gy, indexing="ij")
        coords = np.stack([X.reshape(-1), Y.reshape(-1)], axis=1)
    wts_cp = None if weights is None else np.asarray(weights, float).reshape(
        nbx * nby)

    def cp(ix, iy):
        return ix * nby + iy

    # gauss rule on the local [-1,1]^2 (tensor)
    xs, ws = np.polynomial.legendre.leggauss(gp1)
    gpts = np.array([[a, b] for a in xs for b in xs])
    gwts = np.array([wa * wb for wa in ws for wb in ws])

    d = Discretization(name=name, coords=coords)
    groups = {}
    for ex in range(nx):
        for ey in range(ny):
            conn = [cp(ex + jx, ey + jy)
                    for jx in range(p + 1) for jy in range(p + 1)]
            key = (sx[ex], sy[ey])
            if wts_cp is not None:
                # rational tables depend on the local weight signature
                key = key + tuple(np.round(wts_cp[conn], 12))
            groups.setdefault(key, {"conn": [], "ex": ex, "ey": ey})[
                "conn"].append(conn)

    for gi, (key, grp) in enumerate(groups.items()):
        ex, ey = grp["ex"], grp["ey"]
        nen = (p + 1) * (p + 1)
        g = gp1 * gp1
        N = np.zeros((g, nen))
        dN = np.zeros((g, nen, 2))
        for gg in range(g):
            ga, gb = divmod(gg, gp1)
            a = 0
            for jx in range(p + 1):
                for jy in range(p + 1):
                    N[gg, a] = vx[ex, ga, jx] * vy[ey, gb, jy]
                    dN[gg, a, 0] = dx[ex, ga, jx] * vy[ey, gb, jy]
                    dN[gg, a, 1] = vx[ex, ga, jx] * dy[ey, gb, jy]
                    a += 1
        if wts_cp is not None:
            # rational (NURBS) basis: R = wN / sum(wN), quotient-rule ders
            we = wts_cp[np.asarray(grp["conn"][0])]  # (nen,)
            for gg in range(g):
                wN = we * N[gg]
                W = wN.sum()
                dW = (we[:, None] * dN[gg]).sum(axis=0)  # (2,)
                dN[gg] = (we[:, None] * dN[gg]) / W \
                    - np.outer(wN, dW) / W**2
                N[gg] = wN / W
        cellname = f"nurbs2d_p{p}_{name}_{gi}"
        cell = _cells.CellType(
            name=cellname, dim=2, nen=nen, gauss_points=gpts,
            gauss_weights=gwts, N=N, dN=dN,
            shape_fn=lambda xi, _N=N: _N[0],  # tabulated basis only
        )
        _cells.register_custom_cell(cell)
        d.blocks[cellname] = ElementBlock(
            cellname, np.asarray(grp["conn"], np.int32), mat_id)

    d.nurbs_weights = wts_cp
    d.node_sets["xmin"] = np.asarray([cp(0, iy) for iy in range(nby)], np.int32)
    d.node_sets["xmax"] = np.asarray([cp(nbx - 1, iy) for iy in range(nby)], np.int32)
    d.node_sets["ymin"] = np.asarray([cp(ix, 0) for ix in range(nbx)], np.int32)
    d.node_sets["ymax"] = np.asarray([cp(ix, nby - 1) for ix in range(nbx)], np.int32)
    d.node_sets["all"] = np.arange(coords.shape[0], dtype=np.int32)
    d.structured_shape = None
    return d


def patch_quarter_annulus(r_in=1.0, r_out=2.0, name="structure", mat_id=1,
                          gp1=None):
    """EXACT quarter annulus as a single quadratic rational patch.

    The classic NURBS benchmark geometry (ref: nurbs_discretization
    rational control-point weights): one 90-degree arc span, 3x3 control
    net, circumferential weights (1, 1/sqrt(2), 1).  A plain B-spline
    cannot represent the circle; with these weights the mapped geometry
    is exact to machine precision.
    """
    w_arc = np.array([1.0, 1.0 / np.sqrt(2.0), 1.0])
    r_mid = 0.5 * (r_in + r_out)
    # radial index i (3 rows), circumferential index j (3 cols)
    radii = np.array([r_in, r_mid, r_out])
    ctrl = np.zeros((3, 3, 2))
    for i, r in enumerate(radii):
        ctrl[i, 0] = (r, 0.0)
        ctrl[i, 1] = (r, r)  # arc middle control point (on the tangent)
        ctrl[i, 2] = (0.0, r)
    wts = np.ones((3, 3)) * w_arc[None, :]
    return patch_rectangle(
        1, 1, degree=2, name=name, mat_id=mat_id, gp1=gp1,
        control_points=ctrl.reshape(9, 2), weights=wts.reshape(9))
