"""Cell-type zoo: shape functions, parametric derivatives and Gauss rules.

TPU-native counterpart of the reference's cell-type registry and shape
function utilities (ref: src/core/fem/src/general/4C_fem_general_cell_type.hpp:17-49,
4C_fem_general_utils_fem_shapefunctions.hpp, 4C_fem_general_utils_integration.cpp).

Design: every cell type is described by a pure shape-function callable
``N(xi) -> (nen,)`` written in jax.numpy.  Derivative tables at quadrature
points are generated ONCE at import time with ``jax.jacfwd`` on CPU and
stored as numpy constants.  Element kernels then see only small dense
constant tensors ``N_gp[(ngp, nen)]`` and ``dN_gp[(ngp, nen, dim)]`` that
XLA folds straight into fused einsums on the MXU — there is no per-element
shape-function evaluation at run time (unlike the reference's per-element
virtual calls).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

# ---------------------------------------------------------------------------
# Node layouts (reference node ordering follows the reference's conventions,
# ref: 4C_fem_general_utils_fem_shapefunctions.hpp; identical to the
# ExodusII/standard FE orderings used there).
# ---------------------------------------------------------------------------

_HEX_CORNERS = np.array(
    [
        [-1, -1, -1],
        [1, -1, -1],
        [1, 1, -1],
        [-1, 1, -1],
        [-1, -1, 1],
        [1, -1, 1],
        [1, 1, 1],
        [-1, 1, 1],
    ],
    dtype=np.float64,
)

_QUAD_CORNERS = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], dtype=np.float64)


def _n_line2(xi):
    r = xi[0]
    return np.array([0.5 * (1 - r), 0.5 * (1 + r)])


def _n_line3(xi):
    r = xi[0]
    return np.array([0.5 * r * (r - 1), 0.5 * r * (r + 1), 1 - r * r])


def _n_tri3(xi):
    r, s = xi
    return np.array([1 - r - s, r, s])


def _n_tri6(xi):
    r, s = xi
    t = 1 - r - s
    return np.array(
        [t * (2 * t - 1), r * (2 * r - 1), s * (2 * s - 1), 4 * r * t, 4 * r * s, 4 * s * t]
    )


def _n_quad4(xi):
    r, s = xi
    c = _QUAD_CORNERS
    return 0.25 * (1 + c[:, 0] * r) * (1 + c[:, 1] * s)


def _n_quad8(xi):
    r, s = xi
    c = _QUAD_CORNERS
    corner = 0.25 * (1 + c[:, 0] * r) * (1 + c[:, 1] * s) * (c[:, 0] * r + c[:, 1] * s - 1)
    mid = np.array(
        [
            0.5 * (1 - r * r) * (1 - s),
            0.5 * (1 + r) * (1 - s * s),
            0.5 * (1 - r * r) * (1 + s),
            0.5 * (1 - r) * (1 - s * s),
        ]
    )
    return np.concatenate([corner, mid])


def _n_quad9(xi):
    r, s = xi

    def l2(t):  # 1D quadratic lagrange at nodes (-1, +1, 0)
        return np.array([0.5 * t * (t - 1), 0.5 * t * (t + 1), 1 - t * t])

    lr, ls = l2(r), l2(s)
    # node layout: 4 corners, 4 edge-mids, centre
    order = [
        (0, 0),
        (1, 0),
        (1, 1),
        (0, 1),
        (2, 0),
        (1, 2),
        (2, 1),
        (0, 2),
        (2, 2),
    ]
    return np.array([lr[i] * ls[j] for i, j in order])


def _n_tet4(xi):
    r, s, t = xi
    return np.array([1 - r - s - t, r, s, t])


def _n_tet10(xi):
    r, s, t = xi
    u = 1 - r - s - t
    return np.array(
        [
            u * (2 * u - 1),
            r * (2 * r - 1),
            s * (2 * s - 1),
            t * (2 * t - 1),
            4 * r * u,
            4 * r * s,
            4 * s * u,
            4 * t * u,
            4 * r * t,
            4 * s * t,
        ]
    )


def _n_hex8(xi):
    r, s, t = xi
    c = _HEX_CORNERS
    return 0.125 * (1 + c[:, 0] * r) * (1 + c[:, 1] * s) * (1 + c[:, 2] * t)


_HEX20_EDGES = [
    (0, 1),
    (1, 2),
    (2, 3),
    (3, 0),
    (0, 4),
    (1, 5),
    (2, 6),
    (3, 7),
    (4, 5),
    (5, 6),
    (6, 7),
    (7, 4),
]


def _n_hex20(xi):
    r, s, t = xi
    c = _HEX_CORNERS
    rr = c[:, 0] * r
    ss = c[:, 1] * s
    tt = c[:, 2] * t
    corner = 0.125 * (1 + rr) * (1 + ss) * (1 + tt) * (rr + ss + tt - 2)
    mids = []
    for a, b in _HEX20_EDGES:
        m = 0.5 * (c[a] + c[b])  # midpoint; one coord is 0
        term = 0.25
        for d, x in enumerate((r, s, t)):
            if m[d] == 0:
                term = term * (1 - x * x)
            else:
                term = term * (1 + m[d] * x)
        mids.append(term)
    return np.concatenate([corner, np.array(mids)])


def _n_hex27(xi):
    r, s, t = xi

    def l2(x):
        return np.array([0.5 * x * (x - 1), 0.5 * x * (x + 1), 1 - x * x])

    lr, ls, lt = l2(r), l2(s), l2(t)
    # 8 corners, 12 edge mids (hex20 order), 6 face centres, 1 volume centre
    idx = {-1: 0, 1: 1, 0: 2}
    nodes = list(_HEX_CORNERS)
    for a, b in _HEX20_EDGES:
        nodes.append(0.5 * (_HEX_CORNERS[a] + _HEX_CORNERS[b]))
    for d, v in [(2, -1), (1, -1), (0, 1), (1, 1), (0, -1), (2, 1)]:
        f = np.zeros(3)
        f[d] = v
        nodes.append(f)
    nodes.append(np.zeros(3))
    out = []
    for n in nodes:
        out.append(lr[idx[int(n[0])]] * ls[idx[int(n[1])]] * lt[idx[int(n[2])]])
    return np.array(out)


def _n_wedge6(xi):
    r, s, t = xi
    tri = np.array([1 - r - s, r, s])
    return np.concatenate([tri * 0.5 * (1 - t), tri * 0.5 * (1 + t)])


def _n_pyramid5(xi):
    r, s, t = xi
    # standard rational-free pyramid basis (apex at t=1)
    return np.array(
        [
            0.25 * ((1 - r) * (1 - s) - t + r * s * t / (1 - t + 1e-30)),
            0.25 * ((1 + r) * (1 - s) - t - r * s * t / (1 - t + 1e-30)),
            0.25 * ((1 + r) * (1 + s) - t + r * s * t / (1 - t + 1e-30)),
            0.25 * ((1 - r) * (1 + s) - t - r * s * t / (1 - t + 1e-30)),
            t,
        ]
    )


# ---------------------------------------------------------------------------
# Gauss rules
# ---------------------------------------------------------------------------


def _gauss_1d(n):
    pts, wts = np.polynomial.legendre.leggauss(n)
    return pts, wts


def _tensor_rule(n, dim):
    p, w = _gauss_1d(n)
    if dim == 1:
        return p[:, None], w
    if dim == 2:
        P = np.array([[a, b] for b in p for a in p])
        W = np.array([wa * wb for wb in w for wa in w])
        return P, W
    P = np.array([[a, b, c] for c in p for b in p for a in p])
    W = np.array([wa * wb * wc for wc in w for wb in w for wa in w])
    return P, W


_TRI_RULES = {
    1: (np.array([[1 / 3, 1 / 3]]), np.array([0.5])),
    3: (
        np.array([[1 / 6, 1 / 6], [2 / 3, 1 / 6], [1 / 6, 2 / 3]]),
        np.array([1 / 6, 1 / 6, 1 / 6]),
    ),
    6: (
        np.array(
            [
                [0.09157621350977, 0.09157621350977],
                [0.81684757298046, 0.09157621350977],
                [0.09157621350977, 0.81684757298046],
                [0.44594849091597, 0.44594849091597],
                [0.10810301816807, 0.44594849091597],
                [0.44594849091597, 0.10810301816807],
            ]
        ),
        np.array([0.05497587182766] * 3 + [0.11169079483901] * 3),
    ),
}

_A_TET4 = 0.58541019662496845446  # (5+3*sqrt(5))/20
_B_TET4 = 0.13819660112501051518  # (5-sqrt(5))/20
_TET_RULES = {
    1: (np.array([[0.25, 0.25, 0.25]]), np.array([1 / 6])),
    4: (
        np.array(
            [
                [_B_TET4, _B_TET4, _B_TET4],
                [_A_TET4, _B_TET4, _B_TET4],
                [_B_TET4, _A_TET4, _B_TET4],
                [_B_TET4, _B_TET4, _A_TET4],
            ]
        ),
        np.array([1 / 24] * 4),
    ),
    5: (
        np.array(
            [
                [0.25, 0.25, 0.25],
                [1 / 6, 1 / 6, 1 / 6],
                [0.5, 1 / 6, 1 / 6],
                [1 / 6, 0.5, 1 / 6],
                [1 / 6, 1 / 6, 0.5],
            ]
        ),
        np.array([-2 / 15, 3 / 40, 3 / 40, 3 / 40, 3 / 40]),
    ),
}


def _wedge_rule(ntri, nline):
    tp, tw = _TRI_RULES[ntri]
    lp, lw = _gauss_1d(nline)
    P = np.array([[a[0], a[1], b] for b in lp for a in tp])
    W = np.array([wa * wb for wb in lw for wa in tw])
    return P, W


def _pyramid_rule():
    # 8-point conical product rule
    g = 1 / np.sqrt(3.0)
    zs = np.array([0.122514822655441, 0.544151844011225])
    zw = np.array([0.232547451253500, 0.100785882079825])
    P, W = [], []
    for z, wz in zip(zs, zw):
        for a in (-g, g):
            for b in (-g, g):
                P.append([a * (1 - z), b * (1 - z), z])
                W.append(wz)
    return np.array(P), np.array(W)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CellType:
    """Static description of one cell type.

    Attributes mirror what the reference keeps per `Core::FE::CellType`
    (nodes-per-element, dimension, default quadrature), but here the
    quadrature tables are precomputed dense constants.
    """

    name: str
    dim: int
    nen: int  # nodes per element
    gauss_points: np.ndarray  # (ngp, dim)
    gauss_weights: np.ndarray  # (ngp,)
    N: np.ndarray  # (ngp, nen) shape funcs at GPs
    dN: np.ndarray  # (ngp, nen, dim) parametric grads at GPs
    shape_fn: object  # callable xi -> (nen,) (numpy)
    surfaces: tuple = ()  # tuples of local node ids per face
    edges: tuple = ()

    @property
    def ngp(self) -> int:
        return self.gauss_points.shape[0]

    def eval_shape(self, xi) -> np.ndarray:
        return self.shape_fn(np.asarray(xi, dtype=np.float64))

    def eval_shape_deriv(self, xi) -> np.ndarray:
        return _num_jac(self.shape_fn, np.asarray(xi, dtype=np.float64))


def _num_jac(fn, x, eps=1e-7):
    """Central-difference jacobian of fn at x -> (nen, dim).

    Used only at table-build time (host, float64); accuracy ~1e-9 which is
    folded once into constants. Shape polynomials are low order so central
    differences at 1e-7 are exact to ~1e-9; the hot path never calls this.
    """
    x = np.asarray(x, dtype=np.float64)
    cols = []
    for d in range(x.shape[0]):
        dx = np.zeros_like(x)
        dx[d] = eps
        cols.append((fn(x + dx) - fn(x - dx)) / (2 * eps))
    return np.stack(cols, axis=-1)


def _poly_jac(fn, x):
    """Exact jacobian via Richardson-extrapolated central differences.

    All shape functions here are polynomials of order <= 3 (pyramid is
    rational but smooth away from the apex), so two central differences with
    step h and h/2 plus Richardson extrapolation give machine-precision
    derivatives for the table constants.
    """
    h = 1e-3
    j1 = _num_jac(fn, x, h)
    j2 = _num_jac(fn, x, h / 2)
    return (4 * j2 - j1) / 3


_HEX_SURFACES = (
    (0, 3, 2, 1),
    (0, 1, 5, 4),
    (1, 2, 6, 5),
    (2, 3, 7, 6),
    (3, 0, 4, 7),
    (4, 5, 6, 7),
)
_TET_SURFACES = ((0, 2, 1), (0, 1, 3), (1, 2, 3), (0, 3, 2))
_QUAD_EDGES = ((0, 1), (1, 2), (2, 3), (3, 0))
_WEDGE_SURFACES = ((0, 1, 4, 3), (1, 2, 5, 4), (2, 0, 3, 5), (0, 2, 1), (3, 4, 5))


def _make(name, dim, fn, rule, surfaces=(), edges=()):
    pts, wts = rule
    N = np.stack([fn(p) for p in pts])
    dN = np.stack([_poly_jac(fn, p) for p in pts])
    return CellType(
        name=name,
        dim=dim,
        nen=N.shape[1],
        gauss_points=pts,
        gauss_weights=wts,
        N=N,
        dN=dN,
        shape_fn=fn,
        surfaces=surfaces,
        edges=edges,
    )


_CUSTOM_CELLS: dict = {}


def register_custom_cell(cell: "CellType"):
    """Register a dynamically built cell (NURBS span groups etc.)."""
    _CUSTOM_CELLS[cell.name.lower()] = cell


@functools.lru_cache(maxsize=None)
def _get_builtin(name: str, ngp: int | None = None) -> CellType:
    """Look up a cell type, optionally with a non-default quadrature order.

    Default rules match the reference's defaults (hex8: 2x2x2, hex20/27:
    3x3x3, tet4: 4pt, tet10: 4pt, quad4: 2x2, tri3: 3pt).
    """
    name = name.lower()
    if name == "line2":
        return _make("line2", 1, _n_line2, _tensor_rule(ngp or 2, 1))
    if name == "line3":
        return _make("line3", 1, _n_line3, _tensor_rule(ngp or 3, 1))
    if name == "tri3":
        return _make("tri3", 2, _n_tri3, _TRI_RULES[ngp or 3], edges=((0, 1), (1, 2), (2, 0)))
    if name == "tri6":
        return _make("tri6", 2, _n_tri6, _TRI_RULES[ngp or 6])
    if name == "quad4":
        return _make("quad4", 2, _n_quad4, _tensor_rule(ngp or 2, 2), edges=_QUAD_EDGES)
    if name == "quad8":
        return _make("quad8", 2, _n_quad8, _tensor_rule(ngp or 3, 2), edges=_QUAD_EDGES)
    if name == "quad9":
        return _make("quad9", 2, _n_quad9, _tensor_rule(ngp or 3, 2), edges=_QUAD_EDGES)
    if name == "tet4":
        return _make("tet4", 3, _n_tet4, _TET_RULES[ngp or 4], surfaces=_TET_SURFACES)
    if name == "tet10":
        return _make("tet10", 3, _n_tet10, _TET_RULES[ngp or 4], surfaces=_TET_SURFACES)
    if name == "hex8":
        return _make("hex8", 3, _n_hex8, _tensor_rule(ngp or 2, 3), surfaces=_HEX_SURFACES)
    if name == "hex20":
        return _make("hex20", 3, _n_hex20, _tensor_rule(ngp or 3, 3), surfaces=_HEX_SURFACES)
    if name == "hex27":
        return _make("hex27", 3, _n_hex27, _tensor_rule(ngp or 3, 3), surfaces=_HEX_SURFACES)
    if name == "wedge6":
        return _make("wedge6", 3, _n_wedge6, _wedge_rule(3, ngp or 2), surfaces=_WEDGE_SURFACES)
    if name == "pyramid5":
        return _make("pyramid5", 3, _n_pyramid5, _pyramid_rule())
    raise KeyError(f"unknown cell type {name!r}")


def get_cell(name: str, ngp: int | None = None) -> CellType:
    nm = name.lower()
    if nm in _CUSTOM_CELLS:
        return _CUSTOM_CELLS[nm]
    return _get_builtin(nm, ngp)


# Face cell type for each volume cell's surfaces (used for Neumann loads)
FACE_TYPE = {
    "hex8": "quad4",
    "hex20": "quad8",
    "hex27": "quad9",
    "tet4": "tri3",
    "tet10": "tri6",
    "quad4": "line2",
    "quad8": "line3",
    "quad9": "line3",
    "tri3": "line2",
    "tri6": "line3",
}

ALL_CELLS = [
    "line2",
    "line3",
    "tri3",
    "tri6",
    "quad4",
    "quad8",
    "quad9",
    "tet4",
    "tet10",
    "hex8",
    "hex20",
    "hex27",
    "wedge6",
    "pyramid5",
]
