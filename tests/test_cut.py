"""Level-set cut / CutFEM (XFEM foundations) tests.

Oracles follow CutFEM theory (which the reference's cut library also
relies on; ref: src/cut volume-cell tessellation + src/xfem Nitsche
coupling): exact area of tessellated volume cells, linear exactness of
the Nitsche-imposed Dirichlet problem, and mesh convergence.
"""

import numpy as np

from fourc_tpu.core import gridgen
from fourc_tpu.cut.levelset import CutMesh2D, solve_poisson_cut

R = 0.7


def _bg(n):
    d = gridgen.rectangle(n, n, lo=(-1, -1), hi=(1, 1), cell="quad4")
    coords = np.asarray(d.coords)
    conn = np.asarray(d.blocks["quad4"].conn)
    phi = np.sqrt(coords[:, 0] ** 2 + coords[:, 1] ** 2) - R
    return coords, conn, phi


def test_cut_cells_tessellate_to_circle_area():
    coords, conn, phi = _bg(40)
    cm = CutMesh2D(coords, conn, phi)
    # area = full inside elements + cut-cell quadrature weights
    h = 2.0 / 40
    area = len(cm.inside) * h * h + cm.qcut_wts.sum()
    assert abs(area - np.pi * R**2) < 3e-3 * np.pi * R**2
    # interface length ~ circumference
    length = cm.sif_wts.sum()
    assert abs(length - 2 * np.pi * R) < 2e-2 * 2 * np.pi * R


def test_cutfem_nitsche_linear_exactness():
    coords, conn, phi = _bg(16)
    u, cm = solve_poisson_cut(coords, conn, phi, lambda x, y: x, source=0.0)
    act = cm.active_nodes
    err = np.abs(u[act] - coords[act, 0])
    assert err.max() < 1e-9, err.max()


def test_cutfem_converges_quadratic_solution():
    """u = x^2 + y^2, f = -4: not in Q1 -> discretization error must drop
    ~O(h^2) under refinement."""

    def solve(n):
        coords, conn, phi = _bg(n)
        u, cm = solve_poisson_cut(coords, conn, phi,
                                  lambda x, y: x * x + y * y, source=-4.0)
        act = cm.active_nodes
        uex = np.sum(coords**2, axis=1)
        # compare on safely-interior nodes
        inner = act & (np.sqrt(np.sum(coords**2, 1)) < R - 0.15)
        return np.abs(u[inner] - uex[inner]).max()

    e1, e2 = solve(10), solve(20)
    assert e2 < 0.4 * e1, (e1, e2)
