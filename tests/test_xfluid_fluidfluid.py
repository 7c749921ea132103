"""Fluid-fluid CutFEM coupling: two-phase Stokes across an embedded,
non-mesh-aligned interface (ref: src/fluid_xfluid 4C_fluid_xfluid_fluid.*).

Two-layer Couette flow has a piecewise-linear exact velocity (kinked at the
viscosity jump) that the doubled-dof Q1 CutFEM space represents EXACTLY,
so the consistent Nitsche coupling must reproduce it to solver precision —
the fluid-fluid analog of a patch test.
"""

import numpy as np
import pytest

from fourc_tpu.cut.xfluid_fluidfluid import solve_stokes_two_fluid

pytestmark = pytest.mark.minimal

YI = 0.52  # interface height — cuts through element interiors on an 8x8 grid


def _grid(nx):
    xs = np.linspace(0.0, 1.0, nx + 1)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    coords = np.stack([X.reshape(-1), Y.reshape(-1)], axis=1)
    nid = np.arange((nx + 1) ** 2).reshape(nx + 1, nx + 1)
    conn = np.stack([
        nid[:-1, :-1].reshape(-1), nid[1:, :-1].reshape(-1),
        nid[1:, 1:].reshape(-1), nid[:-1, 1:].reshape(-1),
    ], axis=1)
    return coords, conn


def _couette_exact(mu_m, mu_p, U=1.0):
    tau = U / (YI / mu_m + (1.0 - YI) / mu_p)  # continuous shear stress

    def u_minus(y):
        return tau * y / mu_m

    def u_plus(y):
        return tau * YI / mu_m + tau * (y - YI) / mu_p

    return u_minus, u_plus, tau


@pytest.mark.parametrize("mu_m,mu_p", [(1.0, 1.0), (1.0, 10.0), (5.0, 0.5)])
def test_two_fluid_couette_exact(mu_m, mu_p):
    nx = 8
    coords, conn = _grid(nx)
    phi = coords[:, 1] - YI  # minus phase below the interface
    u_m, u_p, tau = _couette_exact(mu_m, mu_p)

    boundary = np.where(
        (coords[:, 0] < 1e-12) | (coords[:, 0] > 1 - 1e-12)
        | (coords[:, 1] < 1e-12) | (coords[:, 1] > 1 - 1e-12))[0]
    sd = [
        (boundary, 0, lambda x, y: u_m(y), 0),  # minus-side exact profile
        (boundary, 0, lambda x, y: u_p(y), 1),  # plus-side exact profile
        (boundary, 1, lambda x, y: 0.0),        # v = 0 both sides
    ]
    um, pm, up, pp, (cm_m, cm_p) = solve_stokes_two_fluid(
        coords, conn, phi, mu_m, mu_p, strong_dirichlet=sd)

    am = np.where(cm_m.active_nodes)[0]
    ap = np.where(cm_p.active_nodes)[0]
    np.testing.assert_allclose(
        um[am, 0], u_m(coords[am, 1]), atol=1e-9,
        err_msg="minus-phase velocity not exact")
    np.testing.assert_allclose(
        up[ap, 0], u_p(coords[ap, 1]), atol=1e-9,
        err_msg="plus-phase velocity not exact")
    np.testing.assert_allclose(um[am, 1], 0.0, atol=1e-9)
    np.testing.assert_allclose(up[ap, 1], 0.0, atol=1e-9)
    np.testing.assert_allclose(pm[am], 0.0, atol=1e-7 * max(mu_m, mu_p))
    np.testing.assert_allclose(pp[ap], 0.0, atol=1e-7 * max(mu_m, mu_p))


def test_velocity_jump_is_zero_on_interface():
    """[u] = 0 holds at interface quadrature points (weak continuity)."""
    nx = 8
    coords, conn = _grid(nx)
    phi = coords[:, 1] - YI
    u_m, u_p, _ = _couette_exact(1.0, 10.0)
    boundary = np.where(
        (coords[:, 0] < 1e-12) | (coords[:, 0] > 1 - 1e-12)
        | (coords[:, 1] < 1e-12) | (coords[:, 1] > 1 - 1e-12))[0]
    sd = [
        (boundary, 0, lambda x, y: u_m(y), 0),
        (boundary, 0, lambda x, y: u_p(y), 1),
        (boundary, 1, lambda x, y: 0.0),
    ]
    um, _, up, _, (cm_m, _) = solve_stokes_two_fluid(
        coords, conn, phi, 1.0, 10.0, strong_dirichlet=sd)

    from fourc_tpu.cut.levelset import _inv_map, _quad_N
    for pq, e in zip(cm_m.sif_pts, cm_m.sif_ele):
        ce = conn[e]
        N = _quad_N(_inv_map(coords[ce], pq))
        jm = N @ um[ce] - N @ up[ce]
        assert np.abs(jm).max() < 1e-8
