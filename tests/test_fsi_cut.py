"""Cut-based FSI (XFSI analog, ref: src/fsi_xfem): consistent traction
extraction on an embedded interface + a two-way coupled spring-mounted
wall driven by Couette shear.

The fluid field above an embedded flat wall under a moving lid is LINEAR,
hence exactly representable by the Q1 CutFEM space — traction extraction
and the coupled trajectory can therefore be checked against analytic
values at solver precision (the FSI analog of a patch test).
"""

import numpy as np
import pytest

from fourc_tpu.cut.fsi_cut import step_partitioned

pytestmark = pytest.mark.minimal

YI = 0.48  # embedded wall height — cuts element interiors on a 9x9 grid
U_LID = 1.0
MU = 3.0


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


def _setup(v_wall):
    """Couette above an embedded wall moving at (v_wall, 0).

    Exact: u(y) = v_wall + (U - v_wall)(y - YI)/(1 - YI), v = 0, p = 0.
    """
    nx = 9
    coords, conn = _grid(nx)
    phi = YI - coords[:, 1]  # fluid (phi < 0) ABOVE the wall
    s = (U_LID - v_wall) / (1.0 - YI)  # exact shear rate

    # exact field AND its linear ghost extension (cut-element dofs below
    # the interface carry the extension value in an exactly-reproduced
    # CutFEM solution)
    def u_exact(y):
        return v_wall + s * (y - YI)

    # all outer walls except the (fully inactive) bottom; inactive nodes
    # are skipped by the solver's strong-Dirichlet application
    side = np.where(
        (coords[:, 0] < 1e-12) | (coords[:, 0] > 1 - 1e-12)
        | (coords[:, 1] > 1 - 1e-12))[0]
    sd = [
        (side, 0, lambda x, y: u_exact(y)),
        (side, 1, lambda x, y: 0.0),
    ]
    return coords, conn, phi, sd, s


def test_embedded_wall_traction_exact():
    v_wall = 0.0
    coords, conn, phi, sd, s = _setup(v_wall)
    u, p, cm, F = step_partitioned(
        coords, conn, phi, MU, lambda x, y: (v_wall, 0.0),
        strong_dirichlet=sd)
    act = np.where(cm.active_nodes)[0]
    y = coords[act, 1]
    np.testing.assert_allclose(u[act, 0], v_wall + s * (y - YI), atol=1e-8)
    # fluid drags the wall in +x with the exact shear force mu * s * L
    np.testing.assert_allclose(F[0], MU * s * 1.0, rtol=1e-8)
    np.testing.assert_allclose(F[1], 0.0, atol=1e-7)


def test_two_way_spring_wall_trajectory():
    """Spring-mounted wall under Couette shear: the partitioned XFSI loop
    must track the analytic-traction ODE exactly (the fluid solve is exact
    for every wall velocity)."""
    m, k, dt = 2.0, 5.0, 0.05
    n_steps = 6

    def fluid_force(v):  # analytic traction on the wall
        return MU * (U_LID - v) / (1.0 - YI)

    # reference trajectory: same semi-implicit scheme, analytic force
    d_ref, v_ref, traj_ref = 0.0, 0.0, []
    for _ in range(n_steps):
        v_ref = v_ref + dt / m * (fluid_force(v_ref) - k * d_ref)
        d_ref = d_ref + dt * v_ref
        traj_ref.append(d_ref)

    d, v, traj = 0.0, 0.0, []
    for _ in range(n_steps):
        coords, conn, phi, sd, _ = _setup(v)
        vi = float(v)
        _, _, _, F = step_partitioned(
            coords, conn, phi, MU, lambda x, y: (vi, 0.0),
            strong_dirichlet=sd)
        v = v + dt / m * (F[0] - k * d)
        d = d + dt * v
        traj.append(d)

    np.testing.assert_allclose(traj, traj_ref, rtol=1e-7)
    assert traj[-1] > 0  # the wall actually moved with the flow
