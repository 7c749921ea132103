"""NURBS/B-spline discretization tests.

Oracles mirror what the reference's nurbs_discretization guarantees
(ref: src/core/fem/src/nurbs_discretization): partition of unity, exact
polynomial reproduction up to the degree, and a converged patch solve.
"""

import numpy as np

from fourc_tpu.core import cells, nurbs
from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver


def test_basis_partition_of_unity_and_linear_precision():
    for p in (2, 3):
        d = nurbs.patch_rectangle(4, 3, degree=p, lo=(0, 0), hi=(2, 1),
                                  name=f"pu{p}")
        X = np.asarray(d.coords)
        for key, blk in d.blocks.items():
            c = cells.get_cell(key)
            assert np.abs(c.N.sum(axis=1) - 1.0).max() < 1e-12
            # linear precision: sum_a N_a x_a reproduces the geometry map,
            # d(x)/dxi consistent with the span width
            Xe = X[blk.conn]  # (e, nen, 2)
            xg = np.einsum("ga,ead->egd", c.N, Xe)
            assert np.all(xg[:, :, 0] >= -1e-12)
            assert np.all(xg[:, :, 0] <= 2 + 1e-12)


def test_quadratic_bspline_reproduces_x_squared():
    """Stationary diffusion, D=1, source s = -2, u(0)=0, u(1)=1 ->
    u = x^2 exactly representable by p=2 B-splines: Galerkin gives the
    exact solution (superconvergence oracle)."""
    res = driver.run(dm.load("""
problem: {type: scatra}
scatra_dynamic: {dynamictype: stationary, numstep: 1, timestep: 1.0,
                 maxiter: 8, tolres: 1e-9, toldisp: 1e-8, normcombi: or}
solver: {method: cg, precond: jacobi, maxiter: 2000, rtol: 1e-12}
functions:
  1: "0 - 2.0"
materials:
  1: {type: scatra, diffusivity: 1.0}
geometry:
  generator: {kind: nurbs_patch, nx: 5, ny: 3, degree: 2, name: scatra}
conditions:
  dirichlet:
    - {nodes: xmin, onoff: [1], val: [0.0]}
    - {nodes: xmax, onoff: [1], val: [1.0]}
  body_force:
    - {val: [1.0], funct: [1]}
"""))
    f = res.fields["scatra"].f
    phi = np.asarray(res.states["scatra"]["phi"])
    X = np.asarray(f.disc.coords)
    # evaluate u at all Gauss points of all spans and compare to x^2
    err = 0.0
    for key in f.dofmap.blocks:
        c = cells.get_cell(key)
        conn = np.asarray(f.dofmap.blocks[key].conn)
        u_g = np.einsum("ga,ea->eg", c.N, phi[conn])
        x_g = np.einsum("ga,ea->eg", c.N, X[conn][:, :, 0])
        err = max(err, np.abs(u_g - x_g**2).max())
    assert err < 1e-8, err


def test_rational_quarter_annulus_exact_geometry():
    """Rational weights (1, 1/sqrt2, 1) represent the circle EXACTLY: the
    mapped radius is constant along the arc at machine precision — a plain
    B-spline cannot do this (ref: nurbs_discretization control-point
    weights)."""
    import numpy as np

    from fourc_tpu.core import cells as _cells
    from fourc_tpu.core.nurbs import patch_quarter_annulus

    r_in, r_out = 1.0, 2.0
    d = patch_quarter_annulus(r_in, r_out, gp1=4)
    (key, blk), = d.blocks.items()
    cell = _cells.get_cell(key)
    P = np.asarray(d.coords)[np.asarray(blk.conn[0])]  # (nen, 2)
    X = np.asarray(cell.N) @ P  # (g, 2) mapped Gauss points
    r = np.linalg.norm(X, axis=1).reshape(4, 4)  # (radial g, arc g)
    # constant radius along the arc direction, machine exact
    assert np.abs(r - r[:, :1]).max() < 1e-13
    assert r.min() > r_in and r.max() < r_out
    # area via the tabulated derivatives (quadrature of a rational map:
    # tight but not machine-exact)
    dN = np.asarray(cell.dN)  # (g, nen, 2)
    J = np.einsum("gak,ad->gkd", dN, P)
    detJ = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
    area = float(np.asarray(cell.gauss_weights) @ np.abs(detJ))
    exact = 0.25 * np.pi * (r_out**2 - r_in**2)
    assert abs(area - exact) / exact < 2e-4, (area, exact)


def test_rational_patch_poisson_runs():
    """Scalar diffusion on the exact annulus solves and honors Dirichlet
    data (1 on the inner arc, 0 on the outer): the analytic solution is
    log(r_out/r)/log(r_out/r_in); the single-element patch reproduces the
    boundary values and the monotone radial profile."""
    import numpy as np

    from fourc_tpu.core.conditions import DirichletBC
    from fourc_tpu.core.nurbs import patch_quarter_annulus
    from fourc_tpu.materials import make_material
    from fourc_tpu.physics import scalar_transport as st

    d = patch_quarter_annulus(1.0, 2.0, gp1=4)
    mat = make_material({"type": "scatra", "diffusivity": 1.0})
    params = st.ScalarParams(dyntype="stationary")
    params.newton.tol_res = 1e-12
    # xmin/xmax of the control net = radial min/max rows
    dbc = [DirichletBC(d.node_sets["xmin"], [1], [1.0]),
           DirichletBC(d.node_sets["xmax"], [1], [0.0])]
    f = st.ScalarField(d, {1: mat}, params, dirichlet=dbc)
    state = st.init_state(f)
    step = st.make_step(f, dt=1.0)
    state, stats = step(state)
    phi = np.asarray(state["phi"])
    assert np.all(np.isfinite(phi))
    # control values: inner row 1, outer row 0, middle row in between
    assert np.allclose(phi[np.asarray(d.node_sets["xmin"])], 1.0, atol=1e-10)
    assert np.allclose(phi[np.asarray(d.node_sets["xmax"])], 0.0, atol=1e-10)
    mid = phi[3:6]
    assert np.all((mid > 0.1) & (mid < 0.9))
