"""Dual-mortar Lagrange contact: patch test + semismooth active set.

Counterpart of the reference's contact patch tests (non-matching interface
meshes transferring a constant pressure exactly — the defining property of
consistent segment-based dual mortar; ref: src/contact +
tests/input_files contact patch decks).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fourc_tpu.contact.mortar import MortarContactCondition
from fourc_tpu.core import gridgen
from fourc_tpu.core.conditions import DirichletBC, NeumannBC
from fourc_tpu.materials import make_material
from fourc_tpu.physics import solid as ps


def _two_block_stack(nxa=4, nxb=3):
    """Bottom box [0,1]^2 x [0,1] (nxa x nxa x 2), top box (nxb x nxb x 2)
    on [0,1]^2 x [1,2] — NON-matching horizontal meshes at the z=1
    interface."""
    a = gridgen.box(nxa, nxa, 2, hi=(1.0, 1.0, 1.0))
    b = gridgen.box(nxb, nxb, 2, lo=(0.0, 0.0, 1.0), hi=(1.0, 1.0, 2.0))
    return gridgen.merge(a, b)


def _patch_field(disc, E=100.0, p=1.0, cn=100.0, kinem="linear"):
    mat = make_material({"type": "stvenantkirchhoff", "youngs": E,
                         "nue": 0.0, "density": 1.0})
    params = ps.SolidParams(kinem=kinem, dyntype="statics")
    params.newton.tol_res = 1e-11
    params.newton.tol_disp = 1e-12
    params.newton.lin_rtol = 1e-12
    params.newton.lin_adaptive = False
    params.newton.max_iter = 30
    params.newton.lin_maxiter = 2000
    dbc = [
        DirichletBC(disc.node_sets["a_zmin"], [1, 1, 1], [0, 0, 0]),
        # lateral dofs everywhere: exact solution has ux = uy = 0 (nue=0);
        # also removes the frictionless top block's sliding rigid modes
        DirichletBC(disc.node_sets["all"], [1, 1, 0], [0, 0, 0]),
    ]
    neu = [NeumannBC(disc.face_sets["b_zmax"], [0, 0, 1], [0, 0, -p])]
    cond = MortarContactCondition(
        slave_faces=disc.face_sets["b_zmin"],
        master_faces=disc.face_sets["a_zmax"], cn=cn)
    return ps.SolidField(disc, {1: mat}, params, dirichlet=dbc, neumann=neu,
                         mortar_contact=[cond])


def test_gap_sign_and_weights():
    """Weighted gaps: zero at touching interface; d sums to the interface
    area; separating the top block gives positive gaps."""
    disc = _two_block_stack()
    f = _patch_field(disc)
    c = f.mortar_contact[0]
    x0 = jnp.asarray(disc.coords)
    gt, d = c.gaps(x0)
    np.testing.assert_allclose(np.asarray(gt), 0.0, atol=1e-12)
    assert float(d.sum()) == pytest.approx(1.0, abs=1e-10)  # unit interface
    # lift the top body by delta: weighted gap = delta * d
    delta = 0.01
    lift = np.zeros_like(disc.coords)
    lift[disc.node_sets["b_all"], 2] = delta
    gt2, d2 = c.gaps(x0 + jnp.asarray(lift))
    np.testing.assert_allclose(np.asarray(gt2), delta * np.asarray(d2),
                               rtol=1e-9)


def test_contact_patch_pressure_transfer():
    """Constant pressure crosses the non-matching interface exactly:
    lambda = p and u_z = -p z / E to solver tolerance."""
    E, p = 100.0, 1.0
    disc = _two_block_stack()
    f = _patch_field(disc, E=E, p=p)
    state = ps.compute_initial_state(f, ps.init_state(f))
    step = ps.make_step(f, dt=1.0)
    state, stats = step(state)
    assert bool(stats["converged"])
    lam = np.asarray(state["lam"])
    # multiplier = contact pressure = applied pressure, every slave node
    np.testing.assert_allclose(lam, p, rtol=1e-8)
    uz = np.asarray(state["d"]).reshape(-1, 3)[:, 2]
    z = np.asarray(disc.coords)[:, 2]
    np.testing.assert_allclose(uz, -p * z / E, atol=1e-9)


def test_active_set_deactivates_on_separation():
    """Displacement-driven lift of the top block leaves the whole active
    set inactive (lambda = 0, no spurious adhesion).  (A traction-driven
    lift has no static solution — the separated body would be a free body
    under net force — so the separation is prescribed.)"""
    disc = _two_block_stack()
    lift = 0.05
    mat = make_material({"type": "stvenantkirchhoff", "youngs": 100.0,
                         "nue": 0.0, "density": 1.0})
    params = ps.SolidParams(kinem="linear", dyntype="statics")
    params.newton.tol_res = 1e-11
    params.newton.tol_disp = 1e-12
    params.newton.lin_rtol = 1e-12
    params.newton.lin_adaptive = False
    params.newton.max_iter = 30
    params.newton.lin_maxiter = 2000
    dbc = [
        DirichletBC(disc.node_sets["a_zmin"], [1, 1, 1], [0, 0, 0]),
        DirichletBC(disc.node_sets["all"], [1, 1, 0], [0, 0, 0]),
        DirichletBC(disc.node_sets["b_zmax"], [0, 0, 1], [0, 0, lift]),
    ]
    cond = MortarContactCondition(
        slave_faces=disc.face_sets["b_zmin"],
        master_faces=disc.face_sets["a_zmax"], cn=100.0)
    f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc,
                      mortar_contact=[cond])
    state = ps.compute_initial_state(f, ps.init_state(f))
    step = ps.make_step(f, dt=1.0)
    state, stats = step(state)
    assert bool(stats["converged"])
    np.testing.assert_allclose(np.asarray(state["lam"]), 0.0, atol=1e-10)
    # top block floats up rigidly: positive gap, bottom block unstressed
    uzb = np.asarray(state["d"]).reshape(-1, 3)[disc.node_sets["b_all"], 2]
    np.testing.assert_allclose(uzb, lift, atol=1e-9)
    uza = np.asarray(state["d"]).reshape(-1, 3)[disc.node_sets["a_all"], 2]
    np.testing.assert_allclose(uza, 0.0, atol=1e-9)


def _hertz_run(nx_base=None, grade_base=1.45):
    """Shared Hertz cylinder-on-plane setup; returns the converged contact
    data.  nx_base/grade_base control the FOUNDATION interface mesh —
    defaults match the cap (the anchored configuration); different values
    give a genuinely NON-matching graded contact interface."""
    E, nu, R = 200.0, 0.3, 8.0
    L = 0.1  # slab thickness (y)
    a_half, h_cap = 1.6, 2.4  # cap footprint half-width and height
    nxc, nzc = 48, 16  # cap mesh
    p_top = 1.2  # applied traction on the cap top
    F = p_top * 2 * a_half * L  # total force
    Fprime = F / L  # force per unit length
    Estar = E / (2 * (1 - nu * nu))
    b = np.sqrt(4 * Fprime * R / (np.pi * Estar))  # half width
    p_max = np.sqrt(Fprime * Estar / (np.pi * R))
    assert b < 0.5 * a_half  # cap approximation valid

    # cap: box [-a,a] x [0,L] x [0,h]; curve the bottom onto the circle
    # x^2 + (z - R)^2 = R^2, blending to flat at the top.  Graded x spacing
    # concentrates elements in the contact zone.
    cap = gridgen.box(nxc, 1, nzc, lo=(-a_half, 0.0, 0.0),
                      hi=(a_half, L, h_cap))
    cx = cap.coords[:, 0] / a_half  # [-1, 1]
    cap.coords[:, 0] = a_half * np.arctanh(cx * np.tanh(1.45)) / 1.45
    drop = R - np.sqrt(R * R - cap.coords[:, 0] ** 2)
    blend = 1.0 - cap.coords[:, 2] / h_cap
    cap.coords[:, 2] = cap.coords[:, 2] + drop * blend
    cap.structured_shape = None  # curved: not a lattice

    # foundation block below (same material; E* combines both bodies).
    # Default: MATCHED footprint/grading with the cap — dual-LM nodal
    # multipliers on non-matching graded interfaces show a +-10% moire
    # checkerboard (total force stays exact), so the RAW-nodal anchor
    # keeps the interfaces matched; the non-matching variant validates
    # the SMOOTHED pressures instead.  Depth 2 x cap height: a shallow
    # foundation raises the Hertz peak several % (half-space assumption).
    nxb = nx_base if nx_base is not None else nxc
    base = gridgen.box(nxb, 1, 16, lo=(-a_half, 0.0, -3.2), hi=(a_half, L, 0.0))
    bx = base.coords[:, 0] / a_half
    base.coords[:, 0] = a_half * np.arctanh(
        bx * np.tanh(grade_base)) / grade_base
    base.structured_shape = None
    disc = gridgen.merge(base, cap)

    mat = make_material({"type": "stvenantkirchhoff", "youngs": E,
                         "nue": nu, "density": 1.0})
    params = ps.SolidParams(kinem="linear", dyntype="statics")
    params.newton.tol_res = 1e-9
    params.newton.tol_disp = 1e-10
    params.newton.lin_rtol = 1e-10
    params.newton.lin_adaptive = False
    params.newton.max_iter = 40
    params.newton.lin_maxiter = 4000
    params.newton.gmres_restart = 200
    dbc = [
        DirichletBC(disc.node_sets["a_zmin"], [1, 1, 1], [0, 0, 0]),
        DirichletBC(disc.node_sets["all"], [0, 1, 0], [0, 0, 0]),  # p. strain
        # symmetry-like lateral guide for the cap's rigid x mode
        DirichletBC(disc.node_sets["b_zmax"], [1, 0, 0], [0, 0, 0]),
    ]
    neu = [NeumannBC(disc.face_sets["b_zmax"], [0, 0, 1], [0, 0, -p_top])]
    cond = MortarContactCondition(
        slave_faces=disc.face_sets["b_zmin"],
        master_faces=disc.face_sets["a_zmax"], cn=50.0,
        search_factor=12.0)
    f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc, neumann=neu,
                      mortar_contact=[cond])
    state = ps.compute_initial_state(f, ps.init_state(f))
    step = ps.make_step(f, dt=1.0)
    state, stats = step(state)
    assert bool(stats["converged"])

    lam = np.asarray(state["lam"])
    c = f.mortar_contact[0]
    sx = np.asarray(disc.coords)[np.asarray(c.snodes), 0]
    x = np.asarray(disc.coords) + np.asarray(state["d"]).reshape(-1, 3)
    import jax.numpy as jnp

    smooth = np.asarray(c.smoothed_pressure(jnp.asarray(x),
                                            jnp.asarray(lam)))
    hx_local = np.diff(np.unique(np.round(sx, 12))).min()
    return dict(lam=lam, smooth=smooth, sx=sx, p_max=p_max, b=b,
                hx=hx_local)


def test_hertz_cylinder_pressure():
    """Hertz cylinder-on-plane (plane strain): max contact pressure within
    a few % of  p_max = sqrt(F' E* / (pi R)).

    The cylinder is modelled as a near-contact cap (bottom surface on the
    circle of radius R — valid for contact half-width b << R), one element
    thick in y with all y dofs fixed (plane strain).  Both bodies share E,
    nu -> 1/E* = 2 (1 - nu^2)/E.  (ref: the Hertz validation decks of the
    reference's contact test suite.)
    """
    r = _hertz_run()
    lam, sx, p_max, b = r["lam"], r["sx"], r["p_max"], r["b"]
    # peak pressure (slave nodes live on y=0 and y=L planes; same x)
    # +3.5% systematic: finite foundation/cap depth vs the analytic
    # half-space (measured to converge toward p_max with depth)
    assert lam.max() == pytest.approx(p_max, rel=0.05)
    # contact half-width: outermost active node within one element size
    act = sx[lam > 1e-3 * lam.max()]
    assert abs(np.abs(act).max() - b) < 3 * r["hx"]
    # pressure profile matches the Hertz ellipse where active
    p_ref = p_max * np.sqrt(np.clip(1 - (sx / b) ** 2, 0.0, None))
    mask = np.abs(sx) < 0.7 * b
    np.testing.assert_allclose(lam[mask], p_ref[mask], rtol=0.08)


def test_hertz_nonmatching_smoothed_pressure():
    """NON-matching graded Hertz interface (40 vs 48 elements, different
    grading): the post-processed smoothed pressures match the Hertz
    ellipse with the same tolerances as the matched raw anchor — the
    observable the raw dual-LM multipliers cannot provide there (±10%
    moire; mortar on non-matching meshes is the reference's core use
    case, ref: src/mortar/4C_mortar_interface.cpp:3366)."""
    r = _hertz_run(nx_base=40, grade_base=1.2)
    smooth, sx, p_max, b = r["smooth"], r["sx"], r["p_max"], r["b"]
    assert smooth.max() == pytest.approx(p_max, rel=0.06)
    p_ref = p_max * np.sqrt(np.clip(1 - (sx / b) ** 2, 0.0, None))
    mask = np.abs(sx) < 0.7 * b
    np.testing.assert_allclose(smooth[mask], p_ref[mask], rtol=0.08)
    # and the total transmitted force stays exact regardless of matching
    # (checked through equilibrium by the converged solve itself)
