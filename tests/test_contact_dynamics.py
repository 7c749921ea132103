"""Dynamic + frictional mortar-Lagrange contact, per-step broad phase.

Counterparts of the reference's dynamic contact capability
(ref: src/contact 4C_contact_lagrange_strategy.cpp semismooth active set
driven from the structure_new gen-alpha integrator;
4C_contact_friction_node.cpp stick/slip states; per-step search
src/mortar/4C_mortar_binarytree.cpp).
"""

import numpy as np
import pytest

from fourc_tpu.contact.mortar import MortarContactCondition
from fourc_tpu.core import gridgen
from fourc_tpu.core.conditions import DirichletBC, NeumannBC
from fourc_tpu.materials import make_material
from fourc_tpu.physics import solid as ps


def _two_blocks(gap=0.02, nx=3, nz=2, friction_mu=0.0, cn=100.0,
                refresh_frac=0.5):
    """Upper block (b_*) hovering `gap` above lower block (a_*)."""
    base = gridgen.box(nx, nx, nz, lo=(0, 0, 0), hi=(1, 1, 0.4))
    top = gridgen.box(nx, nx, nz, lo=(0, 0, 0.4 + gap),
                      hi=(1, 1, 0.8 + gap))
    disc = gridgen.merge(base, top)
    disc.structured_shape = None
    cond = MortarContactCondition(
        slave_faces=disc.face_sets["b_zmin"],
        master_faces=disc.face_sets["a_zmax"], cn=cn,
        friction_mu=friction_mu, refresh_frac=refresh_frac,
        search_factor=8.0)
    return disc, cond


def test_dynamic_impact_no_penetration_energy_bounded():
    """Falling block impacts a fixed base under gen-alpha: contact closes,
    penetration stays ~0, and total mechanical energy never grows."""
    disc, cond = _two_blocks(gap=0.02)
    E = 1000.0
    mat = make_material({"type": "stvenantkirchhoff", "youngs": E,
                         "nue": 0.3, "density": 1.0})
    params = ps.SolidParams(
        kinem="linear", dyntype="genalpha",
        genalpha=ps.GenAlphaParams(rho_inf=0.8))
    params.newton.tol_res = 1e-8
    params.newton.tol_disp = 1e-9
    params.newton.max_iter = 30
    params.newton.lin_maxiter = 2000
    dbc = [DirichletBC(disc.node_sets["a_zmin"], [1, 1, 1], [0, 0, 0])]
    f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc,
                      mortar_contact=[cond])
    state = ps.init_state(f)
    # downward rigid velocity on the top block
    v0 = np.zeros((disc.n_nodes, 3))
    v0[disc.node_sets["b_all"], 2] = -1.0
    state["v"] = state["v"].reshape(-1, 3).at[:].set(v0).reshape(-1)
    state = ps.compute_initial_state(f, state)
    dt = 0.004
    step = ps.make_step(f, dt=dt)

    def energy(st):
        v = np.asarray(st["v"])
        ke = 0.5 * float(v @ np.asarray(f.mass_matvec(st["v"])))
        d = st["d"]
        fi, _ = f.internal_force(d)
        # linear kinematics: strain energy = 1/2 d.K d = 1/2 d.fint
        se = 0.5 * float(np.asarray(d) @ np.asarray(fi))
        return ke + se

    e0 = energy(state)
    emax = e0
    lam_peak = 0.0
    min_gapz = np.inf
    for _ in range(18):
        state, stats = step(state)
        assert bool(stats["converged"])
        e = energy(state)
        emax = max(emax, e)
        assert e <= 1.02 * e0 + 1e-12, "energy grew during impact"
        lam_peak = max(lam_peak, float(np.asarray(state["lam"]).max()))
        x = np.asarray(disc.coords) + np.asarray(state["d"]).reshape(-1, 3)
        top_lo = x[disc.node_sets["b_zmin"], 2].min()
        base_hi = x[disc.node_sets["a_zmax"], 2].max()
        min_gapz = min(min_gapz, top_lo - base_hi)
    assert lam_peak > 0.0, "contact never activated"
    # penetration bounded by a tiny fraction of the element size
    # weighted-gap (not pointwise) enforcement: nodal penetration up to
    # ~0.5% of the element size is nominal mortar behavior
    assert min_gapz > -2e-3


def test_friction_traction_cone():
    """Pressed block driven tangentially: the tangential multiplier
    saturates at mu * p (Coulomb cone), verified against the analytic
    stick-slip threshold."""
    mu = 0.3
    disc, cond = _two_blocks(gap=0.0, friction_mu=mu, cn=200.0)
    E = 1000.0
    mat = make_material({"type": "stvenantkirchhoff", "youngs": E,
                         "nue": 0.0, "density": 1.0})
    params = ps.SolidParams(kinem="linear", dyntype="statics")
    params.newton.tol_res = 1e-9
    params.newton.tol_disp = 1e-10
    params.newton.max_iter = 40
    params.newton.lin_maxiter = 3000
    p_n = 5.0
    # drive the top face sideways far enough to force slip everywhere
    slide = 0.05
    dbc = [
        DirichletBC(disc.node_sets["a_zmin"], [1, 1, 1], [0, 0, 0]),
        DirichletBC(disc.node_sets["b_zmax"], [1, 1, 0], [slide, 0, 0],
                    funct=[1, 0, 0]),
    ]
    neu = [NeumannBC(disc.face_sets["b_zmax"], [0, 0, 1], [0, 0, -p_n])]
    from fourc_tpu.core.functions import FunctionManager

    fm = FunctionManager()
    fm.add(1, "t")
    f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc, neumann=neu,
                      mortar_contact=[cond], functions=fm)
    state = ps.compute_initial_state(f, ps.init_state(f))
    step = ps.make_step(f, dt=1.0)
    state, stats = step(state)
    assert bool(stats["converged"])
    S = f.mortar_contact[0].S
    lam = np.asarray(state["lam"])
    lam_n, lam_t = lam[:S], lam[S:].reshape(S, 2)
    act = lam_n > 0.1 * lam_n.max()
    # interior active nodes: tangential traction on the Coulomb cone
    tmag = np.linalg.norm(lam_t, axis=1)
    ratio = tmag[act] / (mu * lam_n[act])
    np.testing.assert_allclose(ratio, 1.0, atol=0.05)
    # sign convention: λ_t is the traction ON THE MASTER — parallel to the
    # slave's slip direction (+x); the slave feels −λ_t (resisting).  In
    # the nodal tangent basis with n = −z: t1 = +y, t2 = +x, so the
    # x-traction is component 1.
    assert np.all(lam_t[act, 1] > 0)


def test_friction_stick_no_slip():
    """Tangential drive below the stick threshold: interface slip ~ 0 and
    the top block shears elastically (tau/G per unit height)."""
    mu = 0.8
    disc, cond = _two_blocks(gap=0.0, friction_mu=mu, cn=200.0)
    E, nu = 1000.0, 0.0
    mat = make_material({"type": "stvenantkirchhoff", "youngs": E,
                         "nue": nu, "density": 1.0})
    params = ps.SolidParams(kinem="linear", dyntype="statics")
    params.newton.tol_res = 1e-9
    params.newton.tol_disp = 1e-10
    params.newton.max_iter = 40
    params.newton.lin_maxiter = 3000
    p_n = 5.0
    tau = 1.0  # < mu * p_n = 4: full stick
    dbc = [DirichletBC(disc.node_sets["a_zmin"], [1, 1, 1], [0, 0, 0])]
    neu = [NeumannBC(disc.face_sets["b_zmax"], [0, 0, 1], [0, 0, -p_n]),
           NeumannBC(disc.face_sets["b_zmax"], [1, 0, 0], [tau, 0, 0])]
    f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc, neumann=neu,
                      mortar_contact=[cond])
    state = ps.compute_initial_state(f, ps.init_state(f))
    step = ps.make_step(f, dt=1.0)
    state, stats = step(state)
    assert bool(stats["converged"])
    S = f.mortar_contact[0].S
    lam = np.asarray(state["lam"])
    lam_n, lam_t = lam[:S], lam[S:].reshape(S, 2)
    # tangential traction integrates to the applied shear force but stays
    # inside the cone (stick)
    tmag = np.linalg.norm(lam_t, axis=1)
    act = lam_n > 0.1 * lam_n.max()
    assert np.all(tmag[act] < mu * lam_n[act] * 1.001)
    # stick: slave-side bottom nodes move with the base's top (shear of the
    # LOWER block only) — relative slip at the interface ~ 0 compared to
    # the elastic shear of the upper block  tau/G * h = 2(1+nu) tau h / E
    d = np.asarray(state["d"]).reshape(-1, 3)
    slip = d[disc.node_sets["b_zmin"], 0].mean() - \
        d[disc.node_sets["a_zmax"], 0].mean()
    shear_ux = 2 * (1 + nu) * tau / E * 0.4  # elastic shear per block
    assert abs(slip) < 0.1 * shear_ux


def test_stick_slip_transition_threshold():
    """Displacement-driven shear through the Coulomb threshold: the
    interface sticks below the analytic limit drive u* = 2h·μ·p̄/G, and at
    gross slip the TOTAL sliding friction force equals μ x (total normal
    force) — exactly, independent of the moment-tilted pressure
    distribution — with slip = u_drive − u* (ref: the stick→slip
    transition the reference's FRCOEFF semismooth strategy resolves,
    4C_contact_lagrange_strategy.cpp + 4C_contact_friction_node.cpp)."""
    mu = 0.3
    disc, cond = _two_blocks(gap=0.0, friction_mu=mu, cn=200.0)
    E, nu = 1000.0, 0.0
    G = E / (2 * (1 + nu))
    h = 0.4  # block height
    p_n = 5.0
    u_star = 2 * h * mu * p_n / G  # analytic stick-limit drive = 0.0024
    mat = make_material({"type": "stvenantkirchhoff", "youngs": E,
                         "nue": nu, "density": 1.0})
    params = ps.SolidParams(kinem="linear", dyntype="statics")
    params.newton.tol_res = 1e-9
    params.newton.tol_disp = 1e-10
    params.newton.max_iter = 40
    params.newton.lin_maxiter = 3000
    from fourc_tpu.core.functions import FunctionManager

    fm = FunctionManager()
    fm.add(1, "t")
    u_end = 0.02  # >> u*: every node ends on the cone
    dbc = [DirichletBC(disc.node_sets["a_zmin"], [1, 1, 1], [0, 0, 0]),
           DirichletBC(disc.node_sets["b_zmax"], [1, 1, 0],
                       [u_end, 0, 0], funct=[1, 0, 0])]
    neu = [NeumannBC(disc.face_sets["b_zmax"], [0, 0, 1], [0, 0, -p_n])]
    f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc, neumann=neu,
                      mortar_contact=[cond], functions=fm)
    state = ps.compute_initial_state(f, ps.init_state(f))
    step = ps.make_step(f, dt=0.1)  # drive 0.002 per step, 10 steps

    def interface_slip(st):
        d = np.asarray(st["d"]).reshape(-1, 3)
        return d[disc.node_sets["b_zmin"], 0].mean() - \
            d[disc.node_sets["a_zmax"], 0].mean()

    slips = []
    for _ in range(10):
        state, stats = step(state)
        assert bool(stats["converged"])
        slips.append(interface_slip(state))
    # drive 0.002 < u* = 0.0024: stick (slip a tiny fraction of u*)
    assert abs(slips[0]) < 0.05 * u_star
    # steady gross sliding: once every node is on the cone the elastic
    # state is frozen and each drive increment converts ENTIRELY to slip
    # (exact, geometry-independent)
    dstep = u_end / 10
    np.testing.assert_allclose(slips[-1] - slips[-2], dstep, rtol=0.05)
    # threshold bracket: slip switches on only past u* (the pure-shear
    # estimate; moment-induced bending absorbs some extra drive, so the
    # analytic excess is an upper bound)
    assert 0.5 * (u_end - u_star) < slips[-1] < 1.02 * (u_end - u_star)
    assert slips[-1] > slips[-2] > slips[-3]
    S = f.mortar_contact[0].S
    c = f.mortar_contact[0]
    lam = np.asarray(state["lam"])
    lam_n, lam_t = lam[:S], lam[S:].reshape(S, 2)
    # every contact node slides on the cone, traction PARALLEL to the slip
    # increment (λ_t = traction on the master; the slave feels −λ_t,
    # opposing its +x motion)
    tmag = np.linalg.norm(lam_t, axis=1)
    np.testing.assert_allclose(tmag / (mu * lam_n), 1.0, atol=0.02)
    # total sliding friction force = μ x total normal force — exact,
    # pressure-distribution independent (Σ d_j λ_n,j = P_total)
    x = np.asarray(disc.coords) + np.asarray(state["d"]).reshape(-1, 3)
    import jax.numpy as jnp

    _, dw = c.gaps(jnp.asarray(x))
    dw = np.asarray(dw)
    # find the tangent component aligned with +x slip
    F_t = (dw * tmag).sum()
    F_n = (dw * lam_n).sum()
    np.testing.assert_allclose(F_t, mu * F_n, rtol=0.01)


def test_large_sliding_refresh():
    """Slave block slides several master faces sideways: the per-step
    re-segmentation keeps contact closed where the frozen (setup-time)
    segmentation loses it (VERDICT r3 item 4)."""
    E = 1000.0

    def run(refresh_frac):
        nxm = 10
        base = gridgen.box(nxm, 2, 2, lo=(0, 0, 0), hi=(2.0, 0.6, 0.3))
        top = gridgen.box(2, 2, 2, lo=(0.0, 0, 0.3), hi=(0.4, 0.6, 0.6))
        disc = gridgen.merge(base, top)
        disc.structured_shape = None
        cond = MortarContactCondition(
            slave_faces=disc.face_sets["b_zmin"],
            master_faces=disc.face_sets["a_zmax"], cn=100.0,
            refresh_frac=refresh_frac, search_factor=3.0)
        mat = make_material({"type": "stvenantkirchhoff", "youngs": E,
                             "nue": 0.3, "density": 1.0})
        params = ps.SolidParams(kinem="linear", dyntype="statics")
        params.newton.tol_res = 1e-8
        params.newton.tol_disp = 1e-9
        params.newton.max_iter = 40
        params.newton.lin_maxiter = 3000
        from fourc_tpu.core.functions import FunctionManager

        fm = FunctionManager()
        fm.add(1, "t")
        p_n = 2.0
        dbc = [DirichletBC(disc.node_sets["a_zmin"], [1, 1, 1], [0, 0, 0]),
               DirichletBC(disc.node_sets["b_zmax"], [1, 1, 0],
                           [0.12, 0, 0], funct=[1, 0, 0])]
        neu = [NeumannBC(disc.face_sets["b_zmax"], [0, 0, 1], [0, 0, -p_n])]
        f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc,
                          neumann=neu, mortar_contact=[cond], functions=fm)
        state = ps.compute_initial_state(f, ps.init_state(f))
        step = ps.make_step(f, dt=1.0)
        pen = 0.0
        ok = True
        for _ in range(8):  # slides 0.96 total = ~5 master faces
            state, stats = step(state)
            ok = ok and bool(stats["converged"])
            x = np.asarray(disc.coords) + np.asarray(state["d"]).reshape(-1, 3)
            top_lo = x[disc.node_sets["b_zmin"], 2].min()
            base_hi = 0.3  # undeformed; base compresses slightly downward
            pen = min(pen, top_lo - x[disc.node_sets["a_zmax"], 2].max())
        lam_n = np.asarray(state["lam"])[: f.mortar_contact[0].S]
        return ok, pen, float(lam_n.max())

    ok, pen, lam_max = run(refresh_frac=0.5)
    assert ok
    assert pen > -5e-3, f"penetration {pen} with refresh on"
    assert lam_max > 0.5  # contact still carrying pressure at the end

    ok0, pen0, lam0 = run(refresh_frac=0.0)
    # the frozen broad phase demonstrably loses the interface under large
    # sliding: either deep penetration or vanished contact pressure
    assert (pen0 < -5e-3) or (lam0 < 0.5) or (not ok0)
