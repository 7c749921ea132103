"""Wide-layout (relayout-free) gen-alpha step for structured lattices.

The round-2 hot-path profile at 1.17M dofs showed the flat<->lattice
layout conversion (a transpose moving the 3-component dof axis across
TPU lanes) costing as much as the stencil kernels themselves: a
prep/unprep round trip is ~2.4 ms while the fused Pallas stencil is
sub-ms.  The flat-dof step pays that relayout on EVERY operator apply —
6+ times per V-cycle, 3 times per tangent matvec.

This module keeps the entire Newton-Krylov loop in the wide lattice
layout (3, X, Y, Z) (ops/lattice_pallas.wide_shape): state vectors,
residuals, Krylov vectors and the GMG hierarchy all stay in kernel
layout end to end; the only conversions are one-time (state widening on
the first step, Dirichlet/Neumann patterns once per step).

Counterpart of the reference's implicit structural time integration
(ref: src/structure_new/src/implicit/4C_structure_new_impl_genalpha.cpp)
— same gen-alpha algebra as physics/solid.py, different data layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fourc_tpu.physics.newton import newton_solve


def eligible(f) -> bool:
    """Whether the wide step can replace the flat gen-alpha step: pure
    single-block lattice hyperelasticity with no displacement-dependent
    external loads or extra residual terms.

    Round-5 widening: lumped mass and Rayleigh damping are supported on
    the UNIFORM lattice (f.lattice) — the damping stiffness term runs
    through the pure-XLA reference stencil, which is differentiable to
    the second order the Newton operator needs (the Pallas kernels carry
    first-order custom_jvp rules only).  The general-geometry topology
    path (lattice_geom) keeps the narrower envelope."""
    spec = f.lattice or getattr(f, "lattice_geom", None)
    if spec is None or f.params.dyntype != "genalpha":
        return False
    uniform = f.lattice is not None
    if (f.params.rayleigh_alpha or f.params.rayleigh_beta) and not uniform:
        return False
    if (f.contact is not None or f.ties is not None or f.springs
            or getattr(f, "embedded", ()) or f.constraints
            or getattr(f, "mortar_contact", [])):
        return False
    if f.params.mass != "consistent" and not (
            uniform and f.params.mass == "lumped"):
        return False
    if any(nb.kind == "pressure" for nb, _, _, _ in f._neumann_data):
        return False
    if f.pasi_force is not None:
        return False
    from fourc_tpu.ops import lattice as _lat

    mat = next(iter(f.block_mat.values()))
    return _lat._material_model(mat) is not None


def _spec(f):
    return f.lattice or f.lattice_geom


_WIDE_FIELDS = ("d", "v", "a", "fint", "fext")


def widen_state(f, state):
    """Flat solid state dict -> wide-layout state (one-time, step entry)."""
    from fourc_tpu.ops import lattice_pallas as lp

    new = dict(state)
    for k in _WIDE_FIELDS:
        new[k] = lp.prep(state[k], _spec(f))
    return new


def flatten_state(f, state):
    """Wide-layout state -> flat dof vectors (io/checkpoint/driver use)."""
    from fourc_tpu.ops import lattice_pallas as lp

    if state["d"].ndim == 1:
        return dict(state)
    new = dict(state)
    for k in _WIDE_FIELDS:
        new[k] = lp.unprep(state[k], _spec(f))
    return new


def make_wide_genalpha_step(f, dt: float, M_gmg):
    """Build the wide-layout gen-alpha step; returns None if the GMG
    hierarchy cannot run the wide cycle (caller falls back to flat)."""
    if M_gmg is None or not M_gmg.wide_ok:
        return None
    from fourc_tpu.ops import lattice as _lat
    from fourc_tpu.ops import lattice_pallas as lp
    from fourc_tpu.physics.solid import _newmark_updates

    spec = _spec(f)
    mat = next(iter(f.block_mat.values()))
    cell = f._cell(next(iter(f.block_mat)))
    ra, rb = f.params.rayleigh_alpha, f.params.rayleigh_beta
    damp_ref = None
    if f.lattice is not None:  # uniform geometry: collapsed stencils
        force_w = _lat.make_force_wide(spec, cell, mat)
        if force_w is None:
            return None
        if f.params.mass == "lumped":
            from fourc_tpu.ops import lattice_pallas as lp_

            mlump_w = lp_.prep(f.lumped_mass(), spec)

            def mass_op(vw):
                return mlump_w * vw
        else:
            Mst = f._mass_stencil()

            def mass_op(vw):
                return _lat.stencil_matvec_wide(Mst, vw, spec)
        if rb:
            # stiffness-proportional damping K(d)·v via the pure-XLA
            # reference stencil: second-order-differentiable, so the
            # Newton jvp can pass through the damping term (the Pallas
            # force carries a first-order custom_jvp only); same
            # consistent-at-d_new semantics as the flat path
            from fourc_tpu.materials.elastic import lame as _lame

            model_ = _lat._material_model(mat)
            lam_r, mu_r = (float(x) for x in
                           _lame(mat.youngs, mat.nue))
            G_r, wdet_r = _lat.uniform_geometry(cell, spec)

            def damp_ref(uw):
                out = _lat.neo_force_ref(
                    _lat._wide_to_lat(uw, spec), spec, G_r, wdet_r,
                    lam_r, mu_r, model_)
                return _lat._lat_to_wide(out, spec)
    else:  # general geometry on lattice topology (round-4 kernels)
        from fourc_tpu.materials.elastic import lame

        model = _lat._material_model(mat)
        if model is None:
            return None
        lam_, mu_ = (float(x) for x in lame(mat.youngs, mat.nue))
        force_w = lp.make_force_wide_general(spec, f.disc.coords, lam_,
                                             mu_, model)
        mass_op = lp.make_mass_wide_general(spec, f.disc.coords,
                                            float(mat.density))
    ga = f.params.genalpha
    am, af, beta, gamma = ga.alpha_m, ga.alpha_f, ga.beta, ga.gamma
    # hoisted runtime input (kept out of the compiled program's literals —
    # see utils/hoist.py); f32 0/1 weights are safe runtime inputs
    buf = {"w_wide": lp.prep(f.dbc.free_w, spec)}
    f.hoister.register_item(buf, "w_wide")

    def step(state):
        w_wide = buf["w_wide"]
        t1 = state["t"] + dt
        d_n, v_n, a_n = state["d"], state["v"], state["a"]
        fint_n, fext_n = state["fint"], state["fext"]
        # external load + prescribed values: d-independent by eligibility,
        # so hoisted out of the Newton loop (one relayout each per step)
        fext1 = lp.prep(f.external_force(t1), spec)
        gw = lp.prep((1.0 - f.dbc.free_w)
                     * f.dbc.values(t1).astype(f.dbc.free_w.dtype), spec)
        fmid_ext = (1 - af) * fext1 + af * fext_n

        def residual(d_new):
            v_new, a_new = _newmark_updates(f, dt, d_new, d_n, v_n, a_n,
                                            beta, gamma)
            a_mid = (1 - am) * a_new + am * a_n
            fint_mid = (1 - af) * force_w(d_new) + af * fint_n
            r = mass_op(a_mid) + fint_mid - fmid_ext
            if ra or rb:
                v_mid = (1 - af) * v_new + af * v_n
                if ra:
                    r = r + ra * mass_op(v_mid)
                if rb:
                    _, kv = jax.jvp(damp_ref, (d_new,), (v_mid,))
                    r = r + rb * kv
            return r

        from fourc_tpu.physics.solid import _predict
        u0 = w_wide * _predict(f.params.predictor, dt, d_n, v_n, a_n) + gw
        u, stats = newton_solve(residual, u0, w_wide, M_gmg, f.params.newton)
        v1, a1 = _newmark_updates(f, dt, u, d_n, v_n, a_n, beta, gamma)
        new_state = dict(state)
        new_state.update(
            d=u, v=v1, a=a1, t=t1, step=state["step"] + 1,
            fint=force_w(u), fext=fext1,
        )
        return new_state, stats

    # self-jitted wrapper: the jitted program ALWAYS sees a wide state, so
    # the one-time flat->wide state conversion happens eagerly here and the
    # single compile covers every subsequent step (a flat first call would
    # otherwise compile a second, differently-shaped program mid-run)
    jitted = f.hoister.jit(step)

    def call(state):
        if state["d"].ndim == 1:
            state = widen_state(f, state)
        return jitted(state)

    call.self_jitted = True
    return call
