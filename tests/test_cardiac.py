"""Cardiac monodomain electrophysiology tests.

Oracles mirror the reference's myocard/cardiac-monodomain behavior
(ref: src/mat/4C_mat_myocard*.​*, src/scatra/4C_scatra_timint_cardiac_monodomain.*):
resting stability, all-or-none action-potential generation, and wave
propagation with conduction velocity scaling ~ sqrt(D) on a 1D cable.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.materials import make_material
from fourc_tpu.physics import driver


def _ode_run(mat, v0, t_end, dt, i_stim=0.0, t_stim=1.0):
    V = jnp.asarray([v0])
    w = mat.w_rest()[None, :]
    hist = []
    t = 0.0
    while t < t_end:
        dV, dw = mat.rhs(V, w)
        stim = i_stim if t < t_stim else 0.0
        V = V + dt * (dV + stim)
        w = w + dt * dw
        t += dt
        hist.append(float(V[0]))
    return np.array(hist)


@pytest.mark.parametrize("model,stim,t_end,dt", [
    ("fitzhugh_nagumo", 0.3, 400.0, 0.1),
    ("aliev_panfilov", 0.5, 100.0, 0.02),
    ("minimal", 0.5, 400.0, 0.05),
])
def test_cell_model_action_potential(model, stim, t_end, dt):
    mat = make_material({"type": "myocard", "model": model, "diff": 1e-3})
    # resting state is stable
    rest = _ode_run(mat, mat.v_rest, 50.0, dt)
    assert np.all(np.abs(rest - mat.v_rest) < 0.05)
    # super-threshold stimulus elicits an action potential that repolarizes
    ap = _ode_run(mat, mat.v_rest, t_end, dt, i_stim=stim, t_stim=2.0)
    assert ap.max() > 0.8  # upstroke (all models normalized ~[0,1])
    assert abs(ap[-1] - mat.v_rest) < 0.15  # repolarized


def _cable_deck(diff, numstep=60):
    return dm.load(f"""
problem: {{type: cardiac_monodomain}}
cardiac_dynamic: {{timestep: 1.0, numstep: {numstep}, ode_substeps: 20,
                  tolres: 1e-6}}
solver: {{method: cg, precond: jacobi, maxiter: 500, rtol: 1e-10}}
functions:
  1: "(x < 0.05) * (t < 2.0)"
materials:
  1: {{type: myocard, model: aliev_panfilov, diff: {diff}}}
geometry:
  generator: {{kind: rectangle, nx: 100, ny: 1, cell: quad4, mat: 1,
               lo: [0, 0], hi: [1, 0.01], name: cardiac}}
conditions:
  body_force:
    - {{val: [1.0], funct: [1]}}
""")


def _activation_x(res, thresh=0.5):
    """Rightmost x whose V exceeds thresh (wavefront position)."""
    f = res.fields["cardiac"].f
    V = np.asarray(res.states["cardiac"]["phi"])
    x = np.asarray(f.disc.coords)[:, 0]
    on = V > thresh
    return x[on].max() if on.any() else 0.0


def test_monodomain_wave_propagates():
    res = driver.run(_cable_deck(2e-4, numstep=40))
    xf = _activation_x(res)
    assert 0.15 < xf < 0.95  # wave launched, still traveling


def test_conduction_velocity_scales_with_sqrt_diffusivity():
    x1 = _activation_x(driver.run(_cable_deck(1e-4, numstep=40)))
    x4 = _activation_x(driver.run(_cable_deck(4e-4, numstep=40)))
    # front distance ratio ~ CV ratio ~ sqrt(4) = 2 (generous tolerance:
    # discrete front sampling + stimulus transient)
    assert 1.5 < x4 / x1 < 2.6
