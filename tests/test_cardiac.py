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


def test_tentusscher_action_potential():
    """TP06 (ten Tusscher-Panfilov 2006, epi): resting potential, upstroke
    amplitude and APD90 against the published values (ref capability:
    4C_mat_myocard_tentusscher.*; model from Am J Physiol 291:H1088).
    Uses the material-level Rush-Larsen integrator (the m-gate time
    constant ~1 us at rest makes forward Euler unconditionally unstable
    at any practical dt)."""
    mat = make_material({"type": "myocard", "model": "tentusscher",
                         "diff": 1e-3})
    assert mat.n_gates == 18
    dt = 0.02
    V = jnp.asarray([mat.v_rest])
    w = mat.w_rest()[None, :]
    # resting stability over 50 ms
    for _ in range(int(50 / dt)):
        V, w = mat.ode_substep(V, w, dt, 0.0)
    assert abs(float(V[0]) - mat.v_rest) < 0.5
    # stimulated action potential: 52 pA/pF for 1 ms
    hist = []
    t = 0.0
    import jax

    @jax.jit
    def stepper(carry, i):
        V, w = carry
        t = i * dt
        stim = jnp.where((t >= 2.0) & (t < 3.0), 52.0, 0.0)
        Vn, wn = mat.ode_substep(V, w, dt, stim)
        return (Vn, wn), V[0]

    (V, w), Vs = jax.lax.scan(stepper, (V, w), jnp.arange(int(500 / dt)))
    Vs = np.asarray(Vs)
    assert Vs.max() > 30.0  # overshoot ~ +40 mV
    assert Vs[-1] < -80.0  # repolarized
    v90 = Vs.max() - 0.9 * (Vs.max() - Vs[0])
    above = np.where(Vs > v90)[0]
    apd90 = (above[-1] - above[0]) * dt
    # published TP06 epi APD90 ~ 301 ms; allow a 10% band
    assert 270.0 < apd90 < 330.0, apd90
    # ionic homeostasis: concentrations stay physiologic after the beat
    gf = np.asarray(w[0])
    assert 5.0 < gf[16] < 14.0  # Na_i (mM)
    assert 120.0 < gf[17] < 150.0  # K_i (mM)


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
