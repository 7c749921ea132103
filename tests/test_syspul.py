"""Closed-loop syspul 0D circulation.

ref: src/cardiovascular0d/4C_cardiovascular0d_syspulcirculation.*.

Oracles:
- exact conservation of total blood volume (chambers + C*p of every
  compartment) under backward Euler — the loop flows telescope
- valves rectify: aortic flow only during systole, mitral only during
  filling; both essentially one-way (regurgitation below the diode leak)
- physiological operation: LV pressure swings over a sane range, stroke
  volume positive, PV-loop orientation (work done by the ventricle)
- beat-to-beat convergence toward a periodic limit cycle
"""

import numpy as np
import pytest

import jax

from fourc_tpu.physics.syspul import (SysPulParams, chamber_pressures, flows,
                                      initial_state, run_beats, total_volume)

pytestmark = pytest.mark.minimal


@pytest.fixture(scope="module")
def traj():
    prm = SysPulParams()
    ts, ys = run_beats(prm, n_beats=6, steps_per_beat=300)
    return prm, ts, ys


def test_volume_conserved(traj):
    prm, ts, ys = traj
    import jax.numpy as jnp

    v0 = float(total_volume(jnp.asarray(initial_state(prm)), prm))
    vt = np.asarray([float(total_volume(jnp.asarray(y), prm)) for y in ys[::50]])
    assert np.abs(vt - v0).max() < 1e-8 * v0, np.abs(vt - v0).max()


def test_valves_rectify(traj):
    prm, ts, ys = traj
    import jax.numpy as jnp

    last = slice(-300, None)  # final beat
    q_av = []
    q_mv = []
    for t, y in zip(ts[last], ys[last]):
        q = flows(jnp.asarray(y), float(t), prm)
        q_av.append(float(q["q_av"]))
        q_mv.append(float(q["q_mv"]))
    q_av, q_mv = np.asarray(q_av), np.asarray(q_mv)
    assert q_av.max() > 50.0  # strong systolic ejection (ml/s)
    assert q_mv.max() > 30.0  # diastolic filling
    # smooth-diode leak only (no true regurgitation)
    assert q_av.min() > -2.0 and q_mv.min() > -2.0
    # ejection and filling do not overlap significantly
    overlap = np.sum((q_av > 5.0) & (q_mv > 5.0)) / len(q_av)
    assert overlap < 0.05, overlap


def test_physiological_lv_and_stroke_volume(traj):
    prm, ts, ys = traj
    import jax.numpy as jnp

    last = slice(-300, None)
    p_lv = np.asarray([float(chamber_pressures(jnp.asarray(y), float(t), prm)[1])
                       for t, y in zip(ts[last], ys[last])])
    V_lv = ys[last, 1]
    # kPa: diastolic < 2, systolic peak 8-25 (60-190 mmHg)
    assert p_lv.min() < 2.0
    assert 8.0 < p_lv.max() < 25.0, p_lv.max()
    sv = V_lv.max() - V_lv.min()
    assert 30.0 < sv < 120.0, sv  # stroke volume (ml)
    # PV loop runs clockwise in (V, p): positive enclosed work
    work = -np.trapezoid(p_lv, V_lv)
    assert work > 0.3, work  # kPa*ml = mJ


def test_limit_cycle_convergence(traj):
    prm, ts, ys = traj
    V = ys[:, 1].reshape(6, 300)  # per-beat LV volume traces
    d1 = np.abs(V[2] - V[1]).max()
    d4 = np.abs(V[5] - V[4]).max()
    assert d4 < 0.7 * d1 + 1e-9, (d1, d4)
