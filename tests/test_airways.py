"""Reduced-dimensional airways (red_airways analog) tests.

Oracle: a symmetric 2-generation resistive tree with RC terminal acini has
the closed-form step response of its equivalent circuit
P_alv(t) = P_in (1 - exp(-t/tau)), tau = (R_tr + (R_br + R_a)/2) * 2C
(ref: src/red_airways element/acinus models).
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

MU = 1.8e-5


def _R(L, r):
    return 8 * MU * L / (np.pi * r**4)


def _deck(numstep, dt=0.005):
    return dm.load(f"""
problem: {{type: red_airways}}
airway_dynamic: {{timestep: {dt}, numstep: {numstep}, p_in_funct: 1}}
solver: {{method: cg}}
functions:
  1: "100.0"
materials:
  1: {{type: air_poiseuille, radius: 0.01, viscosity: {MU}}}
  2: {{type: air_poiseuille, radius: 0.008, viscosity: {MU}}}
  3: {{type: maxwell_0d_acinus, compliance: 1e-5, resistance: 1e4}}
geometry:
  name: airways
  nodes:
    - [0, 0, 0]
    - [0, 0, -1]
    - [1, 0, -2]
    - [-1, 0, -2]
    - [1, 0, -3]
    - [-1, 0, -3]
  elements:
    line2: {{conn: [[0, 1], [1, 2], [1, 3], [2, 4], [3, 5]],
             mat: [1, 2, 2, 3, 3]}}
  node_sets:
    start: [0]
""")


def test_airway_tree_rc_step_response():
    R_tr = _R(1.0, 0.01)
    R_br = _R(np.sqrt(2.0), 0.008)
    R_a, C = 1e4, 1e-5
    tau = (R_tr + (R_br + R_a) / 2.0) * 2 * C
    dt = 0.005
    numstep = int(round(tau / dt))
    res = driver.run(_deck(numstep, dt))
    t = numstep * dt
    p_ref = 100.0 * (1.0 - np.exp(-t / tau))
    p4 = res.query("airways", "pressure", 4)
    p5 = res.query("airways", "pressure", 5)
    assert abs(p4 - p5) < 1e-8  # symmetry
    assert abs(p4 - p_ref) / p_ref < 0.02, (p4, p_ref)


def test_airway_steady_state_equalizes():
    res = driver.run(_deck(numstep=2000, dt=0.01))
    for node in (1, 2, 3, 4, 5):
        assert abs(res.query("airways", "pressure", node) - 100.0) < 0.5
