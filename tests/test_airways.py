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


def test_pedley_resistance_reduces_flow():
    """Flow-dependent (Pedley) resistance: at high driving pressure the
    nonlinear airway carries LESS flow than Poiseuille; at vanishing flow
    the laws coincide (factor max(1, .) -> 1)."""
    import numpy as np

    def run_tree(mat, p_drive):
        deck = dm.load(f"""
problem: {{type: red_airways}}
airway_dynamic: {{timestep: 0.01, numstep: 50, p_in_funct: 1}}
solver: {{method: cg, precond: jacobi}}
functions:
  1: "{p_drive}"
materials:
  1: {mat}
  2: {{type: maxwell_0d_acinus, compliance: 1.0e-4, resistance: 10.0}}
geometry:
  name: airways
  nodes:
    - [0, 0, 0]
    - [0.1, 0, 0]
    - [0.12, 0, 0]
  elements:
    line2: {{conn: [[0, 1], [1, 2]], mat: [1, 2]}}
  node_sets:
    start: [0]
""")
        res = driver.run(deck)
        # steady flow = g_eff * (P_in - P_alv); report the trachea-node
        # pressure drop across the airway as a flow proxy
        P = np.asarray(res.states["airways"]["P"])
        return P

    poiseuille = "{type: air_poiseuille, radius: 0.004, viscosity: 1.8e-5}"
    pedley = ("{type: air_pedley, radius: 0.004, viscosity: 1.8e-5, "
              "density: 1.2, gamma: 0.5}")
    P_lin = run_tree(poiseuille, 500.0)
    P_ped = run_tree(pedley, 500.0)
    # same downstream acinus: a higher mid-node pressure drop across the
    # Pedley airway means less flow reached the acinus
    assert P_ped[1] < P_lin[1] - 1e-6, (P_lin, P_ped)
    # low-flow limit: identical
    P_lin0 = run_tree(poiseuille, 1e-3)
    P_ped0 = run_tree(pedley, 1e-3)
    assert abs(P_lin0[1] - P_ped0[1]) < 1e-9


def test_viscoelastic_acinus_creep():
    """Kelvin terminal unit under a pressure step creeps toward V = P/E
    with time constant eta/E (ref: reduced_lung viscoelastic_RLC)."""
    import numpy as np

    E, eta = 100.0, 10.0  # tau = 0.1
    deck = dm.load(f"""
problem: {{type: red_airways}}
airway_dynamic: {{timestep: 0.005, numstep: 200, p_in_funct: 1}}
solver: {{method: cg, precond: jacobi}}
functions:
  1: "50.0"
materials:
  1: {{type: air_poiseuille, radius: 0.05, viscosity: 1.8e-5}}
  2: {{type: maxwell_0d_acinus, stiffness: {E}, eta: {eta}, resistance: 1.0}}
geometry:
  name: airways
  nodes:
    - [0, 0, 0]
    - [0.1, 0, 0]
    - [0.12, 0, 0]
  elements:
    line2: {{conn: [[0, 1], [1, 2]], mat: [1, 2]}}
  node_sets:
    start: [0]
""")
    res = driver.run(deck)
    V = float(np.asarray(res.states["airways"]["V"])[0])
    # after 10 time constants: V -> P/E (airway resistance is negligible)
    assert abs(V - 50.0 / E) / (50.0 / E) < 0.02, V
