"""Spring-dashpot (Robin) support tests.

Oracles mirror the reference's SpringDashpot model evaluator
(ref: 4C_structure_new_model_evaluator_springdashpot.*): static spring
equilibrium and damped free vibration with the analytic decay rate.
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver


def test_spring_static_equilibrium():
    """Rigid-translation mode on nodal springs: u = P_total / k_total."""
    res = driver.run(dm.load("""
problem: {type: structure}
structural_dynamic: {dynamictype: statics, kinem: linear, numstep: 1,
                     timestep: 1.0, maxiter: 10, tolres: 1e-10,
                     toldisp: 1e-10, normcombi: or}
solver: {method: direct}
functions:
  1: "t"
materials:
  1: {type: stvenantkirchhoff, youngs: 1000.0, nue: 0.0}
geometry:
  generator: {kind: box, nx: 1, ny: 1, nz: 1, cell: hex8, mat: 1}
conditions:
  spring_dashpot:
    - {nodes: all, stiffness: [50.0, 50.0, 50.0]}
  point_neumann:
    - {nodes: all, onoff: [1,0,0], val: [2.0], funct: [1]}
"""))
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    # every node: spring k=50 vs load 2 -> u_x = 0.04, uniform (no strain)
    assert np.allclose(d[:, 0], 2.0 / 50.0, atol=1e-9)
    assert np.abs(d[:, 1:]).max() < 1e-10


def test_dashpot_damped_vibration():
    """SDOF analog: block of mass m on springs k with dashpots c; the
    displacement envelope decays as exp(-zeta w t)."""
    k_node, c_node, rho = 20.0, 0.4, 8.0
    res = driver.run(dm.load(f"""
problem: {{type: structure}}
structural_dynamic: {{dynamictype: genalpha, rho_inf: 1.0, kinem: linear,
                     numstep: 240, timestep: 0.05, maxiter: 10,
                     tolres: 1e-10, toldisp: 1e-10, normcombi: or,
                     lumpmass: true}}
io: {{monitor: {{nodes: [0], quantities: [dispx], file: "/tmp/sd_mon.csv"}}}}
solver: {{method: direct}}
functions:
  1: "(t < 0.15)"
materials:
  1: {{type: stvenantkirchhoff, youngs: 1.0e7, nue: 0.0, density: {rho}}}
geometry:
  generator: {{kind: box, nx: 1, ny: 1, nz: 1, cell: hex8, mat: 1}}
conditions:
  spring_dashpot:
    - {{nodes: all, stiffness: [{k_node}, {k_node}, {k_node}],
        viscosity: [{c_node}, {c_node}, {c_node}]}}
  point_neumann:
    - {{nodes: all, onoff: [1,0,0], val: [5.0], funct: [1]}}
"""))
    hist = np.genfromtxt("/tmp/sd_mon.csv", delimiter=",", names=True)
    u = hist["dispx_n0"]
    t = hist["time"]
    # rigid block: m_total = rho*1, k_total = 8*k_node, c_total = 8*c_node
    m, k, c = rho, 8 * k_node, 8 * c_node
    w0 = np.sqrt(k / m)
    zeta = c / (2 * np.sqrt(k * m))
    # peaks after the load is released
    sel = t > 0.3
    us, ts = u[sel], t[sel]
    pk = [i for i in range(1, len(us) - 1)
          if us[i] > us[i - 1] and us[i] > us[i + 1] and us[i] > 0]
    assert len(pk) >= 3
    ratio = us[pk[2]] / us[pk[0]]
    T_d = ts[pk[2]] - ts[pk[0]]  # two damped periods
    assert abs(T_d / 2 - 2 * np.pi / (w0 * np.sqrt(1 - zeta**2))) < 0.15 * T_d / 2
    assert abs(ratio - np.exp(-zeta * w0 * T_d)) < 0.12
