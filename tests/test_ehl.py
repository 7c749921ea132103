"""EHL (elasto-hydrodynamic lubrication) tests.

Oracles mirror EHL physics the reference verifies (ref: src/ehl): in the
rigid limit the coupled solution reduces to the pure Reynolds slider
solution; elastic compliance lowers the peak pressure and opens the film.
"""

import numpy as np

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

H1, H2, U = 2e-4, 1e-4, 1.0  # converging slider: h0 = h1 - (h1-h2) x


def _deck(youngs):
    return dm.load(f"""
problem: {{type: ehl}}
ehl_dynamic: {{timestep: 1.0, numstep: 1, surface: ymin, viscosity: 1e-3,
              height_funct: 1, velocity: [{U}, 0, 0], itemax_outer: 60,
              convtol_outer: 1e-12}}
structural_dynamic: {{dynamictype: statics, kinem: linear, numstep: 1,
                     timestep: 1.0, maxiter: 12, tolres: 1e-9,
                     toldisp: 1e-9, normcombi: or}}
solver: {{method: cg, precond: block_jacobi, maxiter: 4000, rtol: 1e-12}}
functions:
  1: "{H1} - {H1 - H2} * x"
materials:
  1: {{type: stvenantkirchhoff, youngs: {youngs}, nue: 0.3}}
geometry:
  generator: {{kind: rectangle, nx: 24, ny: 4, cell: quad4, mat: 1,
               lo: [0, 0], hi: [1, 0.25], name: structure}}
conditions:
  dirichlet:
    - {{nodes: ymax, onoff: [1,1], val: [0,0]}}
""")


def _p_profile(res):
    return np.asarray(res.states["ehl"]["p"])


def test_ehl_rigid_limit_matches_reynolds():
    """E huge -> deflection ~ 0 -> pressure == standalone Reynolds slider
    solution (analytic: p > 0 inside, p(0)=p(L)=0, peak where h = h*)."""
    res = driver.run(_deck(1e12))
    p = _p_profile(res)
    # compare to the standalone lubrication solver on the same film
    lub = driver.run(dm.load(f"""
problem: {{type: lubrication}}
lubrication_dynamic: {{timestep: 1.0, numstep: 1, viscosity: 1e-3,
                      height_funct: 1, velocity: [{U}, 0, 0], tolres: 1e-12}}
solver: {{method: cg, maxiter: 4000, rtol: 1e-12}}
functions:
  1: "{H1} - {H1 - H2} * x"
geometry:
  generator: {{kind: line, n: 24, p0: [0, 0, 0], p1: [1, 0, 0],
               name: lubrication}}
conditions:
  dirichlet:
    - {{nodes: start, onoff: [1], val: [0]}}
    - {{nodes: end, onoff: [1], val: [0]}}
"""))
    p_ref = np.asarray(lub.states["lubrication"]["p"])
    assert np.abs(p - p_ref).max() < 1e-3 * np.abs(p_ref).max()
    assert p.max() > 0  # converging wedge generates lift


def test_ehl_compliance_softens_peak():
    res_rigid = driver.run(_deck(1e12))
    res_soft = driver.run(_deck(5.0e8))
    p_r = _p_profile(res_rigid)
    p_s = _p_profile(res_soft)
    assert p_s.max() < 0.95 * p_r.max()
    # film opens where pressure acts: surface lifts upward
    f = res_soft.fields["ehl"].f
    d = np.asarray(res_soft.states["ehl"]["d"]).reshape(-1, f.ndpn)
    surf = res_soft.fields["ehl"].surf
    assert d[surf, 1].max() > 1e-6
