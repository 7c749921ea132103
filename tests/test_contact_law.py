"""Contact constitutive laws: regularized pressure-penetration relations.

Counterpart of the reference's contact_constitutivelaw tests (ref:
src/contact_constitutivelaw — linear/power/cubic/brokenrational laws;
unittests/contact_constitutivelaw).  Oracle: a soft block pressed by a
prescribed displacement onto a near-rigid base (whose surface stays flat,
so the geometric penetration is well defined).  The measured penetration
must satisfy the inverse law delta = law^-1(p), with the transmitted
pressure p measured from the soft block's uniaxial strain.
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

E_SOFT = 1000.0
E_RIGID = 1.0e7
GAP0 = 0.01
PUSH = -0.05  # prescribed top displacement (ramped)


def _deck(law, law_params):
    lp = ", ".join(f"{k}: {v}" for k, v in law_params.items())
    return dm.load(f"""
problem: {{type: structure}}
structural_dynamic:
  dynamictype: statics
  kinem: nonlinear
  numstep: 4
  timestep: 0.25
  maxiter: 60
  tolres: 1e-6
  toldisp: 1e-8
  linesearch: true
  divercont: halve_step
solver: {{method: gmres, precond: block_jacobi, maxiter: 3000, gmres_restart: 100}}
materials:
  1: {{type: stvenantkirchhoff, youngs: {E_RIGID}, nue: 0.0}}
  2: {{type: stvenantkirchhoff, youngs: {E_SOFT}, nue: 0.0}}
functions:
  1: "t"
geometry:
  generator:
    - {{kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 1, name: structure}}
    - {{kind: box, nx: 2, ny: 2, nz: 2, cell: hex8, mat: 2, name: structure,
        lo: [0, 0, {1 + GAP0}], hi: [1, 1, {2 + GAP0}], prefix: up_}}
conditions:
  dirichlet:
    - {{nodes: zmin, onoff: [1,1,1], val: [0,0,0]}}
    - {{nodes: up_zmax, onoff: [1,1,1], val: [0,0,{PUSH}], funct: [0,0,1]}}
  contact:
    - {{slave: up_zmin, master: zmax, law: {law}, law_params: {{{lp}}}}}
""")


def _measure(res):
    """Returns (penetration into the rigid surface, transmitted pressure
    from the soft block's strain)."""
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    X = np.asarray(f.disc.coords)
    lower_top = f.disc.node_sets["zmax"]
    upper_bot = f.disc.node_sets["up_zmin"]
    upper_top = f.disc.node_sets["up_zmax"]
    z_low = (X[lower_top, 2] + d[lower_top, 2]).mean()  # ~1.0 (rigid)
    z_up = (X[upper_bot, 2] + d[upper_bot, 2]).mean()
    delta = z_low - z_up  # positive = penetration
    # soft block: unit height -> eps = (uz_top - uz_bot)
    eps = d[upper_top, 2].mean() - d[upper_bot, 2].mean()
    p = -E_SOFT * eps  # compressive pressure (nue = 0)
    return delta, p


@pytest.mark.parametrize(
    "law,params,invert",
    [
        ("power", {"a": 2.0e4, "b": 2.0}, lambda p: (p / 2.0e4) ** 0.5),
        ("cubic", {"a": 0.0, "b": 0.0, "c": 3.0e3},
         lambda p: p / 3.0e3),  # degenerate-to-linear sanity
        # c = -a/b makes p(0) = 0 (continuous onset; the law's intended
        # parameterization — with c=0 the pressure would jump to -a/b at
        # first touch, which no Newton handles)
        ("brokenrational", {"a": -0.5, "b": 0.05, "c": -10.0},
         lambda p: 0.05 - 0.5 / (p + 10.0)),
    ],
)
def test_law_penetration(law, params, invert):
    res = driver.run(_deck(law, params))
    delta, p = _measure(res)
    assert p > 1.0, f"no pressure transmitted ({law}: p={p})"
    want = invert(p)
    assert delta == pytest.approx(want, rel=0.08, abs=2e-4), (law, delta, p, want)
