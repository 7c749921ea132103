"""Zienkiewicz-Xie adaptive time stepping (TimAda analog).

ref: src/timestepping/4C_timestepping_zienkiewicz_xie.* +
src/adapter/4C_adapter_str_timeada.cpp.

Oracles:
- a pulse-loaded dynamic bar: the controller REFINES dt during the pulse
  (rejections > 0, multiple dt levels used) and reaches t_end exactly
- the adaptive trajectory matches a uniformly-fine fixed-dt reference
  within a few times the error tolerance
- statics rejects the estimator (no acceleration to estimate from)
"""

import numpy as np
import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver, solid as ps

pytestmark = pytest.mark.minimal

_DECK = """
problem: {{type: structure}}
structural_dynamic: {{dynamictype: genalpha, rho_inf: 0.9, kinem: linear,
                     numstep: {nstep}, timestep: {dt}, maxiter: 25,
                     tolres: 1e-10, toldisp: 1e-12, normcombi: or{extra}}}
solver: {{method: direct}}
functions:
  1: "exp(-200*(t-0.25)^2)"
materials:
  1: {{type: stvenantkirchhoff, youngs: 100.0, nue: 0.0, density: 1.0}}
geometry:
  generator: {{kind: box, nx: 4, ny: 1, nz: 1, cell: hex8, mat: 1}}
conditions:
  dirichlet:
    - {{nodes: xmin, onoff: [1,1,1], val: [0,0,0]}}
  neumann:
    - {{faces: xmax, onoff: [1,0,0], val: [8.0,0,0], funct: [1,0,0]}}
"""


def _tip_disp(res):
    f = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 3)
    X = np.asarray(f.disc.coords)
    tip = np.argmax(X[:, 0])
    return d[tip, 0]


def test_zienxie_refines_pulse_and_matches_fine_reference():
    tol = 2e-6
    res_ad = driver.run(dm.load(_DECK.format(
        nstep=5, dt=0.1,
        extra=f", timada_kind: zienkiewicz_xie, timada_tol: {tol}, "
              "timada_dtmin: 0.003125")))
    agg = res_ad.stats["structure"]
    # the pulse at t=0.25 forces refinement below the coarse dt
    assert len(agg["dt_levels"]) >= 2, agg
    assert min(agg["dt_levels"]) <= 0.025
    assert agg["rejections"] >= 1
    assert abs(float(res_ad.states["structure"]["t"]) - 0.5) < 1e-10

    res_fine = driver.run(dm.load(_DECK.format(nstep=160, dt=0.003125,
                                               extra="")))
    tip_ad, tip_fine = _tip_disp(res_ad), _tip_disp(res_fine)
    # local tol 2e-6 over ~40 accepted steps -> global error O(1e-4);
    # the tip moves O(1e-1), so relative agreement must be tight
    assert tip_ad == pytest.approx(tip_fine, abs=5e-4), (tip_ad, tip_fine)


def test_zienxie_rejects_statics():
    f_params = ps.SolidParams(kinem="linear", dyntype="statics")
    from fourc_tpu.core import gridgen
    from fourc_tpu.materials import make_material

    disc = gridgen.box(1, 1, 1, cell="hex8")
    mat = make_material({"type": "stvenantkirchhoff", "youngs": 1.0,
                         "nue": 0.0})
    f = ps.SolidField(disc, {1: mat}, f_params)
    with pytest.raises(ValueError, match="Newmark"):
        ps.make_zienxie_error_fn(f)
