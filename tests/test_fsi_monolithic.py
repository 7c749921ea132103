"""Monolithic FSI: same hydrostatic-piston oracle as the partitioned test,
plus cross-algorithm agreement."""

import numpy as np
import pytest
import sys

sys.path.insert(0, "tests")

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver
from test_fsi import G, E_MOD, _fsi_deck


def _mono_deck(numstep=3, dt=1.0):
    deck = _fsi_deck(numstep=numstep, dt=dt)
    raw = dict(deck.raw)
    raw["fsi_dynamic"] = dict(raw["fsi_dynamic"], coupling="monolithic")
    return dm.load(raw)


def test_fsi_monolithic_hydrostatic_piston():
    res = driver.run(_mono_deck(numstep=3))
    f_s = res.fields["structure"].f
    d = np.asarray(res.states["structure"]["d"]).reshape(-1, 2)
    xn = np.asarray(res.states["fluid"]["x"]).reshape(-1, 3)
    f_f = res.fields["fluid"].f
    xf = f_f.disc.coords[:, 0]
    assert np.abs(xn[:, :2]).max() < 2e-3  # (nearly) still fluid
    assert np.abs(xn[:, 2] - G * xf).max() < 0.05  # linear pressure

    delta = G * 1.0 / E_MOD
    iface = f_s.disc.node_sets["xmin"]
    u_if = d[iface, 0]
    assert u_if.mean() == pytest.approx(delta, rel=0.03)


def test_fsi_monolithic_matches_partitioned():
    res_m = driver.run(_mono_deck(numstep=2))
    res_p = driver.run(_fsi_deck(numstep=2))
    dmn = np.asarray(res_m.states["structure"]["d"])
    dpt = np.asarray(res_p.states["structure"]["d"])
    assert np.abs(dmn - dpt).max() < 1e-5
