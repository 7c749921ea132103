"""NP>1 deck variants: run representative decks sharded over the 8-device
CPU mesh and require the SAME RESULT DESCRIPTION values as NP=1.

The analog of the reference running every input file at NP 1-4 with
identical result tests (ref: tests/list_of_tests.cmake:12 — every deck is
listed with an np count; cmake/four_c_testing_functions.cmake drives
mpirun -np N).  Here problem.nshard = 8 device_puts every field array
onto a jax.sharding.Mesh and the jitted steps run GSPMD-partitioned.
"""

import copy
import os

import pytest
import yaml

from fourc_tpu.io import deck as dm
from fourc_tpu.io.result_test import run_result_tests
from fourc_tpu.physics import driver

DECK_DIR = os.path.join(os.path.dirname(__file__), "..", "decks")

# decks with result anchors whose problem types route through the
# nshard-aware drivers (structure / scatra / thermo / fluid)
CASES = [
    "solid_eas_bending.yaml",
    "solid_fbar_compression.yaml",
    "solid_ost_vibration.yaml",
    "solid_j2_cyclic.yaml",
    "solid_ogden_uniaxial.yaml",
    "scatra_gaussian_diffusion.yaml",
    "scatra_supg_skewflow.yaml",
    "thermo_fin_cooling.yaml",
    "fluid_poiseuille_ost.yaml",
    "fluid_cavity_stationary.yaml",
    # coupled problem (both fields sharded over the same mesh)
    "tsi_heated_bar.yaml",
]


@pytest.mark.parametrize("name", CASES, ids=[c.split(".")[0] for c in CASES])
def test_deck_sharded(name):
    with open(os.path.join(DECK_DIR, name)) as fh:
        raw = yaml.safe_load(fh)
    raw.setdefault("problem", {})["nshard"] = 8
    deck = dm.load(copy.deepcopy(raw))
    res = driver.run(deck)
    assert deck.result_tests, f"{name} carries no result_description"
    outcomes = run_result_tests(deck.result_tests, res)
    bad = [str(t) for t in outcomes if not t.ok]
    assert not bad, bad
