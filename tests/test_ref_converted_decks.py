"""Reference-converted regression decks: input files translated from
/root/reference/tests/input_files/*.dat with RESULT DESCRIPTION anchors
QUOTED VERBATIM from the reference (independent oracles — the same
trajectory the reference's CI locks, not self-generated values).
"""

import glob
import os

import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.io.result_test import run_result_tests
from fourc_tpu.physics import driver

DECKS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                      "decks", "ref_converted", "*.yaml")))


@pytest.mark.parametrize("path", DECKS,
                         ids=[os.path.basename(p) for p in DECKS])
def test_ref_converted_deck(path):
    deck = dm.load(path)
    res = driver.run(deck)
    assert deck.result_tests, "converted decks must carry quoted anchors"
    outcomes = run_result_tests(deck.result_tests, res)
    bad = [str(t) for t in outcomes if not t.ok]
    assert not bad, bad
