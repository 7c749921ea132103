"""Curated example decks (the reference's tests/input_files analog).

Every deck in decks/ must run end to end; decks carrying a
result_description are additionally checked in-process — the same
tier-2 strategy the reference's ~2000 input-file tests use
(ref: tests/list_of_tests.cmake + RESULT DESCRIPTION semantics).
"""

import glob
import os

import pytest

from fourc_tpu.io import deck as dm
from fourc_tpu.io.result_test import run_result_tests
from fourc_tpu.physics import driver

DECKS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                      "decks", "*.yaml")))


@pytest.mark.parametrize("path", DECKS, ids=[os.path.basename(p) for p in DECKS])
def test_deck_runs(path):
    deck = dm.load(path)
    res = driver.run(deck)
    if deck.result_tests:
        outcomes = run_result_tests(deck.result_tests, res)
        bad = [str(t) for t in outcomes if not t.ok]
        assert not bad, bad
