"""Restart tail-rerun invariance, per problem type.

The reference re-runs the tail of every RESTART_STEP deck and requires the
same RESULT DESCRIPTION values (ref: cmake/functions/
four_c_testing_functions.cmake:119-151 four_c_test with RESTART_STEP).
Here: run a deck N steps writing checkpoints, then re-run the SAME deck
with problem.restart = N/2 and compare the final state pytrees of both
runs.  Stochastic types (browniandyn) carry their RNG key in the state, so
the comparison is still deterministic.
"""

import copy
import glob
import os

import jax
import numpy as np
import pytest
import yaml

from fourc_tpu.io import deck as dm
from fourc_tpu.physics import driver

DECK_DIR = os.path.join(os.path.dirname(__file__), "..", "decks")

# one representative deck per problem type (fast ones preferred);
# numstep is overridden to keep the double-run cheap
CASES = [
    # (deck file, numstep override or None)
    ("solid_ost_vibration.yaml", 6),
    ("scatra_gaussian_diffusion.yaml", 6),
    ("thermo_fin_cooling.yaml", 6),
    ("fluid_poiseuille_ost.yaml", 6),
    ("tsi_heated_bar.yaml", 6),
    ("elch_butler_volmer.yaml", 6),
    ("poro_terzaghi_column.yaml", 6),
    ("poro_scatra_column.yaml", 6),
    ("ssi_swelling_gradient.yaml", 6),
    ("sti_soret.yaml", 6),
    ("ssti_expansion.yaml", 6),
    ("loma_heating.yaml", 6),
    ("lubrication_step_bearing.yaml", 6),
    ("levelset_rotation.yaml", 6),
    ("cardio0d_ejection.yaml", 6),
    ("cardiac_cable.yaml", 6),
    ("porofluid_darcy.yaml", 6),
    ("porofluid_elast_swelling.yaml", 6),
    ("airways_symmetric_tree.yaml", 6),
    ("artery_pulse.yaml", 6),
    ("ehl_slider.yaml", 6),
    ("ale_patch_motion.yaml", 6),
    ("fsi_flexible_wall.yaml", 4),
    ("fpsi_piston.yaml", 4),
    ("fs3i_membrane.yaml", 4),
    ("fbi_fiber.yaml", 4),
    ("immersed_block_channel.yaml", 4),
    ("pasi_bouncing_ball.yaml", 6),
    ("dem_settling_spheres.yaml", 6),
    ("browniandyn_filament.yaml", 6),
    ("xfsi_spring_wall.yaml", 4),
]


def _numstep_keys(raw):
    """All (section, key) holding the step count of the main loop."""
    out = []
    for sec, body in raw.items():
        if isinstance(body, dict) and "numstep" in body:
            out.append(body)
    return out


def _final_states(res):
    return {k: v for k, v in res.states.items()}


def _assert_states_equal(a, b, rtol=1e-10, atol=1e-12):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        la, lb = np.asarray(la), np.asarray(lb)
        if la.dtype.kind in "fc":
            np.testing.assert_allclose(la, lb, rtol=rtol, atol=atol)
        else:
            np.testing.assert_array_equal(la, lb)


@pytest.mark.parametrize("name,nstep", CASES,
                         ids=[c[0].split(".")[0] for c in CASES])
def test_restart_tail(name, nstep, tmp_path):
    path = os.path.join(DECK_DIR, name)
    with open(path) as fh:
        raw = yaml.safe_load(fh)

    for body in _numstep_keys(raw):
        body["numstep"] = nstep
    half = nstep // 2
    raw.setdefault("io", {})
    raw["io"]["output_dir"] = str(tmp_path)
    raw["io"]["restart_interval"] = half
    # decks with their own anchors would fail at the shortened numstep
    raw.pop("result_description", None)

    res_full = driver.run(dm.load(copy.deepcopy(raw)))

    raw2 = copy.deepcopy(raw)
    raw2.setdefault("problem", {})["restart"] = half
    res_tail = driver.run(dm.load(raw2))

    _assert_states_equal(_final_states(res_full), _final_states(res_tail))
