"""Checkpoint / restart.

Counterpart of the reference's restart system: a plain-text control file
describing fields/steps/files (ref: core/io/src/4C_io_control.hpp:28
`OutputControl`, restart back-references :143) plus binary per-step state
files written by `DiscretizationWriter` and read back by
`DiscretizationReader` (ref: 4C_io.hpp:65,219); every field implements
`read_restart`, and CI enforces identical-trajectory restarts
(RESTART_STEP tests, ref: cmake/functions/four_c_testing_functions.cmake).

TPU-native design: the entire field state is one pytree of device arrays;
a checkpoint is the flattened pytree saved to a compressed .npz (exact
bit-for-bit round trip) plus a JSON control manifest with the deck hash so
a restart against a modified deck is refused.  For multi-host sharded
states, orbax-checkpoint can be dropped in behind the same interface; the
single-controller path keeps the dependency surface minimal.
"""

from __future__ import annotations

import hashlib
import json
import os

import jax
import numpy as np


def _flatten(state):
    """Pytree -> {path_string: np.ndarray}, exact (no dtype changes)."""
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    for path, leaf in leaves:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(template, arrays):
    """Rebuild a pytree shaped like `template` from {path: array}."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key not in arrays:
            raise KeyError(f"checkpoint missing state entry {key!r}")
        arr = arrays[key]
        leaves.append(jax.numpy.asarray(arr, dtype=np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def deck_hash(deck) -> str:
    """Stable hash of the raw deck mapping (refuse restarts across edits).

    The volatile restart counter itself is excluded — the reference's
    RESTART_STEP flow re-runs the SAME deck with restart=<N> on the CLI.
    """
    raw = dict(deck.raw)
    if isinstance(raw.get("problem"), dict):
        raw["problem"] = {k: v for k, v in raw["problem"].items() if k != "restart"}
    blob = json.dumps(raw, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


class Checkpointer:
    """Writes/reads `<prefix>.control` + `<prefix>_step{N}.npz`."""

    def __init__(self, directory: str, prefix: str = "run", deck=None):
        self.dir = directory
        self.prefix = prefix
        self.hash = deck_hash(deck) if deck is not None else None
        os.makedirs(directory, exist_ok=True)

    @property
    def control_path(self):
        return os.path.join(self.dir, f"{self.prefix}.control")

    def _step_path(self, step: int):
        return os.path.join(self.dir, f"{self.prefix}_step{step}.npz")

    def _read_control(self):
        if not os.path.exists(self.control_path):
            return {"steps": [], "deck_hash": self.hash, "fields": []}
        with open(self.control_path) as fh:
            return json.load(fh)

    def save(self, step: int, states: dict):
        """states: {field_name: state pytree}."""
        arrays = {}
        for name, st in states.items():
            for k, v in _flatten(st).items():
                arrays[f"{name}::{k}"] = v
        np.savez_compressed(self._step_path(step), **arrays)
        ctl = self._read_control()
        if step not in ctl["steps"]:
            ctl["steps"].append(step)
            ctl["steps"].sort()
        ctl["fields"] = sorted(set(ctl.get("fields", [])) | set(states))
        ctl["deck_hash"] = self.hash
        with open(self.control_path, "w") as fh:
            json.dump(ctl, fh, indent=1)

    def latest_step(self):
        steps = self._read_control()["steps"]
        return steps[-1] if steps else None

    def load(self, step: int, templates: dict) -> dict:
        """templates: {field_name: state pytree with target shapes/dtypes}."""
        ctl = self._read_control()
        if self.hash is not None and ctl.get("deck_hash") not in (None, self.hash):
            raise ValueError(
                f"restart refused: deck hash {self.hash} != checkpoint "
                f"{ctl.get('deck_hash')} (deck was modified)"
            )
        if step not in ctl["steps"]:
            raise FileNotFoundError(
                f"no checkpoint for step {step} (available: {ctl['steps']})"
            )
        with np.load(self._step_path(step)) as data:
            arrays = dict(data)
        out = {}
        for name, tmpl in templates.items():
            sub = {
                k.split("::", 1)[1]: v
                for k, v in arrays.items()
                if k.startswith(name + "::")
            }
            out[name] = _unflatten(tmpl, sub)
        return out


class CheckpointCallback:
    """time_loop callback: checkpoint every `interval` steps."""

    def __init__(self, ckpt: Checkpointer, interval: int = 1):
        self.ckpt = ckpt
        self.interval = max(1, int(interval))

    def __call__(self, fieldname, state, agg):
        step = int(state["step"])
        if step % self.interval == 0:
            self.ckpt.save(step, {fieldname: state})
