"""Generate a result_description block for a deck from a converged run.

Usage: python tools/gen_result_description.py decks/foo.yaml [decks/bar.yaml ...]

Runs each deck on CPU/f64 and prints a YAML result_description block with
the extremal-node value per canonical quantity of every field — the same
way the reference generates its regression-deck RESULT DESCRIPTION values
from trusted converged runs (ref: tests/list_of_tests.cmake semantics).
Tolerances: 1e-9 absolute scaled by the value magnitude (1e-8 floor).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from fourc_tpu.io import deck as dm  # noqa: E402
from fourc_tpu.physics import driver  # noqa: E402

# candidate quantities per field, tried in order; missing ones are skipped
CANDIDATES = (
    "dispx", "dispy", "dispz", "velx", "vely", "velz", "pressure",
    "phi", "temp", "area", "flow", "posx", "posy", "posz",
)


def field_nodes(res, name):
    f = res.fields[name].f if hasattr(res.fields[name], "f") else res.fields[name]
    disc = getattr(f, "disc", None)
    if disc is not None:
        return int(disc.n_nodes)
    st = res.states.get(name)
    if st is not None and "x" in st:  # particle field: rows of x
        return int(st["x"].shape[0])
    return 0


def main(paths):
    append = False
    if paths and paths[0] == "--append":
        append = True
        paths = paths[1:]
    for path in paths:
        deck = dm.load(path)
        if append and deck.result_tests:
            print(f"# {path}: already has result_description, skipping")
            continue
        try:
            res = driver.run(deck)
        except Exception as exc:  # noqa: BLE001 — keep the batch going
            print(f"# {path}: FAILED ({exc})")
            continue
        lines = []
        for name in res.fields:
            n = field_nodes(res, name)
            if n == 0:
                continue
            nodes = range(n) if n <= 600 else range(0, n, max(1, n // 400))
            for q in CANDIDATES:
                try:
                    vals = np.array([res.query(name, q, i) for i in nodes])
                except (KeyError, IndexError):
                    continue
                if not np.all(np.isfinite(vals)) or np.abs(vals).max() == 0:
                    continue
                idx = list(nodes)[int(np.abs(vals).argmax())]
                v = float(res.query(name, q, idx))
                tol = max(abs(v) * 1e-8, 1e-10)
                lines.append(
                    f"  - {{field: {name}, node: {idx}, quantity: {q}, "
                    f"value: {v:.14e}, tolerance: {tol:.1e}}}")
        block = "result_description:\n" + "\n".join(lines) + "\n"
        print(f"# {path}")
        print(block)
        if append and lines:
            with open(path, "a") as fh:
                fh.write(block)


if __name__ == "__main__":
    main(sys.argv[1:])
