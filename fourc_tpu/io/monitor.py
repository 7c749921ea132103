"""Runtime monitoring output.

Counterparts of the reference's `post_monitor` nodal time histories
(ref: apps/post_monitor) and the runtime CSV writer
(ref: core/io/src/4C_io_runtime_csv_writer.cpp, used e.g. by
scatra's `output_nonlin_solver_stats`).
"""

from __future__ import annotations

import os

import numpy as np


class CsvMonitorCallback:
    """time_loop callback: append per-step nodal quantities + solver stats
    to a CSV file (one row per accepted step)."""

    def __init__(self, view, path: str, nodes=(), quantities=("dispx",)):
        self.view = view
        self.path = path
        self.nodes = list(nodes)
        self.quantities = list(quantities)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        cols = ["step", "time", "newton_iters", "lin_iters", "resnorm"]
        for n in self.nodes:
            for q in self.quantities:
                cols.append(f"{q}_n{n}")
        with open(self.path, "w") as fh:
            fh.write(",".join(cols) + "\n")

    def __call__(self, fieldname, state, agg):
        row = [
            str(int(state["step"])),
            f"{float(state['t']):.10g}",
            str(agg.get("newton_iters", 0)),
            str(agg.get("lin_iters", 0)),
            f"{agg.get('resnorm', 0.0):.6g}",
        ]
        for n in self.nodes:
            for q in self.quantities:
                row.append(f"{self.view.node_value(state, q, n):.12g}")
        with open(self.path, "a") as fh:
            fh.write(",".join(row) + "\n")


def compare_csv(path_a: str, path_b: str, rtol=1e-8, atol=1e-12):
    """Tolerance-based CSV diff (analog of utilities/diff_with_tolerance.py)."""
    a = np.genfromtxt(path_a, delimiter=",", names=True)
    b = np.genfromtxt(path_b, delimiter=",", names=True)
    if a.dtype.names != b.dtype.names:
        raise AssertionError(f"column mismatch: {a.dtype.names} vs {b.dtype.names}")
    for name in a.dtype.names:
        if not np.allclose(a[name], b[name], rtol=rtol, atol=atol):
            raise AssertionError(f"column {name} differs beyond tolerance")
    return True
