"""Offline post-processor: checkpoints -> VTU / Ensight / CSV extracts.

Counterpart of the reference's post-processing apps
(ref: apps/post_processor — reads the control file + binary results and
writes Ensight/VTK, src/post/4C_post_ensight_writer.* /
4C_post_vtk_vtu_writer.*; apps/post_monitor — nodal time histories).

Usage:
  python -m fourc_tpu.app.post <deck.yaml> --checkpoints DIR
      [--format vtu|ensight] [--out DIR]
      [--monitor NODE:QUANTITY ...]    (post_monitor analog -> CSV)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="fourc_tpu.post", description=__doc__)
    p.add_argument("deck")
    p.add_argument("--checkpoints", required=True, help="checkpoint dir")
    p.add_argument("--format", default="vtu", choices=("vtu", "ensight"))
    p.add_argument("--out", default=None, help="output dir (default: ckpt dir)")
    p.add_argument("--monitor", nargs="*", default=[],
                   metavar="NODE:QUANTITY",
                   help="extract nodal time histories to monitor.csv")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from fourc_tpu.io import deck as deck_mod
    from fourc_tpu.io.checkpoint import Checkpointer

    deck = deck_mod.load(args.deck)
    # field drivers checkpoint under the FIELD name prefix
    import glob as _glob

    ctls = _glob.glob(os.path.join(args.checkpoints, "*.control"))
    prefix = (os.path.basename(ctls[0])[: -len(".control")]
              if ctls else "run")
    ck = Checkpointer(args.checkpoints, prefix=prefix, deck=deck)
    ctl = ck._read_control()
    steps = ctl["steps"]
    fields = ctl["fields"]
    if not steps:
        print("no checkpointed steps found", file=sys.stderr)
        return 1
    outdir = args.out or args.checkpoints
    os.makedirs(outdir, exist_ok=True)

    name = fields[0]
    disc = deck.disc.get(name) or next(iter(deck.disc.values()))
    blocks = {k: b for k, b in disc.blocks.items()}

    writer = None
    if args.format == "ensight":
        from fourc_tpu.io.ensight import EnsightWriter

        writer = EnsightWriter(outdir, name, np.asarray(disc.coords), blocks)

    entries = []
    mon_rows = []
    for step in steps:
        with np.load(ck._step_path(step)) as data:
            arrays = {k.split("::", 1)[1]: v for k, v in data.items()
                      if k.startswith(name + "::")}
        t = float(arrays.get("t", step))
        point_data = {}
        n = disc.n_nodes
        for key in ("d", "phi", "T", "p", "x"):
            if key in arrays and arrays[key].size % n == 0:
                point_data[{"d": "displacement", "phi": "phi", "T":
                            "temperature", "p": "pressure", "x": "solution"}
                           [key]] = arrays[key].reshape(n, -1).squeeze()
        if args.format == "vtu":
            from fourc_tpu.io.vtu import write_pvd, write_vtu

            fn = f"{name}-{step:05d}.vtu"
            write_vtu(os.path.join(outdir, fn), np.asarray(disc.coords),
                      {k: b.conn for k, b in blocks.items()},
                      point_data=point_data)
            entries.append((t, fn))
            write_pvd(os.path.join(outdir, f"{name}.pvd"), entries)
        else:
            writer.write_step(t, point_data)
        for spec in args.monitor:
            node_s, q = spec.split(":")
            node = int(node_s)
            for pname, dataarr in point_data.items():
                if q in (pname, pname[:4]) or q.rstrip("xyz") in pname:
                    comp = {"x": 0, "y": 1, "z": 2}.get(q[-1], None)
                    v = (dataarr[node] if dataarr.ndim == 1
                         else dataarr[node, comp or 0])
                    mon_rows.append((step, t, node, q, float(v)))
    if args.monitor and mon_rows:
        with open(os.path.join(outdir, "monitor.csv"), "w") as fh:
            fh.write("step,time,node,quantity,value\n")
            for row in mon_rows:
                fh.write(",".join(map(str, row)) + "\n")
    print(f"post: {len(steps)} steps -> {outdir} ({args.format})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
