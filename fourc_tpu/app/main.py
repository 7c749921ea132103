"""Command-line driver.

Analog of the reference's global_full app (ref:
apps/global_full/4C_global_full_main.cpp:39-110 arg parsing + help;
:280 main -> ntam -> input -> dispatch -> result tests).

Usage:
  python -m fourc_tpu.app.main <deck.yaml> [--platform cpu|axon]
      [--x64/--no-x64] [--restart N] [--parameters]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="fourc_tpu", description=__doc__)
    p.add_argument("deck", nargs="?", help="input deck (.yaml)")
    p.add_argument("--platform", default=None, help="jax platform (cpu/tpu/axon)")
    p.add_argument("--x64", action=argparse.BooleanOptionalAction, default=True,
                   help="double precision (default on; disable on TPU)")
    p.add_argument("--restart", type=int, default=0, help="restart from step N")
    p.add_argument("--restart-from", default=None, help="checkpoint directory")
    p.add_argument("--parameters", action="store_true",
                   help="print the full deck schema and exit (ref: 4C --parameters)")
    p.add_argument("--timers", action="store_true", help="print phase-timer table")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace of the run to DIR "
                        "(TensorBoard-viewable; the TimeMonitor analog)")
    p.add_argument("--debug-nans", action="store_true",
                   help="raise on NaN/Inf in any computation (the analog of "
                        "the reference's FPE trapping, feenableexcept)")
    p.add_argument("--ngroup", type=int, default=1,
                   help="run N independent instances of the deck and compare "
                        "their results (the reference's -ngroup nested "
                        "parallelism with nptype=diffgroup; ref: "
                        "4C_comm_utils.hpp:94-150, main help :78-82)")
    args = p.parse_args(argv)

    if args.parameters:
        from fourc_tpu.io.deck import DECK_SPEC, describe

        print(describe(DECK_SPEC))
        return 0
    if not args.deck:
        p.error("deck file required")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from fourc_tpu.io import deck as deck_mod
    from fourc_tpu.io.result_test import run_result_tests
    from fourc_tpu.physics import driver

    deck = deck_mod.load(args.deck)
    if args.restart:
        deck.problem["restart"] = args.restart
    if args.restart_from:
        deck.sections["io"]["output_dir"] = args.restart_from
    print(f"fourc_tpu: problem={deck.problem_type}, "
          f"discretizations={ {k: (v.n_nodes, v.n_elements) for k, v in deck.disc.items()} }, "
          f"devices={jax.devices()}")

    if args.ngroup > 1:
        # diffgroup: every group must produce bitwise-identical states
        # (determinism oracle; the reference compares group 0 vs 1 results)
        import numpy as np

        results = []
        for g in range(args.ngroup):
            results.append(driver.run(deck_mod.load(args.deck)))
        result = results[0]
        for g, rg in enumerate(results[1:], start=1):
            for name, st in result.states.items():
                l0, _ = jax.tree_util.tree_flatten(st)
                lg, _ = jax.tree_util.tree_flatten(rg.states[name])
                for a, b in zip(l0, lg):
                    if not np.array_equal(np.asarray(a), np.asarray(b)):
                        print(f"[DIFFGROUP] group {g} field {name} "
                              f"differs from group 0")
                        return 1
        print(f"diffgroup: {args.ngroup} groups bitwise identical")
    elif args.profile:
        with jax.profiler.trace(args.profile):
            result = driver.run(deck)
    else:
        result = driver.run(deck)

    if args.timers and result.timers:
        print(result.timers.summary())

    rc = 0
    if deck.result_tests:
        tests = run_result_tests(deck.result_tests, result)
        for t in tests:
            print(t)
        nfail = sum(not t.ok for t in tests)
        print(f"result tests: {len(tests) - nfail}/{len(tests)} passed")
        rc = 1 if nfail else 0
    return rc


if __name__ == "__main__":
    sys.exit(main())
