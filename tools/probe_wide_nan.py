"""Finiteness probe of every wide-layout piece at BENCH_N on the real TPU.

Usage: python tools/probe_wide_nan.py <piece>
pieces: force jvp mass vcycle residual newton0
Each piece in its OWN process (a TPU fault poisons the process).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    piece = sys.argv[1]
    n = int(os.environ.get("BENCH_N", "72"))

    import jax
    import jax.numpy as jnp

    from tools.profile_hot import build_field

    f, ps = build_field(n)
    spec = f.lattice
    from fourc_tpu.ops import lattice as lat, lattice_pallas as lp

    ndof = f.disc.n_nodes * 3
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(ndof).astype(np.float32)) * 1e-3
    v = jnp.asarray(rng.randn(ndof).astype(np.float32)) * 1e-3
    uw = lp.prep(u, spec)
    vw = lp.prep(v, spec)

    def report(name, yw):
        y = np.asarray(yw)
        finite = bool(np.isfinite(y).all())
        # split real region vs padding garbage
        real = np.asarray(lp.crop_real(jnp.asarray(y), spec))
        pad_mask = np.ones(y.shape, bool)
        px, py, pz = spec.pshape
        BX = lp.BX
        pad_mask[:, BX + 1:BX + 1 + px, 1:1 + py, 1:1 + pz] = False
        pad = y[pad_mask]
        print(f"{name}: all_finite={finite} "
              f"real_finite={bool(np.isfinite(real).all())} "
              f"real_absmax={np.abs(real).max():.3e} "
              f"pad_absmax={np.abs(pad).max() if pad.size else 0:.3e} "
              f"pad_nonfinite={int((~np.isfinite(pad)).sum())}")

    cell = f._cell(next(iter(f.block_mat)))
    mat = next(iter(f.block_mat.values()))

    if piece == "force":
        fw = lat.make_force_wide(spec, cell, mat)
        report("force", fw(uw))
    elif piece == "jvp":
        fw = lat.make_force_wide(spec, cell, mat)
        _, dy = jax.jvp(fw, (uw,), (vw,))
        report("jvp", dy)
    elif piece == "mass":
        Mst = f._mass_stencil()
        report("mass", lat.stencil_matvec_wide(Mst, vw, spec))
    elif piece.startswith("vcycle") or piece.startswith("lvl"):
        from fourc_tpu.linalg import gmg

        dt = 0.02
        ga = f.params.genalpha
        ms = (1 - ga.alpha_m) / (ga.beta * dt * dt)
        M = gmg.build_for_solid(f, mass_shift=ms)
        if piece == "vcycle":
            report("vcycle", M(vw))
        elif piece == "vcycle_jit":
            report("vcycle_jit", jax.jit(M)(vw))
        elif piece.startswith("lvl"):
            # lvl<k>_<op>: matvec | cheby | chebyres | down
            tag = piece[3:]
            k, op = tag.split("_", 1)
            k = int(k)
            lv = M.levels[k]
            x = vw
            for kk in range(k):  # restrict a fine vector down to level k
                x = M._restrict(x, M.levels[kk], M.levels[kk + 1], wide=True)
            report(f"input_l{k}", x)
            if op == "matvec":
                report(piece, lv.matvec_wide(x))
            elif op == "cheby":
                report(piece, lv.chebyshev0(x, wide=True))
            elif op == "chebyres":
                z, res = lv.chebyshev0(x, return_res=True, wide=True)
                report(piece + "_z", z)
                report(piece + "_res", res)
            elif op.startswith("chain"):
                # chain<k>[b]: k matvecs back-to-back, 'b' = barrier between
                barrier = op.endswith("b")
                kk = int(op[5:-1] if barrier else op[5:])

                @jax.jit
                def chain(x0):
                    y = x0
                    for _ in range(kk):
                        y = lv.matvec_wide(y)
                        if barrier:
                            y = jax.lax.optimization_barrier(y)
                        y = y * (1.0 / jnp.maximum(
                            jnp.sqrt(jnp.sum(y * y)), 1e-30))
                    return y

                report(piece, chain(x))
            elif op.startswith("axpy"):
                # cheby-shaped chain: y = a*y + b*matvec(y) (no normalize)
                kk = int(op[4:])

                @jax.jit
                def chain(x0):
                    d = x0
                    xx = x0
                    for _ in range(kk):
                        t = lv.matvec_wide(d)
                        d = 0.5 * d + 0.25 * t
                        xx = xx + d
                    return xx

                report(piece, chain(x))
            elif op == "down":
                # one full descend-ascend at this level without recursion
                z, res = lv.chebyshev0(x, return_res=True, wide=True)
                rc = M._restrict(res, lv, M.levels[k + 1], wide=True)
                zc = M.levels[k + 1].chebyshev0(rc, wide=True)
                z = z + M._interp(zc, lv, M.levels[k + 1], wide=True)
                res2 = x - lv.matvec_wide(z)
                z = z + lv.chebyshev0(res2, wide=True)
                report(piece, z)
    elif piece == "residual":
        # the exact residual the wide step builds at step 1
        from fourc_tpu.physics import solid_lattice as sl

        state = ps.compute_initial_state(f, ps.init_state(f))
        ws = sl.widen_state(f, state)
        fw = lat.make_force_wide(spec, cell, mat)
        Mst = f._mass_stencil()
        dt = 0.02
        ga = f.params.genalpha
        am, af, beta, gamma = ga.alpha_m, ga.alpha_f, ga.beta, ga.gamma
        from fourc_tpu.physics.solid import _newmark_updates

        t1 = float(state["t"]) + dt
        fext1 = lp.prep(f.external_force(t1), spec)
        w_wide = lp.prep(f.dbc.free_w, spec)
        gw = lp.prep((1.0 - f.dbc.free_w)
                     * f.dbc.values(t1).astype(f.dbc.free_w.dtype), spec)
        d_n, v_n, a_n = ws["d"], ws["v"], ws["a"]
        u0 = w_wide * d_n + gw
        v_new, a_new = _newmark_updates(f, dt, u0, d_n, v_n, a_n, beta, gamma)
        a_mid = (1 - am) * a_new + am * a_n
        fint_mid = (1 - af) * fw(u0) + af * ws["fint"]
        r = lat.stencil_matvec_wide(Mst, a_mid, spec) + fint_mid - (
            (1 - af) * fext1 + af * ws["fext"])
        report("residual", r)
        report("u0", u0)
        report("fext1", fext1)
    else:
        raise SystemExit(f"unknown piece {piece}")


if __name__ == "__main__":
    main()
