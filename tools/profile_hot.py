"""Micro-profile of the flagship-bench hot path at BENCH_N (default 72).

Usage: python tools/profile_hot.py <piece> [reps]
pieces: stencil vcycle jvp jvp_fused force mass cg step prep
       stencil_wide vcycle_wide jvp_wide (relayout-free wide layout)

Each piece should run in its OWN process (a TPU worker crash poisons the
process, and concurrent probes contaminate timings — round-2 notes).
Timing: N async dispatches + ONE scalar fetch at the end (on the remote
axon platform block_until_ready returns at dispatch).
"""

import os
import sys
import time

# repo root on sys.path (script dir is tools/); PYTHONPATH must stay unset —
# it breaks the axon TPU plugin's jax_plugins namespace-package discovery
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_field(n):
    import jax.numpy as jnp

    from fourc_tpu.core import gridgen
    from fourc_tpu.core.conditions import DirichletBC, NeumannBC
    from fourc_tpu.core.functions import FunctionManager
    from fourc_tpu.materials import make_material
    from fourc_tpu.physics import solid as ps

    disc = gridgen.box(n, n, n, cell="hex8")
    prof_mesh = os.environ.get("PROF_MESH", "lattice")
    if prof_mesh in ("unstructured", "permuted"):
        # same deterministic jitter as bench.py BENCH_MESH=unstructured
        X = np.array(disc.coords)
        rng = np.random.RandomState(0)
        interior = np.all((X > 1e-12) & (X < 1.0 - 1e-12), axis=1)
        h = 1.0 / n
        X[interior] += (rng.rand(int(interior.sum()), 3) - 0.5) * (0.35 * h)
        disc.coords = X
        disc.structured_shape = None
    if prof_mesh == "permuted":
        # general topology: random node renumbering (bench BENCH_MESH=permuted)
        rng = np.random.RandomState(1)
        perm = rng.permutation(disc.n_nodes).astype(np.int32)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(disc.n_nodes, dtype=np.int32)
        disc.coords = np.array(disc.coords)[perm]
        for key, blk in disc.blocks.items():
            blk.conn = inv[blk.conn]
        for nm in disc.node_sets:
            disc.node_sets[nm] = inv[disc.node_sets[nm]]
        for nm, fbs in disc.face_sets.items():
            for fb in fbs:
                fb.conn = inv[fb.conn]
    mat = make_material({"type": "neohooke", "youngs": 1.0e4, "nue": 0.3,
                         "density": 1.0})
    params = ps.SolidParams(kinem="nonlinear", dyntype="genalpha",
                            genalpha=ps.GenAlphaParams(rho_inf=0.9),
                            precond="gmg")
    fm = FunctionManager()
    fm.add(1, "sin(31.4159*t)")
    dbc = [DirichletBC(disc.node_sets["zmin"], [1, 1, 1], [0, 0, 0])]
    neu = [NeumannBC(disc.face_sets["zmax"], [1, 0, 0], [120.0, 0, 0],
                     funct=[1, 0, 0])]
    f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc, neumann=neu,
                      functions=fm)
    return f, ps


def timeit(fn, x, reps, fetch):
    """Time `reps` chained applications INSIDE one jitted program (a
    lax.fori_loop), like the fused step experiences them — per-dispatch
    tunnel overhead on the remote platform would otherwise dominate
    (measured ~3 ms/dispatch vs ~0.1 ms/kernel).  Requires fn output
    shape == input shape (all pieces here are vec -> vec); a tiny scale
    keeps the chained nonlinear iterates finite."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x0):
        def body(i, y):
            z = fn(y)
            return 1e-3 * z / jnp.maximum(jnp.linalg.norm(z), 1e-30)

        return jax.lax.fori_loop(0, reps, body, x0)

    y = loop(x)  # warm (compile)
    _ = fetch(y)
    t0 = time.perf_counter()
    y = loop(x)
    _ = fetch(y)
    dt = (time.perf_counter() - t0) / reps
    return dt


def main():
    piece = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n = int(os.environ.get("BENCH_N", "72"))

    import jax
    import jax.numpy as jnp

    f, ps = build_field(n)
    ndof = f.disc.n_nodes * 3
    key = jax.random.PRNGKey(0)
    v = 1e-3 * jax.random.normal(key, (ndof,), jnp.float32)
    u = 1e-3 * jax.random.normal(jax.random.PRNGKey(1), (ndof,), jnp.float32)

    def fetch(y):
        return float(y.reshape(-1)[0])

    dt = f.params.dt if f.params.dt else 0.02
    ga = f.params.genalpha
    mass_shift = (1 - ga.alpha_m) / (ga.beta * dt * dt)

    if piece in ("stencil", "vcycle", "stencil_wide", "vcycle_wide"):
        from fourc_tpu.linalg import gmg

        M = gmg.build_for_solid(f, mass_shift=mass_shift)
        lv = M.levels[0]
        x = v
        if piece == "stencil":
            g = jax.jit(lv.matvec)
        elif piece == "stencil_wide":
            from fourc_tpu.ops import lattice_pallas as lp

            x = lp.prep(v, f.lattice)
            g = jax.jit(lv.matvec_wide)
        elif piece == "vcycle_wide":
            from fourc_tpu.ops import lattice_pallas as lp

            x = lp.prep(v, f.lattice)
            g = jax.jit(M)
        else:
            g = jax.jit(M)
        t = timeit(g, x, reps, fetch)
    elif piece in ("jvp", "force", "jvp_fused", "mass"):
        from fourc_tpu.ops import lattice as lat

        spec = f.lattice
        cell = f._cell(next(iter(f.block_mat)))
        mat = next(iter(f.block_mat.values()))
        if piece == "force":
            fn = lat.make_force_flat(spec, cell, mat)
            g = jax.jit(fn)
            t = timeit(g, u, reps, fetch)
        elif piece == "mass":
            g = jax.jit(lambda x: f.mass_matvec(x))
            t = timeit(g, v, reps, fetch)
        else:
            mc = mass_shift if piece == "jvp_fused" else 0.0
            tan = lat.make_tangent_flat(spec, cell, mat, mass_coef=mc)
            g = jax.jit(lambda x: tan(u, x))
            t = timeit(g, v, reps, fetch)
    elif piece == "jvp_wide":
        from fourc_tpu.ops import lattice as lat
        from fourc_tpu.ops import lattice_pallas as lp

        spec = f.lattice
        cell = f._cell(next(iter(f.block_mat)))
        mat = next(iter(f.block_mat.values()))
        force_w = lat.make_force_wide(spec, cell, mat)
        uw = lp.prep(u, spec)
        g = jax.jit(lambda x: jax.jvp(force_w, (uw,), (x,))[1])
        t = timeit(g, lp.prep(v, spec), reps, fetch)
    elif piece in ("gforce", "gjvp", "gvcycle", "gmass", "gext", "gscat"):
        # GENERAL-path pieces (hoisted like the real step): element force
        # via dofmap gather/scatter, its jvp, and the flat GMG V-cycle
        if piece == "gvcycle":
            from fourc_tpu.linalg import gmg

            M = gmg.build_for_solid(f, mass_shift=mass_shift)
            for lv in M.levels:
                for nm in ("Xe", "Ke", "dinv", "mlump", "w"):
                    if getattr(lv, nm, None) is not None:
                        f.hoister.register_attr(lv, nm)
            g = f.hoister.jit(M)
            t = timeit(g, v, reps, fetch)
        elif piece == "gforce":
            g = f.hoister.jit(lambda x: f.internal_force(x)[0])
            t = timeit(g, u, reps, fetch)
        elif piece == "gjvp":
            def mv(x):
                return jax.jvp(lambda y: f.internal_force(y)[0], (u,), (x,))[1]

            g = f.hoister.jit(mv)
            t = timeit(g, v, reps, fetch)
        elif piece == "gmass":
            g = f.hoister.jit(lambda x: f.mass_matvec(x))
            t = timeit(g, v, reps, fetch)
        elif piece == "gscat":
            dm = f.dofmap
            key0 = next(iter(dm.blocks))

            def gs(x):
                ue = dm.gather(x, key0)
                return dm.scatter_add({key0: ue.reshape(ue.shape[0], -1)})

            g = f.hoister.jit(gs)
            t = timeit(g, v, reps, fetch)
        else:
            g = f.hoister.jit(lambda x: f.external_force(0.013, x))
            t = timeit(g, v, reps, fetch)
    elif piece in ("amg_vcycle", "amg_spmv"):
        M = f._build_amg(mass_shift=mass_shift)
        if piece == "amg_vcycle":
            g = jax.jit(M)
        else:
            A0 = M.levels[0]["A"]
            g = jax.jit(A0.mv)
        t = timeit(g, v, reps, fetch)
    elif piece == "gather_scatter":
        dm = f.dofmap
        key0 = next(iter(dm.blocks))

        def gs(x):
            ue = dm.gather(x, key0)
            return dm.scatter_add({key0: ue.reshape(ue.shape[0], -1)})

        g = jax.jit(gs)
        t = timeit(g, v, reps, fetch)
    elif piece == "prep":
        from fourc_tpu.ops import lattice_pallas as lp

        spec = f.lattice
        g = jax.jit(lambda x: lp._post(lp._prep(x, spec), spec))
        t = timeit(g, v, reps, fetch)
    elif piece == "residual":
        # gen-alpha residual as built in the step (force + mass + ext)
        state = ps.compute_initial_state(f, ps.init_state(f))

        def res(d_new):
            fi, _ = f.internal_force(d_new, dt=dt)
            return fi + mass_shift * f.mass_matvec(d_new) - f.external_force(
                0.01, d_new)

        g = jax.jit(res)
        t = timeit(g, u, reps, fetch)
    elif piece == "cg":
        from fourc_tpu.linalg import gmg, solvers as ls

        M = gmg.build_for_solid(f, mass_shift=mass_shift)

        def res(d_new):
            fi, _ = f.internal_force(d_new, dt=dt)
            return fi + mass_shift * f.mass_matvec(d_new)

        w = f.dbc.free_w

        def A(x):
            xm = w * x
            _, jv = jax.jvp(res, (u,), (xm,))
            return w * jv + (1.0 - w) * x

        b = w * v

        def solve(bb):
            r = ls.cg(A, bb, M=M, tol=1e-4, maxiter=20)
            return r.x

        g = jax.jit(solve)
        y = g(b)
        _ = fetch(y)
        t0 = time.perf_counter()
        for _ in range(reps):
            y = g(b)
        _ = fetch(y)
        t = (time.perf_counter() - t0) / reps
    else:
        raise SystemExit(f"unknown piece {piece}")

    print(f"PIECE {piece} n={n} reps={reps}: {1e3 * t:.3f} ms")


if __name__ == "__main__":
    main()
