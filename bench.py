"""Benchmark: 1M-DOF nonlinear hyperelastic implicit gen-alpha step.

BASELINE.json north star: assembly + full Newton on one TPU chip,
target < 150 ms / implicit step.  Prints ONE JSON line:
  {"metric": ..., "value": ms_per_step, "unit": "ms", "vs_baseline": ...}

vs_baseline = target_ms / measured_ms  (>1 means faster than target).

Env overrides: BENCH_N (elements per edge, default 72 -> 1.17M dofs),
BENCH_STEPS, BENCH_PRECOND, BENCH_MESH (lattice | unstructured = jittered
coords on box topology | permuted = jittered + randomly renumbered nodes,
genuinely general topology through the flat gather/scatter + SA-AMG path),
BENCH_RAYLEIGH=1 (Rayleigh-damped lumped-mass wide variant), BENCH_CELL
(hex8 | tet4 — a tet mesh is general topology by construction; combine
with BENCH_MESH=permuted for the fully unstructured configuration).

A default invocation (no BENCH_N/BENCH_MESH override) additionally runs
the VARIANT matrix in subprocesses and embeds their JSON under
detail.variants, so one driver capture records the whole perf story:
  unstructured_1M : jittered box at the flagship size (wide general-
                    geometry kernels + exact-geometry GMG)
  permuted_500k   : general topology at >= 500k dofs (flat path + SA-AMG)
  f64_northstar   : JAX_ENABLE_X64=1, Newton to tol_res 1e-8 abs
Disable with BENCH_VARIANTS=0.
"""

import json
import os
import subprocess
import sys
import time


def main():
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        # the axon TPU plugin pre-registers itself (sitecustomize), so the
        # JAX_PLATFORMS env var alone cannot pin a backend — config wins
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import numpy as np

    # persistent XLA compilation cache: the 1.17M-dof fused step program
    # compiles in ~4-5 min on the remote TPU; cached reruns cut that to
    # seconds (harmless miss on a fresh machine)
    try:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        # persist the SA-AMG hierarchy too: the host-side setup at 555k
        # dofs costs ~45 min on this 1-core host and is deterministic
        os.environ.setdefault("FOURC_AMG_CACHE", cache)
    except Exception:
        pass

    from fourc_tpu.core import gridgen
    from fourc_tpu.core.conditions import DirichletBC, NeumannBC
    from fourc_tpu.materials import make_material
    from fourc_tpu.physics import solid as ps

    # n=72 -> 1.17M dofs (above the 1M-DOF north star).  Even n -> full
    # geometric-multigrid hierarchy.
    n = int(os.environ.get("BENCH_N", "72"))
    # 10 timed steps: amortizes the single end-of-region host fetch
    # (~28 ms tunnel RTT) to <3 ms/step of measurement artifact
    n_steps = int(os.environ.get("BENCH_STEPS", "10"))
    mesh_kind = os.environ.get("BENCH_MESH", "lattice")  # lattice|unstructured
    # gmg by default on BOTH mesh kinds: the unstructured bench jitters
    # coordinates but keeps box topology, and the lattice detection keys
    # off CONNECTIVITY only (core/mesh.py _detect_conn_lattice) — the
    # geometric hierarchy uses the true jittered coords per level.  Meshes
    # with general topology fall back to SA-AMG automatically.
    precond = os.environ.get("BENCH_PRECOND", "gmg")
    host_newton = os.environ.get("BENCH_HOST_NEWTON", "0") == "1"
    # wide-layout lattice stepping (physics/solid_lattice.py): the whole
    # Newton-Krylov loop stays in the (3, X, Y, Z) kernel layout — no
    # flat<->lattice relayouts in the hot path.  Falls back to the flat
    # step automatically when ineligible (unstructured mesh, etc).
    # wide works on BOTH mesh kinds since round 4: uniform lattices use the
    # collapsed-stencil kernels, general-geometry lattice topologies use the
    # in-kernel-jacobian kernels (ops/lattice_pallas general variants)
    wide = os.environ.get("BENCH_WIDE", "1") == "1"

    cell = os.environ.get("BENCH_CELL", "hex8")  # hex8 | tet4 (6 tets/hex)
    disc = gridgen.box(n, n, n, cell=cell)
    if mesh_kind in ("unstructured", "permuted"):
        # jitter interior nodes (deterministic): kills the structured-
        # lattice provenance, so the step runs the general gather/scatter
        # element kernels with the SA-AMG preconditioner — the second
        # benchmark config of the north star (unstructured-mesh path).
        X = np.array(disc.coords)
        rng = np.random.RandomState(0)
        interior = np.all((X > 1e-12) & (X < 1.0 - 1e-12), axis=1)
        h = 1.0 / n
        X[interior] += (rng.rand(int(interior.sum()), 3) - 0.5) * (0.35 * h)
        disc.coords = X
        disc.structured_shape = None
    if mesh_kind == "permuted":
        # genuinely general TOPOLOGY: randomly renumber the nodes so no
        # lattice structure survives in the connectivity (the flat
        # gather/scatter + SA-AMG path, as any externally-read tet/hex
        # mesh would run). The framework is expected to recover locality
        # itself (node reordering at dofmap build).
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
    ndof = disc.n_nodes * 3

    mat = make_material({"type": "neohooke", "youngs": 1.0e4, "nue": 0.3, "density": 1.0})
    params = ps.SolidParams(
        kinem="nonlinear",
        dyntype="genalpha",
        genalpha=ps.GenAlphaParams(rho_inf=0.9),
        precond=precond,
        host_newton=host_newton,
        wide=wide,
    )
    if os.environ.get("BENCH_RAYLEIGH", "0") == "1":
        # round-5 fast-path widening: Rayleigh-damped lumped-mass variant
        # runs in the SAME wide lattice kernels (physics/solid_lattice.py)
        params.rayleigh_alpha = 0.3
        params.rayleigh_beta = 0.002
        params.mass = "lumped"
    # f32 on TPU: relative residual drop of 1e-4 (the measured f32 residual
    # floor for this problem is ~3e-5 relative; BASELINE's 1e-8 abs maps to
    # f64 semantics and is reached when run with x64)
    # absolute floor: the measured f32 roundoff floor of this residual is
    # ~1.2e-2 at 15k dofs and scales ~sqrt(ndof) (x64 runs use 1e-8 abs)
    if jax.config.jax_enable_x64:
        # North-Star semantics: Newton converges on the RESIDUAL alone to
        # 1e-8 absolute (the increment test is disabled so it cannot
        # short-circuit the claim)
        params.newton.tol_res = 1e-8
        params.newton.tol_res_rel = 0.0
        params.newton.tol_disp = 1e30
        params.newton.combine = "and"
    else:
        params.newton.tol_res = 1.5e-4 * ndof**0.5
        params.newton.tol_res_rel = 1e-4
        params.newton.tol_disp = 1e-7 * ndof**0.5
        params.newton.combine = "or"
    params.newton.max_iter = int(os.environ.get("BENCH_MAXIT", "12"))
    params.newton.stag_tol = 0.5  # stop at the f32 roundoff floor
    # accept the f32 floor only after a >=100x residual drop within the
    # step (at 1.17M dofs / 20% load swings the floor sits ~1e-3 relative,
    # above the old 3e-3*r0 gate's reach on the hardest steps)
    params.newton.stag_min_drop = 1e-2
    # stagnation early-accept OFF by default: measured at n=72/amp=400 the
    # residual keeps dropping to 0.059 < tol in <=5 iters — the old
    # stag_tol=0.5 fired one iteration early and left steps at 1.5
    if os.environ.get("BENCH_STAG", "0") != "1":
        params.newton.stag_tol = 0.0
    # constdis: the extrapolated (constvelacc) predictor overshoots badly
    # on the load REVERSALS this workload is built from (v, a point the
    # wrong way), leaving Newton at an indefinite-tangent state that kills
    # CG — measured NaN at step 4, n=24; constdis converges every step
    params.predictor = os.environ.get("BENCH_PREDICT", "constdis")
    params.newton.lin_maxiter = 1000
    params.newton.lin_rtol = 1e-4

    # Sinusoidal shear traction (period 10 dt): the load changes
    # substantially EVERY step, so each step needs a genuine multi-iteration
    # Newton solve — no near-converged-at-entry steps (the reference's
    # regression decks ramp loads the same way via FUNCT curves).
    from fourc_tpu.core.functions import FunctionManager

    fm = FunctionManager()
    # phase advance of 1.6 rad/step (dt=0.02): successive load values are
    # 0.9996, -0.058, -0.996, 0.116, ... — the load swings by O(amp) EVERY
    # step, so no step is near-converged at entry (a zero-delta step like
    # the old 10*dt period produced converges in 1 Newton iteration, which
    # benchmarks nothing)
    # amp=400 / freq=50 (1.0 rad/step): ~4% strain swings every step.
    # The smooth entry ramp (1 - exp(-t/3dt)) is REQUIRED at this
    # amplitude: a cold 0 -> 336 first-step load jump diverges the f32
    # Newton (CG hits lin_maxiter, NaN); with the warmed-up predictor the
    # same +-350 swings converge fine from step 3 on.
    freq = float(os.environ.get("BENCH_FREQ", "50.0"))
    if os.environ.get("BENCH_RAMP", "1") == "1":
        fm.add(1, f"sin({freq}*t)*(1-exp(-t/0.06))")
    else:
        fm.add(1, f"sin({freq}*t)")
    amp = float(os.environ.get("BENCH_AMP", "400.0"))
    if os.environ.get("BENCH_LS", "0") == "1":
        params.newton.line_search = True
    dbc = [DirichletBC(disc.node_sets["zmin"], [1, 1, 1], [0, 0, 0])]
    neu = [NeumannBC(disc.face_sets["zmax"], [1, 0, 0], [amp, 0, 0],
                     funct=[1, 0, 0])]
    f = ps.SolidField(disc, {1: mat}, params, dirichlet=dbc, neumann=neu,
                      functions=fm)

    state = ps.compute_initial_state(f, ps.init_state(f))
    step = ps.make_step(f, dt=0.02)

    def sync(st):
        # a host FETCH, not block_until_ready: on the remote (axon)
        # platform block_until_ready can return before execution finishes,
        # which times only the dispatch
        return float(st["d"].reshape(-1)[0])

    # warmup (compile + first step)
    t0 = time.perf_counter()
    state, stats = step(state)
    sync(state)
    compile_s = time.perf_counter() - t0

    # tunnel round-trip cost of one tiny fetch (reported, and subtracted
    # implicitly by timing all steps in one region with a single fetch)
    t0 = time.perf_counter()
    sync(state)
    rtt_ms = 1e3 * (time.perf_counter() - t0)

    newtons = []
    lins = []
    all_stats = []
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, stats = step(state)
        all_stats.append(stats)
    sync(state)
    total = time.perf_counter() - t0
    for stats in all_stats:
        newtons.append(int(stats["iters"]))
        lins.append(int(stats["lin_iters"]))

    ms = 1e3 * total / n_steps
    target_ms = 150.0
    variants = _run_variants(n)
    result = {
        "metric": f"time_per_implicit_step_{ndof//1000}kDOF_neohooke_genalpha",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(target_ms / ms, 4),
        "detail": {
            "ndof": ndof,
            "elements": int(disc.n_elements),
            "newton_iters": newtons,
            "krylov_iters": lins,
            "resnorm": float(stats["resnorm"]),
            "converged": bool(stats["converged"]),
            "compile_s": round(compile_s, 2),
            "fetch_rtt_ms": round(rtt_ms, 2),
            "dofs_per_sec": round(ndof / (ms / 1e3)),
            "precond": precond,
            "wide_layout": bool(state["d"].ndim == 4),
            "device": str(jax.devices()[0]),
        },
    }
    if variants:
        result["detail"]["variants"] = variants
    print(json.dumps(result))


def _run_variants(flagship_n):
    """Default-invocation variant matrix (subprocesses; each prints its own
    JSON line which is embedded verbatim).  Returns {} when variants are
    disabled or this IS a variant/overridden run."""
    if os.environ.get("BENCH_VARIANTS", "1") != "1":
        return {}
    if "BENCH_N" in os.environ or "BENCH_MESH" in os.environ \
            or os.environ.get("BENCH_RAYLEIGH") == "1" \
            or os.environ.get("JAX_ENABLE_X64"):
        return {}  # an explicitly-configured run benchmarks only itself
    specs = {
        # jittered box at flagship size: general-geometry wide kernels +
        # exact-geometry GMG (round-4 path, now driver-recorded).  The
        # in-kernel-jacobian compile is the slowest program in the suite
        # (> 45 min cold on a degraded chip) — give it its own timeout
        "unstructured_1M": {"BENCH_MESH": "unstructured",
                            "BENCH_N": str(flagship_n), "BENCH_STEPS": "5",
                            "_timeout": "5400"},
        # genuinely general topology >= 500k dofs: flat path + SA-AMG
        "permuted_500k": {"BENCH_MESH": "permuted", "BENCH_N": "56",
                          "BENCH_STEPS": "5"},
        # f64 North-Star semantics: Newton to tol_res 1e-8 absolute.
        # Runs on CPU: Mosaic has no f64 kernels, and with the XLA-path
        # fallback in place the axon TPU WORKER still crashes with a
        # kernel fault executing the f64 step (reproduced twice in
        # isolation; small f64 probes run fine) — a platform limitation,
        # recorded here rather than hidden. The converged 1e-8 run is
        # what this variant documents.
        "f64_northstar": {"JAX_ENABLE_X64": "1", "BENCH_PLATFORM": "cpu",
                          "BENCH_N": "16", "BENCH_STEPS": "2",
                          "BENCH_WIDE": "0", "FOURC_LATTICE": "0",
                          "BENCH_PRECOND": "amg"},
        # widened fast path: Rayleigh damping + lumped mass in the wide
        # lattice kernels.  n = 32: the stiffness-proportional damping
        # term runs the XLA-reference stencils (second-order jvp), whose
        # unrolled intermediates tile-pad ~56x — n = 48 needs 33 GB of
        # HBM at compile (OOM on a 16 GB chip); n = 32 fits
        "rayleigh_wide": {"BENCH_RAYLEIGH": "1", "BENCH_N": "32",
                          "BENCH_STEPS": "5"},
    }
    here = os.path.abspath(__file__)
    out = {}
    budget = float(os.environ.get("BENCH_VARIANTS_BUDGET", "7200"))
    t_start = time.perf_counter()
    for name, envup in specs.items():
        if time.perf_counter() - t_start > budget:
            out[name] = {"error": "skipped: variants wall-clock budget "
                                  f"({budget:.0f}s) exhausted"}
            continue
        env = dict(os.environ)
        env.update(envup)
        vtimeout = float(env.pop("_timeout", os.environ.get(
            "BENCH_VARIANT_TIMEOUT", "3600")))
        env["BENCH_VARIANTS"] = "0"
        try:
            t0 = time.perf_counter()
            proc = subprocess.run(
                [sys.executable, here], env=env, capture_output=True,
                text=True, timeout=vtimeout)
            line = [ln for ln in proc.stdout.strip().splitlines()
                    if ln.startswith("{")]
            if line:
                out[name] = json.loads(line[-1])
                out[name]["wall_s"] = round(time.perf_counter() - t0, 1)
            else:
                out[name] = {"error": (proc.stderr or "no output")[-500:]}
        except Exception as e:  # noqa: BLE001 — record, don't abort the bench
            out[name] = {"error": str(e)[:500]}
    return out


if __name__ == "__main__":
    main()
