"""Standalone particle problem driver: DEM / SPH without a structure.

Counterpart of the reference's pure-particle simulations
(ref: src/particle_algorithm — ParticleAlgorithm time loop over the
particle engine, DEM/SPH interactions; the pasi driver couples the same
engine to a structure, here the particle field runs alone).

Deck::

  problem: {type: particle}
  particle_dynamic: {kind: dem | sph, timestep: .., numstep: ..,
                     substeps: 10}
  particles:
    positions: [[x,y,z], ...]   # or generator: {kind: grid, lo, hi, n}
    velocities: [[...], ...]    # optional
    radii: 0.1                  # scalar or list (DEM)
    mass: 1.0
    dem: {k_normal, damp_normal, friction_mu, rolling_mu, adhesion_f0,
          adhesion_gap, gravity}
    sph: {h, rho0, c0, gamma, alpha_visc, surface_tension, gravity}
    boundary: [i, j, ...]       # static boundary-particle indices (SPH)
    walls: [{point: [..], normal: [..]}]   # analytic planes (DEM)

Result tests address particles by index: quantity posx/posy/posz/velx/...
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fourc_tpu.physics import driver as drv
from fourc_tpu.utils.timer import Timers


def _coerce(d):
    """YAML 1.1 quirk: '5.0e4' (exponent without sign) parses as a string —
    coerce numeric-looking strings (same guard as io/deck.py materials)."""
    out = {}
    for k, v in d.items():
        if isinstance(v, str):
            try:
                v = float(v)
            except ValueError:
                pass
        out[k] = v
    return out


def _one_box(gen):
    lo = np.asarray(gen.get("lo", (0, 0, 0)), float)
    hi = np.asarray(gen.get("hi", (1, 1, 1)), float)
    n = np.asarray(gen.get("n", (2, 2, 2)), int)
    axes = [np.linspace(lo[d], hi[d], int(n[d])) for d in range(len(n))]
    grid = np.meshgrid(*axes, indexing="ij")
    return np.stack([g.reshape(-1) for g in grid], axis=1)


def _positions(psec):
    """Particle cloud from the deck: explicit positions, one generator
    box, or a LIST of generator boxes (each optionally `boundary: true` —
    static wall particles, the SPH dam-break setup).  Returns
    (positions, boundary_idx_or_None)."""
    gen = psec.get("generator")
    if isinstance(gen, list):
        parts, bidx, off = [], [], 0
        for g in gen:
            p = _one_box(g)
            parts.append(p)
            if g.get("boundary"):
                bidx.extend(range(off, off + p.shape[0]))
            off += p.shape[0]
        return np.concatenate(parts, axis=0), (
            np.asarray(bidx, int) if bidx else None)
    if gen:
        return _one_box(gen), None
    return np.asarray(psec["positions"], float), None


def run(deck, callbacks=None) -> drv.RunResult:
    from fourc_tpu.particles import engine as pe

    timers = Timers()
    psec = dict(deck.sections.get("particles") or deck.raw.get("particles") or {})
    dyn = deck.sections["particle_dynamic"]
    x0, gen_boundary = _positions(psec)
    n_p, dim = x0.shape
    masses = jnp.asarray(np.broadcast_to(
        np.asarray(psec.get("mass", 1.0), float), (n_p,)))
    v0 = psec.get("velocities")
    v0 = None if v0 is None else jnp.asarray(np.asarray(v0, float))
    state = pe.init_state(x0, v0)
    n_sub = int(dyn["substeps"])
    dt_sub = float(dyn["timestep"]) / n_sub

    kind = str(dyn["kind"]).lower()

    def _make_grid(cell_size, default_k):
        """Cartesian bin overlay sized from the deck or auto from the
        initial cloud (ref: src/core/binstrategy BinningStrategy domain
        bounding box + CUTOFF_RADIUS)."""
        from fourc_tpu.particles.gridhash import GridHash

        nsec = dict(psec.get("neighbor") or {})
        lo = nsec.get("lo")
        hi = nsec.get("hi")
        if lo is None or hi is None:
            span = x0.max(axis=0) - x0.min(axis=0) + cell_size
            lo = x0.min(axis=0) - 0.25 * span
            hi = x0.max(axis=0) + 0.25 * span
        K = int(nsec.get("max_per_cell", default_k))
        return GridHash(np.asarray(lo, float), np.asarray(hi, float),
                        float(nsec.get("cell_size", cell_size)),
                        dim=dim, max_per_cell=K)

    def _use_grid():
        """Deck override, else AUTO: grid beyond the N where the (N, N)
        all-pairs arrays stop being the fast/feasible choice (the
        reference never does all-pairs — src/particle_engine is bin-based
        throughout; small N keeps the simpler kernel as a fallback)."""
        mode = str((psec.get("neighbor") or {}).get("type", "auto")).lower()
        if mode in ("grid", "allpairs"):
            return mode == "grid"
        return n_p >= 4000

    with timers("setup"):
        if kind == "dem":
            radii = jnp.asarray(np.broadcast_to(
                np.asarray(psec.get("radii", 0.1), float), (n_p,)))
            dp = _coerce(dict(psec.get("dem") or {}))
            if "gravity" in dp:
                dp["gravity"] = tuple(dp["gravity"])
            params = pe.DemParams(**dp)
            walls = [(tuple(w["point"]), tuple(w["normal"]))
                     for w in (psec.get("walls") or [])]
            if _use_grid():
                from fourc_tpu.particles.gridhash import make_dem_stepper_grid

                rmax = float(np.asarray(radii).max())
                grid = _make_grid(2.0 * rmax + max(
                    float(getattr(params, "adhesion_gap", 0.0)), 0.0), 16)
                step = make_dem_stepper_grid(params, radii, masses, grid,
                                             walls=walls, n_sub=n_sub)
            else:
                step = pe.make_dem_stepper(params, radii, masses, walls=walls,
                                           n_sub=n_sub)
        elif kind == "sph":
            sp = _coerce(dict(psec.get("sph") or {}))
            if "gravity" in sp:
                sp["gravity"] = tuple(sp["gravity"])
            params = pe.SphParams(**sp)
            boundary = None
            bsrc = psec.get("boundary")
            if bsrc is None:
                bsrc = gen_boundary
            if bsrc is not None:
                boundary = np.zeros(n_p, bool)
                boundary[np.asarray(bsrc, int)] = True
            if _use_grid():
                from fourc_tpu.particles.gridhash import make_sph_stepper_grid

                grid = _make_grid(2.0 * float(params.h), 48)
                step = make_sph_stepper_grid(params, masses, grid,
                                             n_sub=n_sub, boundary=boundary)
            else:
                step = pe.make_sph_stepper(params, masses, n_sub=n_sub,
                                           boundary=boundary)
        else:
            raise ValueError(f"unknown particle_dynamic.kind {kind!r}")

    # velocity-Verlet needs a(x0, v0) for its first half-kick (the
    # reference evaluates forces once before the time loop)
    init_acc = getattr(step, "initial_accel", None)
    if init_acc is not None:
        state["a"] = init_acc(state["x"], state["v"], state.get("omega"))

    cbs = list(callbacks or [])
    combo = {"p": state, "step": jnp.asarray(0)}
    combo, _nsteps, cbs = drv.setup_restart(deck, "particles", combo,
                                            int(dyn["numstep"]), cbs)
    state, _k = combo["p"], int(combo["step"])
    with timers("step"):
        for _ in range(_nsteps):
            state = step(state, dt_sub)
            _k += 1
            if cbs:
                for cb in cbs:
                    cb("particles", {"p": state, "step": jnp.asarray(_k)},
                       None)
        float(state["x"][0, 0])  # device sync

    agg = {"steps": int(dyn["numstep"]),
           "ke": float(0.5 * jnp.sum(
               masses[:, None] * state["v"] ** 2))}
    for cb in callbacks or []:
        cb(state, None)
    return drv.RunResult(
        deck=deck, fields={"particles": ParticleFieldView()},
        states={"particles": state}, stats={"particles": agg},
        timers=timers)


class ParticleFieldView:
    """Result-test access: per-particle position/velocity components."""

    _COMP = {"x": 0, "y": 1, "z": 2}

    def node_value(self, state, quantity: str, node: int):
        q = quantity.lower()
        if q.startswith("pos"):
            return float(np.asarray(state["x"])[node, self._COMP[q[-1]]])
        if q.startswith("vel"):
            return float(np.asarray(state["v"])[node, self._COMP[q[-1]]])
        raise KeyError(f"unknown particle quantity {quantity!r}")
