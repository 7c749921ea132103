"""Device grid-hash neighbor search (fixed-shape, jit-compatible).

Counterpart of the reference's binning strategy + particle-engine neighbor
search (ref: src/core/binstrategy/4C_binstrategy.hpp:138 Cartesian bin
overlay; src/particle_engine — bin-based neighbor pairs).

TPU-native design: everything static-shaped inside jit —
  1. cell id per particle (Cartesian overlay, clipped to the domain box)
  2. sort particles by cell id (one argsort)
  3. per-cell [start, end) offsets via searchsorted
  4. per particle: gather up to `max_per_cell` candidates from each of the
     3^dim neighboring cells -> (N, 3^dim * K) candidate indices + mask

Candidate capacity overflow (a cell holding more than max_per_cell
particles) silently DROPS pairs; callers size K from the physics (e.g.
~4 particles per kernel-support cell in SPH) with margin, and
`occupancy_check` provides a host-side audit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class GridHash:
    def __init__(self, lo, hi, cell_size, dim=3, max_per_cell=8):
        self.lo = np.asarray(lo, float)[:dim]
        self.cell = float(cell_size)
        self.dim = dim
        n = np.maximum(1, np.ceil((np.asarray(hi, float)[:dim] - self.lo)
                                  / self.cell).astype(int))
        self.dims = tuple(int(v) for v in n)
        self.n_cells = int(np.prod(self.dims))
        self.K = int(max_per_cell)
        # neighbor cell offsets (3^dim,)
        rng = [-1, 0, 1]
        if dim == 3:
            offs = [(i, j, k) for i in rng for j in rng for k in rng]
        else:
            offs = [(i, j) for i in rng for j in rng]
        self.offsets = np.asarray(offs, np.int32)

    def _cid(self, x):
        ij = jnp.floor((x - jnp.asarray(self.lo, x.dtype)) / self.cell)
        ij = jnp.clip(ij.astype(jnp.int32), 0,
                      jnp.asarray(self.dims, jnp.int32) - 1)
        if self.dim == 3:
            return (ij[..., 0] * self.dims[1] + ij[..., 1]) * self.dims[2] \
                + ij[..., 2], ij
        return ij[..., 0] * self.dims[1] + ij[..., 1], ij

    def neighbors(self, x):
        """(N, d) -> (cand_idx (N, M), valid (N, M)) with M = 3^dim * K.

        cand lists exclude self; indices refer to the ORIGINAL particle
        order.
        """
        N = x.shape[0]
        cid, ij = self._cid(x)
        order = jnp.argsort(cid)
        cid_sorted = cid[order]
        cells = jnp.arange(self.n_cells, dtype=cid.dtype)
        starts = jnp.searchsorted(cid_sorted, cells, side="left")
        ends = jnp.searchsorted(cid_sorted, cells, side="right")

        # neighbor cell linear ids per particle: (N, 3^dim)
        nij = ij[:, None, :] + jnp.asarray(self.offsets, jnp.int32)[None]
        inside = jnp.all((nij >= 0) & (nij < jnp.asarray(self.dims)), axis=-1)
        nij = jnp.clip(nij, 0, jnp.asarray(self.dims, jnp.int32) - 1)
        if self.dim == 3:
            ncid = (nij[..., 0] * self.dims[1] + nij[..., 1]) * self.dims[2] \
                + nij[..., 2]
        else:
            ncid = nij[..., 0] * self.dims[1] + nij[..., 1]

        slots = starts[ncid][..., None] + jnp.arange(self.K)  # (N, 3^d, K)
        valid = (slots < ends[ncid][..., None]) & inside[..., None]
        idx = order[jnp.clip(slots, 0, N - 1)]
        M = self.offsets.shape[0] * self.K
        idx = idx.reshape(N, M)
        valid = valid.reshape(N, M)
        valid = valid & (idx != jnp.arange(N)[:, None])  # drop self
        return idx, valid

    def occupancy_check(self, x):
        """Host-side audit: max particles in one cell (must be <= K)."""
        cid, _ = self._cid(jnp.asarray(x))
        counts = np.bincount(np.asarray(cid), minlength=self.n_cells)
        return int(counts.max())


# -- grid-hash variants of the interaction kernels ---------------------------


def dem_forces_grid(x, v, radii, params, grid: GridHash, walls=()):
    """Spring-dashpot DEM via grid-hash candidates (matches
    engine.dem_forces when the grid captures all contacts)."""
    from fourc_tpu.particles.engine import _wall_forces

    idx, valid = grid.neighbors(x)  # (N, M)
    xj = x[idx]
    vj = v[idx]
    rj = radii[idx]
    diff = x[:, None, :] - xj
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-30)
    rsum = radii[:, None] + rj
    overlap = rsum - dist
    active = (overlap > 0) & valid
    n = diff / dist[..., None]
    fn = params.k_normal * overlap
    if params.damp_normal:
        vrel = jnp.sum((v[:, None, :] - vj) * n, axis=-1)
        fn = fn - params.damp_normal * vrel
    f = jnp.sum(jnp.where(active[..., None], fn[..., None] * n, 0.0), axis=1)
    fw, _ = _wall_forces(x, v, radii, params, walls)
    return f + fw


def sph_density_grid(x, masses, params, grid: GridHash):
    from fourc_tpu.particles.engine import cubic_spline_w

    d = x.shape[1]
    idx, valid = grid.neighbors(x)
    diff = x[:, None, :] - x[idx]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-30)
    W = cubic_spline_w(r / params.h, params.h, d)
    # self-contribution W(0) added explicitly (candidates exclude self)
    W0 = cubic_spline_w(jnp.zeros(()), params.h, d)
    return jnp.sum(jnp.where(valid, masses[idx] * W, 0.0), axis=1) \
        + masses * W0


def sph_accel_grid(x, v, masses, params, grid: GridHash):
    from fourc_tpu.particles.engine import cubic_spline_dw, sph_pressure

    d = x.shape[1]
    rho = sph_density_grid(x, masses, params, grid)
    p = sph_pressure(rho, params)
    idx, valid = grid.neighbors(x)
    diff = x[:, None, :] - x[idx]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-30)
    dW = cubic_spline_dw(r / params.h, params.h, d)
    gradW = dW[..., None] * diff / r[..., None]
    pij = p[:, None] / rho[:, None] ** 2 + (p / rho**2)[idx]
    vij = v[:, None, :] - v[idx]
    xv = jnp.sum(vij * diff, axis=-1)
    mu_ij = params.h * xv / (r**2 + 0.01 * params.h**2)
    rho_bar = 0.5 * (rho[:, None] + rho[idx])
    Pi = jnp.where(xv < 0, -params.alpha_visc * params.c0 * mu_ij / rho_bar, 0.0)
    coeff = -masses[idx] * (pij + Pi)
    a = jnp.sum(jnp.where(valid[..., None], coeff[..., None] * gradW, 0.0),
                axis=1)
    return a + jnp.asarray(params.gravity, x.dtype)[None, :], rho, p


def make_dem_stepper_grid(params, radii, masses, grid: GridHash, walls=(),
                          n_sub=1):
    import jax

    g = jnp.asarray(params.gravity)

    def accel(x, v):
        return dem_forces_grid(x, v, radii, params, grid, walls) \
            / masses[:, None] + g[None, :]

    def step(state, dt):
        def body(i, s):
            x, v, a = s
            v_half = v + 0.5 * dt * a
            x_new = x + dt * v_half
            a_new = accel(x_new, v_half)
            v_new = v_half + 0.5 * dt * a_new
            return (x_new, v_new, a_new)

        x, v, a = jax.lax.fori_loop(0, n_sub, body,
                                    (state["x"], state["v"], state["a"]))
        return dict(state, x=x, v=v, a=a, t=state["t"] + n_sub * dt)

    return jax.jit(step)
