"""Crosslinker dynamics: stochastic binding/unbinding of linker molecules
between beam filaments (polymer-network mechanics).

Counterpart of the reference's beam-interaction crosslinking submodel
(ref: src/beaminteraction/src/4C_beaminteraction_submodel_evaluator_
crosslinking.cpp — diffusing crosslinker molecules bind to filament
binding spots within reach, doubly-bound linkers act as elastic
connectors, bonds open/close with exponential on/off kinetics).

TPU-native design: FIXED-CAPACITY linker population with integer bond
state, all transitions sampled with jax.random inside the jitted scan —
no dynamic allocation, no host round trips:

  state per linker: pos (3,), bond (2,) int32 node ids (-1 = open slot)
    n_bound = 0: free, diffuses (Euler-Maruyama, diffusivity D)
    n_bound = 1: tethered to one binding spot (rides that node)
    n_bound = 2: elastic spring (k_spring, rest length l0) between its
                 two spots -> force into the beam residual

  per step: unbind each closed slot w.p. 1-exp(-k_off dt); bind each open
  slot to a uniformly chosen in-reach spot w.p. 1-exp(-k_on dt)
  (the reference's Poisson binding draw, one candidate per event).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class CrosslinkParams:
    n_linkers: int = 32
    k_on: float = 10.0  # binding rate [1/time]
    k_off: float = 0.0  # unbinding rate
    k_spring: float = 100.0  # linker stiffness
    l0: float = 0.1  # linker rest length
    r_reach: float = 0.15  # binding reach
    diffusivity: float = 0.0  # free-linker D (0 = static linkers)
    seed: int = 1


def init_linkers(params: CrosslinkParams, box_lo, box_hi):
    """Uniformly seeded free linkers in a box."""
    key = jax.random.PRNGKey(params.seed)
    lo = jnp.asarray(box_lo, jnp.result_type(float))
    hi = jnp.asarray(box_hi, lo.dtype)
    pos = lo + (hi - lo) * jax.random.uniform(
        key, (params.n_linkers, lo.shape[0]), lo.dtype)
    bond = -jnp.ones((params.n_linkers, 2), jnp.int32)
    return {"pos": pos, "bond": bond}


def linker_positions(lstate, spots):
    """Current linker anchor positions: free -> own pos, bound -> first
    bound spot (tethered), double -> midpoint."""
    b = lstate["bond"]
    p0 = jnp.where((b[:, 0] >= 0)[:, None], spots[jnp.maximum(b[:, 0], 0)],
                   lstate["pos"])
    p1 = spots[jnp.maximum(b[:, 1], 0)]
    both = (b >= 0).all(axis=1)
    return jnp.where(both[:, None], 0.5 * (p0 + p1), p0)


def kinetics_step(key, lstate, spots, dt, params: CrosslinkParams):
    """One stochastic binding/unbinding + diffusion update (pure jax)."""
    n_l = lstate["bond"].shape[0]
    n_s = spots.shape[0]
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    bond = lstate["bond"]

    # --- unbinding: each closed slot opens w.p. 1 - exp(-k_off dt)
    if params.k_off > 0.0:
        p_off = 1.0 - jnp.exp(-params.k_off * dt)
        u = jax.random.uniform(k1, (n_l, 2))
        bond = jnp.where((bond >= 0) & (u < p_off), -1, bond)

    # --- binding: anchor position per linker, pick ONE random in-reach
    # spot; bind first open slot w.p. 1 - exp(-k_on dt)
    anchor = linker_positions({"pos": lstate["pos"], "bond": bond}, spots)
    d2 = jnp.sum((anchor[:, None, :] - spots[None, :, :]) ** 2, axis=-1)
    in_reach = d2 < params.r_reach**2
    # exclude spots already bound by this linker
    same = (jnp.arange(n_s)[None, :] == bond[:, 0:1]) | (
        jnp.arange(n_s)[None, :] == bond[:, 1:2])
    in_reach = in_reach & ~same
    # uniform choice among in-reach spots via Gumbel-max on the mask
    gum = jax.random.gumbel(k2, (n_l, n_s))
    score = jnp.where(in_reach, gum, -jnp.inf)
    cand = jnp.argmax(score, axis=1).astype(jnp.int32)
    has_cand = jnp.any(in_reach, axis=1)
    p_on = 1.0 - jnp.exp(-params.k_on * dt)
    do_bind = has_cand & (jax.random.uniform(k3, (n_l,)) < p_on)
    slot0_open = bond[:, 0] < 0
    new_b0 = jnp.where(do_bind & slot0_open, cand, bond[:, 0])
    new_b1 = jnp.where(do_bind & ~slot0_open & (bond[:, 1] < 0), cand,
                       bond[:, 1])
    bond = jnp.stack([new_b0, new_b1], axis=1)

    # --- diffusion of fully free linkers
    pos = lstate["pos"]
    if params.diffusivity > 0.0:
        free = (bond < 0).all(axis=1)
        noise = jnp.sqrt(2.0 * params.diffusivity * dt) * jax.random.normal(
            k4, pos.shape, pos.dtype)
        pos = jnp.where(free[:, None], pos + noise, pos)
    # tethered linkers ride their spot
    single = (bond[:, 0] >= 0) & (bond[:, 1] < 0)
    pos = jnp.where(single[:, None], spots[jnp.maximum(bond[:, 0], 0)], pos)

    return {"pos": pos, "bond": bond}


def link_forces(lstate, spots, n_nodes, ndpn, params: CrosslinkParams,
                dtype):
    """Nodal force vector (ndof,) from doubly-bound linker springs."""
    b = lstate["bond"]
    closed = (b >= 0).all(axis=1)
    i = jnp.maximum(b[:, 0], 0)
    j = jnp.maximum(b[:, 1], 0)
    d = spots[j] - spots[i]
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-30)
    fmag = jnp.where(closed, params.k_spring * (r - params.l0), 0.0)
    fvec = (fmag / r)[:, None] * d  # force on node i toward j
    f = jnp.zeros((n_nodes, 3), dtype)
    f = f.at[i].add(fvec).at[j].add(-fvec)
    out = jnp.zeros((n_nodes, ndpn), dtype)
    out = out.at[:, :3].set(f)
    return out.reshape(-1)
