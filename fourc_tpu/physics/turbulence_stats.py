"""Turbulence statistics: in-jit running moments + plane averaging.

Counterpart of the reference's turbulence statistics machinery
(ref: src/fluid_turbulence/4C_fluid_turbulence_statistic_manager.* and
4C_fluid_turbulence_statistics_mean_general.* — time averaging of
velocity/pressure moments during a sampling period, plus averaging over
homogeneous directions for canonical flows like turbulent channel flow).

TPU-native design: the accumulator is a small pytree of nodal running
sums living INSIDE the jitted time step (zero host traffic during
sampling, arithmetic start gating so the step stays a single compiled
program).  Plane averaging / profile extraction is a host-side
post-processing pass over the frozen mesh coordinates.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["init_stats", "accumulate", "finalize", "plane_profiles"]

# symmetric second-moment component order (3D): uu, vv, ww, uv, uw, vw
_IJ3 = ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))
_IJ2 = ((0, 0), (1, 1), (0, 1))


def init_stats(n_nodes: int, dim: int, dtype=jnp.float32):
    """Zeroed accumulator pytree for nodal (u, p) moments."""
    ncov = len(_IJ3 if dim == 3 else _IJ2)
    return {
        "n": jnp.zeros((), dtype),
        "sum_u": jnp.zeros((n_nodes, dim), dtype),
        "sum_uu": jnp.zeros((n_nodes, ncov), dtype),
        "sum_p": jnp.zeros((n_nodes,), dtype),
        "sum_pp": jnp.zeros((n_nodes,), dtype),
    }


def accumulate(stats, x, ndpn: int, weight=1.0):
    """Add one sample of the stacked fluid vector x ((u, p) per node).

    jit-safe; ``weight`` may be a traced 0/1 float (sampling-start gate:
    arithmetic masking, not jnp.where — see linalg/gmg.py NOTE on large
    predicate tensors near Pallas kernels).
    """
    dim = ndpn - 1
    xn = x.reshape(-1, ndpn)
    u = xn[:, :dim]
    p = xn[:, dim]
    ij = _IJ3 if dim == 3 else _IJ2
    uu = jnp.stack([u[:, i] * u[:, j] for i, j in ij], axis=1)
    w = jnp.asarray(weight, x.dtype)
    return {
        "n": stats["n"] + w,
        "sum_u": stats["sum_u"] + w * u,
        "sum_uu": stats["sum_uu"] + w * uu,
        "sum_p": stats["sum_p"] + w * p,
        "sum_pp": stats["sum_pp"] + w * p * p,
    }


def finalize(stats):
    """Running sums -> nodal time statistics.

    Returns dict with mean_u (n, d), mean_p (n,), re_stress (n, ncov)
    (the Reynolds stress tensor <u_i' u_j'> = <u_i u_j> - <u_i><u_j> in
    the component order uu, vv, ww, uv, uw, vw), p_var (n,).
    """
    n = float(np.maximum(np.asarray(stats["n"]), 1.0))
    mu = np.asarray(stats["sum_u"]) / n
    mp = np.asarray(stats["sum_p"]) / n
    muu = np.asarray(stats["sum_uu"]) / n
    dim = mu.shape[1]
    ij = _IJ3 if dim == 3 else _IJ2
    re = muu - np.stack([mu[:, i] * mu[:, j] for i, j in ij], axis=1)
    return {
        "n_samples": n,
        "mean_u": mu,
        "mean_p": mp,
        "re_stress": re,
        "p_var": np.asarray(stats["sum_pp"]) / n - mp * mp,
    }


def plane_profiles(coords, nodal, axis: int, decimals: int = 10):
    """Average nodal statistics over planes normal to ``axis``.

    The homogeneous-direction averaging of the reference's channel-flow
    statistics (ref: 4C_fluid_turbulence_statistics_cha.*): nodes are
    grouped by their (rounded) coordinate along ``axis``; every nodal
    array in ``nodal`` is averaged per group.

    Returns (positions (m,), {key: (m, ...) profile arrays}).
    """
    coords = np.asarray(coords)
    key = np.round(coords[:, axis], decimals)
    pos, inv, counts = np.unique(key, return_inverse=True,
                                 return_counts=True)
    out = {}
    for name, arr in nodal.items():
        arr = np.asarray(arr)
        if arr.ndim == 0:
            out[name] = arr
            continue
        acc = np.zeros((pos.shape[0],) + arr.shape[1:], arr.dtype)
        np.add.at(acc, inv, arr)
        out[name] = acc / counts.reshape((-1,) + (1,) * (arr.ndim - 1))
    return pos, out
