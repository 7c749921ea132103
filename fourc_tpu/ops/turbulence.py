"""Dynamic Smagorinsky (Germano-Lilly) LES model.

Counterpart of the reference's dynamic-Smagorinsky machinery
(ref: src/fluid_turbulence/4C_fluid_turbulence_dyn_smag.* with the node-
patch box filter 4C_fluid_turbulence_boxfilter.*): the model coefficient
Cs² is computed from the resolved field itself via the Germano identity,
with the test filter realized as a volume-weighted average over the patch
of elements sharing a node — exactly the reference's box-filter choice,
but as three batched scatter/gather passes instead of a per-node loop.

  L_ij = hat(u_i u_j) - hat(u_i) hat(u_j)          (resolved Leonard stress)
  M_ij = 2 Δ² [ hat(|S| S_ij) - α² |hat(S)| hat(S)_ij ],  α = Δ̂/Δ = 2
  Cs²  = <L_ij M_ij> / <M_ij M_ij>   (clipped to [0, cs2_max])

`averaging="global"` contracts over the whole domain (one Cs² per call,
the robust default for statistically homogeneous flows); "element" keeps
the clipped local value per element.
"""

from __future__ import annotations

import jax.numpy as jnp

from fourc_tpu.ops import common as gm


def _element_averages(Xe, ue, cell):
    """Element-mean u, u⊗u, S, |S|S and volume. ue: (e, nen, d)."""
    G, detJ = gm.iso_gradients(Xe, cell.dN)  # (e,g,a,d), (e,g)
    wdet = gm.weighted(detJ, cell.gauss_weights)  # (e,g)
    N = jnp.asarray(cell.N, Xe.dtype)
    V = jnp.sum(wdet, axis=1)  # (e,)
    u_g = jnp.einsum("ga,eai->egi", N, ue)
    gradu = gm.grad_field(ue, G)  # (e,g,i,j)
    S = 0.5 * (gradu + jnp.swapaxes(gradu, -1, -2))
    snorm = jnp.sqrt(2.0 * jnp.einsum("egij,egij->eg", S, S) + 1e-30)

    def avg(f):  # (e, g, ...) -> (e, ...)
        w = wdet.reshape(wdet.shape + (1,) * (f.ndim - 2))
        return jnp.sum(w * f, axis=1) / V.reshape((-1,) + (1,) * (f.ndim - 2))

    u_e = avg(u_g)
    uu_e = avg(jnp.einsum("egi,egj->egij", u_g, u_g))
    S_e = avg(S)
    SS_e = avg(snorm[..., None, None] * S)
    return u_e, uu_e, S_e, SS_e, V


def _patch_filter(f_e, V, conn, n_nodes):
    """Box filter: element values -> volume-weighted node-patch averages ->
    back to element (mean over the element's nodes). f_e: (e, ...)."""
    nen = conn.shape[1]
    extra = f_e.shape[1:]
    wf = V.reshape((-1,) + (1,) * len(extra)) * f_e  # (e, ...)
    rep = jnp.repeat(wf[:, None], nen, axis=1)  # (e, nen, ...)
    num = jnp.zeros((n_nodes,) + extra, f_e.dtype)
    num = num.at[conn.reshape(-1)].add(rep.reshape((-1,) + extra))
    den = jnp.zeros((n_nodes,), f_e.dtype)
    den = den.at[conn.reshape(-1)].add(
        jnp.broadcast_to(V[:, None], conn.shape).reshape(-1))
    f_n = num / den.reshape((-1,) + (1,) * len(extra))
    return jnp.mean(f_n[conn], axis=1)  # back to elements


def dynamic_cs2(Xe, ue, cell, conn, n_nodes, averaging="global",
                cs2_max=0.09):
    """Dynamic Cs² per element: (e,)."""
    dim = Xe.shape[-1]
    u_e, uu_e, S_e, SS_e, V = _element_averages(Xe, ue, cell)
    delta2 = V ** (2.0 / dim)

    hat_u = _patch_filter(u_e, V, conn, n_nodes)
    hat_uu = _patch_filter(uu_e, V, conn, n_nodes)
    hat_S = _patch_filter(S_e, V, conn, n_nodes)
    hat_SS = _patch_filter(SS_e, V, conn, n_nodes)

    L = hat_uu - jnp.einsum("ei,ej->eij", hat_u, hat_u)
    hat_snorm = jnp.sqrt(2.0 * jnp.einsum("eij,eij->e", hat_S, hat_S) + 1e-30)
    M = 2.0 * delta2[:, None, None] * (
        hat_SS - 4.0 * hat_snorm[:, None, None] * hat_S)

    LM = jnp.einsum("eij,eij->e", L, M)
    MM = jnp.einsum("eij,eij->e", M, M)
    if averaging == "global":
        cs2 = jnp.sum(V * LM) / jnp.maximum(jnp.sum(V * MM), 1e-30)
        cs2 = jnp.clip(cs2, 0.0, cs2_max)
        return jnp.broadcast_to(cs2, V.shape)
    cs2 = LM / jnp.maximum(MM, 1e-30)
    return jnp.clip(cs2, 0.0, cs2_max)


# ---------------------------------------------------------------------------
# Multifractal subgrid scales (MFS)
# ---------------------------------------------------------------------------


def mfs_fields(Xe, ue, cell, conn, n_nodes, nu, csgs=0.25, n_max=12.0):
    """Multifractal SGS model inputs per element block.

    Counterpart of the reference's multifractal subgrid-scale model
    (ref: src/fluid_turbulence — Rasthofer & Gravemeier multifractal SGS;
    fluid_ele calc multifractal terms): the subgrid velocity is modeled as
    delta_u = B * (u - hat_u) with hat_u the box-filtered (node-patch)
    resolved velocity and

        N = log2(Re_h^(3/4))   (cascade steps to the Kolmogorov scale)
        B = csgs * sqrt(2/3) * sqrt(2^(4N/3) - 1)

    Returns (B (e,), u_hat_nodes (n_nodes, d)) — the caller forms
    delta_u(GP) = B_e (u - hat_u)(GP) and its gradient from nodal values.
    """
    u_e, _, S_e, _, V = _element_averages(Xe, ue, cell)
    dim = Xe.shape[-1]
    h = V ** (1.0 / dim)
    umag = jnp.linalg.norm(u_e, axis=-1)
    re_h = umag * h / nu
    Nc = jnp.clip(jnp.log2(jnp.maximum(re_h, 1.0) ** 0.75), 0.0, n_max)
    B = csgs * jnp.sqrt(2.0 / 3.0) * jnp.sqrt(2.0 ** (4.0 * Nc / 3.0) - 1.0)

    # node-patch filtered velocity AT NODES (volume-weighted element means)
    nen = conn.shape[1]
    wf = V[:, None] * u_e  # (e, d)
    rep = jnp.repeat(wf[:, None], nen, axis=1)
    num = jnp.zeros((n_nodes, u_e.shape[-1]), ue.dtype)
    num = num.at[conn.reshape(-1)].add(rep.reshape(-1, u_e.shape[-1]))
    den = jnp.zeros((n_nodes,), ue.dtype)
    den = den.at[conn.reshape(-1)].add(
        jnp.broadcast_to(V[:, None], conn.shape).reshape(-1))
    u_hat = num / jnp.maximum(den, 1e-300)[:, None]
    return B, u_hat


# ---------------------------------------------------------------------------
# AVM3 (algebraic variational multiscale-multigrid) scale separation
# ---------------------------------------------------------------------------


def avm3_aggregates(disc):
    """Plain-aggregation nodal scale separation (host precompute).

    Counterpart of the reference's AVM3 scale-separation operator built
    from a plain-aggregation ML/MueLu hierarchy (ref: src/fluid
    4C_fluid_implicit_integration avm3_preparation + avm3_assemble_mat_and_rhs
    in fluid_ele; the separation matrix S = I - P R).  Greedy aggregation
    over the node adjacency graph; returns (agg_id (n_nodes,),
    counts (n_agg,))."""
    import numpy as np

    n = disc.n_nodes
    nbr = [[] for _ in range(n)]
    for blk in disc.blocks.values():
        conn = np.asarray(blk.conn)
        for e in range(conn.shape[0]):
            nodes = conn[e]
            for a in nodes:
                nbr[a].extend(int(b) for b in nodes if b != a)
    agg = -np.ones(n, np.int32)
    next_id = 0
    for i in range(n):  # root-based greedy aggregation
        if agg[i] >= 0:
            continue
        if any(agg[j] >= 0 for j in nbr[i]):
            continue
        agg[i] = next_id
        for j in nbr[i]:
            if agg[j] < 0:
                agg[j] = next_id
        next_id += 1
    for i in range(n):  # attach leftovers to a neighbouring aggregate
        if agg[i] < 0:
            for j in nbr[i]:
                if agg[j] >= 0:
                    agg[i] = agg[j]
                    break
            if agg[i] < 0:
                agg[i] = next_id
                next_id += 1
    counts = np.bincount(agg, minlength=next_id).astype(np.float64)
    return jnp.asarray(agg), jnp.asarray(counts)


def avm3_fine_scales(u_nodes, agg, counts):
    """u' = (I - P R) u with R = aggregate mean, P = injection.
    Annihilates aggregate-wise constants. u_nodes: (n_nodes, d)."""
    s = jnp.zeros((counts.shape[0], u_nodes.shape[-1]), u_nodes.dtype)
    s = s.at[agg].add(u_nodes)
    mean = s / counts.astype(u_nodes.dtype)[:, None]
    return u_nodes - mean[agg]
