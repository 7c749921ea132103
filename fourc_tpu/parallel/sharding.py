"""Device-mesh sharding of a field.

Counterpart of the reference's MPI domain decomposition (SPMD over ranks,
ref: SURVEY §2.11 — Epetra row/col maps + Exporter ghost exchange).  The
TPU-native mapping (single-controller JAX):

- one mesh axis ``"mesh"`` = spatial domain decomposition (the FEM analog
  of data parallelism: each device owns a contiguous, RCB-compacted slice
  of nodes, dofs, elements and Gauss points)
- dof/state vectors: sharded on their single axis
- per-block element arrays (connectivity, gathered coords, history):
  sharded on the element axis
- gathers (u[conn]) and segment-sum scatters cross shard boundaries only at
  subdomain surfaces; XLA's SPMD partitioner emits the halo collectives
  that the reference hand-codes as Epetra_Import (owner->ghost) and
  ghost-row export (sum-into on complete()).
- Krylov dot products / norms become psum over ICI (the reference's
  MPI_Allreduce).

``shard_field`` device_puts every array a SolidField closes over, so the
jitted step functions propagate shardings end to end with zero code changes
in the physics layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), axis_names=("mesh",))


def shard_vector(mesh: Mesh, x):
    if x.shape[0] % mesh.size:  # GSPMD needs even shards; replicate odd
        return replicate(mesh, x)
    return jax.device_put(x, NamedSharding(mesh, P("mesh")))


def shard_leading(mesh: Mesh, x):
    if x.shape[0] % mesh.size:
        return replicate(mesh, x)
    spec = P(*(["mesh"] + [None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_solid_field(f, mesh: Mesh):
    """In-place: shard every device array a SolidField holds.

    perm/sorted_dof index the flattened element-contribution stream;
    sharded 1-d so the segment_sum runs sharded too.  Neumann face sets
    are small boundary strips: left replicated.
    """
    return _shard_common(f, mesh)


def _shard_common(f, mesh: Mesh):
    """Shared element-array sharding for any nodal field (coords, dofmap
    blocks, block_X, free mask)."""
    f.coords = shard_leading(mesh, f.coords)
    for key, ba in f.dofmap.blocks.items():
        ba.conn = shard_leading(mesh, ba.conn)
        ba.edof = shard_leading(mesh, ba.edof)
        ba.perm = shard_vector(mesh, ba.perm)
        ba.sorted_dof = shard_vector(mesh, ba.sorted_dof)
        if key in getattr(f, "block_X", {}):
            f.block_X[key] = shard_leading(mesh, f.block_X[key])
    f.dbc.free_mask = shard_vector(mesh, f.dbc.free_mask)
    return f


def shard_scalar_field(f, mesh: Mesh):
    """Shard a ScalarField (scatra/thermo/elch modes) over the mesh axis —
    the fluid/scatra analog of the reference's per-field discretization
    row maps (every field is distributed, not just structure)."""
    return _shard_common(f, mesh)


def shard_fluid_field(f, mesh: Mesh):
    """Shard a FluidField (velocity+pressure dofs) over the mesh axis."""
    return _shard_common(f, mesh)


def shard_state(state: dict, mesh: Mesh):
    """Shard a solid state pytree over the mesh axis."""
    out = {}
    for k, v in state.items():
        if k == "hist":
            out[k] = {kk: shard_leading(mesh, vv) for kk, vv in (v or {}).items()}
        elif isinstance(v, jnp.ndarray) and v.ndim >= 1 and v.size > 8:
            out[k] = shard_vector(mesh, v) if v.ndim == 1 else shard_leading(mesh, v)
        else:
            out[k] = v
    return out
