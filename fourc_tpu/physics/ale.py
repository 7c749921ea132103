"""ALE mesh-motion field.

Counterpart of the reference's ale module (ref: src/ale — Laplace /
spring / pseudo-elasticity mesh smoothing, `Ale` adapter + `AleDyn`
driver 4C_ale_dyn.cpp).  Given prescribed displacements on the moving
interface (and zero on the remaining boundary), the interior mesh
displacement solves a Laplace problem per component (ALE_TYPE laplace) —
matrix-free CG on the scalar diffusion kernel, all on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.core.mesh import Discretization
from fourc_tpu.ops import common as gm


class AleField:
    """Harmonic mesh motion: one scalar Laplace solve per coordinate.

    boundary_nodes: node ids held fixed (zero displacement) unless they are
    interface nodes; interface_nodes: ids receiving prescribed values.
    """

    def __init__(self, disc: Discretization, interface_nodes, boundary_nodes,
                 method: str = "laplace"):
        self.disc = disc
        self.dim = disc.dim
        self.method = method  # laplace | elastic (ref ALE_TYPE)
        self.dofmap = disc.dofmap(1)
        self.coords = jnp.asarray(disc.coords)
        n = disc.n_nodes
        fixed = np.zeros(n, dtype=bool)
        fixed[np.asarray(boundary_nodes)] = True
        fixed[np.asarray(interface_nodes)] = True
        self.free = jnp.asarray(~fixed)
        self.interface = jnp.asarray(np.asarray(interface_nodes, np.int32))
        self.block_X = {
            key: self.coords[ba.conn] for key, ba in self.dofmap.blocks.items()
        }

        # jacobi diagonal of the Laplacian
        dm = self.dofmap
        per_block = {}
        for key, ba in dm.blocks.items():
            from fourc_tpu.core.cells import get_cell

            cell = get_cell(ba.cell)
            Xt = jnp.transpose(self.block_X[key], (1, 2, 0))
            G, detJ = gm.iso_gradients_el(Xt, cell.dN)
            w = jnp.asarray(cell.gauss_weights, self.coords.dtype)
            wdet = detJ * w[:, None]
            per_block[key] = jnp.einsum("gE,gaiE,gaiE->Ea", wdet, G, G)
        diag = dm.scatter_add(per_block)
        self._dinv = jnp.where(self.free, 1.0 / jnp.maximum(diag, 1e-30), 1.0)

    def _laplace(self, phi):
        """K_lap phi (scalar field on nodes)."""
        dm = self.dofmap
        per_block = {}
        for key, ba in dm.blocks.items():
            from fourc_tpu.core.cells import get_cell

            cell = get_cell(ba.cell)
            Xt = jnp.transpose(self.block_X[key], (1, 2, 0))
            G, detJ = gm.iso_gradients_el(Xt, cell.dN)
            w = jnp.asarray(cell.gauss_weights, phi.dtype)
            wdet = detJ * w[:, None]
            pe = dm.gather(phi, key)[..., 0]  # (E, nen)
            gphi = jnp.einsum("gadE,Ea->gdE", G, pe)
            per_block[key] = jnp.einsum("gE,gadE,gdE->Ea", wdet, G, gphi)
        return dm.scatter_add(per_block)

    def _elastic_force(self, u_nodes):
        """Pseudo-elasticity mesh stiffness with JACOBIAN STIFFENING: every
        element's linear-elastic contribution is scaled by (V_mean/V_e), so
        small elements resist distortion hardest (ref: the reference's
        pseudo-elastic ALE with element-size stiffening, src/ale
        springs_material/elastic variants)."""
        from fourc_tpu.core.cells import get_cell
        from fourc_tpu.materials.small_strain import LinearElastic
        from fourc_tpu.ops import solid as sops

        if not hasattr(self, "_ale_mat"):
            self._ale_mat = LinearElastic(youngs=1.0, nue=0.0)
            self._stiffen = {}
            for key, ba in self.dofmap.blocks.items():
                cell = get_cell(ba.cell)
                _, detJ = gm.iso_gradients(self.block_X[key], cell.dN)
                w = jnp.asarray(cell.gauss_weights, detJ.dtype)
                V = jnp.einsum("eg,g->e", detJ, w)
                self._stiffen[key] = jnp.mean(V) / V
        dm = self.dofmap
        out = jnp.zeros((self.disc.n_nodes, self.dim), u_nodes.dtype)
        for key, ba in dm.blocks.items():
            cell = get_cell(ba.cell)
            ue = u_nodes[ba.conn]
            fe, _ = sops.internal_force(self.block_X[key], ue, cell,
                                        self._ale_mat, kinem="linear",
                                        impl="einsum")
            fe = fe * self._stiffen[key][:, None, None]
            out = out.at[ba.conn.reshape(-1)].add(fe.reshape(-1, self.dim))
        return out

    def solve(self, interface_disp, tol=1e-8, maxiter=400):
        """interface_disp: (n_interface, dim) -> mesh displacement (n, dim)."""
        from fourc_tpu.linalg import solvers as ls
        from fourc_tpu.linalg.precond import jacobi

        n = self.disc.n_nodes
        if self.method == "elastic":
            bc = jnp.zeros((n, self.dim), interface_disp.dtype).at[
                self.interface].set(interface_disp)
            freev = jnp.repeat(self.free, self.dim)

            def A(v):
                vm = jnp.where(freev, v, 0.0)
                f = self._elastic_force(vm.reshape(n, self.dim)).reshape(-1)
                return jnp.where(freev, f, v)

            rhs = jnp.where(
                freev, -self._elastic_force(bc).reshape(-1), 0.0)
            Mv = jacobi(jnp.repeat(1.0 / self._dinv, self.dim))
            res = ls.cg(A, rhs, M=Mv, tol=tol, maxiter=maxiter)
            u = jnp.where(freev, res.x, bc.reshape(-1))
            return u.reshape(n, self.dim)
        out = []
        M = jacobi(1.0 / self._dinv)
        for c in range(self.dim):
            bcvals = jnp.zeros((n,), interface_disp.dtype).at[self.interface].set(
                interface_disp[:, c]
            )

            def A(v):
                vm = jnp.where(self.free, v, 0.0)
                return jnp.where(self.free, self._laplace(vm), v)

            rhs = jnp.where(self.free, -self._laplace(bcvals), 0.0)
            res = ls.cg(A, rhs, M=M, tol=tol, maxiter=maxiter)
            out.append(jnp.where(self.free, res.x, bcvals))
        return jnp.stack(out, axis=-1)  # (n, dim)
