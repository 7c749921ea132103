"""FE² multiscale material: macro stress from micro-RVE solves.

Counterpart of the reference's micromaterial / MicroStatic pair
(ref: src/mat/4C_mat_micromaterial.hpp + src/stru_multi/4C_stru_multi_microstatic.cpp
— each macro Gauss point owns a micro representative-volume-element problem;
the macro deformation gradient is imposed on the RVE boundary, a static
micro equilibrium is solved, and the volume-averaged micro stress + the
condensed micro stiffness are returned as the macro material response; the
reference distributes the RVE solves over `-ngroup` nested MPI groups).

TPU-native redesign: ALL macro Gauss points' RVE problems are solved
simultaneously as ONE `jax.vmap` over the batched micro Newton loop — the
nested-parallelism analog (SURVEY §2.11) with zero process plumbing — and
the consistent macro tangent is `jax.jvp` straight through the micro solve
(replacing the reference's explicitly condensed stiffness transfer).

The imposed micro BC is the linear-displacement (kinematically uniform)
condition u = (F̄-1)·X on the RVE boundary; the homogenized 1st
Piola-Kirchhoff stress follows from the boundary-reaction identity
P̄ = (1/V₀) Σ_{a∈∂RVE} f_a ⊗ X_a.  Frame indifference makes the response a
function of C̄ alone, so the macro GL strain E is mapped to the symmetric
stretch F̄ = U = √(2E+1) (Denman–Beavers iteration — smooth under AD even
at repeated eigenvalues, unlike eigh) and S̄ = U⁻¹ P̄.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _sqrtm_spd(C, iters=8):
    """Denman-Beavers square root of an SPD 3x3 matrix (AD-smooth)."""
    # scale to unit determinant-ish for robust convergence
    tr = jnp.trace(C) / 3.0
    Y = C / tr
    Z = jnp.eye(3, dtype=C.dtype)
    for _ in range(iters):
        Yn = 0.5 * (Y + jnp.linalg.inv(Z))
        Z = 0.5 * (Z + jnp.linalg.inv(Y))
        Y = Yn
    return Y * jnp.sqrt(tr)


class MicroRVE:
    """The micro problem: an nx³ hex8 cube of a given material."""

    def __init__(self, micro_material, nx=2, size=1.0, n_newton=6):
        from fourc_tpu.core import cells, gridgen

        disc = gridgen.box(nx, nx, nx, hi=[size] * 3, cell="hex8")
        self.cell = cells.get_cell("hex8")
        self.mat = micro_material
        self.X = jnp.asarray(disc.coords)  # (n, 3)
        self.conn = jnp.asarray(np.asarray(disc.blocks["hex8"].conn))
        self.V0 = float(size) ** 3
        self.n_newton = n_newton

        coords = np.asarray(disc.coords)
        onb = np.zeros(coords.shape[0], bool)
        for ax in range(3):
            onb |= np.isclose(coords[:, ax], coords[:, ax].min())
            onb |= np.isclose(coords[:, ax], coords[:, ax].max())
        self.bnd = jnp.asarray(np.where(onb)[0])
        self.inner = jnp.asarray(np.where(~onb)[0])
        self.n_nodes = coords.shape[0]

    def _fint(self, u_nodes):
        """Assembled internal force (n, 3) for the RVE displacement field."""
        from fourc_tpu.ops import solid as sops

        Xe = self.X[self.conn]
        ue = u_nodes[self.conn]
        fe, _ = sops.internal_force(Xe, ue, self.cell, self.mat,
                                    kinem="nonlinear", impl="einsum")
        f = jnp.zeros((self.n_nodes, 3), u_nodes.dtype)
        return f.at[self.conn].add(fe)

    def solve_pk1(self, U):
        """Impose F̄ = U (3,3) on the boundary, return homogenized P̄ (3,3)."""
        ub = (self.X[self.bnd] @ (U - jnp.eye(3, dtype=U.dtype)).T)
        ni = self.inner.shape[0]

        def u_full(x):
            u = jnp.zeros((self.n_nodes, 3), U.dtype)
            u = u.at[self.bnd].set(ub)
            return u.at[self.inner].set(x.reshape(ni, 3))

        def res(x):
            return self._fint(u_full(x))[self.inner].reshape(-1)

        x = jnp.zeros((ni * 3,), U.dtype)
        for _ in range(self.n_newton):
            r = res(x)
            K = jax.jacfwd(res)(x)
            x = x - jnp.linalg.solve(K, r)

        f = self._fint(u_full(x))  # boundary reactions
        P = jnp.einsum("ai,aj->ij", f[self.bnd], self.X[self.bnd]) / self.V0
        return P


class Fe2Material:
    """Macro material delegating to vmapped micro-RVE solves.

    Deck spec: {type: micromaterial, micro: {<material spec>}, nx: 2}
    (the reference's MAT_Struct_Multiscale pointing at a micro input file).
    """

    kind = "solid"

    @classmethod
    def from_deck(cls, params):
        from fourc_tpu.materials import make_material

        micro = make_material(dict(params.pop("micro")))
        return cls(micro, **params)

    def __init__(self, micro_material, nx=2, size=1.0, density=0.0,
                 n_newton=6):
        self.rve = MicroRVE(micro_material, nx=nx, size=size,
                            n_newton=n_newton)
        self.density = density

    def pk2_from_E(self, Egl):
        """Egl: (3, 3, M) GL strain batch -> S̄ (3, 3, M)."""
        C = 2.0 * Egl + jnp.eye(3, dtype=Egl.dtype)[:, :, None]

        def one(Cg):  # (3, 3)
            U = _sqrtm_spd(Cg)
            P = self.rve.solve_pk1(U)
            S = jnp.linalg.solve(U, P)
            return 0.5 * (S + S.T)

        return jnp.moveaxis(jax.vmap(one, in_axes=-1)(C), 0, -1)


from fourc_tpu.materials.base import register_material  # noqa: E402

register_material("micromaterial")(Fe2Material)
