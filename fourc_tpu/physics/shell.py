"""Shell field: 6-dof-per-node structural mechanics on quad4 midsurfaces.

Counterpart of the reference's shell7p module driver side (ref: src/shell7p
— shells run through the standard structure_new integrators).  Mirrors
BeamField's interface so the shared statics/gen-alpha/OST step builders in
physics/beam.py and physics/solid.py apply unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.core.conditions import DirichletHandler
from fourc_tpu.core.functions import FunctionManager
from fourc_tpu.core.mesh import Discretization
from fourc_tpu.ops import shell as ops


class ShellField:
    """6 dofs/node: [u, theta] on quad4 element blocks."""

    def __init__(self, disc: Discretization, materials: dict, params,
                 dirichlet=(), point_neumann=(), functions=None):
        self.disc = disc
        self.params = params
        self.functions = functions or FunctionManager()
        self.ndpn = 6
        self.dofmap = disc.dofmap(6)
        self.ndof = self.dofmap.ndof
        self.dbc = DirichletHandler(list(dirichlet), disc.coords, 6,
                                    self.functions)
        self.point_neumann = list(point_neumann)
        self.coords = jnp.asarray(disc.coords)

        self.block_K = {}
        self.block_M = {}
        for key, blk in disc.blocks.items():
            if blk.cell != "quad4":
                raise ValueError("ShellField supports quad4 elements")
            mat = materials[int(np.asarray(blk.mat_id)[0])]
            Xe = self.coords[jnp.asarray(np.asarray(blk.conn))]
            self.block_K[key] = ops.element_stiffness(Xe, mat)
            self.block_M[key] = ops.lumped_mass(Xe, mat)

    def internal_force(self, u, history=None, dt=None, temps=None,
                       cstate=None, u_old=None):
        dm = self.dofmap
        per_block = {}
        for key in dm.blocks:
            ue = dm.gather(u, key).reshape(-1, 24)
            per_block[key] = jnp.einsum("eij,ej->ei", self.block_K[key], ue)
        return dm.scatter_add(per_block), None

    def external_force(self, t, u=None):
        f = jnp.zeros((self.ndof,), self.coords.dtype)
        for pb in self.point_neumann:
            xyz = self.coords[jnp.asarray(pb.nodes)]
            for k in range(min(6, len(pb.onoff))):
                if pb.onoff[k]:
                    fn = self.functions.get(pb.funct[k])
                    vals = pb.val[k] * fn(xyz, t, component=0)
                    f = f.at[jnp.asarray(pb.nodes) * 6 + k].add(vals)
        return f

    def lumped_mass(self):
        return self.dofmap.scatter_add(dict(self.block_M))

    def mass_matvec(self, v):
        if not hasattr(self, "_ml"):
            self._ml = self.lumped_mass()
        return self._ml * v

    def _residual_xform(self, residual_fn):
        return residual_fn, lambda u: u

    def build_preconditioner(self, u=None, history=None, dt=None,
                             mass_shift=0.0):
        from fourc_tpu.linalg.precond import jacobi

        # bending conditioning ~ (L/h)^2: dense inverse for moderate sizes
        # (the reference runs shells through direct solvers routinely)
        if self.ndof <= 6000:
            key_ = (round(float(mass_shift), 12),)
            cache = getattr(self, "_pc_cache", {})
            if key_ not in cache:
                K = np.zeros((self.ndof, self.ndof))
                for key in self.dofmap.blocks:
                    conn = np.asarray(self.disc.blocks[key].conn)
                    Ke = np.asarray(self.block_K[key])
                    dof = (conn[:, :, None] * 6 + np.arange(6)[None, None]) \
                        .reshape(-1, 24)
                    for e in range(dof.shape[0]):
                        ix = dof[e]
                        K[np.ix_(ix, ix)] += Ke[e]
                    if mass_shift:
                        Me = np.asarray(self.block_M[key])
                        np.add.at(K, (dof.reshape(-1), dof.reshape(-1)),
                                  mass_shift * Me.reshape(-1))
                free = np.asarray(self.dbc.free_mask)
                K[~free, :] = 0.0
                K[:, ~free] = 0.0
                K[~free, ~free] = 1.0
                cache[key_] = jnp.asarray(np.linalg.inv(K))
                self._pc_cache = cache
            Kinv = cache[key_]
            return lambda r: Kinv @ r
        per_block = {}
        for key in self.dofmap.blocks:
            Kd = jnp.einsum("eii->ei", self.block_K[key])
            if mass_shift:
                Kd = Kd + mass_shift * self.block_M[key]
            per_block[key] = Kd
        diag = self.dofmap.scatter_add(per_block)
        diag = jnp.where(self.dbc.free_mask, jnp.maximum(diag, 1e-30), 1.0)
        return jacobi(diag)


class KLShellField:
    """Rotation-free Kirchhoff-Love NURBS shell: 3 dofs per control point.

    ref: src/shell_kl_nurbs (4C_shell_kl_nurbs.*).  internal_force =
    jax.grad of the batched KL energy (ops/klshell.py); tangent = jvp.
    C1 inter-element continuity comes from the spline basis, so no
    rotational dofs are needed (Kiendl's isogeometric KL shell).
    """

    def __init__(self, patch, material, params, dirichlet=(),
                 point_neumann=(), functions=None):
        from fourc_tpu.ops import klshell as kls

        self.patch = patch
        self.params = params
        self.functions = functions or FunctionManager()
        self.ndpn = 3
        self.n_nodes = patch["coords"].shape[0]
        self.ndof = 3 * self.n_nodes
        self.coords = jnp.asarray(patch["coords"])

        class _D:  # minimal Discretization view for callbacks/queries
            pass

        self.disc = _D()
        self.disc.coords = patch["coords"]
        self.disc.node_sets = patch["node_sets"]
        self.disc.n_nodes = self.n_nodes
        self.disc.dim = 3
        self.dbc = DirichletHandler(list(dirichlet), patch["coords"], 3,
                                    self.functions)
        self.point_neumann = list(point_neumann)
        E = float(material["youngs"])
        nu = float(material["nue"])
        t = float(material["thickness"])
        self.rho_t = float(material.get("density", 1.0)) * t

        def energy(u):
            x = self.coords + u.reshape(-1, 3)
            return kls.kl_energy(patch, x, E, nu, t)

        self._force = jax.grad(energy)

    def internal_force(self, u, history=None, dt=None, temps=None,
                       cstate=None, u_old=None):
        return self._force(u), None

    def external_force(self, t, u=None):
        f = jnp.zeros((self.ndof,), self.coords.dtype)
        for pb in self.point_neumann:
            xyz = self.coords[jnp.asarray(pb.nodes)]
            for k in range(min(3, len(pb.onoff))):
                if pb.onoff[k]:
                    fn = self.functions.get(pb.funct[k])
                    vals = pb.val[k] * fn(xyz, t, component=0)
                    f = f.at[jnp.asarray(pb.nodes) * 3 + k].add(vals)
        return f

    def lumped_mass(self):
        # control-point lumping by tributary reference area
        w = jnp.asarray(self.patch["w"])
        N = jnp.asarray(self.patch["N"])
        conn = jnp.asarray(self.patch["conn"])
        dN = jnp.asarray(self.patch["dN"])
        xe = self.coords[conn]
        aa = jnp.einsum("egak,ead->egkd", dN, xe)
        jdet = jnp.linalg.norm(jnp.cross(aa[..., 0, :], aa[..., 1, :]),
                               axis=-1)
        m_e = jnp.einsum("eg,eg,ega->ea", w, jdet, N) * self.rho_t
        m = jnp.zeros((self.n_nodes,)).at[conn].add(m_e)
        return jnp.repeat(jnp.maximum(m, 1e-12), 3)

    def mass_matvec(self, v):
        if not hasattr(self, "_ml"):
            self._ml = self.lumped_mass()
        return self._ml * v

    def _residual_xform(self, residual_fn):
        return residual_fn, lambda u: u

    def build_preconditioner(self, u=None, history=None, dt=None,
                             mass_shift=0.0):
        from fourc_tpu.linalg.precond import jacobi

        # AD diagonal of the tangent via Hutchinson-free exact probes is
        # overkill here; Jacobi on a fixed scale works for the modest
        # patch sizes this field targets
        u0 = jnp.zeros((self.ndof,)) if u is None else u
        diag = jnp.zeros((self.ndof,))
        # 3 probes (one per component direction pattern)
        for k in range(3):
            p = jnp.zeros((self.n_nodes, 3)).at[:, k].set(1.0).reshape(-1)
            _, jv = jax.jvp(lambda x: self._force(x), (u0,), (p,))
            diag = diag + p * jv
        diag = jnp.where(self.dbc.free_mask,
                         jnp.maximum(jnp.abs(diag), 1e-10)
                         + mass_shift * self.lumped_mass(), 1.0)
        dinv = 1.0 / diag
        return lambda r: dinv * r


class Shell7pField:
    """7-parameter shell: 7 dofs/node [u(3), w(3), beta] on quad4 blocks,
    geometrically nonlinear with unmodified 3D material laws.

    ref: src/shell7p (4C_shell7p_ele_calc.*) — here the batched element
    energy (ops/shell7p.py) is differentiated by jax AD for the internal
    force; the tangent is jvp-of-grad (matrix-free), matching the house
    pattern of SolidField.
    """

    def __init__(self, disc: Discretization, materials: dict, params,
                 dirichlet=(), point_neumann=(), functions=None):
        from fourc_tpu.ops import shell7p as s7

        self.disc = disc
        self.params = params
        self.functions = functions or FunctionManager()
        self.ndpn = 7
        self.dofmap = disc.dofmap(7)
        self.ndof = self.dofmap.ndof
        self.dbc = DirichletHandler(list(dirichlet), disc.coords, 7,
                                    self.functions)
        self.point_neumann = list(point_neumann)
        self.coords = jnp.asarray(disc.coords)

        self._forces = {}
        self._mass = {}
        for key, blk in disc.blocks.items():
            if blk.cell != "quad4":
                raise ValueError("Shell7pField supports quad4 elements")
            mat = materials[int(np.asarray(blk.mat_id)[0])]
            Xb = self.coords[jnp.asarray(np.asarray(blk.conn))]
            force, _ = s7.make_internal_force(Xb, mat, mat.thickness)
            self._forces[key] = force
            self._mass[key] = s7.lumped_mass(Xb, mat.density, mat.thickness)

    def internal_force(self, u, history=None, dt=None, temps=None,
                       cstate=None, u_old=None):
        dm = self.dofmap
        per = {}
        for key in dm.blocks:
            qb = dm.gather(u, key)  # (E, 4, 7)
            per[key] = self._forces[key](qb).reshape(qb.shape[0], -1)
        return dm.scatter_add(per), None

    def external_force(self, t, u=None):
        f = jnp.zeros((self.ndof,), self.coords.dtype)
        for pb in self.point_neumann:
            xyz = self.coords[jnp.asarray(pb.nodes)]
            for k in range(min(7, len(pb.onoff))):
                if pb.onoff[k]:
                    fn = self.functions.get(pb.funct[k])
                    vals = pb.val[k] * fn(xyz, t, component=0)
                    f = f.at[jnp.asarray(pb.nodes) * 7 + k].add(vals)
        return f

    def lumped_mass(self):
        per = {k: m.reshape(m.shape[0], -1) for k, m in self._mass.items()}
        return jnp.maximum(self.dofmap.scatter_add(per), 1e-12)

    def mass_matvec(self, v):
        if not hasattr(self, "_ml"):
            self._ml = self.lumped_mass()
        return self._ml * v

    def _residual_xform(self, residual_fn):
        return residual_fn, lambda u: u

    def build_preconditioner(self, u=None, history=None, dt=None,
                             mass_shift=0.0):
        u0 = jnp.zeros((self.ndof,), self.coords.dtype) if u is None else u
        diag = jnp.zeros((self.ndof,), self.coords.dtype)
        nn = self.disc.n_nodes
        for k in range(7):
            p = jnp.zeros((nn, 7), self.coords.dtype).at[:, k].set(1.0)
            p = p.reshape(-1)
            _, jv = jax.jvp(lambda x: self.internal_force(x)[0], (u0,), (p,))
            diag = diag + p * jv
        diag = jnp.abs(diag) + mass_shift * self.lumped_mass()
        diag = jnp.where(self.dbc.free_mask, jnp.maximum(diag, 1e-10), 1.0)
        dinv = 1.0 / diag
        return lambda r: dinv * r
