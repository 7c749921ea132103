"""Scalar-transport field (scatra + thermo share this core).

Counterpart of the reference's scatra time integration
(ref: src/scatra/4C_scatra_timint_implicit.cpp — `ScaTraTimIntImpl`,
`time_loop()` :1537, `nonlinear_solve()` :2933; schemes OST/BDF2/GenAlpha/
stationary in 4C_scatra_timint_{ost,bdf2,genalpha,stationary}.*) and the
thermo field (ref: src/thermo/src/implicit/4C_thermo_timint_{statics,ost,
genalpha}.hpp).  One scalar dof per node; element kernels in ops/scalar.py.

Design: like SolidField, a ScalarField owns mesh+materials+BCs and provides
pure residual functions; integrator builders return ONE jitted step with
the full Newton-Krylov loop on device.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.core.conditions import DirichletHandler
from fourc_tpu.core.functions import FunctionManager
from fourc_tpu.core.mesh import Discretization
from fourc_tpu.ops import common as gm
from fourc_tpu.ops import scalar as ops
from fourc_tpu.physics.newton import NewtonParams, newton_solve


@dataclass
class GenAlphaScalarParams:
    """JWH gen-alpha for first-order systems (ref: scatra genalpha:
    alpha_f = 1/(1+rho_inf), alpha_m = (3-rho_inf)/(2(1+rho_inf)),
    gamma = 1/2 + alpha_m - alpha_f).  Explicit coefficients override the
    rho_inf parametrisation (ref: THERMAL DYNAMIC/GENALPHA ALPHA_F/
    ALPHA_M/GAMMA given directly, e.g. the fully-implicit af = am = 1)."""

    rho_inf: float = 1.0
    alpha_f_in: float | None = None
    alpha_m_in: float | None = None
    gamma_in: float | None = None

    @property
    def alpha_f(self):
        if self.alpha_f_in is not None:
            return float(self.alpha_f_in)
        return 1.0 / (1.0 + self.rho_inf)

    @property
    def alpha_m(self):
        if self.alpha_m_in is not None:
            return float(self.alpha_m_in)
        return 0.5 * (3.0 - self.rho_inf) / (1.0 + self.rho_inf)

    @property
    def gamma(self):
        if self.gamma_in is not None:
            return float(self.gamma_in)
        return 0.5 + self.alpha_m - self.alpha_f


@dataclass
class ScalarParams:
    dyntype: str = "onesteptheta"  # stationary|onesteptheta|bdf2|genalpha
    dt: float = 1.0
    n_steps: int = 1
    theta: float = 0.5
    genalpha: GenAlphaScalarParams = field(default_factory=GenAlphaScalarParams)
    newton: NewtonParams = field(default_factory=NewtonParams)
    stab: str = "taylor"  # SUPG tau: zero|taylor|franca_valentin
    velocity: list | None = None  # convective velocity exprs (scatra only)
    initial_funct: int = 0  # initial field function id
    divercont: str = "stop"
    max_halvings: int = 5
    dtype: str = "float64"


class ScalarField:
    """Discretization + scalar materials + BCs -> pure residual functions.

    materials: {mat_id: Material with .diff(phi), .reaction(phi) or .flux;
    kind 'scatra' or 'thermo'}.
    """

    quantity = "phi"

    def __init__(
        self,
        disc: Discretization,
        materials: dict,
        params: ScalarParams,
        dirichlet=(),
        neumann=(),
        body_forces=(),
        functions: FunctionManager | None = None,
    ):
        self.disc = disc
        self.params = params
        self.functions = functions or FunctionManager()
        # K scalars per node when any block material is a matlist_reactions
        # species list (ref: MAT_matlist_reactions NUMMAT); 1 otherwise
        used_mats = {int(np.asarray(b.mat_id)[0]) for b in disc.blocks.values()}
        self.ndpn = max(
            (getattr(materials[m], "nspec", 1) for m in used_mats), default=1
        )
        self.dofmap = disc.dofmap(self.ndpn)
        self.ndof = self.dofmap.ndof
        dirichlet = list(dirichlet)
        if "__padding__" in disc.node_sets and len(disc.node_sets["__padding__"]):
            from fourc_tpu.core.conditions import DirichletBC

            dirichlet.append(DirichletBC(disc.node_sets["__padding__"],
                                         [1] * self.ndpn, [0.0] * self.ndpn))
        if self.ndpn > 1:
            # variable-dof support (ref: the reference's diffnumdof setup —
            # a block whose material carries fewer species leaves the extra
            # nodal dofs without any element row): dofs no block supports
            # are pinned to zero so the system stays regular.
            from fourc_tpu.core.conditions import DirichletBC

            support = np.zeros((disc.coords.shape[0], self.ndpn), dtype=bool)
            for key, blk in disc.blocks.items():
                mid = int(np.asarray(blk.mat_id)[0])
                kb = getattr(materials[mid], "nspec", 1)
                support[np.asarray(blk.conn).reshape(-1), :kb] = True
            for k in range(self.ndpn):
                dead = np.where(~support[:, k])[0]
                if dead.size:
                    onoff = [0] * self.ndpn
                    onoff[k] = 1
                    dirichlet.append(DirichletBC(dead.astype(np.int32), onoff,
                                                 [0.0] * self.ndpn))
        self.dbc = DirichletHandler(dirichlet, disc.coords, self.ndpn,
                                    self.functions)
        self.neumann = list(neumann)
        self.body_forces = list(body_forces)

        self.coords = jnp.asarray(disc.coords)
        self.block_mat = {}
        self.block_X = {}
        for key, blk in disc.blocks.items():
            mid = int(np.asarray(blk.mat_id)[0])
            self.block_mat[key] = materials[mid]
            self.block_X[key] = self.coords[self.dofmap.blocks[key].conn]

        self._neumann_data = []
        for nb in self.neumann:
            from fourc_tpu.core.cells import get_cell

            for fb in nb.faces:
                fc = get_cell(fb.cell)
                conn = jnp.asarray(fb.conn)
                self._neumann_data.append((nb, fc, conn, self.coords[conn]))

        # velocity field: list of expressions (or None)
        self._vel_fn = None
        if params.velocity is not None:
            from fourc_tpu.core.functions import FunctionOfSpaceTime

            self._vel_fn = FunctionOfSpaceTime.from_spec(
                [str(v) for v in params.velocity]
            )

    def _cell(self, key):
        from fourc_tpu.core.cells import get_cell

        return get_cell(self.dofmap.blocks[key].cell)

    def _mat_props(self, key):
        m = self.block_mat[key]
        kind = getattr(m, "kind", "scatra")
        if kind in ("scatra", "scatra_solid", "poro_solid"):
            # d phi/dt storage scaling (porosity for porous transport,
            # 1 otherwise)
            rhoc = float(getattr(m, "capacity", 1.0) or 1.0)
            diff = m.diff()
            reaction = m.reaction
        else:  # thermo / thermo_solid: rho c dT/dt = div(k grad T)
            rhoc = float(m.density or 1.0) * float(getattr(m, "capacity", 1.0) or 1.0)
            diff = float(m.conductivity)
            reaction = None
        return diff, rhoc, reaction

    def _multi_lists(self, m):
        """Per-species diffusivity/capacity lists padded to the field's K
        (a block carrying fewer species contributes zero rows beyond its
        own — those dofs are pinned by the support mask above)."""
        K = self.ndpn
        if hasattr(m, "diff_list"):
            D, C = list(m.diff_list()), list(m.capacity_list())
        else:
            D = [float(m.diff())]
            C = [float(getattr(m, "capacity", 1.0) or 1.0)]
        return D + [0.0] * (K - len(D)), C + [0.0] * (K - len(C))

    def velocity_at_gps(self, key, t):
        """Convective velocity at GPs: (e, g, d) or None."""
        if self._vel_fn is None:
            return None
        cell = self._cell(key)
        xg = ops.gp_coords(self.block_X[key], cell)
        return self._vel_fn(xg, t)  # (e, g, d)

    def source_at_gps(self, key, t):
        """Volumetric source at GPs from body_force conditions: (e,g) or None."""
        if not self.body_forces:
            return None
        cell = self._cell(key)
        xg = ops.gp_coords(self.block_X[key], cell)
        s = jnp.zeros(xg.shape[:2], xg.dtype)
        for bf in self.body_forces:
            fn = self.functions.get(bf.funct[0])
            s = s + bf.val[0] * fn(xg, t, component=0)
        return s

    def residual_transient(self, phi, phidot, t, dt=None, extra_source=None,
                           mesh_disp=None, vel_nodes=None, extra_flux=None):
        """Global residual r(phi, phidot) at time t.

        extra_source: optional {block_key: (e,g)} coupling source at GPs
        (used by TSI for thermoelastic heating).
        mesh_disp: (n_nodes, dim) — evaluate transport on the DEFORMED
        configuration (SSI: diffusion follows the deforming body).
        extra_flux: optional {block_key: (e,g,d)} additional diffusive-type
        flux at GPs, added as int grad(w) . flux (STI Soret term).
        """
        dm = self.dofmap
        per_block = {}
        if self.ndpn > 1:
            for key in dm.blocks:
                cell = self._cell(key)
                m = self.block_mat[key]
                phie = dm.gather(phi, key)  # (e, a, K)
                phidote = dm.gather(phidot, key)
                Xe = self.block_X[key]
                if mesh_disp is not None:
                    Xe = Xe + mesh_disp[dm.blocks[key].conn]
                vel_gp = self.velocity_at_gps(key, t)
                reaction_gp = None
                if getattr(m, "reactions", None):
                    xg = ops.gp_coords(Xe, cell)
                    fns, tt = self.functions, t

                    def reaction_gp(p, m=m, xg=xg, fns=fns, tt=tt):
                        return m.reaction_gp(p, xg, fns, tt)

                elif float(getattr(m, "reacoeff", 0.0) or 0.0):
                    # plain scatra block inside a multi field: linear decay
                    # on its single species only
                    rc = float(m.reacoeff)

                    def reaction_gp(p, rc=rc):
                        return jnp.zeros_like(p).at[..., 0].set(rc * p[..., 0])

                D, C = self._multi_lists(m)
                fe = ops.residual_multi(
                    Xe, phie, phidote, cell, D, C,
                    vel_gp=vel_gp, reaction_gp=reaction_gp,
                )
                per_block[key] = fe.reshape(fe.shape[0], -1)
            return dm.scatter_add(per_block) - self.neumann_flux(t)
        for key in dm.blocks:
            cell = self._cell(key)
            diff, rhoc, reaction = self._mat_props(key)
            phie = dm.gather(phi, key)[..., 0]
            phidote = dm.gather(phidot, key)[..., 0]
            src = self.source_at_gps(key, t)
            if extra_source is not None and key in extra_source:
                src = extra_source[key] if src is None else src + extra_source[key]
            Xe = self.block_X[key]
            if mesh_disp is not None:
                Xe = Xe + mesh_disp[dm.blocks[key].conn]
            vel_gp = self.velocity_at_gps(key, t)
            if vel_nodes is not None:
                # numeric convective velocity (e.g. the fluid solution in
                # loma / coupled transport), interpolated to GPs
                vel_e = vel_nodes[dm.blocks[key].conn]
                vel_num = jnp.einsum("ga,ead->egd",
                                     jnp.asarray(cell.N, Xe.dtype), vel_e)
                vel_gp = vel_num if vel_gp is None else vel_gp + vel_num
            fe = ops.residual(
                Xe, phie, phidote, cell,
                diff, rhoc,
                vel_gp=vel_gp,
                reaction=reaction,
                source_gp=src,
                tau_kind=(self.params.stab
                          if (self._vel_fn is not None or vel_nodes is not None)
                          else "zero"),
                dt=dt,
            )
            if extra_flux is not None and key in extra_flux:
                G, detJ = gm.iso_gradients(Xe, cell.dN)
                wdet = gm.weighted(detJ, cell.gauss_weights)
                fe = fe + jnp.einsum("eg,egad,egd->ea", wdet, G,
                                     extra_flux[key])
            per_block[key] = fe
        r = dm.scatter_add(per_block)
        return r - self.neumann_flux(t)

    def neumann_flux(self, t):
        """Prescribed boundary flux contributions (positive into domain)."""
        f = jnp.zeros((self.ndof,), self.coords.dtype)
        for nb, fc, conn, Xf in self._neumann_data:
            fn = self.functions.get(nb.funct[0])
            xg = gm.interp_field(Xf, fc.N)
            q = nb.val[0] * fn(xg, t, component=0)
            fe = ops.surface_flux(Xf, jnp.broadcast_to(q, xg.shape[:2]), fc)
            f = f.at[conn.reshape(-1)].add(fe.reshape(-1))
        return f

    def lumped_capacity(self):
        dm = self.dofmap
        per_block = {}
        for key in dm.blocks:
            if self.ndpn > 1:
                m = self.block_mat[key]
                base = ops.capacity_lumped(self.block_X[key], self._cell(key),
                                           1.0)  # (e, a)
                cap = jnp.asarray(self._multi_lists(m)[1], base.dtype)
                ce = base[..., None] * cap  # (e, a, K)
                per_block[key] = ce.reshape(ce.shape[0], -1)
                continue
            _, rhoc, _ = self._mat_props(key)
            per_block[key] = ops.capacity_lumped(self.block_X[key], self._cell(key), rhoc)
        return dm.scatter_add(per_block)

    def build_preconditioner(self, dt_factor=0.0):
        """Jacobi from lumped diffusion + capacity diagonal (mask-safe)."""
        from fourc_tpu.linalg.precond import jacobi

        dm = self.dofmap
        per_block = {}
        if self.ndpn > 1:
            for key in dm.blocks:
                cell = self._cell(key)
                m = self.block_mat[key]
                G, detJ = gm.iso_gradients(self.block_X[key], cell.dN)
                wdet = gm.weighted(detJ, cell.gauss_weights)
                kbase = jnp.einsum("eg,egad,egad->ea", wdet, G, G)  # (e,a)
                Dl, Cl = self._multi_lists(m)
                D = jnp.asarray(Dl, kbase.dtype)
                kdiag = kbase[..., None] * D  # (e, a, K)
                if dt_factor:
                    cbase = ops.capacity_lumped(self.block_X[key], cell, 1.0)
                    cap = jnp.asarray(Cl, cbase.dtype)
                    kdiag = kdiag + dt_factor * cbase[..., None] * cap
                per_block[key] = kdiag.reshape(kdiag.shape[0], -1)
            diag = dm.scatter_add(per_block)
            diag = jnp.where(self.dbc.free_mask, jnp.maximum(diag, 1e-300), 1.0)
            return jacobi(diag)
        for key in dm.blocks:
            cell = self._cell(key)
            diff, rhoc, _ = self._mat_props(key)
            G, detJ = gm.iso_gradients(self.block_X[key], cell.dN)
            wdet = gm.weighted(detJ, cell.gauss_weights)
            if hasattr(diff, "ndim") and getattr(diff, "ndim", 0) == 2:
                dscal = jnp.trace(diff) / diff.shape[0]
            else:
                dscal = diff
            kdiag = dscal * jnp.einsum("eg,egad,egad->ea", wdet, G, G)
            if dt_factor:
                kdiag = kdiag + dt_factor * ops.capacity_lumped(
                    self.block_X[key], cell, rhoc
                )
            per_block[key] = kdiag
        diag = dm.scatter_add(per_block)
        diag = jnp.where(self.dbc.free_mask, jnp.maximum(diag, 1e-300), 1.0)
        return jacobi(diag)


# ---------------------------------------------------------------------------
# state + integrators
# ---------------------------------------------------------------------------


def init_state(f: ScalarField):
    want64 = f.params.dtype == "float64" and jax.config.jax_enable_x64
    dtype = jnp.float64 if want64 else jnp.float32
    z = jnp.zeros((f.ndof,), dtype=dtype)
    phi0 = z
    if f.params.initial_funct:
        fn = f.functions.get(f.params.initial_funct)
        X = jnp.asarray(f.disc.coords, dtype)
        if f.ndpn > 1:
            # per-species components of the initial-field function
            # (ref: INITIALFIELD field_by_function with a multi-component
            # FUNCT for matlist decks)
            cols = [fn(X, 0.0, component=k) for k in range(f.ndpn)]
            phi0 = jnp.stack(cols, axis=-1).reshape(-1)
        else:
            phi0 = fn(X, 0.0, component=0)
    phi0 = f.dbc.apply(phi0, 0.0)
    return {
        "phi": phi0,
        "phidot": z,
        "phi_nm1": phi0,  # for BDF2
        "t": jnp.asarray(0.0, dtype),
        "step": jnp.asarray(0),
    }


def compute_initial_state(f: ScalarField, state):
    """Consistent initial rate: C phidot0 = -r_steady(phi0).

    Solves with the CONSISTENT capacity matrix like the reference's
    `calc_initial_time_derivative` (ref: src/scatra/
    4C_scatra_timint_implicit.cpp) — the matrix action is extracted from
    the residual's linearity in phidot, the lumped diagonal serves as the
    Jacobi preconditioner.  A lumped-only inverse perturbs the whole OST
    trajectory at the 1e-3 level on coarse meshes (measured against the
    reference's distrreaccoeff anchors).
    """
    if f.params.dyntype == "stationary":
        return state
    t0 = state["t"]
    zero = jnp.zeros_like(state["phi"])
    r = f.residual_transient(state["phi"], zero, t0, dt=f.params.dt)
    r0 = f.residual_transient(state["phi"], zero, t0, dt=f.params.dt)
    # consistent capacity action: residual is affine in phidot at fixed phi
    def massmat(v):
        return f.dbc.mask(
            f.residual_transient(state["phi"], v, t0, dt=f.params.dt) - r0
        )

    from fourc_tpu.linalg import solvers as ls

    c = f.lumped_capacity()
    cinv = jnp.where(f.dbc.free_mask, 1.0 / jnp.maximum(c, 1e-300), 1.0)
    phidot0 = ls.cg(massmat, f.dbc.mask(-r), M=lambda x: cinv * x,
                    tol=1e-12, maxiter=200).x
    new = dict(state)
    new["phidot"] = f.dbc.mask(phidot0)
    return new


def make_step(f: ScalarField, dt: float | None = None):
    dt = float(dt if dt is not None else f.params.dt)
    typ = f.params.dyntype
    if typ == "stationary":
        raw = _make_stationary_step(f, dt)
    elif typ == "onesteptheta":
        raw = _make_ost_step(f, dt)
    elif typ == "bdf2":
        raw = _make_bdf2_step(f, dt)
    elif typ == "genalpha":
        raw = _make_genalpha_step(f, dt)
    else:
        raise ValueError(f"unknown scalar DYNAMICTYPE {typ!r}")
    return jax.jit(raw)


def _solve(f, residual, phi0, M):
    return newton_solve(residual, phi0, f.dbc.free_mask, M, f.params.newton)


def _make_stationary_step(f: ScalarField, dt: float):
    def step(state):
        t1 = state["t"] + dt
        zero = jnp.zeros_like(state["phi"])

        def residual(phi):
            return f.residual_transient(phi, zero, t1, dt=None)

        phi0 = f.dbc.apply(state["phi"], t1)
        M = f.build_preconditioner()
        phi, stats = _solve(f, residual, phi0, M)
        new = dict(state)
        new.update(phi=phi, phi_nm1=state["phi"], t=t1, step=state["step"] + 1)
        return new, stats

    return step


def _make_ost_step(f: ScalarField, dt: float):
    th = f.params.theta

    def step(state):
        t1 = state["t"] + dt
        phi_n, phidot_n = state["phi"], state["phidot"]

        def residual(phi):
            phidot = (phi - phi_n) / (th * dt) - (1 - th) / th * phidot_n
            # DBC rows carry the FUNCT's analytic rate during the solve
            # (ref: thermo/scatra evaluate_dirichlet fills the rate vector;
            # update_iter_incrementally only writes the recursion to free
            # rows, 4C_thermo_timint_genalpha.cpp:330-351)
            phidot = f.dbc.apply_rates(phidot, t1)
            return f.residual_transient(phi, phidot, t1, dt=dt)

        phi0 = f.dbc.apply(phi_n, t1)
        M = f.build_preconditioner(dt_factor=1.0 / (th * dt))
        phi, stats = _solve(f, residual, phi0, M)
        phidot1 = (phi - phi_n) / (th * dt) - (1 - th) / th * phidot_n
        new = dict(state)
        new.update(phi=phi, phidot=f.dbc.apply_rates(phidot1, t1), phi_nm1=phi_n, t=t1,
                   step=state["step"] + 1)
        return new, stats

    return step


def _make_bdf2_step(f: ScalarField, dt: float):
    """BDF2 (ref: 4C_scatra_timint_bdf2); first step = backward Euler."""

    def step(state):
        t1 = state["t"] + dt
        phi_n, phi_nm1 = state["phi"], state["phi_nm1"]
        first = state["step"] == 0

        def residual(phi):
            phidot_be = (phi - phi_n) / dt
            phidot_b2 = (3.0 * phi - 4.0 * phi_n + phi_nm1) / (2.0 * dt)
            phidot = jnp.where(first, phidot_be, phidot_b2)
            phidot = f.dbc.apply_rates(phidot, t1)
            return f.residual_transient(phi, phidot, t1, dt=dt)

        phi0 = f.dbc.apply(phi_n, t1)
        M = f.build_preconditioner(dt_factor=1.5 / dt)
        phi, stats = _solve(f, residual, phi0, M)
        phidot1 = jnp.where(
            first, (phi - phi_n) / dt, (3.0 * phi - 4.0 * phi_n + phi_nm1) / (2.0 * dt)
        )
        new = dict(state)
        new.update(phi=phi, phidot=f.dbc.apply_rates(phidot1, t1), phi_nm1=phi_n, t=t1,
                   step=state["step"] + 1)
        return new, stats

    return step


def _make_genalpha_step(f: ScalarField, dt: float):
    ga = f.params.genalpha
    af, am, gamma = ga.alpha_f, ga.alpha_m, ga.gamma

    def step(state):
        t1 = state["t"] + dt
        taf = state["t"] + af * dt
        phi_n, phidot_n = state["phi"], state["phidot"]

        def residual(phi1):
            phidot1 = (phi1 - phi_n) / (gamma * dt) + (1.0 - 1.0 / gamma) * phidot_n
            phidot1 = f.dbc.apply_rates(phidot1, t1)
            phi_af = af * phi1 + (1 - af) * phi_n
            phidot_am = am * phidot1 + (1 - am) * phidot_n
            return f.residual_transient(phi_af, phidot_am, taf, dt=dt)

        phi0 = f.dbc.apply(phi_n, t1)
        M = f.build_preconditioner(dt_factor=am / (gamma * dt * af + 1e-300))
        phi, stats = _solve(f, residual, phi0, M)
        phidot1 = (phi - phi_n) / (gamma * dt) + (1.0 - 1.0 / gamma) * phidot_n
        new = dict(state)
        new.update(phi=phi, phidot=f.dbc.apply_rates(phidot1, t1), phi_nm1=phi_n, t=t1,
                   step=state["step"] + 1)
        return new, stats

    return step
