"""Geometric multigrid preconditioner for structured lattices.

Counterpart of the reference's MueLu AMG preconditioner
(ref: src/core/linear_solver/src/preconditioner/4C_linear_solver_preconditioner_muelu.cpp:52-97
CreateXpetraPreconditioner with rigid-body-mode nullspace) — but TPU-native:
on a structured lattice (GridGenerator provenance) the whole hierarchy is
geometric, every transfer is a stencil (slicing) op, and every level's
operator is a matrix-free rediscretized LINEAR-elastic operator evaluated
with the same batched element kernels.  No sparse matrices anywhere.

Design:
- levels: n -> n/2 -> ... while all axes even (coarse lattice = every 2nd
  fine lattice point, so stretched tensor-product grids coarsen exactly)
- smoother: Chebyshev(k) on the Jacobi-scaled operator (lambda_max from
  power iteration at build time, eagerly, once)
- cycle: V(1,1) with a Chebyshev-smoothed coarsest level
- the preconditioner operator is the small-strain rediscretization
  (+ mass shift for dynamics), state-independent: spectrally equivalent to
  the consistent tangent at moderate strains, and reusable across Newton
  iterations and time steps (the analog of the reference's `savegraph` +
  preconditioner reuse)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _ax_slice(nd, axis, sl):
    return tuple(sl if i == axis else slice(None) for i in range(nd))


def _interp_axis(c, axis, n_f=None):
    """Linear interpolation along one lattice axis: coarse (m+1) -> fine
    (2m+1) points.  Axis-local slicing, NO moveaxis: the transposes of
    the (p,p,p,ndpn) lattice dominated the measured V-cycle cost on TPU
    (relayout copies per axis per level)."""
    nd = c.ndim
    m1 = c.shape[axis]
    f_shape = c.shape[:axis] + (2 * (m1 - 1) + 1,) + c.shape[axis + 1:]
    f = jnp.zeros(f_shape, c.dtype)
    f = f.at[_ax_slice(nd, axis, slice(0, None, 2))].set(c)
    lo = c[_ax_slice(nd, axis, slice(0, m1 - 1))]
    hi = c[_ax_slice(nd, axis, slice(1, m1))]
    f = f.at[_ax_slice(nd, axis, slice(1, None, 2))].set(0.5 * (lo + hi))
    return f


def _restrict_axis(f, axis):
    """Transpose of _interp_axis: fine (2m+1) -> coarse (m+1) points."""
    nd = f.ndim
    even = f[_ax_slice(nd, axis, slice(0, None, 2))]
    odd = f[_ax_slice(nd, axis, slice(1, None, 2))]
    c = even
    c = c.at[_ax_slice(nd, axis, slice(0, -1))].add(0.5 * odd)
    c = c.at[_ax_slice(nd, axis, slice(1, None))].add(0.5 * odd)
    return c


class StructuredGMG:
    """V-cycle preconditioner on the structured hex8/quad4 lattice of a
    field; see module docstring.

    field must expose: disc (with structured_shape), dofmap (structured
    block), dbc.free_mask, ndpn, and material Lame parameters via
    `lame_params()` below.
    """

    def __init__(self, disc, ndpn, free_mask, lam, mu, rho=0.0,
                 mass_shift=0.0, n_smooth=2, cheby_degree=3, coarsest=8,
                 dtype=jnp.float32, max_levels=0):
        from fourc_tpu.core import cells as _cells
        from fourc_tpu.ops import solid as sops

        ss = getattr(disc, "structured_shape", None)
        if ss is not None:
            shape0 = tuple(ss[:len(ss) - 1])
        else:
            # lattice detected from connectivity alone (core/mesh.py
            # _detect_conn_lattice): shape from the dofmap block
            blk = next(iter(disc.dofmap(ndpn).blocks.values()))
            shape0 = tuple(blk.structured["shape"])
        dim = len(shape0)
        pshape0 = tuple(s + 1 for s in shape0)
        lattice_coords = np.asarray(disc.coords).reshape(pshape0 + (dim,))
        mask0 = np.asarray(free_mask).reshape(pshape0 + (ndpn,))

        cellname = "hex8" if dim == 3 else "quad4"
        cell = _cells.get_cell(cellname)
        self.ndpn = ndpn
        self.dim = dim
        self.levels = []

        shape = shape0
        coords = lattice_coords
        mask = mask0
        while True:
            level = _Level(shape, coords, mask, cell, lam, mu, rho,
                           mass_shift, ndpn, dtype)
            self.levels.append(level)
            if max_levels and len(self.levels) >= max_levels:
                break
            if any(s % 2 for s in shape) or min(shape) <= 2 or \
               int(np.prod(shape)) <= coarsest:
                break
            shape = tuple(s // 2 for s in shape)
            coords = coords[tuple(slice(None, None, 2) for _ in range(dim))]
            # a coarse lattice dof is free only if the matching fine dof is
            mask = mask[tuple(slice(None, None, 2) for _ in range(dim))]

        self.n_smooth = n_smooth
        import os

        # sharp lambda_max from a few power iterations (one small jitted
        # program per level) instead of the Gershgorin bound: a tighter
        # Chebyshev interval strengthens the smoother at zero per-apply
        # cost.  FOURC_GMG_POWER=0 restores the bound-only setup.
        pit = int(os.environ.get("FOURC_GMG_POWER", "12"))

        def _pit(lv):
            # general-geometry levels: the power iteration would estimate
            # lmax of the MEAN-stencil ref operator, not the real one —
            # use the rigorous Gershgorin bound from the real row sums
            return 0 if getattr(lv, "_gen_xw", None) is not None else pit

        for lv in self.levels:
            lv.setup_chebyshev(cheby_degree, power_iters=_pit(lv))
        self.levels[-1].setup_chebyshev(max(cheby_degree, 6),
                                        power_iters=_pit(self.levels[-1]))

    # -- transfers ----------------------------------------------------------

    # NOTE on masking: all traced masking below is ARITHMETIC with the f32
    # 0/1 weight `lv.w`, never `jnp.where(lv.free, ...)`.  Exactness is
    # identical (one product term is exactly zero), but on TPU the bool
    # (packed-pred) lattice-sized mask arrays trigger a Mosaic/XLA runtime
    # fault once two or more masked stencil applications compose in one
    # program (worker crash reproduced at 73^3; each piece alone is fine —
    # see round-2 notes).  Eager/setup math may keep using `lv.free`.

    def _interp(self, z_c, lv_f, lv_c, wide=False):
        if wide:
            from fourc_tpu.ops import lattice_pallas as lp

            z = lp.crop_real(z_c, lv_c._lattice_spec)
            for ax in range(self.dim):
                z = _interp_axis(z, 1 + ax, None)
            return lp.widen_real(z, lv_f._lattice_spec) * lv_f.w_wide
        z = z_c.reshape(lv_c.pshape + (self.ndpn,))
        for ax in range(self.dim):
            z = _interp_axis(z, ax, None)
        z = z.reshape(-1)
        return z * lv_f.w

    def _restrict(self, r_f, lv_f, lv_c, wide=False):
        if wide:
            from fourc_tpu.ops import lattice_pallas as lp

            r = lp.crop_real(r_f, lv_f._lattice_spec)
            for ax in range(self.dim):
                r = _restrict_axis(r, 1 + ax)
            return lp.widen_real(r, lv_c._lattice_spec) * lv_c.w_wide
        r = r_f.reshape(lv_f.pshape + (self.ndpn,))
        for ax in range(self.dim):
            r = _restrict_axis(r, ax)
        r = r.reshape(-1)
        return r * lv_c.w

    # -- cycle ----------------------------------------------------------------

    @property
    def wide_ok(self):
        """All levels can run the wide-layout (relayout-free) V-cycle."""
        return all(lv._lattice_spec is not None for lv in self.levels)

    def v_cycle(self, r, k=0, wide=False):
        lv = self.levels[k]
        r = r * (lv.w_wide if wide else lv.w)
        if k == len(self.levels) - 1:
            return lv.chebyshev0(r, wide=wide)
        # pre-smooth from zero, residual fused into the smoother's own
        # matvec chain (see chebyshev0): degree matvecs total, vs
        # degree + 2 for smooth-from-zero + separate residual
        z, res = lv.chebyshev0(r, return_res=True, wide=wide)
        z_c = self.v_cycle(self._restrict(res, lv, self.levels[k + 1], wide),
                           k + 1, wide)
        z = z + self._interp(z_c, lv, self.levels[k + 1], wide)
        # post-smooth (no residual needed afterwards)
        res = r - lv.matvec_wide(z) if wide else r - lv.matvec(z)
        z = z + lv.chebyshev0(res, wide=wide)
        return z

    def __call__(self, r):
        # wide-layout (3, X, Y, Z) inputs run the relayout-free cycle
        # (see ops/lattice_pallas.py wide_shape); flat dof vectors the
        # classic one.  mask-safe either way: constrained entries pass
        # through (unit diagonal).
        wide = r.ndim == 4
        z = self.v_cycle(r, wide=wide)
        w = self.levels[0].w_wide if wide else self.levels[0].w
        return w * z + (1.0 - w) * r


def _lattice_enabled():
    from fourc_tpu.ops import lattice as _lat

    return _lat.enabled()


class _Level:
    """One lattice level: matrix-free linear-elastic operator + Chebyshev."""

    def __init__(self, shape, lattice_coords, lattice_mask, cell, lam, mu,
                 rho, mass_shift, ndpn, dtype):
        from fourc_tpu.materials.small_strain import LinearElastic
        from fourc_tpu.ops import solid as sops

        self.shape = shape
        self.pshape = tuple(s + 1 for s in shape)
        self.ndpn = ndpn
        dim = len(shape)
        self.cell = cell
        E_mod = mu * (3 * lam + 2 * mu) / (lam + mu)
        nue = lam / (2 * (lam + mu))
        self.mat = LinearElastic(youngs=float(E_mod), nue=float(nue))
        self.free = jnp.asarray(lattice_mask.reshape(-1))
        # f32 0/1 weight used for ALL traced masking (see class NOTE)
        self.w = jnp.asarray(
            np.asarray(lattice_mask).reshape(-1).astype(np.float32))
        self._sops = sops

        # element coords (E, nen, dim) from lattice slices (canonical order)
        offsets = _hex_offsets(dim)
        Ecount = int(np.prod(shape))
        cols = []
        for off in offsets:
            sl = tuple(slice(o, o + s) for o, s in zip(off, shape))
            cols.append(lattice_coords[sl].reshape(Ecount, dim))
        self.Xe = jnp.asarray(np.stack(cols, axis=1), dtype)

        # assembled per-element stiffness stored ELEMENT-LAST (m, m, E):
        # the matvec contracts the tiny m=24 axis with E in the vector
        # lanes.  (A batched (E,24,24) MXU matmul pads 24 -> 128 in both
        # dims: 25x wasted FLOPs and a multi-GB padded intermediate that
        # OOMs the chip at ~1M dofs.)  This is the 'assembled operator'
        # capability of the reference's SparseMatrix path, element-wise.
        nen = len(offsets)
        m = nen * ndpn
        # Congruent-element collapse: on a uniform lattice every element has
        # the same geometry, so one (m, m) stencil matrix replaces the
        # (m, m, E) per-element store (e.g. 860 MB -> 2.3 KB at 1M dofs) and
        # the level matvec becomes a broadcast small-matmul — this is what a
        # 'stencil operator' is on a structured grid.
        Xe_np = np.asarray(self.Xe)
        rel = Xe_np - Xe_np[:, :1, :]
        # tolerance must absorb dtype roundoff of the COORDINATES (f32 grid
        # spacings differ by ~eps*|x|; a genuinely stretched grid differs by
        # orders of magnitude more).  A too-tight atol silently drops to the
        # per-element Ke store, whose batched-jvp build OOMs at ~1M dofs.
        eps = np.finfo(Xe_np.dtype).eps
        self.uniform = bool(np.allclose(
            rel, rel[:1], rtol=0.0,
            atol=64.0 * eps * max(1.0, np.abs(Xe_np).max())))
        m = nen * ndpn
        self._mean_diag = None
        if self.uniform:
            ue0 = jnp.zeros((1, nen, dim), dtype)
            Ke1 = jax.jit(
                lambda xe: sops.element_stiffness(
                    xe, ue0, cell, self.mat, kinem="linear",
                    )[0]
            )(self.Xe[:1])
            self.Ke = Ke1  # (m, m) single stencil
        elif dim == 3 and _lattice_enabled():
            # non-uniform geometry, lattice TOPOLOGY (round-4 unstructured
            # path): the level operator is approximated by the MEAN element
            # stencil — spectrally equivalent for bounded jacobian
            # variation (jittered/mildly graded boxes), which is all a
            # preconditioner needs.  Streaming chunked build: never
            # materializes the (m, m, E) per-element store (859 MB at 1M
            # dofs), only the mean + the exact Jacobi diagonal/rowsums.
            CH = 1 << 16
            ue0 = jnp.zeros((CH, nen, dim), dtype)

            # reductions computed ON DEVICE; only (m, m) + 2 x (CH, m)
            # cross the wire per chunk (fetching full (CH, m, m) element
            # matrices through the remote-TPU tunnel measured ~GBs/chunk)
            @jax.jit
            def kstats(xe, wreal):
                K = sops.element_stiffness(xe, ue0, cell, self.mat,
                                           kinem="linear")
                return ((K * wreal[:, None, None]).sum(axis=0),
                        jnp.einsum("eii->ei", K),
                        jnp.abs(K).sum(axis=2))

            Xe_np = np.asarray(self.Xe)
            ke_sum = np.zeros((m, m))
            dKe_np = np.empty((Ecount, m), np.float64)
            rKe_np = np.empty((Ecount, m), np.float64)
            for c0 in range(0, Ecount, CH):
                c1 = min(c0 + CH, Ecount)
                chunk = Xe_np[c0:c1]
                if c1 - c0 < CH:  # pad to the jitted shape
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], CH - (c1 - c0), 0)])
                wreal = np.zeros(CH, np.float32)
                wreal[: c1 - c0] = 1.0
                ks, dk, rk = kstats(jnp.asarray(chunk, dtype),
                                    jnp.asarray(wreal, dtype))
                ke_sum += np.asarray(ks, np.float64)
                dKe_np[c0:c1] = np.asarray(dk, np.float64)[: c1 - c0]
                rKe_np[c0:c1] = np.asarray(rk, np.float64)[: c1 - c0]
            self.Ke = jnp.asarray(ke_sum / Ecount, dtype)  # mean stencil
            self._mean_diag = (dKe_np, rKe_np)
        else:
            ue0 = jnp.zeros((Ecount, nen, dim), dtype)
            Ke = jax.jit(
                lambda xe: jnp.transpose(
                    sops.element_stiffness(xe, ue0, cell, self.mat, kinem="linear"),
                    (1, 2, 0),
                )
            )(self.Xe)
            self.Ke = Ke  # (m, m, E)

        # lattice stencil path: uniform 3D levels use the fused Pallas
        # stencil matvec (ops/lattice.py) instead of the (m, E) matmul +
        # slice-scatter form — the measured V-cycle bottleneck at 1M dofs
        self._lattice_spec = None
        from fourc_tpu.ops import lattice as _lat

        if ((self.uniform or self._mean_diag is not None)
                and dim == 3 and _lat.enabled()):
            from fourc_tpu.ops.lattice import LatticeSpec, collapse_stencil

            self._lattice_spec = LatticeSpec(pshape=tuple(self.pshape),
                                             h=(1.0, 1.0, 1.0))
            self._Kstencil = collapse_stencil(np.asarray(self.Ke))

        self.offsets = offsets
        self.mass_coeff = float(rho * mass_shift)
        if self.mass_coeff:
            ml = sops.lumped_mass(self.Xe, cell, 1.0)  # rho folded below
            self.mlump = self._scatter(jnp.repeat(ml[..., None], ndpn, -1)
                                       .reshape(ml.shape[0], -1))
        else:
            self.mlump = None

        # exact Jacobi diagonal from the assembled element matrices
        if self._mean_diag is not None:
            dKe_np, rKe_np = self._mean_diag
            diag = self._scatter(jnp.asarray(dKe_np, dtype))
            rowabs = self._scatter(jnp.asarray(rKe_np, dtype))
            self._mean_diag = True  # free the host copies
        elif self.uniform:
            dKe = jnp.broadcast_to(jnp.diagonal(self.Ke)[None, :], (Ecount, m))
            rKe = jnp.broadcast_to(jnp.sum(jnp.abs(self.Ke), axis=1)[None, :],
                                   (Ecount, m))
            diag = self._scatter(dKe)
            rowabs = self._scatter(rKe)
        else:
            diag = self._scatter(jnp.einsum("iiE->Ei", self.Ke))
            # Gershgorin: lmax(D^-1 A) <= max_i sum_j|A_ij|/D_i
            rowabs = self._scatter(jnp.transpose(jnp.sum(jnp.abs(self.Ke), axis=1)))
        if self.mlump is not None:
            diag = diag + self.mass_coeff * self.mlump
            rowabs = rowabs + self.mass_coeff * self.mlump
        self.dinv = jnp.where(self.free, 1.0 / jnp.maximum(diag, 1e-30), 1.0)
        self.gersh_lmax = float(jnp.max(jnp.where(
            self.free, rowabs / jnp.maximum(diag, 1e-30), 0.0)))

        # wide-layout buffers (eager, host-built): the relayout-free cycle
        # keeps every vector in (3, X, Y, Z) lattice layout end to end
        if self._lattice_spec is not None:
            from fourc_tpu.ops import lattice_pallas as lp

            self.w_wide = lp.prep(self.w, self._lattice_spec)
            self.dinv_wide = lp.prep(self.dinv, self._lattice_spec)
            self.mlump_wide = (None if self.mlump is None
                               else lp.prep(self.mlump, self._lattice_spec))

        # general-geometry level operator (round 4): on non-uniform lattice
        # topology the EXACT linear-elastic operator is one fused kernel —
        # the tangent of the SVK force at u = 0 with real per-element
        # jacobians (ops/lattice_pallas._jvp_wide_gen).  The mean stencil
        # (self.Ke) costs ~3.5x the Krylov iterations (measured n=48
        # jittered: 47-179 vs 26-52 with exact geometry).
        self._gen_xw = None
        if self._lattice_spec is not None and self._mean_diag is not None:
            from fourc_tpu.ops import lattice_pallas as lp

            x3 = jnp.transpose(
                jnp.asarray(lattice_coords, jnp.float32), (3, 0, 1, 2))
            self._gen_xw = lp.widen_real(x3, self._lattice_spec)
            self._gen_lam, self._gen_mu = float(lam), float(mu)

    def _gather(self, u):
        u3 = u.reshape(self.pshape + (self.ndpn,))
        E = int(np.prod(self.shape))
        cols = [
            u3[tuple(slice(o, o + s) for o, s in zip(off, self.shape))]
            .reshape(E, self.ndpn)
            for off in self.offsets
        ]
        return jnp.stack(cols, axis=1)

    def _scatter(self, fe):
        nen = len(self.offsets)
        fe4 = fe.reshape(self.shape + (nen, self.ndpn))
        f3 = jnp.zeros(self.pshape + (self.ndpn,), fe.dtype)
        for a, off in enumerate(self.offsets):
            sl = tuple(slice(o, o + s) for o, s in zip(off, self.shape))
            f3 = f3.at[sl].add(fe4[..., a, :])
        return f3.reshape(-1)

    def matvec(self, v, ref=False):
        """Level operator apply.  ``ref=True`` forces the pure-XLA
        reference stencil on lattice levels — used for setup-time math
        (power iteration), where chaining many Pallas stencil calls in one
        program has produced NaN on real TPU at large shapes (the Mosaic
        composition fragility family, NOTES_ROUND2.md)."""
        w = self.w.astype(v.dtype)
        vm = w * v
        if (getattr(self, "_gen_xw", None) is not None and not ref):
            from fourc_tpu.ops import lattice_pallas as lp

            vw = lp.prep(vm, self._lattice_spec)
            ow = lp._jvp_wide_gen(self._gen_xw, jnp.zeros_like(vw), vw,
                                  self._lattice_spec, self._gen_lam,
                                  self._gen_mu, "svk")
            out = lp.unprep(ow, self._lattice_spec, dtype=v.dtype)
            if self.mlump is not None:
                out = out + self.mass_coeff * self.mlump * vm
            return w * out + (1.0 - w) * v
        if self._lattice_spec is not None:
            from fourc_tpu.ops import lattice as _lat

            if ref:
                out = _lat.from_lattice(_lat.stencil_matvec_ref(
                    np.asarray(self._Kstencil, np.float64),
                    _lat.to_lattice(vm, self._lattice_spec),
                    self._lattice_spec), self._lattice_spec)
            else:
                out = _lat.stencil_matvec_flat(self._Kstencil, vm,
                                               self._lattice_spec)
            if self.mlump is not None:
                out = out + self.mass_coeff * self.mlump * vm
            return w * out + (1.0 - w) * v
        ve = self._gather(vm)  # (E, nen, ndpn)
        return self._matvec_gather(ve, vm, v, w)

    def matvec_wide(self, vw):
        """Wide-layout level operator apply (see StructuredGMG.__call__)."""
        from fourc_tpu.ops import lattice as _lat

        w = self.w_wide
        vm = w * vw
        if self._gen_xw is not None:  # exact geometry (general kernel)
            from fourc_tpu.ops import lattice_pallas as lp

            out = lp._jvp_wide_gen(self._gen_xw, jnp.zeros_like(vm), vm,
                                   self._lattice_spec, self._gen_lam,
                                   self._gen_mu, "svk")
            if self.mlump_wide is not None:
                out = out + self.mass_coeff * self.mlump_wide * vm
            return w * out + (1.0 - w) * vw
        out = _lat.stencil_matvec_wide(self._Kstencil, vm,
                                       self._lattice_spec)
        if self.mlump_wide is not None:
            out = out + self.mass_coeff * self.mlump_wide * vm
        return w * out + (1.0 - w) * vw

    def _matvec_gather(self, ve, vm, v, w):
        E = ve.shape[0]
        vt = jnp.transpose(ve.reshape(E, -1))  # (m, E)
        # full f32 precision is REQUIRED here: TPU's default matmul
        # precision would route this through the bf16 MXU, whose rounding
        # makes the V-cycle non-additive at ~1e-3 relative — which breaks
        # right-preconditioned Krylov methods (GMRES reconstructs
        # x = M(sum y_j V_j) assuming M is linear; CG assumes a fixed SPD M)
        hp = jax.lax.Precision.HIGHEST
        if self.uniform:
            fe = jnp.matmul(self.Ke, vt, precision=hp)  # (m,m)x(m,E)
        else:
            fe = jnp.einsum("ijE,jE->iE", self.Ke, vt, precision=hp)
        out = self._scatter(jnp.transpose(fe))
        if self.mlump is not None:
            out = out + self.mass_coeff * self.mlump * vm
        return w * out + (1.0 - w) * v

    def setup_chebyshev(self, degree, power_iters=0):
        """Chebyshev bounds for D^-1 A.

        Default: the analytic Jacobi-scaled FEM bound lambda_max <~ 2 (with
        margin) — one less compiled program per level, which matters on the
        remote-compile TPU path.  power_iters > 0 runs one jitted power
        iteration for a sharp estimate.
        """
        self.degree = degree
        if power_iters <= 0:
            # rigorous Gershgorin upper bound (no extra compiled programs)
            self.lmax = 1.02 * self.gersh_lmax
            self.lmin = self.lmax / 30.0
            return
        n = self.free.shape[0]
        key = jax.random.PRNGKey(0)
        # f32 arithmetic masking, never jnp.where(bool) next to the Pallas
        # matvec (see class NOTE)
        x0 = self.w * jax.random.normal(key, (n,), self.dinv.dtype)

        def power(x):
            def body(i, carry):
                x, _ = carry
                # ref=True: the pure-XLA stencil — 12 chained Pallas calls
                # in one program NaN'd on real TPU at 73^3 (setup-only
                # path, perf irrelevant)
                y = self.w * (self.dinv * self.matvec(x, ref=True))
                lm = jnp.linalg.norm(y) / jnp.maximum(jnp.linalg.norm(x), 1e-30)
                return (y / jnp.maximum(jnp.linalg.norm(y), 1e-30), lm)

            return jax.lax.fori_loop(0, power_iters, body,
                                     (x, jnp.asarray(1.0, x.dtype)))[1]

        lm = float(jax.jit(power)(x0)) * 1.05
        ub = 1.02 * self.gersh_lmax  # rigorous Gershgorin upper bound
        if not np.isfinite(lm) or not (0.0 < lm <= ub):
            lm = ub  # power estimate unusable: fall back to the bound
        self.lmax = lm
        self.lmin = self.lmax / 30.0

    def chebyshev(self, b, x):
        """Chebyshev(degree) iteration on D^-1 A with range [lmin, lmax]."""
        theta = 0.5 * (self.lmax + self.lmin)
        delta = 0.5 * (self.lmax - self.lmin)
        sigma = theta / delta
        rho_old = 1.0 / sigma
        r = self.dinv * (b - self.matvec(x))
        d = r / theta
        x = x + d
        for _ in range(self.degree - 1):
            rho = 1.0 / (2.0 * sigma - rho_old)
            r = r - self.dinv * self.matvec(d)
            d = rho * rho_old * d + (2.0 * rho / delta) * r
            x = x + d
            rho_old = rho
        return x

    def chebyshev0(self, b, return_res=False, wide=False):
        """chebyshev(b, x=0), minus the wasted A·0 matvec (XLA cannot fold
        a zero input through the Pallas stencil call).  With
        ``return_res`` also returns the TRUE residual b - A x, reusing the
        smoother's own matvecs for all but the final increment: degree
        matvecs total, identical math to chebyshev + separate residual."""
        matvec = self.matvec_wide if wide else self.matvec
        dinv = self.dinv_wide if wide else self.dinv
        theta = 0.5 * (self.lmax + self.lmin)
        delta = 0.5 * (self.lmax - self.lmin)
        sigma = theta / delta
        rho_old = 1.0 / sigma
        r = dinv * b
        d = r / theta
        x = d
        rt = b
        for _ in range(self.degree - 1):
            t = matvec(d)
            if return_res:
                rt = rt - t
            rho = 1.0 / (2.0 * sigma - rho_old)
            r = r - dinv * t
            d = rho * rho_old * d + (2.0 * rho / delta) * r
            x = x + d
            rho_old = rho
        if return_res:
            return x, rt - matvec(d)
        return x


def _hex_offsets(dim):
    if dim == 3:
        return [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
    return [(0, 0), (1, 0), (1, 1), (0, 1)]


def build_for_solid(field, mass_shift=0.0, dtype=None, max_levels=None):
    """Construct the GMG preconditioner for a SolidField on a structured
    mesh; returns None when the mesh is unstructured (caller falls back)."""
    disc = field.disc
    blocks = list(field.dofmap.blocks.values())
    if (len(blocks) != 1 or blocks[0].structured is None
            or not hasattr(field, "block_mat")):
        return None
    mat = next(iter(field.block_mat.values()))
    youngs = getattr(mat, "youngs", None)
    nue = getattr(mat, "nue", None)
    if youngs is None or nue is None:
        return None
    lam = youngs * nue / ((1 + nue) * (1 - 2 * nue))
    mu = youngs / (2 * (1 + nue))
    rho = float(getattr(mat, "density", 0.0) or 0.0)
    dtype = dtype or field.coords.dtype
    import os

    if max_levels is None:
        max_levels = int(os.environ.get("FOURC_GMG_MAX_LEVELS", "0"))
    return StructuredGMG(disc, field.ndpn, field.dbc.free_mask, lam, mu,
                         rho=rho, mass_shift=mass_shift, dtype=dtype,
                         max_levels=max_levels)
