"""Kirchhoff-Love NURBS shell (rotation-free, C1 via spline continuity).

Counterpart of the reference's shell_kl_nurbs module (ref:
src/shell_kl_nurbs — 4C_shell_kl_nurbs.* Kirchhoff-Love shell on NURBS
patches, Kiendl et al. isogeometric KL formulation).

TPU-native design: the patch basis (values + first + SECOND parametric
derivatives — curvature needs d2N) is tabulated per knot span on the host
(Piegl-Tiller DersBasisFuns) and baked into element blocks; the strain
energy

    W = int  t/2 eps : C : eps  +  t^3/24 kap : C : kap  dA

(membrane eps_ab = (a_ab - A_ab)/2, bending kap_ab = B_ab - b_ab, plane-
stress St.Venant material in the contravariant surface basis) is a pure
function of the control-point displacements; internal force and the
Newton-Krylov tangent are jax.grad / jvp of the batched energy — no
hand-derived shell stiffness (the reference hand-codes both).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fourc_tpu.core.nurbs import open_knot_vector


def ders_basis_1d(p, U, i_span, u, nd=2):
    """Piegl-Tiller A2.3: nonzero basis and derivatives up to order nd at
    parameter u in span i_span (host numpy). Returns (nd+1, p+1)."""
    k = i_span + p
    ndu = np.zeros((p + 1, p + 1))
    ndu[0, 0] = 1.0
    left = np.zeros(p + 1)
    right = np.zeros(p + 1)
    for j in range(1, p + 1):
        left[j] = u - U[k + 1 - j]
        right[j] = U[k + j] - u
        saved = 0.0
        for r in range(j):
            ndu[j, r] = right[r + 1] + left[j - r]
            temp = ndu[r, j - 1] / ndu[j, r] if ndu[j, r] != 0 else 0.0
            ndu[r, j] = saved + right[r + 1] * temp
            saved = left[j - r] * temp
        ndu[j, j] = saved
    ders = np.zeros((nd + 1, p + 1))
    ders[0] = ndu[:, p]
    a = np.zeros((2, p + 1))
    for r in range(p + 1):
        s1, s2 = 0, 1
        a[0, 0] = 1.0
        for kk in range(1, nd + 1):
            d = 0.0
            rk, pk = r - kk, p - kk
            if r >= kk:
                a[s2, 0] = a[s1, 0] / ndu[pk + 1, rk]
                d = a[s2, 0] * ndu[rk, pk]
            j1 = 1 if rk >= -1 else -rk
            j2 = kk - 1 if r - 1 <= pk else p - r
            for j in range(j1, j2 + 1):
                a[s2, j] = (a[s1, j] - a[s1, j - 1]) / ndu[pk + 1, rk + j]
                d += a[s2, j] * ndu[rk + j, pk]
            if r <= pk:
                a[s2, kk] = -a[s1, kk - 1] / ndu[pk + 1, r]
                d += a[s2, kk] * ndu[r, pk]
            ders[kk, r] = d
            s1, s2 = s2, s1
    rfac = p
    for kk in range(1, nd + 1):
        ders[kk] *= rfac
        rfac *= (p - kk)
    return ders


def build_kl_patch(nx, ny, degree=2, origin=(0, 0, 0), u_vec=(1, 0, 0),
                   v_vec=(0, 1, 0), gp1=None):
    """Flat 3D B-spline sheet with tabulated N/dN/d2N per span.

    Returns dict(coords (n,3), conn (E,nen), N (g,nen), dN (g,nen,2),
    d2N (g,nen,3 [uu,vv,uv]), w (g,), node_sets).
    (Uniform open knots: every interior span shares the same tables; the
    boundary spans differ, so tables are stored PER ELEMENT row — still
    one batched einsum downstream since the element axis carries them.)
    """
    p = int(degree)
    gp1 = gp1 or (p + 1)
    Ux = open_knot_vector(nx, p)
    Uy = open_knot_vector(ny, p)
    nbx, nby = nx + p, ny + p
    from fourc_tpu.core.nurbs import greville

    gx, gy = greville(Ux, p), greville(Uy, p)
    o = np.asarray(origin, float)
    uv = np.asarray(u_vec, float)
    vv = np.asarray(v_vec, float)
    coords = np.array([o + a * uv + b * vv for a in gx for b in gy])

    xs, ws = np.polynomial.legendre.leggauss(gp1)
    nen = (p + 1) ** 2
    E = nx * ny
    g = gp1 * gp1
    conn = np.zeros((E, nen), np.int32)
    N = np.zeros((E, g, nen))
    dN = np.zeros((E, g, nen, 2))
    d2N = np.zeros((E, g, nen, 3))
    wq = np.zeros((E, g))
    e = 0
    for ex in range(nx):
        ax, bx = Ux[ex + p], Ux[ex + p + 1]
        for ey in range(ny):
            ay, by = Uy[ey + p], Uy[ey + p + 1]
            conn[e] = [(ex + jx) * nby + (ey + jy)
                       for jx in range(p + 1) for jy in range(p + 1)]
            for gg in range(g):
                ga, gb = divmod(gg, gp1)
                uu = 0.5 * (ax + bx) + 0.5 * (bx - ax) * xs[ga]
                vv_ = 0.5 * (ay + by) + 0.5 * (by - ay) * xs[gb]
                du = ders_basis_1d(p, Ux, ex, uu)
                dv = ders_basis_1d(p, Uy, ey, vv_)
                a_ = 0
                for jx in range(p + 1):
                    for jy in range(p + 1):
                        N[e, gg, a_] = du[0, jx] * dv[0, jy]
                        dN[e, gg, a_, 0] = du[1, jx] * dv[0, jy]
                        dN[e, gg, a_, 1] = du[0, jx] * dv[1, jy]
                        d2N[e, gg, a_, 0] = du[2, jx] * dv[0, jy]
                        d2N[e, gg, a_, 1] = du[0, jx] * dv[2, jy]
                        d2N[e, gg, a_, 2] = du[1, jx] * dv[1, jy]
                        a_ += 1
                # include the [-1,1]^2 -> knot-span jacobian: dN/d2N are
                # knot-space derivatives, so the area element needs
                # (du/dxi)(dv/deta)
                wq[e, gg] = ws[ga] * ws[gb] * 0.25 * (bx - ax) * (by - ay)
            e += 1

    def cp(ix, iy):
        return ix * nby + iy

    node_sets = {
        "xmin": np.asarray([cp(0, iy) for iy in range(nby)], np.int32),
        "xmax": np.asarray([cp(nbx - 1, iy) for iy in range(nby)], np.int32),
        "xmin2": np.asarray([cp(1, iy) for iy in range(nby)], np.int32),
        "ymin": np.asarray([cp(ix, 0) for ix in range(nbx)], np.int32),
        "ymax": np.asarray([cp(ix, nby - 1) for ix in range(nbx)], np.int32),
        "all": np.arange(coords.shape[0], dtype=np.int32),
    }
    return dict(coords=coords, conn=conn, N=N, dN=dN, d2N=d2N, w=wq,
                node_sets=node_sets)


def kl_energy(patch_np, x_cp, youngs, nue, thickness):
    """Total KL strain energy for control-point positions x_cp (n, 3)."""
    conn = jnp.asarray(patch_np["conn"])
    N, dN, d2N, w = (jnp.asarray(patch_np[k]) for k in ("N", "dN", "d2N", "w"))
    X_cp = jnp.asarray(patch_np["coords"], x_cp.dtype)

    lam = youngs * nue / ((1 + nue) * (1 - 2 * nue))
    mu = youngs / (2 * (1 + nue))
    lam_ps = 2.0 * lam * mu / (lam + 2.0 * mu)  # plane stress

    def surf(cp_xyz):
        """a_alpha (E,g,2,3), a3 (E,g,3), metric (E,g,2,2), curv (E,g,2,2)."""
        xe = cp_xyz[conn]  # (E, nen, 3)
        aa = jnp.einsum("egak,ead->egkd", dN, xe)  # (E,g,2,3)
        h = jnp.einsum("egam,ead->egmd", d2N, xe)  # (E,g,3[uu,vv,uv],3)
        cr = jnp.cross(aa[..., 0, :], aa[..., 1, :])
        jdet = jnp.linalg.norm(cr, axis=-1)
        a3 = cr / jnp.maximum(jdet, 1e-30)[..., None]
        m = jnp.einsum("egkd,egld->egkl", aa, aa)
        # curvature b_ab = h_ab . a3 with h ordered [uu, vv, uv]
        buu = jnp.einsum("egd,egd->eg", h[..., 0, :], a3)
        bvv = jnp.einsum("egd,egd->eg", h[..., 1, :], a3)
        buv = jnp.einsum("egd,egd->eg", h[..., 2, :], a3)
        b = jnp.stack([jnp.stack([buu, buv], -1),
                       jnp.stack([buv, bvv], -1)], -2)
        return m, b, jdet

    A, B, Jref = surf(X_cp)
    a, b, _ = surf(x_cp)
    eps = 0.5 * (a - A)
    kap = B - b
    Ainv = jnp.linalg.inv(A)

    def contract(E2):
        """E2 : C : E2 with C^abgd = lam_ps A^ab A^gd + mu (A^ag A^bd +
        A^ad A^bg) (contravariant surface basis)."""
        tr = jnp.einsum("egab,egab->eg", Ainv, E2)
        EA = jnp.einsum("egab,egbc->egac", E2, Ainv)
        frob = jnp.einsum("egac,egca->eg",
                          jnp.einsum("egab,egbc->egac", Ainv, EA), E2)
        return lam_ps * tr**2 + 2.0 * mu * frob

    t = thickness
    dens = 0.5 * t * contract(eps) + (t**3 / 24.0) * contract(kap)
    return jnp.sum(w * Jref * dens)
