"""Fused Pallas TPU kernels for lattice (structured hex8) FEM operators.

Three kernels with one shared structure — a 3D stencil over x-slabs of the
padded component-first lattice (see ops/lattice.py for the layout and the
ghost-element masking scheme):

1. ``stencil_matvec``: y = A v for a uniform 24x24 element stencil
   (GMG level operators, consistent mass).
2. ``neo_force``: total-Lagrangian internal force for Neo-Hooke / SVK.
3. ``neo_jvp``: the hand-propagated dual (consistent tangent apply) —
   the Newton-Krylov matvec.

Each grid step owns BX output node-planes; the input lattice is passed as
three shifted block views (prev/cur/next) so the +-1-plane halo needs no
manual DMA.  All intermediates live in VMEM: per step one HBM read of the
slab and one write of the output slab.  Compute is pure VPU (scalar-
broadcast FMAs on (BX, ny, nz) blocks) — no gathers, no scatters, no MXU.

Replaces the measured hot-path bottleneck of round 1 (gather/scatter
assembly at ~25x below the HBM roofline; V-cycle 69 ms -> sub-ms).

ref counterpart: the assembly loop + Epetra SpMV
(src/core/fem/src/discretization/4C_fem_discretization_evaluate.cpp:84-105).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fourc_tpu.ops.lattice import HEX8_OFFSETS, LatticeSpec
from fourc_tpu.ops.solid_pallas import (_STRESS, _mm)

BX = 8  # output node-planes per grid step

# local node indices contributing to an out-plane, per element layer:
# layer 0 = element x-layer g-1 (needs offa_x == 1), layer 1 = g (offa_x == 0)
_A_OF_LAYER = (tuple(a for a, o in enumerate(HEX8_OFFSETS) if o[0] == 1),
               tuple(a for a, o in enumerate(HEX8_OFFSETS) if o[0] == 0))


def _masks(i, layer, spec: LatticeSpec, wyz):
    """(BX, ny, nz) 0/1 mask: element layer g-1+layer real (x) times the
    y/z real-element mask."""
    nx = spec.nshape[0]
    gx = i * BX + jax.lax.broadcasted_iota(jnp.int32, (BX, 1, 1), 0)
    e = gx - 1 + layer
    xm = jnp.logical_and(e >= 1, e <= nx)
    return jnp.where(xm, wyz[None], 0.0)


def _build_window(vm, vc, vp, W):
    """Assemble the (3, BX+2, Y, Z) halo window from the three block views."""
    W[:, 0] = vm[:, BX - 1]
    W[:, 1:BX + 1] = vc[:]
    W[:, BX + 1] = vp[:, 0]


def _acc_idx(a):
    """Accumulator row for local node a: 3 * (2*offa_y + offa_z)."""
    _, ay, az = HEX8_OFFSETS[a]
    return 3 * (2 * ay + az)


def _zero_acc(ny, nz):
    """12 register accumulators (4 node shifts x 3 components)."""
    z = jnp.zeros((BX, ny, nz), jnp.float32)
    return [z] * 12


def _combine(acc, out_ref, ny, nz):
    """Write the 4 shift-accumulators into the output slab.

    The accumulators are plain jnp values (register/VMEM allocated by
    Mosaic) — scratch-ref read-modify-writes serialized badly."""
    out = jnp.zeros(out_ref.shape, out_ref.dtype)
    out_ref[:] = out
    for ay in (0, 1):
        for az in (0, 1):
            base = 3 * (2 * ay + az)
            for c in range(3):
                out_ref[c, :, ay:ay + ny, az:az + nz] += acc[base + c]


def _stencil_kernel(spec, K, wyz_ref, vm, vc, vp, out_ref, W):
    ny, nz = spec.pshape[1] + 1, spec.pshape[2] + 1
    i = pl.program_id(0)
    _build_window(vm, vc, vp, W)
    acc = _zero_acc(ny, nz)
    for layer in (0, 1):
        m3 = _masks(i, layer, spec, wyz_ref[:])
        for b, (bx, by, bz) in enumerate(HEX8_OFFSETS):
            s = layer + bx
            vb = [W[c, s:s + BX, by:by + ny, bz:bz + nz] * m3 for c in range(3)]
            for a in _A_OF_LAYER[layer]:
                base = _acc_idx(a)
                for ci in range(3):
                    acc[base + ci] = acc[base + ci] + (
                        K[a][ci][b][0] * vb[0]
                        + K[a][ci][b][1] * vb[1]
                        + K[a][ci][b][2] * vb[2])
    _combine(acc, out_ref, ny, nz)


def _grad_h(W, s, G_g, m3, y0, ty, nz):
    """Masked displacement gradient H[i][j] of one Gauss point for the
    element layer starting at window plane s, restricted to the y-element
    chunk [y0, y0+ty)."""
    ue = [[W[c, s + HEX8_OFFSETS[a][0]:s + HEX8_OFFSETS[a][0] + BX,
            y0 + HEX8_OFFSETS[a][1]:y0 + HEX8_OFFSETS[a][1] + ty,
            HEX8_OFFSETS[a][2]:HEX8_OFFSETS[a][2] + nz] for c in range(3)]
          for a in range(8)]
    H = [[sum(ue[a][i] * G_g[a][j] for a in range(8) if G_g[a][j] != 0.0)
          for j in range(3)] for i in range(3)]
    return ue, [[H[i][j] * m3 for j in range(3)] for i in range(3)]


def _strain_A(H):
    return [[H[i][j] + H[j][i] + sum(H[k][i] * H[k][j] for k in range(3))
             for j in range(3)] for i in range(3)]


def _accum_force(P, G_g, wdet_g, layer, acc):
    """acc[a] += wdet * P . G_a for the 4 out-plane nodes of this layer."""
    for a in _A_OF_LAYER[layer]:
        base = _acc_idx(a)
        for ci in range(3):
            row = sum(P[ci][j] * G_g[a][j] for j in range(3)
                      if G_g[a][j] != 0.0)
            acc[base + ci] = acc[base + ci] + wdet_g * row


# y-chunk width for the nonlinear kernels: bounds the live working set
# (H/A/S/P temporaries, ~40 arrays of (BX, TY, nz) each) independently of
# the mesh size — full-plane temporaries spilled 138 MB of vmem at n=72
TY = 16


def _write_chunk(acc, out_ref, y0, ty, nz):
    """Add the 4 shift-accumulators of one y-chunk into the output slab.
    Chunks run sequentially inside one kernel invocation, so the
    overlapping +=s between neighbours are safe."""
    for ay in (0, 1):
        for az in (0, 1):
            base = 3 * (2 * ay + az)
            for c in range(3):
                out_ref[c, :, y0 + ay:y0 + ay + ty, az:az + nz] += acc[base + c]


def _masks_chunk(i, layer, spec, wyz_ref, y0, ty, nz):
    """(BX, ty, nz) real-element mask for a y-chunk of element rows."""
    nx = spec.nshape[0]
    gx = i * BX + jax.lax.broadcasted_iota(jnp.int32, (BX, 1, 1), 0)
    e = gx - 1 + layer
    xm = jnp.logical_and(e >= 1, e <= nx)
    return jnp.where(xm, wyz_ref[y0:y0 + ty, :nz][None], 0.0)


def _force_kernel(spec, G, wdet, lam, mu, model, wyz_ref, um, uc, up,
                  out_ref, W):
    ny, nz = spec.pshape[1] + 1, spec.pshape[2] + 1
    i = pl.program_id(0)
    _build_window(um, uc, up, W)
    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
    stress = _STRESS[model][0]
    for y0 in range(0, ny, TY):
        ty = min(TY, ny - y0)
        z = jnp.zeros((BX, ty, nz), jnp.float32)
        acc = [z] * 12
        for layer in (0, 1):
            m3 = _masks_chunk(i, layer, spec, wyz_ref, y0, ty, nz)
            for g in range(len(wdet)):
                _, H = _grad_h(W, layer, G[g], m3, y0, ty, nz)
                A = _strain_A(H)
                S, _aux = stress(A, lam, mu)
                eye = [[1.0 if a == b else 0.0 for b in range(3)]
                       for a in range(3)]
                F = [[H[a][b] + eye[a][b] for b in range(3)] for a in range(3)]
                P = _mm(F, S)
                _accum_force(P, G[g], wdet[g], layer, acc)
        _write_chunk(acc, out_ref, y0, ty, nz)


def _jvp_kernel(spec, G, wdet, lam, mu, model, wyz_ref, um, uc, up,
                vm, vc, vp, out_ref, Wu, Wv, Nf=None, mcoef=0.0):
    """Tangent apply; with mcoef != 0 the consistent-mass shift
    mcoef * M v is FUSED into the same pass (one HBM sweep instead of a
    separate mass-stencil kernel — the dynamic Newton operator is
    K(u) v + c M v)."""
    ny, nz = spec.pshape[1] + 1, spec.pshape[2] + 1
    i = pl.program_id(0)
    _build_window(um, uc, up, Wu)
    _build_window(vm, vc, vp, Wv)
    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
    stress, stress_dual = _STRESS[model]
    for y0 in range(0, ny, TY):
        ty = min(TY, ny - y0)
        z = jnp.zeros((BX, ty, nz), jnp.float32)
        acc = [z] * 12
        for layer in (0, 1):
            m3 = _masks_chunk(i, layer, spec, wyz_ref, y0, ty, nz)
            for g in range(len(wdet)):
                _, H = _grad_h(Wu, layer, G[g], m3, y0, ty, nz)
                ue_v, Hd = _grad_h(Wv, layer, G[g], m3, y0, ty, nz)
                A = _strain_A(H)
                Ad = [[Hd[a][b] + Hd[b][a]
                       + sum(Hd[k][a] * H[k][b] + H[k][a] * Hd[k][b]
                             for k in range(3))
                       for b in range(3)] for a in range(3)]
                S, aux = stress(A, lam, mu)
                Sd = stress_dual(A, Ad, aux, lam, mu)
                eye = [[1.0 if a == b else 0.0 for b in range(3)]
                       for a in range(3)]
                F = [[H[a][b] + eye[a][b] for b in range(3)] for a in range(3)]
                P1 = _mm(Hd, S)
                P2 = _mm(F, Sd)
                Pd = [[P1[a][b] + P2[a][b] for b in range(3)] for a in range(3)]
                _accum_force(Pd, G[g], wdet[g], layer, acc)
                if mcoef != 0.0:
                    cg = mcoef * wdet[g]
                    vbar = [sum(Nf[g][b] * ue_v[b][ci] for b in range(8))
                            * m3 for ci in range(3)]
                    for a in _A_OF_LAYER[layer]:
                        base = _acc_idx(a)
                        for ci in range(3):
                            acc[base + ci] = acc[base + ci] + (
                                cg * Nf[g][a]) * vbar[ci]
        _write_chunk(acc, out_ref, y0, ty, nz)


# ---------------------------------------------------------------------------
# general-geometry kernels (per-element jacobians computed IN-KERNEL from a
# coordinate lattice input — the relayout-free wide path for lattice-
# TOPOLOGY meshes with arbitrary node positions, e.g. jittered/graded boxes
# read from external files.  Same slab/window structure as the uniform
# kernels; the coordinate lattice X rides the exact same BlockSpecs as u.)
# ---------------------------------------------------------------------------


def _corner_slices(W, s, y0, ty, nz):
    """[a][c] (BX, ty, nz) blocks: the 8 corner values of element layer s
    restricted to the y-chunk [y0, y0+ty)."""
    return [[W[c,
               s + HEX8_OFFSETS[a][0]:s + HEX8_OFFSETS[a][0] + BX,
               y0 + HEX8_OFFSETS[a][1]:y0 + HEX8_OFFSETS[a][1] + ty,
               HEX8_OFFSETS[a][2]:HEX8_OFFSETS[a][2] + nz]
             for c in range(3)] for a in range(8)]


def _geom_gp(Xe, dn_g, w_g, m3):
    """Per-Gauss-point geometry on blocks (masked, ghost-safe).

    Returns (G[a][i] cartesian shape grads, wdet).  Ghost elements (m3=0)
    get det_safe = 1 so the inverse never divides by the zero jacobian of
    the zero-padded coordinates; their wdet is exactly 0.
    Index conventions mirror ops/solid_pallas._geometry.
    """
    J = [[sum(Xe[a][i] * dn_g[a][j] for a in range(8)) for j in range(3)]
         for i in range(3)]
    from fourc_tpu.ops.solid_pallas import _cof, _det

    detJ = _det(J)
    det_safe = detJ * m3 + (1.0 - m3)
    cof = _cof(J)
    inv_det = 1.0 / det_safe
    Jinv = [[cof[j][i] * inv_det for j in range(3)] for i in range(3)]
    G = [[sum(dn_g[a][j] * Jinv[j][i] for j in range(3)) for i in range(3)]
         for a in range(8)]
    return G, detJ * w_g * m3


def _grad_blocks(ue, G, m3):
    """H[i][j] = sum_a ue[a][i] G[a][j], masked (ghost G is garbage-free
    but boundary-ghost Xe mixes real/zero corners — masking H keeps the
    downstream log/inv chains at the well-defined A = 0 point)."""
    return [[sum(ue[a][i] * G[a][j] for a in range(8)) * m3
             for j in range(3)] for i in range(3)]


def _force_kernel_gen(spec, dn, w, Nf, lam, mu, model, mcoef, stiff,
                      wyz_ref, xm, xc, xp, um, uc, up, out_ref, Wx, Wu):
    """General-geometry internal force (stiff=True) and/or consistent-mass
    apply (mcoef != 0): one fused pass in wide layout."""
    ny, nz = spec.pshape[1] + 1, spec.pshape[2] + 1
    i = pl.program_id(0)
    _build_window(xm, xc, xp, Wx)
    _build_window(um, uc, up, Wu)
    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
    stress = _STRESS[model][0]
    for y0 in range(0, ny, TY):
        ty = min(TY, ny - y0)
        z = jnp.zeros((BX, ty, nz), jnp.float32)
        acc = [z] * 12
        for layer in (0, 1):
            m3 = _masks_chunk(i, layer, spec, wyz_ref, y0, ty, nz)
            Xe = _corner_slices(Wx, layer, y0, ty, nz)
            ue = _corner_slices(Wu, layer, y0, ty, nz)
            for g in range(8):
                G, wdet = _geom_gp(Xe, dn[g], w[g], m3)
                if stiff:
                    H = _grad_blocks(ue, G, m3)
                    A = _strain_A(H)
                    S, _aux = stress(A, lam, mu)
                    eye = [[1.0 if a == b else 0.0 for b in range(3)]
                           for a in range(3)]
                    F = [[H[a][b] + eye[a][b] for b in range(3)]
                         for a in range(3)]
                    P = _mm(F, S)
                    for a in _A_OF_LAYER[layer]:
                        base = _acc_idx(a)
                        for ci in range(3):
                            row = sum(P[ci][j] * G[a][j] for j in range(3))
                            acc[base + ci] = acc[base + ci] + wdet * row
                if mcoef != 0.0:
                    vbar = [sum(Nf[g][b] * ue[b][ci] for b in range(8)) * m3
                            for ci in range(3)]
                    cg = mcoef * wdet
                    for a in _A_OF_LAYER[layer]:
                        base = _acc_idx(a)
                        for ci in range(3):
                            acc[base + ci] = acc[base + ci] + (
                                cg * Nf[g][a]) * vbar[ci]
        _write_chunk(acc, out_ref, y0, ty, nz)


def _jvp_kernel_gen(spec, dn, w, Nf, lam, mu, model, mcoef,
                    wyz_ref, xm, xc, xp, um, uc, up, vm, vc, vp,
                    out_ref, Wx, Wu, Wv):
    """General-geometry tangent apply K(u) v (+ mcoef * M v fused)."""
    ny, nz = spec.pshape[1] + 1, spec.pshape[2] + 1
    i = pl.program_id(0)
    _build_window(xm, xc, xp, Wx)
    _build_window(um, uc, up, Wu)
    _build_window(vm, vc, vp, Wv)
    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
    stress, stress_dual = _STRESS[model]
    for y0 in range(0, ny, TY):
        ty = min(TY, ny - y0)
        z = jnp.zeros((BX, ty, nz), jnp.float32)
        acc = [z] * 12
        for layer in (0, 1):
            m3 = _masks_chunk(i, layer, spec, wyz_ref, y0, ty, nz)
            Xe = _corner_slices(Wx, layer, y0, ty, nz)
            ue = _corner_slices(Wu, layer, y0, ty, nz)
            ve = _corner_slices(Wv, layer, y0, ty, nz)
            for g in range(8):
                G, wdet = _geom_gp(Xe, dn[g], w[g], m3)
                H = _grad_blocks(ue, G, m3)
                Hd = _grad_blocks(ve, G, m3)
                A = _strain_A(H)
                Ad = [[Hd[a][b] + Hd[b][a]
                       + sum(Hd[k][a] * H[k][b] + H[k][a] * Hd[k][b]
                             for k in range(3))
                       for b in range(3)] for a in range(3)]
                S, aux = stress(A, lam, mu)
                Sd = stress_dual(A, Ad, aux, lam, mu)
                eye = [[1.0 if a == b else 0.0 for b in range(3)]
                       for a in range(3)]
                F = [[H[a][b] + eye[a][b] for b in range(3)]
                     for a in range(3)]
                P1 = _mm(Hd, S)
                P2 = _mm(F, Sd)
                Pd = [[P1[a][b] + P2[a][b] for b in range(3)]
                      for a in range(3)]
                for a in _A_OF_LAYER[layer]:
                    base = _acc_idx(a)
                    for ci in range(3):
                        row = sum(Pd[ci][j] * G[a][j] for j in range(3))
                        acc[base + ci] = acc[base + ci] + wdet * row
                if mcoef != 0.0:
                    vbar = [sum(Nf[g][b] * ve[b][ci] for b in range(8)) * m3
                            for ci in range(3)]
                    cg = mcoef * wdet
                    for a in _A_OF_LAYER[layer]:
                        base = _acc_idx(a)
                        for ci in range(3):
                            acc[base + ci] = acc[base + ci] + (
                                cg * Nf[g][a]) * vbar[ci]
        _write_chunk(acc, out_ref, y0, ty, nz)


def _hex8_dn_tables():
    """dN-hat (8 gp, 8 a, 3) + weights as nested float tuples (kernel
    literals) and the N table for the consistent mass."""
    from fourc_tpu.core import cells

    cell = cells.get_cell("hex8")
    dn = tuple(tuple(tuple(float(x) for x in a) for a in g)
               for g in np.asarray(cell.dN))
    w = tuple(float(x) for x in np.asarray(cell.gauss_weights))
    Nf = tuple(tuple(float(x) for x in row) for row in np.asarray(cell.N))
    return dn, w, Nf


@functools.partial(jax.jit, static_argnames=(
    "spec", "lam", "mu", "model", "mcoef", "stiff", "interpret"))
def _force_wide_gen(xw, uw, spec, lam, mu, model, mcoef=0.0, stiff=True,
                    interpret=False):
    in_specs, out_spec, out_shape, window, nb = _specs(spec, 2)
    Y, Z = spec.pshape[1] + 2, spec.pshape[2] + 2
    dn, w, Nf = _hex8_dn_tables()
    kern = functools.partial(_force_kernel_gen, spec, dn, w, Nf, lam, mu,
                             model, mcoef, stiff)
    xw, uw = xw.astype(jnp.float32), uw.astype(jnp.float32)
    out = pl.pallas_call(
        kern, grid=(nb,), in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[window,
                        pltpu.VMEM((3, BX + 2, Y, Z), jnp.float32)],
        compiler_params=_CPARAMS, interpret=interpret,
    )(_wyz(spec), xw, xw, xw, uw, uw, uw)
    return _rewiden(out)


@functools.partial(jax.jit, static_argnames=(
    "spec", "lam", "mu", "model", "mcoef", "interpret"))
def _jvp_wide_gen(xw, uw, vw, spec, lam, mu, model, mcoef=0.0,
                  interpret=False):
    in_specs, out_spec, out_shape, window, nb = _specs(spec, 3)
    Y, Z = spec.pshape[1] + 2, spec.pshape[2] + 2
    dn, w, Nf = _hex8_dn_tables()
    kern = functools.partial(_jvp_kernel_gen, spec, dn, w, Nf, lam, mu,
                             model, mcoef)
    xw = xw.astype(jnp.float32)
    uw, vw = uw.astype(jnp.float32), vw.astype(jnp.float32)
    out = pl.pallas_call(
        kern, grid=(nb,), in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[window,
                        pltpu.VMEM((3, BX + 2, Y, Z), jnp.float32),
                        pltpu.VMEM((3, BX + 2, Y, Z), jnp.float32)],
        compiler_params=_CPARAMS, interpret=interpret,
    )(_wyz(spec), xw, xw, xw, uw, uw, uw, vw, vw, vw)
    return _rewiden(out)


def _gen_interpret(interpret):
    import os

    return interpret or os.environ.get("FOURC_PALLAS_INTERPRET", "0") == "1"


def make_force_wide_general(spec: LatticeSpec, coords, lam, mu, model,
                            interpret=False):
    """Wide-layout internal force for a lattice-TOPOLOGY mesh with
    arbitrary node coordinates: per-element jacobians are computed in-
    kernel from the coordinate lattice (no (E, nen, 3) gathers, no
    relayouts).  coords: (n_nodes, 3) real node positions."""
    interpret = _gen_interpret(interpret)
    px, py, pz = spec.pshape
    x3 = jnp.transpose(jnp.asarray(coords, jnp.float32).reshape(
        px, py, pz, 3), (3, 0, 1, 2))
    xw = widen_real(x3, spec)

    @jax.custom_jvp
    def force(uw):
        return _force_wide_gen(xw, uw, spec, lam, mu, model,
                               interpret=interpret)

    @force.defjvp
    def force_jvp(primals, tangents):
        (uw,), (vw,) = primals, tangents
        y = _force_wide_gen(xw, uw, spec, lam, mu, model,
                            interpret=interpret)
        dy = _jvp_wide_gen(xw, uw, vw, spec, lam, mu, model,
                           interpret=interpret)
        return y, dy

    return force


def make_mass_wide_general(spec: LatticeSpec, coords, rho,
                           interpret=False):
    """Wide-layout consistent-mass apply M v for arbitrary-geometry
    lattices: v_w -> rho * sum_g wdet_g N N^T v (geometry in-kernel)."""
    interpret = _gen_interpret(interpret)
    px, py, pz = spec.pshape
    x3 = jnp.transpose(jnp.asarray(coords, jnp.float32).reshape(
        px, py, pz, 3), (3, 0, 1, 2))
    xw = widen_real(x3, spec)
    rho = float(rho)

    @jax.custom_jvp
    def mass(vw):
        return _force_wide_gen(xw, vw, spec, 0.0, 0.0, "svk",
                               mcoef=rho, stiff=False, interpret=interpret)

    @mass.defjvp
    def mass_jvp(primals, tangents):  # linear: dM(v)[t] = M t
        (vw,), (tw,) = primals, tangents
        return mass(vw), mass(tw)

    return mass


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------


# v5e/v5p have 128 MB of physical VMEM; the conservative 16 MB default
# scoped limit rejects the (3, BX, Y, Z) slab buffers at ~1M dofs
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _xblocks(spec: LatticeSpec):
    X = spec.pshape[0] + 2
    return -(-X // BX)


def _prep(v, spec: LatticeSpec):
    """Flat dof vector -> wide padded lattice (3, nb*BX + 2*BX, Y, Z).
    Dtype-preserving: the Pallas kernels are f32 (TPU runs f32 anyway);
    the CPU/f64 test path keeps f64 through the XLA-reference fallbacks."""
    px, py, pz = spec.pshape
    nb = _xblocks(spec)
    Xp = nb * BX
    x = jnp.transpose(v.reshape(px, py, pz, 3), (3, 0, 1, 2))
    return jnp.pad(x, ((0, 0), (BX + 1, BX + Xp - px - 1), (1, 1), (1, 1)))


def _post(out, spec: LatticeSpec):
    px = spec.pshape[0]
    x = out[:, 1:px + 1, 1:-1, 1:-1]
    return jnp.transpose(x, (1, 2, 3, 0)).reshape(-1)


def _wyz(spec: LatticeSpec):
    ny, nz = spec.pshape[1] + 1, spec.pshape[2] + 1
    w = jnp.zeros((ny, nz), jnp.float32)
    return w.at[1:-1, 1:-1].set(1.0)


def _specs(spec: LatticeSpec, n_lat_inputs):
    """in_specs: [wyz] + 3 shifted views per lattice input; plus out spec,
    grid, scratch."""
    Y, Z = spec.pshape[1] + 2, spec.pshape[2] + 2
    nb = _xblocks(spec)
    lat = [
        pl.BlockSpec((3, BX, Y, Z), lambda i, d=d: (0, i + d, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(n_lat_inputs) for d in (0, 1, 2)
    ]
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] + lat
    out_spec = pl.BlockSpec((3, BX, Y, Z), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((3, nb * BX, Y, Z), jnp.float32)
    window = pltpu.VMEM((3, BX + 2, Y, Z), jnp.float32)
    return in_specs, out_spec, out_shape, window, nb


def wide_shape(spec: LatticeSpec):
    """Shape of the wide padded lattice layout (3, nb*BX + 2*BX, Y, Z) —
    the layout every hot-path kernel consumes and produces.  Real node
    (i, j, k) lives at [:, BX+1+i, 1+j, 1+k]; everything else is zero."""
    nb = _xblocks(spec)
    return (3, nb * BX + 2 * BX, spec.pshape[1] + 2, spec.pshape[2] + 2)


def _rewiden(out):
    """Kernel output (3, nb*BX, Y, Z) -> wide layout: out row j is wide row
    BX + j, and the kernel's masked ghost rows are exactly zero, so a zero
    x-pad of BX on both sides reproduces the wide layout."""
    return jnp.pad(out, ((0, 0), (BX, BX), (0, 0), (0, 0)))


def _run_stencil(K, v, spec: LatticeSpec, interpret=False):
    Kf = tuple(tuple(tuple(tuple(float(x) for x in r3) for r3 in r2)
                     for r2 in r1)
               for r1 in np.asarray(K).reshape(8, 3, 8, 3))
    return _run_stencil_inner(Kf, v, spec, interpret)


@functools.partial(jax.jit, static_argnames=("Kf", "spec", "interpret"))
def _stencil_wide(Kf, vw, spec: LatticeSpec, interpret=False):
    """y = A v in WIDE layout (no flat<->lattice transposes: the measured
    hot-path cost at 1M dofs is the relayout, not the stencil FMAs)."""
    in_specs, out_spec, out_shape, window, nb = _specs(spec, 1)
    kern = functools.partial(_stencil_kernel, spec, Kf)
    vw = vw.astype(jnp.float32)  # the kernels are f32 (TPU-native dtype)
    out = pl.pallas_call(
        kern, grid=(nb,), in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape, scratch_shapes=[window],
        compiler_params=_CPARAMS, interpret=interpret,
    )(_wyz(spec), vw, vw, vw)
    return _rewiden(out)


def stencil_matvec_wide(K, vw, spec: LatticeSpec, interpret=False):
    Kf = tuple(tuple(tuple(tuple(float(x) for x in r3) for r3 in r2)
                     for r2 in r1)
               for r1 in np.asarray(K).reshape(8, 3, 8, 3))
    return _stencil_wide(Kf, vw, spec, interpret)


@functools.partial(jax.jit, static_argnames=("Kf", "spec", "interpret"))
def _run_stencil_inner(Kf, v, spec: LatticeSpec, interpret=False):
    vw = _prep(v, spec)
    return _post(_stencil_wide(Kf, vw, spec, interpret)[:, BX:-BX],
                 spec).astype(v.dtype)


def stencil_matvec_flat(K, v, spec: LatticeSpec, interpret=False):
    """y = A v for the uniform (24,24) element stencil K, flat dof layout.

    The stencil is baked into the kernel as immediates (it is tiny and
    changes only when the operator is rebuilt)."""
    return _run_stencil(np.asarray(K, np.float64), v, spec, interpret)


def _bake_geom(G, wdet):
    Gf = tuple(tuple(tuple(float(x) for x in a) for a in g)
               for g in np.asarray(G))
    wf = tuple(float(x) for x in np.asarray(wdet))
    return Gf, wf


@functools.partial(jax.jit, static_argnames=(
    "spec", "Gf", "wf", "lam", "mu", "model", "interpret"))
def _force_wide(uw, spec, Gf, wf, lam, mu, model, interpret=False):
    in_specs, out_spec, out_shape, window, nb = _specs(spec, 1)
    kern = functools.partial(_force_kernel, spec, Gf, wf, lam, mu, model)
    uw = uw.astype(jnp.float32)
    out = pl.pallas_call(
        kern, grid=(nb,), in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape, scratch_shapes=[window],
        compiler_params=_CPARAMS, interpret=interpret,
    )(_wyz(spec), uw, uw, uw)
    return _rewiden(out)


def _run_force(u, spec, Gf, wf, lam, mu, model, interpret=False):
    uw = _prep(u, spec)
    out = _force_wide(uw, spec, Gf, wf, lam, mu, model, interpret)
    return _post(out[:, BX:-BX], spec).astype(u.dtype)


@functools.partial(jax.jit, static_argnames=(
    "spec", "Gf", "wf", "lam", "mu", "model", "interpret", "Nf", "mcoef"))
def _jvp_wide(uw, vw, spec, Gf, wf, lam, mu, model, interpret=False,
              Nf=None, mcoef=0.0):
    in_specs, out_spec, out_shape, window, nb = _specs(spec, 2)
    Y, Z = spec.pshape[1] + 2, spec.pshape[2] + 2
    kern = functools.partial(_jvp_kernel, spec, Gf, wf, lam, mu, model,
                             Nf=Nf, mcoef=mcoef)
    uw, vw = uw.astype(jnp.float32), vw.astype(jnp.float32)
    out = pl.pallas_call(
        kern, grid=(nb,), in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[window,
                        pltpu.VMEM((3, BX + 2, Y, Z), jnp.float32)],
        compiler_params=_CPARAMS, interpret=interpret,
    )(_wyz(spec), uw, uw, uw, vw, vw, vw)
    return _rewiden(out)


def _run_jvp(u, v, spec, Gf, wf, lam, mu, model, interpret=False,
             Nf=None, mcoef=0.0):
    uw = _prep(u, spec)
    vw = _prep(v, spec)
    out = _jvp_wide(uw, vw, spec, Gf, wf, lam, mu, model, interpret,
                    Nf=Nf, mcoef=mcoef)
    return _post(out[:, BX:-BX], spec).astype(u.dtype)


def make_force_flat(spec: LatticeSpec, G, wdet, lam, mu, model,
                    interpret=False):
    """Flat internal-force fn with fused-tangent custom jvp (TPU path)."""
    Gf, wf = _bake_geom(G, wdet)

    @jax.custom_jvp
    def force(u):
        return _run_force(u, spec, Gf, wf, lam, mu, model, interpret)

    @force.defjvp
    def force_jvp(primals, tangents):
        (u,), (v,) = primals, tangents
        y = _run_force(u, spec, Gf, wf, lam, mu, model, interpret)
        dy = _run_jvp(u, v, spec, Gf, wf, lam, mu, model, interpret)
        return y, dy

    return force


def make_force_wide(spec: LatticeSpec, G, wdet, lam, mu, model,
                    interpret=False):
    """Wide-layout internal force u_w -> f_w with a custom jvp routed to
    the tangent kernel — zero flat<->lattice relayouts in the Newton-Krylov
    loop (the measured dominant cost at 1M dofs)."""
    Gf, wf = _bake_geom(G, wdet)

    @jax.custom_jvp
    def force(uw):
        return _force_wide(uw, spec, Gf, wf, lam, mu, model, interpret)

    @force.defjvp
    def force_jvp(primals, tangents):
        (uw,), (vw,) = primals, tangents
        y = _force_wide(uw, spec, Gf, wf, lam, mu, model, interpret)
        dy = _jvp_wide(uw, vw, spec, Gf, wf, lam, mu, model, interpret)
        return y, dy

    return force


def prep(v, spec: LatticeSpec):
    """Flat node-major dof vector -> wide lattice layout."""
    return _prep(v, spec)


def widen_real(x3, spec: LatticeSpec):
    """Dense component-first real lattice (3, px, py, pz) -> wide layout
    (dtype-preserving)."""
    px = spec.pshape[0]
    Xp = _xblocks(spec) * BX
    return jnp.pad(x3, ((0, 0), (BX + 1, BX + Xp - px - 1), (1, 1), (1, 1)))


def crop_real(xw, spec: LatticeSpec):
    """Wide layout -> dense component-first real lattice (3, px, py, pz)."""
    px, py, pz = spec.pshape
    return xw[:, BX + 1:BX + 1 + px, 1:1 + py, 1:1 + pz]


def unprep(xw, spec: LatticeSpec, dtype=None):
    """Wide lattice layout -> flat node-major dof vector."""
    out = _post(xw[:, BX:-BX], spec)
    return out.astype(dtype) if dtype is not None else out


def make_tangent_flat(spec: LatticeSpec, G, wdet, N, lam, mu, model,
                      mcoef, interpret=False):
    """(u, v) -> K(u) v + mcoef * M v in ONE fused Pallas pass.

    mcoef folds rho and the integrator mass shift; M is the consistent
    mass (sum_g wdet N_a N_b), identical to the collapsed mass stencil.
    """
    Gf, wf = _bake_geom(G, wdet)
    Nf = tuple(tuple(float(x) for x in row) for row in np.asarray(N))

    def tangent(u, v):
        return _run_jvp(u, v, spec, Gf, wf, lam, mu, model, interpret,
                        Nf=Nf, mcoef=float(mcoef))

    return tangent
