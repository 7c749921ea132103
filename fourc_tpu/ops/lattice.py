"""Lattice (structured-grid) operator application: stencils, not scatters.

On a uniform hex8 lattice the whole matrix-free FEM hot path — internal
force, consistent-tangent matvec, consistent-mass matvec, and every GMG
level operator — is a 3D stencil computation: local node a of element
(i,j,k) is lattice point (i,j,k)+offset_a, so "gather + element kernel +
scatter-add" collapses into shifted slice arithmetic on the node lattice.
This removes ALL indexed gather/scatter traffic (measured ~25x below the
HBM roofline at 1M dofs) and is the TPU-native analog of the reference's
assembled-SpMV hot loop (ref: src/core/fem/src/discretization/
4C_fem_discretization_evaluate.cpp:84-105 + Epetra SpMV).

Layout: component-first padded lattice ``(3, px+2, py+2, pz+2)`` with one
zero ghost shell per side.  Ghost ELEMENTS (the shell of fictitious
elements around the domain) are masked out, which makes the stencil
uniform everywhere — no boundary special-casing (the mask plays the role
of the reference's row/col map boundary handling).

This module holds the layout helpers, the stencil collapse, and a pure-XLA
reference implementation (runs everywhere, used by CPU tests and as the
fallback).  The TPU speed-of-light kernels live in ops/lattice_pallas.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# canonical hex8 local-node lattice offsets (matches core/mesh.py
# _HEX8_OFFSETS and core/cells.py hex8 node ordering)
HEX8_OFFSETS = ((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1))


@dataclass(frozen=True)
class LatticeSpec:
    """Geometry of one structured hex8 block: px,py,pz real node counts and
    the (uniform) element spacings hx,hy,hz."""

    pshape: tuple  # (px, py, pz) real node counts
    h: tuple  # (hx, hy, hz) uniform element edge lengths

    @property
    def nshape(self):  # real element counts
        return tuple(p - 1 for p in self.pshape)

    @property
    def ndof(self):
        px, py, pz = self.pshape
        return px * py * pz * 3


def detect_lattice(disc, block_key=None) -> LatticeSpec | None:
    """LatticeSpec for a single-block structured UNIFORM hex8 mesh, else
    None.  Uniformity = all elements congruent axis-aligned boxes (the
    stencil-collapse condition, same test as linalg/gmg.py)."""
    ss = getattr(disc, "structured_shape", None)
    if ss is None or len(ss) != 4 or ss[3] != 1 or hasattr(disc, "node_perm"):
        return None
    if len(disc.blocks) != 1:
        return None
    blk = next(iter(disc.blocks.values()))
    if blk.cell != "hex8":
        return None
    nx, ny, nz, _ = ss
    px, py, pz = nx + 1, ny + 1, nz + 1
    coords = np.asarray(disc.coords)
    if coords.shape[0] != px * py * pz:
        return None
    lat = coords.reshape(px, py, pz, 3)
    # axis-aligned uniform spacing test
    hx = lat[1, 0, 0] - lat[0, 0, 0]
    hy = lat[0, 1, 0] - lat[0, 0, 0]
    hz = lat[0, 0, 1] - lat[0, 0, 0]
    if not (abs(hx[1]) < 1e-12 and abs(hx[2]) < 1e-12
            and abs(hy[0]) < 1e-12 and abs(hy[2]) < 1e-12
            and abs(hz[0]) < 1e-12 and abs(hz[1]) < 1e-12):
        return None
    h = (float(hx[0]), float(hy[1]), float(hz[2]))
    if min(h) <= 0:
        return None
    ref = lat[0, 0, 0]
    ii, jj, kk = np.meshgrid(np.arange(px), np.arange(py), np.arange(pz),
                             indexing="ij")
    want = ref[None, None, None] + np.stack(
        [ii * h[0], jj * h[1], kk * h[2]], axis=-1)
    eps = 64 * np.finfo(np.float32).eps * max(1.0, np.abs(coords).max())
    if not np.allclose(lat, want, rtol=0.0, atol=eps):
        return None
    return LatticeSpec(pshape=(px, py, pz), h=h)


# ---------------------------------------------------------------------------
# layout
# ---------------------------------------------------------------------------


def to_lattice(v, spec: LatticeSpec):
    """Flat node-major dof vector -> padded component-first lattice
    (3, px+2, py+2, pz+2) with zero ghost shells."""
    px, py, pz = spec.pshape
    x = v.reshape(px, py, pz, 3)
    x = jnp.transpose(x, (3, 0, 1, 2))
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1)))


def from_lattice(x, spec: LatticeSpec):
    """Padded lattice -> flat node-major dof vector."""
    x = x[:, 1:-1, 1:-1, 1:-1]
    return jnp.transpose(x, (1, 2, 3, 0)).reshape(-1)


def collapse_stencil(Ke):
    """One congruent-element (24, 24) matrix -> (8, 3, 8, 3) node-block
    stencil K[a, i, b, j] in canonical hex8 ordering."""
    Ke = np.asarray(Ke)
    assert Ke.shape == (24, 24)
    return Ke.reshape(8, 3, 8, 3)


def uniform_geometry(cell, spec: LatticeSpec, dtype=np.float64):
    """Cartesian shape gradients + weighted jacobians of the congruent
    element: G (ngp, 8, 3) with G[g,a,j] = dN[g,a,j] * 2/h_j, and
    wdet (ngp,) = w_g * hx*hy*hz/8."""
    dN = np.asarray(cell.dN, dtype)  # (g, a, 3) parametric grads
    w = np.asarray(cell.gauss_weights, dtype)
    h = np.asarray(spec.h, dtype)
    G = dN * (2.0 / h)[None, None, :]
    wdet = w * float(np.prod(h)) / 8.0
    return G, wdet


# ---------------------------------------------------------------------------
# XLA reference implementations (portable; also the CPU/test oracle)
# ---------------------------------------------------------------------------


def _elem_mask(spec: LatticeSpec, dtype):
    """(nx+2, ny+2, nz+2) 0/1 mask over the PADDED element grid: 1 for real
    elements, 0 for the ghost shell."""
    nx, ny, nz = spec.nshape
    m = np.zeros((nx + 2, ny + 2, nz + 2), dtype)
    m[1:-1, 1:-1, 1:-1] = 1.0
    return jnp.asarray(m)


def stencil_matvec_ref(K, v_lat, spec: LatticeSpec):
    """y = A v with the uniform node-block stencil K (8,3,8,3), padded
    lattice layout.  Pure XLA shift-form: per (a, b) pair one shifted
    3x3-block FMA over the padded element grid."""
    K = np.asarray(K)
    w = _elem_mask(spec, v_lat.dtype)
    nx, ny, nz = (s + 2 for s in spec.nshape)  # padded element counts
    out = jnp.zeros_like(v_lat)
    for b, (bx, by, bz) in enumerate(HEX8_OFFSETS):
        vb = v_lat[:, bx:bx + nx, by:by + ny, bz:bz + nz]  # (3, e-grid)
        vbm = vb * w[None]
        for a, (ax, ay, az) in enumerate(HEX8_OFFSETS):
            # scalar-broadcast FMAs, NOT an einsum: the TPU default matmul
            # precision would route a (3,3)x(3,...) contraction through the
            # bf16 MXU (~1e-3 relative error — breaks Krylov; see gmg.py)
            fe = jnp.stack([
                sum(float(K[a, i, b, j]) * vbm[j] for j in range(3))
                for i in range(3)
            ])
            out = out.at[:, ax:ax + nx, ay:ay + ny, az:az + nz].add(fe)
    return out


def _neo_stress(A, lam, mu):
    """PK2 from 2E (=A) for compressible Neo-Hooke; batched over trailing
    lattice dims.  Same f32-stable closed form as materials/elastic.py."""
    eye = jnp.eye(3, dtype=A.dtype).reshape(3, 3, 1, 1, 1)
    C = A + eye
    trA = jnp.trace(A)
    trA2 = jnp.einsum("ij...,ji...->...", A, A)
    detA = jnp.linalg.det(jnp.moveaxis(A, (0, 1), (-2, -1)))
    detC_m1 = trA + 0.5 * (trA * trA - trA2) + detA
    lnJ = 0.5 * jnp.log1p(detC_m1)
    Cm = jnp.moveaxis(C, (0, 1), (-2, -1))
    Cinv = jnp.moveaxis(jnp.linalg.inv(Cm), (-2, -1), (0, 1))
    M = mu * A + lam * lnJ * eye
    return jnp.einsum("ik...,kj...->ij...", Cinv, M)


def _svk_stress(A, lam, mu):
    eye = jnp.eye(3, dtype=A.dtype).reshape(3, 3, 1, 1, 1)
    trE = 0.5 * jnp.trace(A)
    return lam * trE * eye + 0.5 * mu * (A + jnp.swapaxes(A, 0, 1))


def neo_force_ref(u_lat, spec: LatticeSpec, G, wdet, lam, mu, model="neohooke"):
    """Total-Lagrangian internal force on the lattice (XLA reference).

    u_lat: padded (3, X, Y, Z).  G/wdet from uniform_geometry.
    """
    w = _elem_mask(spec, u_lat.dtype)
    nx, ny, nz = (s + 2 for s in spec.nshape)
    ngp = G.shape[0]
    out = jnp.zeros_like(u_lat)
    ue = jnp.stack([u_lat[:, ax:ax + nx, ay:ay + ny, az:az + nz]
                    for (ax, ay, az) in HEX8_OFFSETS])  # (8, 3, e-grid)
    eye = jnp.eye(3, dtype=u_lat.dtype).reshape(3, 3, 1, 1, 1)
    for g in range(ngp):
        Gg = jnp.asarray(G[g], u_lat.dtype)  # (8, 3)
        # mask H (not just the force) so ghost elements see H = 0 — their
        # garbage C could otherwise hit log(detC <= 0) and poison the
        # masked product with NaNs
        H = jnp.einsum("ai...,aj->ij...", ue, Gg) * w[None, None]
        A = H + jnp.swapaxes(H, 0, 1) + jnp.einsum("ki...,kj...->ij...", H, H)
        S = (_neo_stress if model == "neohooke" else _svk_stress)(A, lam, mu)
        F = H + eye
        P = jnp.einsum("ik...,kj...->ij...", F, S)
        fe = float(wdet[g]) * jnp.einsum("ij...,aj->ai...", P, Gg) * w[None, None]
        for a, (ax, ay, az) in enumerate(HEX8_OFFSETS):
            out = out.at[:, ax:ax + nx, ay:ay + ny, az:az + nz].add(fe[a])
    return out


def neo_jvp_ref(u_lat, v_lat, spec, G, wdet, lam, mu, model="neohooke"):
    """Reference tangent apply: jax.jvp through neo_force_ref."""
    _, jv = jax.jvp(
        lambda u: neo_force_ref(u, spec, G, wdet, lam, mu, model), (u_lat,),
        (v_lat,))
    return jv


# ---------------------------------------------------------------------------
# dispatch: pallas on TPU, XLA reference elsewhere
# ---------------------------------------------------------------------------


def _use_pallas():
    # axon (remote TPU) registers a non-"tpu" platform name; anything that
    # is not the CPU interpreter is a real TPU backend here.
    # f64: Mosaic has no float64 kernel support ("failed to legalize
    # func.return" at compile) — x64 runs (the 1e-8 North-Star semantics)
    # take the XLA-reference stencils instead.
    if jax.config.jax_enable_x64:
        return False
    return jax.default_backend() != "cpu"


def enabled():
    """Whether SolidField/GMG should auto-engage the lattice fast path.

    Only where it is actually fast: the Pallas TPU backend.  On CPU the
    XLA-reference stencils are the correctness oracle (tests/test_lattice)
    but measurably SLOWER than the general gather/scatter path, so the
    auto path stays off there.  ``FOURC_LATTICE=1/0`` forces it on/off.
    """
    import os

    v = os.environ.get("FOURC_LATTICE", "auto")
    if v in ("0", "1"):
        return v == "1"
    return _use_pallas()


def _linear_op(fn):
    """custom-jvp wrapper for a LINEAR operator: d(A v) = A dv.  Needed on
    the Pallas path (pallas_call has no jvp rule) and cheaper everywhere."""

    @jax.custom_jvp
    def op(v):
        return fn(v)

    @op.defjvp
    def op_jvp(primals, tangents):
        (v,), (dv,) = primals, tangents
        return fn(v), fn(dv)

    return op


def stencil_matvec_mxu(K, v, spec: LatticeSpec):
    """im2col form of the uniform-stencil matvec: 8 shifted views of the
    lattice stack to a (24, M) matrix over the padded element grid, one
    (24, 24) x (24, M) MXU matmul at Precision.HIGHEST (3-pass bf16 ==
    f32-accurate — plain default precision would break Krylov, see
    stencil_matvec_ref), then 8 shifted scatter-adds.  ~6x faster than
    the scalar-FMA stencil on TPU: the 576 FMAs/point run on the MXU
    instead of the VPU."""
    K = jnp.asarray(np.asarray(K, np.float32).reshape(24, 24))
    v_lat = to_lattice(v, spec)
    w = _elem_mask(spec, v_lat.dtype)
    nx, ny, nz = (s + 2 for s in spec.nshape)  # padded element counts
    cols = []
    for (bx, by, bz) in HEX8_OFFSETS:
        vb = v_lat[:, bx:bx + nx, by:by + ny, bz:bz + nz] * w[None]
        cols.append(vb.reshape(3, -1))
    V = jnp.concatenate(cols, axis=0)  # (24, M) rows = (b, j)
    F = jnp.matmul(K, V, precision=jax.lax.Precision.HIGHEST)  # (24, M)
    out = jnp.zeros_like(v_lat)
    for a, (ax, ay, az) in enumerate(HEX8_OFFSETS):
        fe = F[3 * a:3 * a + 3].reshape(3, nx, ny, nz)
        out = out.at[:, ax:ax + nx, ay:ay + ny, az:az + nz].add(fe)
    return from_lattice(out, spec)


def stencil_matvec_flat(K, v, spec: LatticeSpec):
    """Flat-vector uniform-stencil matvec (the level-operator/mass apply)."""
    import os

    if _use_pallas():
        # "mxu" (XLA im2col matmul) measured 13x SLOWER than the Pallas
        # stencil at 73^3 (relayout/concat/scatter overheads) — kept only
        # as an experiment behind the env var
        impl = os.environ.get("FOURC_STENCIL_IMPL", "pallas")
        if impl == "mxu":
            Kc = np.asarray(K, np.float64).reshape(24, 24)
            return _linear_op(lambda x: stencil_matvec_mxu(Kc, x, spec))(v)
        from fourc_tpu.ops import lattice_pallas as lp

        return _linear_op(lambda x: lp.stencil_matvec_flat(K, x, spec))(v)
    # K stays a NumPy constant: the ref kernel bakes its entries in as
    # scalar immediates (jnp.asarray here would lift it to a tracer under
    # jit and break that)
    out = stencil_matvec_ref(np.asarray(K, np.float64), to_lattice(v, spec),
                             spec)
    return from_lattice(out, spec)


def make_tangent_flat(spec: LatticeSpec, cell, material, mass_coef,
                      interpret=False):
    """(u, v) -> K(u) v + mass_coef * M v fused in one Pallas pass
    (consistent mass; mass_coef excludes rho — folded here).  Returns
    None off-TPU or for unsupported materials: callers fall back to
    jvp-of-residual + separate mass stencil."""
    from fourc_tpu.materials.elastic import lame

    if not (_use_pallas() or interpret):
        return None
    name = type(material).__name__.lower()
    if "neohooke" in name and "plastic" not in name:
        model = "neohooke"
    elif "stvenant" in name and "scatra" not in name and "thermo" not in name:
        model = "svk"
    else:
        return None
    lam, mu = (float(x) for x in lame(material.youngs, material.nue))
    rho = float(getattr(material, "density", 0.0) or 0.0)
    G, wdet = uniform_geometry(cell, spec)
    from fourc_tpu.ops import lattice_pallas as lp

    return lp.make_tangent_flat(spec, G, wdet, cell.N, lam, mu, model,
                                rho * float(mass_coef), interpret=interpret)


def _material_model(material):
    """Stencil-kernel model name for a material, or None if unsupported."""
    name = type(material).__name__.lower()
    if "neohooke" in name and "plastic" not in name:
        return "neohooke"
    if "stvenant" in name and "scatra" not in name and "thermo" not in name:
        return "svk"
    return None


# -- wide-layout dispatchers (Pallas on TPU, XLA reference off-TPU) ---------
#
# The wide (3, nb*BX + 2*BX, Y, Z) layout is the Pallas kernels' native
# in/out layout (lattice_pallas.wide_shape); slicing off the BX x-guard
# bands yields exactly the padded-lattice (3, px+2, py+2, pz+2) layout the
# XLA reference stencils consume — so the CPU fallback is a cheap slice +
# ref-op + zero-repad, NOT interpret-mode Pallas (whose compile time inside
# the Newton while_loop is minutes even at 5^3).


def _wide_to_lat(xw, spec: LatticeSpec):
    from fourc_tpu.ops.lattice_pallas import BX

    return xw[:, BX:BX + spec.pshape[0] + 2]


def _lat_to_wide(x, spec: LatticeSpec):
    from fourc_tpu.ops import lattice_pallas as lp

    return lp.widen_real(x[:, 1:-1, 1:-1, 1:-1], spec)


def stencil_matvec_wide(K, vw, spec: LatticeSpec):
    """y = A v in the wide layout (level-operator / mass apply)."""
    if _use_pallas():
        from fourc_tpu.ops import lattice_pallas as lp

        return _linear_op(lambda x: lp.stencil_matvec_wide(K, x, spec))(vw)
    Kc = np.asarray(K, np.float64)
    return _linear_op(
        lambda x: _lat_to_wide(
            stencil_matvec_ref(Kc, _wide_to_lat(x, spec), spec), spec))(vw)


def make_force_wide(spec: LatticeSpec, cell, material):
    """Wide-layout internal force u_w -> f_w (jvp-capable); None when the
    material is unsupported."""
    from fourc_tpu.materials.elastic import lame

    model = _material_model(material)
    if model is None:
        return None
    lam, mu = (float(x) for x in lame(material.youngs, material.nue))
    G, wdet = uniform_geometry(cell, spec)
    if _use_pallas():
        from fourc_tpu.ops import lattice_pallas as lp

        return lp.make_force_wide(spec, G, wdet, lam, mu, model)

    def force(uw):
        out = neo_force_ref(_wide_to_lat(uw, spec), spec, G, wdet, lam, mu,
                            model)
        return _lat_to_wide(out, spec)

    return force


def make_force_flat(spec: LatticeSpec, cell, material):
    """Returns flat-vector internal-force fn u -> f with a custom jvp that
    routes Newton-Krylov matvecs to the fused tangent kernel, or None when
    the material is unsupported."""
    from fourc_tpu.materials.elastic import lame

    name = type(material).__name__.lower()
    if "neohooke" in name and "plastic" not in name:
        model = "neohooke"
    elif "stvenant" in name and "scatra" not in name and "thermo" not in name:
        model = "svk"
    else:
        return None
    lam, mu = (float(x) for x in lame(material.youngs, material.nue))
    G, wdet = uniform_geometry(cell, spec)

    if _use_pallas():
        from fourc_tpu.ops import lattice_pallas as lp

        return lp.make_force_flat(spec, G, wdet, lam, mu, model)

    @jax.custom_jvp
    def force(u):
        out = neo_force_ref(to_lattice(u, spec), spec, G, wdet, lam, mu, model)
        return from_lattice(out, spec)

    @force.defjvp
    def force_jvp(primals, tangents):
        (u,), (v,) = primals, tangents
        ul, vl = to_lattice(u, spec), to_lattice(v, spec)
        y = from_lattice(neo_force_ref(ul, spec, G, wdet, lam, mu, model), spec)
        dy = from_lattice(
            neo_jvp_ref(ul, vl, spec, G, wdet, lam, mu, model), spec)
        return y, dy

    return force
