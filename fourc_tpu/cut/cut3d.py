"""3D level-set cut of a hex8 background mesh + CutFEM (Nitsche) solve.

Counterpart of the reference's 3D cut library and XFEM foundations
(ref: src/cut — `Cut::CutWizard` 4C_cut_cutwizard.hpp:55: mesh/level-set
intersection, facets, VOLUME CELLS with tet tessellation and Gauss rules,
boundary cells; src/xfem Nitsche-type embedded Dirichlet coupling).

TPU-native redesign of the pipeline:

1. **Tet tessellation of cut cells (host, once).**  Each cut hex8 is
   decomposed into 6 tets; the nodal level set is linear per tet, so the
   inside region {phi <= 0} of every tet is a convex polytope with an
   exact closed-form clip (marching-tet cases by inside-vertex count,
   Delaunay tessellation of the clipped polytope).  This is the analog of
   the reference's volume-cell tessellation
   (4C_cut_volumecell.cpp tessellation + moment-fitting alternatives).
2. **Fixed-shape quadrature arrays.**  The clip emits flat arrays of
   volume Gauss points (physical point, weight, owner element) and
   interface Gauss points (point, area weight, outward normal, owner) —
   the device solve consumes fixed shapes only, no cut-topology objects.
3. **Embedded Dirichlet via symmetric Nitsche** on the implicit surface,
   assembled into the shared COO pattern and solved with the on-device
   Jacobi-CG (linalg/solvers.py) — dofs whose basis support in Omega
   vanishes are deactivated (the reference guards small volume cells the
   same way).
"""

from __future__ import annotations

import numpy as np

# hex8 corner -> unit-cube coords (canonical ordering, core/cells.py)
_HEX_XI = np.array([
    [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
    [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
], float)

# 6-tet decomposition of the hex (all share the 0-6 diagonal)
_HEX_TETS = np.array([
    [0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6],
    [0, 7, 4, 6], [0, 4, 5, 6], [0, 5, 1, 6],
])

# degree-2 4-point tet rule (barycentric)
_TET4_L = np.array([
    [0.5854101966249685, 0.1381966011250105, 0.1381966011250105, 0.1381966011250105],
    [0.1381966011250105, 0.5854101966249685, 0.1381966011250105, 0.1381966011250105],
    [0.1381966011250105, 0.1381966011250105, 0.5854101966249685, 0.1381966011250105],
    [0.1381966011250105, 0.1381966011250105, 0.1381966011250105, 0.5854101966249685],
])
# degree-4 6-point triangle rule (barycentric + weights summing to 1):
# trilinear shape functions restricted to a planar facet are CUBIC, so the
# Nitsche consistency terms need degree >= 3 for exact linear consistency
_a1, _a2 = 0.44594849091597, 0.09157621350977
_TRI6_L = np.array([
    [1 - 2 * _a1, _a1, _a1], [_a1, 1 - 2 * _a1, _a1], [_a1, _a1, 1 - 2 * _a1],
    [1 - 2 * _a2, _a2, _a2], [_a2, 1 - 2 * _a2, _a2], [_a2, _a2, 1 - 2 * _a2],
])
_TRI6_W = np.array([0.22338158967801, 0.22338158967801, 0.22338158967801,
                    0.10995174365532, 0.10995174365532, 0.10995174365532])


def _tet_volume(T):
    return abs(np.linalg.det(T[1:] - T[0])) / 6.0


def _delaunay_tets(pts):
    """Tessellate a convex point cloud into tets (Delaunay; fan fallback
    for degenerate clouds)."""
    from scipy.spatial import Delaunay, QhullError

    try:
        dl = Delaunay(pts)
        return [pts[s] for s in dl.simplices if _tet_volume(pts[s]) > 1e-16]
    except (QhullError, ValueError):
        out = []
        for i in range(1, len(pts) - 2):
            T = pts[[0, i, i + 1, i + 2]]
            if _tet_volume(T) > 1e-16:
                out.append(T)
        return out


def _edge_cut(Xa, Xb, fa, fb):
    t = fa / (fa - fb)
    return Xa + t * (Xb - Xa)


def clip_tet(X4, phi4):
    """Clip one tet against {phi <= 0} (phi linear on the tet).

    Returns (sub_tets, iface_tris): lists of (4,3) / (3,3) vertex arrays.
    The marching-tet case table of the reference's tessellation
    (4C_cut_tetmesh.cpp) collapses to 4 sign cases here.
    """
    inside = phi4 <= 0.0
    k = int(inside.sum())
    if k == 0:
        return [], []
    if k == 4:
        return [X4], []
    idx_in = np.where(inside)[0]
    idx_out = np.where(~inside)[0]
    if k == 1:
        a = idx_in[0]
        ps = [_edge_cut(X4[a], X4[b], phi4[a], phi4[b]) for b in idx_out]
        tet = np.stack([X4[a], *ps])
        return ([tet] if _tet_volume(tet) > 1e-16 else []), [np.stack(ps)]
    if k == 3:
        d = idx_out[0]
        ps = [_edge_cut(X4[a], X4[d], phi4[a], phi4[d]) for a in idx_in]
        pts = np.stack([*X4[idx_in], *ps])
        return _delaunay_tets(pts), [np.stack(ps)]
    # k == 2: wedge bounded by the interface quad
    a, b = idx_in
    c, d = idx_out
    pac = _edge_cut(X4[a], X4[c], phi4[a], phi4[c])
    pbc = _edge_cut(X4[b], X4[c], phi4[b], phi4[c])
    pbd = _edge_cut(X4[b], X4[d], phi4[b], phi4[d])
    pad = _edge_cut(X4[a], X4[d], phi4[a], phi4[d])
    pts = np.stack([X4[a], X4[b], pac, pbc, pbd, pad])
    # quad loop pac -> pbc -> pbd -> pad (each edge lies on a tet face)
    tris = [np.stack([pac, pbc, pbd]), np.stack([pac, pbd, pad])]
    return _delaunay_tets(pts), tris


class CutMesh3D:
    """Cut state of a hex8 background mesh against a nodal level set.

    Emits: inside / outside / cut element index sets; volume quadrature
    (qcut_pts/wts/ele) of the inside parts of cut cells; interface
    quadrature (sif_pts/wts/ele/nrm) with outward (toward phi > 0)
    normals; active node mask.
    """

    def __init__(self, coords, conn, phi_nodes):
        coords = np.asarray(coords, float)
        conn = np.asarray(conn)
        phi = np.asarray(phi_nodes, float)
        E = conn.shape[0]
        phie = phi[conn]
        self.inside = np.where(np.all(phie <= 0, axis=1))[0]
        self.outside = np.where(np.all(phie > 0, axis=1))[0]
        self.cut = np.setdiff1d(
            np.arange(E), np.concatenate([self.inside, self.outside]))

        qp, qw, qe = [], [], []
        sp, sw, se, sn = [], [], [], []
        for e in self.cut:
            Xc = coords[conn[e]]
            fc = phie[e]
            for tet in _HEX_TETS:
                X4 = Xc[tet]
                f4 = fc[tet]
                sub, tris = clip_tet(X4, f4)
                # constant grad(phi) of the linear interpolant on this tet
                A = np.concatenate([X4[1:] - X4[0]])
                g = np.linalg.solve(A, f4[1:] - f4[0])
                gn = np.linalg.norm(g)
                nrm = g / gn if gn > 1e-30 else np.array([0.0, 0, 1])
                for T in sub:
                    v = _tet_volume(T)
                    if v <= 1e-16:
                        continue
                    for lam in _TET4_L:
                        qp.append(lam @ T)
                        qw.append(v / 4.0)
                        qe.append(e)
                for tri in tris:
                    area = 0.5 * np.linalg.norm(
                        np.cross(tri[1] - tri[0], tri[2] - tri[0]))
                    if area <= 1e-16:
                        continue
                    for lam, wt in zip(_TRI6_L, _TRI6_W):
                        sp.append(lam @ tri)
                        sw.append(area * wt)
                        se.append(e)
                        sn.append(nrm)

        z3 = np.zeros((0, 3))
        self.coords = coords
        self.conn = conn
        self.phi = phi
        self.qcut_pts = np.asarray(qp) if qp else z3
        self.qcut_wts = np.asarray(qw) if qw else np.zeros((0,))
        self.qcut_ele = np.asarray(qe, np.int32) if qe else np.zeros((0,), np.int32)
        self.sif_pts = np.asarray(sp) if sp else z3
        self.sif_wts = np.asarray(sw) if sw else np.zeros((0,))
        self.sif_ele = np.asarray(se, np.int32) if se else np.zeros((0,), np.int32)
        self.sif_nrm = np.asarray(sn) if sn else z3
        act = np.zeros(coords.shape[0], bool)
        act[conn[self.inside].reshape(-1)] = True
        act[conn[self.cut].reshape(-1)] = True
        self.active_nodes = act

    def volume(self):
        """Tessellated |Omega|: full inside cells + cut-cell weights."""
        v_in = 0.0
        for e in self.inside:
            X = self.coords[self.conn[e]]
            for tet in _HEX_TETS:
                v_in += _tet_volume(X[tet])
        return v_in + self.qcut_wts.sum()

    def area(self):
        """Tessellated interface area."""
        return self.sif_wts.sum()


def _hex_N(xi):
    return 0.125 * np.prod(1.0 + _HEX_XI * np.asarray(xi), axis=1)


def _hex_dN(xi):
    xi = np.asarray(xi)
    dN = np.empty((8, 3))
    for j in range(3):
        terms = 1.0 + _HEX_XI * xi
        terms[:, j] = _HEX_XI[:, j]
        dN[:, j] = 0.125 * np.prod(terms, axis=1)
    return dN


def _inv_map_hex(X, p, iters=10):
    xi = np.zeros(3)
    for _ in range(iters):
        r = _hex_N(xi) @ X - p
        J = _hex_dN(xi).T @ X
        xi = xi - np.linalg.solve(J, r)
    return np.clip(xi, -1.2, 1.2)


def solve_poisson_cut3d(coords, conn, phi_nodes, g_dirichlet, source=0.0,
                        nitsche=20.0, tol=1e-10):
    """CutFEM Poisson on Omega = {phi < 0}: -lap u = source, u = g on
    {phi = 0} imposed weakly (symmetric Nitsche).  Geometry on host;
    solve = on-device Jacobi-CG on the assembled COO operator.

    Returns (u nodal values, CutMesh3D).
    """
    import jax.numpy as jnp

    from fourc_tpu.linalg.precond import jacobi
    from fourc_tpu.linalg.solvers import cg

    cm = CutMesh3D(coords, conn, phi_nodes)
    coords, conn = cm.coords, cm.conn
    n = coords.shape[0]
    h = np.linalg.norm(coords[conn[0, 6]] - coords[conn[0, 0]]) / np.sqrt(3.0)
    gam = nitsche / max(h, 1e-300)

    rows, cols, vals = [], [], []
    rhs = np.zeros(n)

    # full 2x2x2 Gauss on uncut inside elements (vectorized; uniform grids
    # collapse to one congruent Ke but keep the general path)
    if len(cm.inside) > 0:
        Xe = coords[conn[cm.inside]]  # (E, 8, 3)
        gp = np.array(np.meshgrid(*3 * [[-1 / np.sqrt(3), 1 / np.sqrt(3)]],
                                  indexing="ij")).reshape(3, -1).T
        Ke = np.zeros((len(cm.inside), 8, 8))
        fe = np.zeros((len(cm.inside), 8))
        for xi in gp:
            dN = _hex_dN(xi)  # (8, 3)
            J = np.einsum("aj,eai->eji", dN, Xe)
            detJ = np.abs(np.linalg.det(J))
            G = np.einsum("ak,ekj->eaj", dN, np.linalg.inv(J))
            Ke += detJ[:, None, None] * np.einsum("eaj,ebj->eab", G, G)
            fe += detJ[:, None] * _hex_N(xi)[None] * source
        ce = conn[cm.inside]
        rows.append(np.repeat(ce, 8, axis=1).reshape(-1))
        cols.append(np.tile(ce, (1, 8)).reshape(-1))
        vals.append(Ke.reshape(-1))
        np.add.at(rhs, ce.reshape(-1), fe.reshape(-1))

    # cut-cell volume quadrature
    for p, w, e in zip(cm.qcut_pts, cm.qcut_wts, cm.qcut_ele):
        ce = conn[e]
        X = coords[ce]
        xi = _inv_map_hex(X, p)
        dN = _hex_dN(xi)
        J = dN.T @ X
        G = dN @ np.linalg.inv(J).T
        rows.append(np.repeat(ce, 8))
        cols.append(np.tile(ce, 8))
        vals.append((w * (G @ G.T)).reshape(-1))
        rhs[ce] += w * _hex_N(xi) * source

    # Nitsche interface terms
    for p, w, e, nr in zip(cm.sif_pts, cm.sif_wts, cm.sif_ele, cm.sif_nrm):
        ce = conn[e]
        X = coords[ce]
        xi = _inv_map_hex(X, p)
        Nv = _hex_N(xi)
        dN = _hex_dN(xi)
        G = dN @ np.linalg.inv(dN.T @ X).T
        dn = G @ nr
        g = g_dirichlet(*p)
        Ae = w * (-np.outer(dn, Nv) - np.outer(Nv, dn)
                  + gam * np.outer(Nv, Nv))
        rows.append(np.repeat(ce, 8))
        cols.append(np.tile(ce, 8))
        vals.append(Ae.reshape(-1))
        rhs[ce] += w * (-dn * g + gam * Nv * g)

    # deactivate near-zero-support dofs (no ghost penalty)
    support = np.zeros(n)
    for e in cm.inside:
        support[conn[e]] += h**3 / 8.0
    for p, w, e in zip(cm.qcut_pts, cm.qcut_wts, cm.qcut_ele):
        ce = conn[e]
        support[ce] += w * _hex_N(_inv_map_hex(coords[ce], p))
    act = cm.active_nodes & (support > 1e-8 * h**3)
    cm.active_nodes = act

    r = np.concatenate(rows)
    c = np.concatenate(cols)
    v = np.concatenate(vals)
    free = act
    # Dirichlet-style masking of inactive rows/cols + unit diagonal
    keep = free[r] & free[c]
    r, c, v = r[keep], c[keep], v[keep]
    inact = np.where(~free)[0]
    r = np.concatenate([r, inact])
    c = np.concatenate([c, inact])
    v = np.concatenate([v, np.ones(len(inact))])
    # merge duplicates
    lin = r.astype(np.int64) * n + c
    order = np.argsort(lin, kind="stable")
    lin_s = lin[order]
    uniq, seg = np.unique(lin_s, return_inverse=True)
    vm = np.zeros(len(uniq))
    np.add.at(vm, seg, v[order])
    ur = jnp.asarray((uniq // n).astype(np.int32))
    uc = jnp.asarray((uniq % n).astype(np.int32))
    uv = jnp.asarray(vm)
    rhs = jnp.asarray(np.where(free, rhs, 0.0))

    import jax

    def A(x):
        return jax.ops.segment_sum(uv * x[uc], ur, num_segments=n)

    diag = jax.ops.segment_sum(jnp.where(ur == uc, uv, 0.0), ur,
                               num_segments=n)
    res = cg(A, rhs, M=jacobi(jnp.where(diag != 0, diag, 1.0)),
             tol=tol, maxiter=20 * int(np.cbrt(n)) + 200)
    return np.asarray(res.x), cm


# ---------------------------------------------------------------------------
# mesh-mesh cut: background hex mesh x triangulated CUTTER SURFACE
# (ref: src/cut 4C_cut_cutwizard.hpp:207-213 add_cutter_state(mc_idx,
#  cutter_dis, ...) — the reference cuts against surface DISCRETIZATIONS,
#  not only level-set fields; 4C_cut_selfcut.cpp resolves multi-surface
#  overlaps.  TPU-native realization: the cutter surface is sampled into
#  an exact signed-distance field at the background NODES (point-triangle
#  distance + ray-parity sign), and the marching-tet machinery above
#  produces the volume/interface quadrature.  The interface is the linear
#  interpolant of that field — faithful to the true surface to O(h^2) of
#  the background mesh; multi-surface cuts take the distance UNION (the
#  selfcut analog for overlapping closed cutters).
# ---------------------------------------------------------------------------


def _point_tri_distance(P, A, B, C):
    """Unsigned distance from points P (n, 3) to ONE triangle (A, B, C).
    Fully vectorized closest-point: plane projection clamped to the
    triangle via edge-segment distances when the projection is outside."""
    n = np.cross(B - A, C - A)
    nn = np.linalg.norm(n)
    if nn < 1e-30:  # degenerate: fall back to edge distances only
        return np.minimum(_point_seg_distance(P, A, B),
                          _point_seg_distance(P, A, C))
    n = n / nn
    d_plane = (P - A) @ n
    proj = P - d_plane[:, None] * n
    # barycentric of the projection
    v0, v1 = B - A, C - A
    v2 = proj - A
    d00, d01, d11 = v0 @ v0, v0 @ v1, v1 @ v1
    d20, d21 = v2 @ v0, v2 @ v1
    den = d00 * d11 - d01 * d01
    v = (d11 * d20 - d01 * d21) / den
    w = (d00 * d21 - d01 * d20) / den
    inside = (v >= 0) & (w >= 0) & (v + w <= 1)
    d_edges = np.minimum(
        _point_seg_distance(P, A, B),
        np.minimum(_point_seg_distance(P, B, C),
                   _point_seg_distance(P, C, A)))
    return np.where(inside, np.abs(d_plane), d_edges)


def _point_seg_distance(P, A, B):
    ab = B - A
    t = np.clip(((P - A) @ ab) / max(float(ab @ ab), 1e-300), 0.0, 1.0)
    closest = A[None, :] + t[:, None] * ab[None, :]
    return np.linalg.norm(P - closest, axis=1)


def _ray_parity(P, verts, tris, direction=(0.61803, 0.5137, 0.33511)):
    """Odd crossing parity of a ray from each point -> point is INSIDE the
    closed surface.  Moller-Trumbore, vectorized over points per triangle;
    an irrational-ish direction avoids edge/vertex grazing."""
    d = np.asarray(direction, float)
    d = d / np.linalg.norm(d)
    count = np.zeros(P.shape[0], np.int64)
    V = verts
    for (i0, i1, i2) in tris:
        A, B, C = V[i0], V[i1], V[i2]
        e1, e2 = B - A, C - A
        pvec = np.cross(d, e2)
        det = e1 @ pvec
        if abs(det) < 1e-14:
            continue
        inv = 1.0 / det
        tvec = P - A
        u = (tvec @ pvec) * inv
        qvec = np.cross(tvec, e1)
        v = (qvec @ d) * inv
        t = (qvec @ e2) * inv
        hit = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
        count += hit
    return (count % 2) == 1


def signed_distance_to_surface(points, verts, tris):
    """Signed distance from `points` (n, 3) to a CLOSED triangulated
    surface (verts (V, 3), tris (T, 3) int): NEGATIVE inside the solid
    the surface bounds, positive outside."""
    P = np.asarray(points, float)
    verts = np.asarray(verts, float)
    tris = np.asarray(tris, int)
    dist = np.full(P.shape[0], np.inf)
    for (i0, i1, i2) in tris:
        dist = np.minimum(dist, _point_tri_distance(
            P, verts[i0], verts[i1], verts[i2]))
    inside = _ray_parity(P, verts, tris)
    return np.where(inside, -dist, dist)


def cut_by_surfaces(coords, conn, surfaces):
    """Cut a hex8 background mesh by one or more closed triangulated
    cutter surfaces: Omega (the kept region, phi < 0) is the EXTERIOR of
    the union of the cutter solids — the XFLUID convention (fluid outside
    embedded structures).

    surfaces: list of (verts (V,3), tris (T,3)).  Overlapping cutters are
    resolved by the signed-distance union (min over surfaces) — the
    selfcut-style multi-cutter treatment.  Returns (CutMesh3D, phi_nodes).
    """
    X = np.asarray(coords, float)
    sdf = np.full(X.shape[0], np.inf)
    for verts, tris in surfaces:
        sdf = np.minimum(sdf, signed_distance_to_surface(X, verts, tris))
    phi = -sdf  # solid interior -> phi > 0 (removed); fluid keeps phi < 0
    return CutMesh3D(coords, conn, phi), phi


def icosphere(center=(0.0, 0.0, 0.0), radius=1.0, subdiv=2):
    """Closed triangulated sphere (icosahedron subdivision) — cutter-
    surface generator for tests/decks."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], float)
    tris = [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
            (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
            (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
            (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    tris = [tuple(tr) for tr in tris]
    for _ in range(subdiv):
        cache = {}
        new_tris = []

        def mid(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = verts[i] + verts[j]
                m /= np.linalg.norm(m)
                cache[key] = len(verts_list)
                verts_list.append(m)
            return cache[key]

        verts_list = list(verts)
        for (a, b, c) in tris:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_tris += [(a, ab, ca), (b, bc, ab), (c, ca, bc),
                         (ab, bc, ca)]
        verts = np.asarray(verts_list)
        tris = new_tris
    verts = np.asarray(center, float)[None, :] + radius * verts
    return verts, np.asarray(tris, int)


def box_surface(lo, hi, n=4):
    """Closed triangulated axis-aligned box surface (n x n quads per face,
    each split in two) — plate/wall cutter generator."""
    lo = np.asarray(lo, float)
    hi = np.asarray(hi, float)
    verts, tris = [], []

    def face(orig, du, dv, flip):
        base = len(verts)
        for i in range(n + 1):
            for j in range(n + 1):
                verts.append(orig + du * (i / n) + dv * (j / n))
        for i in range(n):
            for j in range(n):
                a = base + i * (n + 1) + j
                b, c, d = a + 1, a + (n + 1), a + (n + 2)
                if flip:
                    tris.extend([(a, c, b), (b, c, d)])
                else:
                    tris.extend([(a, b, c), (b, d, c)])

    ex = np.array([hi[0] - lo[0], 0, 0])
    ey = np.array([0, hi[1] - lo[1], 0])
    ez = np.array([0, 0, hi[2] - lo[2]])
    face(lo, ex, ey, flip=True)           # z = lo (normal -z)
    face(lo + ez, ex, ey, flip=False)     # z = hi (+z)
    face(lo, ex, ez, flip=False)          # y = lo (-y): check winding
    face(lo + ey, ex, ez, flip=True)      # y = hi
    face(lo, ey, ez, flip=True)           # x = lo
    face(lo + ex, ey, ez, flip=False)     # x = hi
    return np.asarray(verts), np.asarray(tris, int)
