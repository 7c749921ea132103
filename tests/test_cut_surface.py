"""Mesh-mesh 3D cut: background hex8 mesh x triangulated cutter surfaces.

Counterpart of the reference's surface-discretization cutters + selfcut
(ref: src/cut 4C_cut_cutwizard.hpp:207-213 add_cutter_state;
4C_cut_selfcut.cpp).  Oracles: exact signed distances (within the
triangulation's chord error), analytic cut volumes/areas for sphere, box
and overlapping-sphere UNION cutters.
"""

import numpy as np

from fourc_tpu.core import gridgen
from fourc_tpu.cut import cut3d


def _box16():
    d = gridgen.box(16, 16, 16)
    return np.asarray(d.coords), np.asarray(d.blocks["hex8"].conn)


def test_signed_distance_sphere():
    verts, tris = cut3d.icosphere(center=(0.5, 0.5, 0.5), radius=0.3,
                                  subdiv=2)
    rng = np.random.RandomState(0)
    P = rng.rand(400, 3)
    sdf = cut3d.signed_distance_to_surface(P, verts, tris)
    exact = np.linalg.norm(P - 0.5, axis=1) - 0.3
    # max error bounded by the icosphere chord sagitta (~0.0037 at
    # subdiv 2) plus projection slack
    assert np.abs(sdf - exact).max() < 0.006
    # sign agrees except within the chord band
    off = np.abs(exact) > 0.006
    assert np.all((sdf[off] < 0) == (exact[off] < 0))


def test_sphere_cut_volume_and_area():
    X, conn = _box16()
    verts, tris = cut3d.icosphere(center=(0.5, 0.5, 0.5), radius=0.3,
                                  subdiv=2)
    cm, phi = cut3d.cut_by_surfaces(X, conn, [(verts, tris)])
    exact_vol = 1.0 - 4.0 / 3.0 * np.pi * 0.3**3
    assert abs(cm.volume() - exact_vol) / exact_vol < 0.01
    exact_area = 4.0 * np.pi * 0.3**2
    assert abs(cm.area() - exact_area) / exact_area < 0.05
    # fluid region keeps phi < 0 outside the solid
    c = np.array([0.5, 0.5, 0.5])
    r = np.linalg.norm(X - c, axis=1)
    assert np.all(phi[r > 0.35] < 0)
    assert np.all(phi[r < 0.25] > 0)


def test_union_of_overlapping_spheres_selfcut_style():
    """Two overlapping closed cutters: the distance UNION removes the
    union solid exactly once (the reference's selfcut resolves the same
    overlap by removing interior surface parts)."""
    X, conn = _box16()
    r, dc = 0.25, 0.24  # both spheres fully inside the unit box
    s1 = cut3d.icosphere(center=(0.38, 0.5, 0.5), radius=r, subdiv=3)
    s2 = cut3d.icosphere(center=(0.62, 0.5, 0.5), radius=r, subdiv=3)
    cm, _ = cut3d.cut_by_surfaces(X, conn, [s1, s2])
    Vlens = np.pi * (4 * r + dc) * (2 * r - dc) ** 2 / 12.0
    Vunion = 2 * (4.0 / 3.0 * np.pi * r**3) - Vlens
    exact = 1.0 - Vunion
    assert abs(cm.volume() - exact) / exact < 0.02
    # the buried interface parts must NOT contribute area: union area =
    # 2 full spheres - 2 caps; cap height h = r - d/2
    hcap = r - dc / 2.0
    Aunion = 2 * 4 * np.pi * r**2 - 2 * (2 * np.pi * r * hcap)
    assert abs(cm.area() - Aunion) / Aunion < 0.06


def test_box_cutter_plate():
    X, conn = _box16()
    bv, bt = cut3d.box_surface([0.4, 0.2, 0.3], [0.6, 0.8, 0.7], n=3)
    cm, _ = cut3d.cut_by_surfaces(X, conn, [(bv, bt)])
    exact = 1.0 - 0.2 * 0.6 * 0.4
    assert abs(cm.volume() - exact) / exact < 0.01


def test_moving_cutter_recut_tracks_surface():
    """Re-cutting against a shifted surface moves the interface: the
    removed volume stays constant, its centroid follows the shift — the
    per-step moving-cutter operation of the 3D XFSI driver."""
    X, conn = _box16()
    removed = []
    cents = []
    for shift in (0.0, 0.12):
        v, t = cut3d.icosphere(center=(0.45 + shift, 0.5, 0.5),
                               radius=0.25, subdiv=2)
        cm, _ = cut3d.cut_by_surfaces(X, conn, [(v, t)])
        removed.append(1.0 - cm.volume())
        w = cm.sif_wts
        cents.append((w[:, None] * cm.sif_pts).sum(0) / w.sum())
    assert abs(removed[0] - removed[1]) / removed[0] < 0.02
    assert abs((cents[1][0] - cents[0][0]) - 0.12) < 0.02
    assert abs(cents[1][1] - cents[0][1]) < 0.01
