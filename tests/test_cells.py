"""Cell-type zoo unit tests (tier-1 analog of unittests/solid_3D_ele etc.)."""

import numpy as np
import pytest

from fourc_tpu.core import cells

VOLUMES = {
    "line2": 2.0, "line3": 2.0,
    "tri3": 0.5, "tri6": 0.5,
    "quad4": 4.0, "quad8": 4.0, "quad9": 4.0,
    "tet4": 1.0 / 6.0, "tet10": 1.0 / 6.0,
    "hex8": 8.0, "hex20": 8.0, "hex27": 8.0,
    "wedge6": 1.0, "pyramid5": 4.0 / 3.0,
}


@pytest.mark.parametrize("name", cells.ALL_CELLS)
def test_partition_of_unity(name):
    c = cells.get_cell(name)
    assert np.abs(c.N.sum(axis=1) - 1).max() < 1e-12
    assert np.abs(c.dN.sum(axis=1)).max() < 1e-10


@pytest.mark.parametrize("name", cells.ALL_CELLS)
def test_weights_integrate_reference_volume(name):
    c = cells.get_cell(name)
    assert abs(c.gauss_weights.sum() - VOLUMES[name]) < 1e-10


@pytest.mark.parametrize("name", ["hex8", "hex20", "hex27", "tet4", "tet10", "quad4", "tri3"])
def test_linear_completeness(name):
    """Shape functions reproduce linear fields exactly at GPs."""
    c = cells.get_cell(name)
    # nodal coordinates of the reference element (interpolate xi itself)
    # evaluate N at GPs against analytic xi
    # use: sum_a N_a(xi) * xi_a == xi for isoparametric cells
    nodes = _ref_nodes(name, c)
    interp = c.N @ nodes  # (ngp, dim)
    assert np.abs(interp - c.gauss_points).max() < 1e-9


def _ref_nodes(name, c):
    """Recover reference nodal coords by fitting: for Lagrange elements the
    shape fn of node a is 1 at node a. Use known generators."""
    from fourc_tpu.core.cells import (
        _HEX_CORNERS, _QUAD_CORNERS, _HEX20_EDGES,
    )

    if name == "hex8":
        return _HEX_CORNERS
    if name == "quad4":
        return _QUAD_CORNERS
    if name == "tri3":
        return np.array([[0, 0], [1, 0], [0, 1]], dtype=float)
    if name == "tet4":
        return np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)
    if name == "tet10":
        c4 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)
        mids = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)]
        return np.vstack([c4] + [0.5 * (c4[a] + c4[b]) for a, b in mids])
    if name in ("hex20", "hex27"):
        nodes = [r for r in _HEX_CORNERS]
        nodes += [0.5 * (_HEX_CORNERS[a] + _HEX_CORNERS[b]) for a, b in _HEX20_EDGES]
        if name == "hex27":
            for d, v in [(2, -1), (1, -1), (0, 1), (1, 1), (0, -1), (2, 1)]:
                f = np.zeros(3)
                f[d] = v
                nodes.append(f)
            nodes.append(np.zeros(3))
        return np.array(nodes)
    raise KeyError(name)


def test_tet10_midside_ordering():
    """tet10 midside nodes must interpolate exactly (catches ordering bugs)."""
    c = cells.get_cell("tet10")
    nodes = _ref_nodes("tet10", c)
    for i, x in enumerate(nodes):
        N = c.eval_shape(x)
        expect = np.zeros(10)
        expect[i] = 1.0
        assert np.abs(N - expect).max() < 1e-12, f"node {i}"
