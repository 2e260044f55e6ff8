import os

import numpy as np
import pytest

from aither_tpu.io.deck import parse_deck
from aither_tpu.io.plot3d import read_p3d, write_p3d
from aither_tpu.grid.geometry import (build_block_geometry, cell_volumes,
                                      cell_centroids, face_areas)

CASES = "/root/reference/testCases"


def unit_cube_nodes(n=4, h=1.0):
    x = np.arange(n + 1) * h
    g = np.stack(np.meshgrid(x, x, x, indexing="ij"), axis=-1)
    return g


def test_uniform_cube_metrics():
    nodes = unit_cube_nodes(4, 0.5)
    vol = cell_volumes(nodes)
    assert vol.shape == (4, 4, 4)
    np.testing.assert_allclose(vol, 0.125, rtol=1e-14)
    c = cell_centroids(nodes)
    np.testing.assert_allclose(c[0, 0, 0], [0.25, 0.25, 0.25], rtol=1e-14)
    fa = face_areas(nodes, "i")
    assert fa.shape == (5, 4, 4, 3)
    np.testing.assert_allclose(fa[..., 0], 0.25, atol=1e-14)
    np.testing.assert_allclose(fa[..., 1:], 0.0, atol=1e-14)


def test_skewed_cell_volume():
    # a single parallelepiped: volume = |a . (b x c)|
    a = np.array([1.0, 0.1, 0.0])
    b = np.array([0.2, 1.0, 0.0])
    c = np.array([0.0, 0.3, 1.0])
    nodes = np.zeros((2, 2, 2, 3))
    for i in range(2):
        for j in range(2):
            for k in range(2):
                nodes[i, j, k] = i * a + j * b + k * c
    vol = cell_volumes(nodes)
    expected = abs(np.dot(a, np.cross(b, c)))
    np.testing.assert_allclose(vol[0, 0, 0], expected, rtol=1e-13)


def test_plot3d_roundtrip(tmp_path):
    nodes = unit_cube_nodes(3)
    path = str(tmp_path / "grid.xyz")
    write_p3d(path, [nodes, nodes * 2.0])
    blocks = read_p3d(path)
    assert len(blocks) == 2
    np.testing.assert_array_equal(blocks[0], nodes)
    np.testing.assert_array_equal(blocks[1], nodes * 2.0)


@pytest.mark.skipif(not os.path.isdir(CASES), reason="reference cases absent")
def test_shocktube_grid_geometry():
    deck = parse_deck(os.path.join(CASES, "shockTube", "shockTube.inp"))
    deck.finalize()
    blocks = read_p3d(os.path.join(CASES, "shockTube", "shockTube.xyz"),
                      deck.l_ref)
    assert len(blocks) == 2
    assert blocks[0].shape == (2, 2, 51, 3)
    geo = build_block_geometry(blocks[0], deck.bcs[0], deck.num_ghosts)
    P = geo.phys_slice()
    assert (geo.vol[P] > 0).all()
    # ghost geometry along non-interblock boundaries must be positive
    g = geo.g
    assert (geo.vol[:g, P[1], P[2]] > 0).all()      # i-lower ghosts
    assert (geo.vol[-g:, P[1], P[2]] > 0).all()     # i-upper ghosts
    assert (geo.vol[P[0], :g, P[2]] > 0).all()
    assert (geo.vol[P[0], P[1], :g] > 0).all()      # k-lower slipWall
    # interblock upper-k ghosts remain zero until swapped
    assert (geo.vol[P[0], P[1], -g:] == 0).all()
    # widths positive everywhere physically
    assert (geo.width_i[P] > 0).all()
    assert (geo.width_k[P] > 0).all()
    # edge ghosts (i-lower/j-lower corner at physical k) filled
    assert (geo.vol[:g, :g, P[2]] > 0).all()


def test_ghost_geometry_uniform_grid():
    """On a uniform grid ghost metrics must replicate interior spacing."""
    from aither_tpu.io.deck import BlockBC, BoundarySurface
    n, h = 4, 0.5
    nodes = unit_cube_nodes(n, h)
    surfs = []
    for d, axpair in zip("ijk", [(1, 2), (0, 2), (0, 1)]):
        for side in (0, 1):
            args = dict(imin=0, imax=n, jmin=0, jmax=n, kmin=0, kmax=n)
            for lo, hi, v in ((f"{d}min", f"{d}max", side * n),):
                args[lo] = v
                args[hi] = v
            surfs.append(BoundarySurface("slipWall", args["imin"],
                                         args["imax"], args["jmin"],
                                         args["jmax"], args["kmin"],
                                         args["kmax"], 1, d))
    bc = BlockBC(2, 2, 2, surfs)
    g = 2
    geo = build_block_geometry(nodes, bc, g)

    # triple-corner ghosts (all three directions in a ghost layer) are never
    # assigned (matching the reference); mask them out
    ghost = np.zeros(n + 2 * g, dtype=bool)
    ghost[:g] = ghost[-g:] = True
    gi, gj, gk = np.meshgrid(ghost, ghost, ghost, indexing="ij")
    defined = ~(gi & gj & gk)

    np.testing.assert_allclose(geo.vol[defined], h ** 3, rtol=1e-12)
    np.testing.assert_allclose(geo.width_i[defined], h, rtol=1e-12)
    np.testing.assert_allclose(geo.width_j[defined], h, rtol=1e-12)
    np.testing.assert_allclose(geo.width_k[defined], h, rtol=1e-12)
    # centroids must continue linearly into ghosts
    np.testing.assert_allclose(geo.center[0, 2, 2, 0], -1.5 * h, rtol=1e-12)
    np.testing.assert_allclose(geo.center[-1, 2, 2, 0],
                               (n + 1.5) * h, rtol=1e-12)
    expect_x = (np.arange(n + 2 * g + 1) - g) * h
    np.testing.assert_allclose(geo.fc_i[:, 2, 2, 0], expect_x, atol=1e-12)
    # ghost face areas mirror the boundary magnitude
    np.testing.assert_allclose(geo.fa_i[0, 2, 2], [h * h, 0, 0], atol=1e-12)
