"""Geometry kernel unit tests (SURVEY.md §5.1#1)."""

import numpy as np
import pytest

from tilers_tools_ray import geometry as geo
from tilers_tools_ray import tilegrid as tg


def test_affine_solve_exact_recovery():
    gt = np.array([100.0, 2.5, 0.3, -50.0, -0.1, -2.0])
    rng = np.random.default_rng(3)
    px = rng.uniform(0, 500, 12)
    py = rng.uniform(0, 400, 12)
    wx, wy = geo.apply_gt(gt, px, py)
    fit = geo.solve_affine(px, py, wx, wy)
    np.testing.assert_allclose(fit, gt, atol=1e-9)


def test_invert_gt_roundtrip():
    gt = np.array([1000.0, 3.0, 0.5, 2000.0, 0.2, -3.0])
    inv = geo.invert_gt(gt)
    px, py = np.array([0.0, 10.0, 123.4]), np.array([0.0, 20.0, 56.7])
    wx, wy = geo.apply_gt(gt, px, py)
    px2, py2 = geo.apply_gt(inv, wx, wy)
    np.testing.assert_allclose(px2, px, atol=1e-9)
    np.testing.assert_allclose(py2, py, atol=1e-9)


SQUARE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
CONCAVE = np.array(  # L-shape
    [[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]], dtype=float
)


def test_pip_square():
    xs = np.array([5.0, -1.0, 10.5, 9.9, 0.1])
    ys = np.array([5.0, 5.0, 5.0, 9.9, 0.1])
    np.testing.assert_array_equal(
        geo.point_in_polygon(xs, ys, SQUARE), [True, False, False, True, True]
    )


def test_pip_concave():
    assert geo.point_in_polygon([2.0], [8.0], CONCAVE)[0]  # in the leg
    assert not geo.point_in_polygon([8.0], [8.0], CONCAVE)[0]  # in the notch
    assert geo.point_in_polygon([8.0], [2.0], CONCAVE)[0]


def test_fill_polygon_square():
    mask = geo.fill_polygon(SQUARE, 12, 12)
    assert mask[5, 5] == 255
    assert mask[11, 11] == 0
    assert mask[:10, :10].min() == 255  # pixel centers 0.5..9.5 all inside
    assert mask[10:, :].max() == 0 and mask[:, 10:].max() == 0


def test_fill_polygon_matches_pip_at_pixel_centers():
    h = w = 16
    mask = geo.fill_polygon(CONCAVE, h, w)
    yy, xx = np.mgrid[0:h, 0:w]
    pip = geo.point_in_polygon(xx.ravel() + 0.5, yy.ravel() + 0.5, CONCAVE).reshape(
        h, w
    )
    np.testing.assert_array_equal(mask > 0, pip)


def test_segments_intersect_rect():
    assert geo.segments_intersect_rect(SQUARE, 5, 5, 15, 15)  # edge crosses
    assert geo.segments_intersect_rect(SQUARE, 2, 2, 3, 3) is False  # rect inside, no edge
    assert not geo.segments_intersect_rect(SQUARE, 20, 20, 30, 30)


def test_polygon_dist2():
    d2 = geo.polygon_dist2_to_points([5.0, 15.0, -3.0], [5.0, 5.0, 5.0], SQUARE)
    np.testing.assert_allclose(d2, [25.0, 25.0, 9.0])


def test_cell_of_merc_matches_tile():
    mx, my = np.array([1.0e6, -2.0e6]), np.array([3.0e6, 1.0e5])
    cells = geo.cell_of_merc(mx, my, 6)
    z, x, y = tg.unpack_key(cells)
    tx, ty = tg.merc_to_tile(mx, my, 6)
    np.testing.assert_array_equal(z, [6, 6])
    np.testing.assert_array_equal(x, tx)
    np.testing.assert_array_equal(y, ty)


def test_cover_ring_is_conservative_superset():
    # ring = one z=5 tile's bounds, shrunk slightly
    minx, miny, maxx, maxy = tg.tile_bounds_merc(5, 10, 12)
    eps = (maxx - minx) * 0.01
    ring = np.array(
        [
            [minx + eps, miny + eps],
            [maxx - eps, miny + eps],
            [maxx - eps, maxy - eps],
            [minx + eps, maxy - eps],
        ]
    )
    cells = geo.cover_ring_merc(ring, 5)
    assert int(tg.pack_key(5, 10, 12)) in set(int(c) for c in cells)
    # at a finer level the cover contains every interior cell
    cells7 = set(int(c) for c in geo.cover_ring_merc(ring, 7))
    interior = tg.pack_key(7, 10 * 4 + 2, 12 * 4 + 2)
    assert int(interior) in cells7


def _coverage():
    rings = [
        np.array([[0.0, 0.0], [1e6, 0.0], [1e6, 1e6], [0.0, 1e6]]),
        np.array([[2e6, 0.0], [3e6, 0.0], [3e6, 1e6], [2e6, 1e6]]),
    ]
    return geo.CoverageIndex(["reg-a", "reg-b"], rings, level=6)


def test_coverage_assign():
    idx = _coverage()
    mx = np.array([5e5, 2.5e6, 1.5e6, 1.05e6])
    my = np.array([5e5, 5e5, 5e5, 5e5])
    out = idx.assign(mx, my)
    np.testing.assert_array_equal(out, [0, 1, -1, -1])
    # with kNN epsilon fallback the near-miss point (1.05e6) attaches to reg-a
    out2 = idx.assign(mx, my, knn_eps=1e5)
    np.testing.assert_array_equal(out2, [0, 1, -1, 0])


def test_coverage_knn():
    idx = _coverage()
    nn = idx.knn([4e5, 2.9e6], [5e5, 5e5], k=2)
    np.testing.assert_array_equal(nn[0], [0, 1])
    np.testing.assert_array_equal(nn[1], [1, 0])


def test_resampling_kernels_identity_on_aligned_grid():
    """All interpolating kernels reproduce the source exactly when the
    dest grid lands on source pixel centers (gt = identity, z chosen so
    res==1 is irrelevant — call _sample directly)."""
    from tilers_tools_ray import raster

    rng = np.random.default_rng(4)
    src = rng.integers(0, 256, (16, 16, 4)).astype(np.uint8)
    yy, xx = np.mgrid[0:16, 0:16]
    spx = xx + 0.5
    spy = yy + 0.5
    for kernel in ("nearest", "bilinear", "bicubic"):
        out, inb = raster._sample(src, spx.astype(float), spy.astype(float), kernel)
        assert inb.all()
        np.testing.assert_array_equal(out, src, err_msg=kernel)


def test_bicubic_smooth_between_pixels():
    from tilers_tools_ray import raster

    src = np.zeros((8, 8, 4), dtype=np.uint8)
    src[:, 4:, :3] = 200
    src[:, :, 3] = 255
    spx = np.array([[3.0, 3.5, 4.0]])
    spy = np.full((1, 3), 4.0)
    out, _ = raster._sample(src, spx, spy, "bicubic")
    # spx=3.5 is pixel-3's center (value 0); spx=4.0 is the midpoint
    # between pixel centers 3 and 4 → strictly between the two values
    assert out[0, 1, 0] == 0
    assert 0 < out[0, 2, 0] < 200


def test_fill_polygon_fast_equals_reference():
    """fill_polygon_fast (vectorized 2-crossing path + loop fallback)
    is bit-identical to the golden fill_polygon across random rings,
    including rings extending past the image on every side (the
    off-image span class that exposed the negative-slice wrap bug)."""
    import numpy as np

    from tilers_tools_ray import geometry as geo

    rng = np.random.default_rng(31)
    for _ in range(200):
        n = int(rng.integers(3, 10))
        ring = rng.uniform(-80, 336, (n, 2))
        a = geo.fill_polygon(ring, 256, 256)
        b = geo.fill_polygon_fast(ring, 256, 256)
        assert np.array_equal(a, b)
    # fully off-image ring fills nothing
    far = np.array([[-50.0, -50.0], [-10.0, -50.0], [-10.0, -10.0]])
    assert geo.fill_polygon(far, 64, 64).sum() == 0
    assert geo.fill_polygon_fast(far, 64, 64).sum() == 0
