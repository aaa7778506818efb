"""Unit tests for tilegrid math vs closed-form constants (SURVEY.md §5.1#1)."""

import numpy as np
import pytest

from tilers_tools_ray import tilegrid as tg


def test_origin_constant():
    assert tg.ORIGIN == pytest.approx(20037508.342789244)


def test_resolution_halves_per_zoom():
    assert tg.resolution(0) == pytest.approx(2 * tg.ORIGIN / 256)
    for z in range(1, 20):
        assert tg.resolution(z) == pytest.approx(tg.resolution(z - 1) / 2)


def test_zoom0_world_tile():
    minx, miny, maxx, maxy = tg.tile_bounds_merc(0, 0, 0)
    assert minx == pytest.approx(-tg.ORIGIN)
    assert maxx == pytest.approx(tg.ORIGIN)
    assert miny == pytest.approx(-tg.ORIGIN)
    assert maxy == pytest.approx(tg.ORIGIN)


def test_lonlat_merc_roundtrip():
    lon = np.array([-180.0, -45.3, 0.0, 2.3486, 179.9])
    lat = np.array([-85.0, -12.25, 0.0, 48.85, 84.9])
    mx, my = tg.lonlat_to_merc(lon, lat)
    lon2, lat2 = tg.merc_to_lonlat(mx, my)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # known value: lon=180 → ORIGIN
    mx, _ = tg.lonlat_to_merc(180.0, 0.0)
    assert float(mx) == pytest.approx(tg.ORIGIN)


def test_pixel_roundtrip():
    z = 7
    mx = np.array([-1e7, 0.0, 5e6])
    my = np.array([3e6, -2e6, 0.0])
    px, py = tg.merc_to_pixel(mx, my, z)
    mx2, my2 = tg.pixel_to_merc(px, py, z)
    np.testing.assert_allclose(mx2, mx, atol=1e-6)
    np.testing.assert_allclose(my2, my, atol=1e-6)


def test_merc_to_tile_center_is_middle_tile():
    # (0,0) at zoom 1 lies at the corner of 4 tiles; nudge into tile (1,0)
    tx, ty = tg.merc_to_tile(1.0, 1.0, 1)
    assert (int(tx), int(ty)) == (1, 0)
    tx, ty = tg.merc_to_tile(-1.0, -1.0, 1)
    assert (int(tx), int(ty)) == (0, 1)


def test_key_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    z = rng.integers(0, 24, 1000)
    n = 1 << z
    x = (rng.random(1000) * n).astype(np.int64)
    y = (rng.random(1000) * n).astype(np.int64)
    key = tg.pack_key(z, x, y)
    z2, x2, y2 = tg.unpack_key(key)
    np.testing.assert_array_equal(z2, z)
    np.testing.assert_array_equal(x2, x)
    np.testing.assert_array_equal(y2, y)
    # keys sort by (z, x, y)
    order = np.lexsort((y, x, z))
    np.testing.assert_array_equal(np.sort(key), key[order])


def test_parent_key():
    k = tg.pack_key(5, 13, 27)
    pz, px, py = tg.unpack_key(tg.parent_key(k))
    assert (int(pz), int(px), int(py)) == (4, 6, 13)


def test_tms_flip_involution():
    z = np.array([3, 3, 7])
    y = np.array([0, 7, 100])
    y2 = tg.xyz_to_tms_y(z, tg.xyz_to_tms_y(z, y))
    np.testing.assert_array_equal(y2, y)


@pytest.mark.parametrize("layout", tg.TILE_LAYOUTS)
def test_path_codec_roundtrip(layout):
    for z, x, y in [(0, 0, 0), (5, 13, 27), (12, 4000, 1234)]:
        p = tg.coord_to_path(z, x, y, layout=layout)
        assert tg.path_to_coord(p, layout=layout) == (z, x, y)


def test_sasplanet_path_shape():
    assert tg.coord_to_path(12, 4000, 1234, layout="sasplanet") == (
        "z13/3/x4000/1/y1234.png"
    )


def test_tiles_overlapping_bbox():
    # a bbox exactly one tile wide at z=2
    minx, miny, maxx, maxy = tg.tile_bounds_merc(2, 1, 2)
    xs, ys = tg.tiles_overlapping_bbox(minx + 1, miny + 1, maxx - 1, maxy - 1, 2)
    assert list(xs) == [1] and list(ys) == [2]
    # bbox spanning 2x2 tiles
    xs, ys = tg.tiles_overlapping_bbox(minx + 1, miny + 1, maxx + 1, maxy + 1, 2)
    assert sorted(zip(xs.tolist(), ys.tolist())) == [(1, 1), (1, 2), (2, 1), (2, 2)]


def test_auto_base_zoom():
    # source resolution exactly res(8) → z=8; slightly finer → z=9
    r8 = tg.resolution(8)
    assert int(tg.auto_base_zoom(r8)) == 8
    assert int(tg.auto_base_zoom(r8 * 0.99)) == 9
    assert int(tg.auto_base_zoom(r8 * 1.01)) == 8


def test_parse_zoom_spec():
    assert tg.parse_zoom_spec("8:12,15") == [8, 9, 10, 11, 12, 15]
    assert tg.parse_zoom_spec("5") == [5]
    assert tg.parse_zoom_spec("3:5") == [3, 4, 5]
    assert tg.parse_zoom_spec(None, 2, 4) == [2, 3, 4]
    with pytest.raises(ValueError):
        tg.parse_zoom_spec("abc")
