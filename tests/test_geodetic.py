"""Geodetic (plate-carrée) profile: grid math, exact-alignment warp,
and the pyramid pipeline end-to-end (§2.10 profile registry — the
mercator/geodetic profile pair of gdal_tiler)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tilers_tools_ray import codecs, raster
from tilers_tools_ray import tilegrid as tg
from tilers_tools_ray.pipelines import pyramid
from tilers_tools_ray.stages import tiling


def test_geodetic_grid_math():
    assert tg.grid_dims("geodetic", 0) == (2, 1)
    assert tg.grid_dims("geodetic", 3) == (16, 8)
    res3 = tg.geodetic_resolution(3)
    assert res3 == 180.0 / (256 * 8)
    # world corners
    px, py = tg.lonlat_to_pixel_geodetic(-180.0, 90.0, 0)
    assert (px, py) == (0.0, 0.0)
    px, py = tg.lonlat_to_pixel_geodetic(180.0, -90.0, 0)
    assert (px, py) == (512.0, 256.0)
    # tile bounds roundtrip
    minlon, minlat, maxlon, maxlat = tg.tile_bounds_geodetic(3, 6, 2)
    assert (minlon, maxlat) == (-45.0, 45.0)
    assert maxlon - minlon == pytest.approx(22.5)
    xs, ys = tg.tiles_overlapping_bbox_geodetic(-45.0, 0.0, 0.0, 45.0, 3)
    assert set(zip(xs.tolist(), ys.tolist())) == {
        (x, y) for x in (6, 7) for y in (2, 3)
    }
    # auto zoom: source exactly at z3 resolution
    assert int(tg.auto_base_zoom_geodetic(tg.geodetic_resolution(3))) == 3


def _aligned_image(z=3, lon0=-45.0, lat0=45.0, size=512, seed=2):
    res = tg.geodetic_resolution(z)
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (size, size, 4)).astype(np.uint8)
    px[:, :, 3] = 255
    gt = [lon0, res, 0.0, lat0, 0.0, -res]
    return px, gt


def test_geodetic_exact_alignment_identity_warp():
    """A 4326 source laid exactly on geodetic tile boundaries at its
    native zoom: nearest warp is the identity — every base tile equals
    the corresponding source sub-block byte-for-byte."""
    z = 3
    px, gt = _aligned_image(z)
    xs, ys = raster.base_tiles_for_image(
        gt, 512, 512, "EPSG:4326", z, profile="geodetic"
    )
    assert set(zip(xs.tolist(), ys.tolist())) == {
        (x, y) for x in (6, 7) for y in (2, 3)
    }
    frags = {
        (x, y): f
        for zz, x, y, f in raster.emit_fragments_for_image(
            px, gt, "EPSG:4326", None, [z], profile="geodetic"
        )
    }
    assert set(frags) == {(x, y) for x in (6, 7) for y in (2, 3)}
    for (x, y), f in frags.items():
        sub = px[(y - 2) * 256 : (y - 1) * 256, (x - 6) * 256 : (x - 5) * 256]
        assert np.array_equal(f, sub), f"tile ({x},{y}) not identity"


def test_geodetic_mercator_source_projects():
    """A 3857 source through the geodetic profile: fragments land in
    the tiles covering the reprojected footprint, opaque where the
    source covers them."""
    z = 4
    # mercator square ~ (0..2e6)m in x/y
    gt = [0.0, 10000.0, 0.0, 2.0e6, 0.0, -10000.0]
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (200, 200, 4)).astype(np.uint8)
    px[:, :, 3] = 255
    out = list(
        raster.emit_fragments_for_image(
            px, gt, "EPSG:3857", None, [z], profile="geodetic"
        )
    )
    assert out
    lon_lo, lat_lo = tg.merc_to_lonlat(0.0, 0.0)
    lon_hi, lat_hi = tg.merc_to_lonlat(2.0e6, 2.0e6)
    exp_xs, exp_ys = tg.tiles_overlapping_bbox_geodetic(
        lon_lo, lat_lo, lon_hi, lat_hi, z
    )
    got = {(x, y) for _, x, y, _ in out}
    assert got <= set(zip(exp_xs.tolist(), exp_ys.tolist()))
    total_alpha = sum(int((f[:, :, 3] == 255).sum()) for _, _, _, f in out)
    # footprint area in dest pixels ≈ alpha-covered pixels (±20%: the
    # plate-carrée x-stretch is exact, y uses the mercator gradient)
    res = tg.geodetic_resolution(z)
    area = ((lon_hi - lon_lo) / res) * ((lat_hi - lat_lo) / res)
    assert 0.8 <= total_alpha / area <= 1.2


@pytest.fixture(scope="module")
def geodetic_images(tmp_path_factory):
    """Tiny images table: two exactly-aligned 4326 sources overlapping
    by one tile column (zorder decides the winner) + one 3857 source."""
    z = 3
    res = tg.geodetic_resolution(z)
    rows = []
    for i, (lon0, lat0) in enumerate([(-45.0, 45.0), (-22.5, 45.0)]):
        px, gt = _aligned_image(z, lon0, lat0, 512, seed=10 + i)
        rows.append(
            {
                "image_id": f"geo-{i}",
                "bytes": codecs.encode_png(px),
                "w": 512,
                "h": 512,
                "fmt": "png",
                "caption": f"cap-{i}",
                "gt": list(map(float, gt)),
                "srs": "EPSG:4326",
                "cutline_wkb": raster.wkb_polygon(
                    np.array([[0, 0], [512, 0], [512, 512], [0, 512]], float)
                ),
                "zorder": i,
            }
        )
    merc_px = np.full((128, 128, 4), 200, np.uint8)
    merc_px[:, :, 3] = 255  # opaque (fractional alpha would make
    # self-merge legitimately non-idempotent under Porter-Duff OVER)
    rows.append(
        {
            "image_id": "geo-merc",
            "bytes": codecs.encode_png(merc_px),
            "w": 128,
            "h": 128,
            "fmt": "png",
            "caption": "merc",
            "gt": [5.0e6, 20000.0, 0.0, 5.0e6, 0.0, -20000.0],
            "srs": "EPSG:3857",
            "cutline_wkb": raster.wkb_polygon(
                np.array([[0, 0], [128, 0], [128, 128], [0, 128]], float)
            ),
            "zorder": 2,
        }
    )
    tbl = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    path = str(tmp_path_factory.mktemp("geodetic") / "images.parquet")
    pq.write_table(tbl, path)
    return path, z


def test_geodetic_pyramid_e2e(ray_session, geodetic_images, tmp_path):
    images_path, z = geodetic_images
    assert pyramid.auto_zoom(images_path, profile="geodetic") == z
    out = str(tmp_path / "geo_pyr")
    summary = pyramid.write_pyramid(
        images_path, out, z_min=1, salt=False, profile="geodetic"
    )
    assert set(summary) == {1, 2, 3}
    df = pyramid.read_tiles(out, z=z).to_pandas()
    # image 0 covers x∈{6,7}, image 1 x∈{7,8} → overlap column x=7
    keys = set(zip(df["x"], df["y"]))
    assert {(x, y) for x in range(6, 9) for y in (2, 3)} <= keys
    by_xy = df.set_index(["x", "y"])
    px1, _ = _aligned_image(z, -22.5, 45.0, 512, seed=11)
    for y in (2, 3):
        # overlap tile: image 1 (zorder 1, left half) painted over image 0
        t = tiling.unpack_pixels(by_xy.loc[(7, y), "pixels"])
        sub = px1[(y - 2) * 256 : (y - 1) * 256, 0:256]
        assert np.array_equal(t, sub)
        # caption policy (M10): max-coverage tie → smallest image_id
        assert by_xy.loc[(7, y), "caption"] == "cap-0"
        # exclusive tile: image 1 right half, identity warp
        t = tiling.unpack_pixels(by_xy.loc[(8, y), "pixels"])
        sub = px1[(y - 2) * 256 : (y - 1) * 256, 256:512]
        assert np.array_equal(t, sub)
    # grid bounds respected at every level
    for zz in (1, 2, 3):
        lvl = pyramid.read_tiles(out, z=zz).to_pandas()
        nx, ny = tg.grid_dims("geodetic", zz)
        assert lvl["x"].between(0, nx - 1).all()
        assert lvl["y"].between(0, ny - 1).all()
    # resume no-op
    assert pyramid.write_pyramid(
        images_path, out, z_min=1, salt=False, profile="geodetic"
    ) == summary


def test_resume_profile_mismatch_raises(ray_session, geodetic_images, tmp_path):
    """Resuming an output dir with different grid parameters must fail
    loudly instead of silently mixing tile grids."""
    images_path, z = geodetic_images
    out = str(tmp_path / "guard_pyr")
    pyramid.write_pyramid(images_path, out, z_min=2, salt=False, profile="geodetic")
    with pytest.raises(ValueError, match="resume parameter mismatch"):
        pyramid.write_pyramid(
            images_path, out, z_min=2, salt=False, profile="mercator"
        )
    with pytest.raises(ValueError, match="resume parameter mismatch"):
        pyramid.write_pyramid(
            images_path, out, z_min=1, salt=False, profile="geodetic"
        )


def test_geodetic_merge_and_tree_roundtrip(ray_session, geodetic_images, tmp_path):
    """Tile-set machinery is profile-agnostic: merging a geodetic
    pyramid with itself is identity; tms tree export/import round-trips
    (geodetic ny=2^z matches the tms y-flip domain)."""
    from tilers_tools_ray.pipelines import tileset

    images_path, z = geodetic_images
    out = str(tmp_path / "gp")
    pyramid.write_pyramid(images_path, out, z_min=2, salt=False, profile="geodetic")
    tiles = pyramid.read_tiles(out, z=z)
    merged = tileset.merge_tilesets([tiles, tiles]).to_pandas()
    orig = tiles.to_pandas()
    assert sorted(merged["tile_key"]) == sorted(orig["tile_key"])
    a = orig.set_index("tile_key")
    for row in merged.itertuples(index=False):
        assert np.array_equal(
            tiling.unpack_pixels(a.loc[row.tile_key, "pixels"]),
            tiling.unpack_pixels(row.pixels),
        )
    root = str(tmp_path / "gtree")
    meta = tileset.export_tree(tiles, root, layout="tms", fmt="png")
    assert meta["n_tiles"] == len(orig)
    back = tileset.decode_tree_tiles(
        tileset.read_tile_tree(root, layout="tms")
    ).to_pandas()
    assert sorted(back["tile_key"]) == sorted(orig["tile_key"])
