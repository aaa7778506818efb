"""Raster (pixel-canvas) profile — gdal_tiler's third built-in profile
(`-p raster` [C semantics]): world units are canvas pixels (y down),
sources carry srs="PIXEL" with a gt in canvas pixels."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tilers_tools_ray import codecs, raster
from tilers_tools_ray import tilegrid as tg
from tilers_tools_ray.pipelines import pyramid
from tilers_tools_ray.stages import tiling


def test_raster_grid_math():
    rg = tg.RasterGrid(512, 512)
    assert rg.z_base == 1
    assert rg.resolution(1) == 1.0 and rg.resolution(0) == 2.0
    assert rg.dims(1) == (2, 2) and rg.dims(0) == (1, 1)
    # non-square, non-multiple canvas
    rg2 = tg.RasterGrid(1000, 300)
    assert rg2.z_base == 2  # 1000/256 → 4 tiles → z2
    assert rg2.dims(2) == (4, 2)
    assert rg2.dims(1) == (2, 1)
    xs, ys = rg2.tiles_overlapping_bbox(0.0, 0.0, 600.0, 300.0, 2)
    assert set(zip(xs.tolist(), ys.tolist())) == {
        (x, y) for x in (0, 1, 2) for y in (0, 1)
    }
    assert tg.profile_tag(rg2) == "raster:1000x300"
    assert tg.grid_dims(rg2, 2) == (4, 2)


def test_raster_identity_tiling():
    """A source placed 1:1 on the canvas: base tiles are byte-exact
    source sub-blocks (y down, no flip)."""
    rg = tg.RasterGrid(512, 512)
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (512, 512, 4)).astype(np.uint8)
    px[:, :, 3] = 255
    gt = [0.0, 1.0, 0.0, 0.0, 0.0, 1.0]  # identity, y down
    frags = {
        (x, y): f
        for _, x, y, f in raster.emit_fragments_for_image(
            px, gt, "PIXEL", None, [rg.z_base], profile=rg
        )
    }
    assert set(frags) == {(x, y) for x in (0, 1) for y in (0, 1)}
    for (x, y), f in frags.items():
        sub = px[y * 256 : (y + 1) * 256, x * 256 : (x + 1) * 256]
        assert np.array_equal(f, sub), (x, y)


def test_raster_profile_rejects_geo_srs():
    rg = tg.RasterGrid(512, 512)
    with pytest.raises(ValueError, match="PIXEL"):
        raster.base_tiles_for_image(
            [0, 1, 0, 0, 0, 1], 100, 100, "EPSG:3857", 1, profile=rg
        )


def test_raster_pyramid_e2e(ray_session, tmp_path):
    """Two PIXEL-srs sources on a 1024×512 canvas → pyramid to z0;
    base identity + overview box-downsample checks."""
    rg = tg.RasterGrid(1024, 512)
    assert rg.z_base == 2
    rng = np.random.default_rng(7)
    rows = []
    for i, x0 in enumerate([0.0, 512.0]):
        px = rng.integers(0, 256, (512, 512, 4)).astype(np.uint8)
        px[:, :, 3] = 255
        rows.append(
            {
                "image_id": f"ras-{i}",
                "bytes": codecs.encode_png(px),
                "w": 512,
                "h": 512,
                "fmt": "png",
                "caption": f"cap-{i}",
                "gt": [x0, 1.0, 0.0, 0.0, 0.0, 1.0],
                "srs": "PIXEL",
                "cutline_wkb": raster.wkb_polygon(
                    np.array([[0, 0], [512, 0], [512, 512], [0, 512]], float)
                ),
                "zorder": i,
            }
        )
    tbl = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    path = str(tmp_path / "images.parquet")
    pq.write_table(tbl, path)
    out = str(tmp_path / "pyr")
    summary = pyramid.write_pyramid(path, out, z_min=0, salt=False, profile=rg)
    assert set(summary) == {0, 1, 2}
    base = pyramid.read_tiles(out, z=2).to_pandas().set_index(["x", "y"])
    assert set(base.index) == {(x, y) for x in range(4) for y in (0, 1)}
    # identity check for image 1's tiles (x=2,3)
    px1 = codecs.decode_png(rows[1]["bytes"])
    for x in (2, 3):
        for y in (0, 1):
            t = tiling.unpack_pixels(base.loc[(x, y), "pixels"])
            sub = px1[y * 256 : (y + 1) * 256, (x - 2) * 256 : (x - 1) * 256]
            assert np.array_equal(t, sub)
    # z1 overview = 2×2 box of z0-level children
    z1 = pyramid.read_tiles(out, z=1).to_pandas().set_index(["x", "y"])
    kids = {
        (0, 0): base.loc[(0, 0), "pixels"],
        (1, 0): base.loc[(1, 0), "pixels"],
        (0, 1): base.loc[(0, 1), "pixels"],
        (1, 1): base.loc[(1, 1), "pixels"],
    }
    expect = raster.downsample_children(
        {k: tiling.unpack_pixels(v) for k, v in kids.items()}
    )
    got = tiling.unpack_pixels(z1.loc[(0, 0), "pixels"])
    assert np.array_equal(got, expect)
    # grid bounds at every level + resume no-op
    for zz in (0, 1, 2):
        lvl = pyramid.read_tiles(out, z=zz).to_pandas()
        nx, ny = rg.dims(zz)
        assert lvl["x"].between(0, nx - 1).all()
        assert lvl["y"].between(0, ny - 1).all()
    assert (
        pyramid.write_pyramid(path, out, z_min=0, salt=False, profile=rg)
        == summary
    )
