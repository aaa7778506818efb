"""Edge-case behavior: off-world footprints, total cutline masks,
empty inputs, degenerate polygons."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tilers_tools_ray import corpus, raster
from tilers_tools_ray import geometry as geo
from tilers_tools_ray import tilegrid as tg


def _pixels(h=64, w=64):
    px = np.full((h, w, 4), 200, dtype=np.uint8)
    px[:, :, 3] = 255
    return px


def test_fragment_emit_off_world_clamps():
    """Footprint straddling the world edge: window clamps, no crash,
    only in-world tiles emitted."""
    px = _pixels()
    res = tg.resolution(6)
    gt = np.array([tg.ORIGIN - 10 * res, res, 0.0, tg.ORIGIN - 10 * res, 0.0, -res])
    frags = list(raster.emit_fragments_for_image(px, gt, "EPSG:3857", None, [6]))
    assert frags  # the in-world part still tiles
    n = 1 << 6
    for z, x, y, _ in frags:
        assert 0 <= x < n and 0 <= y < n


def test_fragment_emit_fully_off_world():
    px = _pixels()
    res = tg.resolution(6)
    gt = np.array([tg.ORIGIN * 2, res, 0.0, 0.0, 0.0, -res])  # beyond east edge
    frags = list(raster.emit_fragments_for_image(px, gt, "EPSG:3857", None, [6]))
    assert frags == []


def test_cutline_masks_everything():
    """A cutline fully outside the frame yields zero fragments."""
    px = _pixels()
    res = tg.resolution(7)
    gt = np.array([0.0, res, 0.0, 0.0, 0.0, -res])
    cutline = np.array([[-50.0, -50.0], [-40.0, -50.0], [-40.0, -40.0], [-50.0, -40.0]])
    frags = list(raster.emit_fragments_for_image(px, gt, "EPSG:3857", cutline, [7]))
    assert frags == []


def test_degenerate_polygon_fill_and_pip():
    line = np.array([[0.0, 0.0], [10.0, 0.0]])  # zero-area "ring"
    assert not geo.point_in_polygon([5.0], [0.0], line)[0]
    mask = geo.fill_polygon(line, 8, 12)
    assert mask.sum() == 0


def test_auto_zoom_empty_table(ray_session, tmp_path):
    from tilers_tools_ray.pipelines import pyramid

    empty = corpus.rows_to_table([])
    path = str(tmp_path / "empty.parquet")
    pq.write_table(empty, path)
    with pytest.raises(ValueError, match="empty images table"):
        pyramid.auto_zoom(path)


def test_singular_geotransform_rejected():
    with pytest.raises(ValueError, match="singular"):
        geo.invert_gt(np.array([0.0, 1.0, 2.0, 0.0, 2.0, 4.0]))


def test_wkb_roundtrip_preserves_ring():
    ring = np.array([[0.5, 1.5], [10.25, 1.5], [5.0, 9.75]])
    out = raster.parse_wkb_polygon(raster.wkb_polygon(ring))
    np.testing.assert_array_equal(out, ring)


def test_caption_unicode_and_empty_survive(ray_session, tmp_path):
    """Byte-equality invariant: non-ASCII and empty captions ride
    through the full pipeline untouched."""
    from tilers_tools_ray.pipelines import pyramid

    paths = corpus.generate(str(tmp_path / "c"), n_rows=60, seed=3)
    src = pq.read_table(paths["images"], columns=["caption"])
    captions = set(src.column("caption").to_pylist())
    assert "" in captions or any("一" <= ch <= "鿿" for c in captions for ch in c)
    tiles = pyramid.base_tiles(paths["images"]).to_pandas()
    assert set(tiles["caption"]) <= captions


def test_resume_without_job_meta_refuses(tmp_path):
    """A pre-guard output dir (committed levels, no job.json) must not
    silently adopt the caller's grid parameters on resume."""
    import os

    from tilers_tools_ray.state import lineage

    out = str(tmp_path / "legacy_out")
    os.makedirs(lineage.lineage_dir(out, 5), exist_ok=True)
    with open(
        os.path.join(lineage.lineage_dir(out, 5), "part_0000.json"), "w"
    ) as f:
        f.write("{}")
    with pytest.raises(ValueError, match="job.json"):
        lineage.check_job_meta(out, {"profile": "mercator"})
    # a genuinely fresh dir records the caller's params as ground truth
    fresh = str(tmp_path / "fresh_out")
    meta = lineage.check_job_meta(fresh, {"profile": "mercator"})
    assert meta == {"profile": "mercator"}
