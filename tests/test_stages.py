"""Stage tests: spatial join vs golden/duckdb counts, georef parser
recovery, tileset merge/convert/export/import roundtrips."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tilers_tools_ray import golden, raster
from tilers_tools_ray import tilegrid as tg
from tilers_tools_ray.pipelines import pyramid, tileset
from tilers_tools_ray.stages import georef, spatial, tiling


@pytest.fixture(scope="module")
def tables(tiny_corpus):
    return (
        pq.read_table(tiny_corpus["images"]),
        pq.read_table(tiny_corpus["coverage"]),
    )


def test_spatial_join_matches_golden(ray_session, tiny_corpus, tables):
    images_tbl, coverage_tbl = tables
    gold = sorted(golden.spatial_join(images_tbl, coverage_tbl, knn_eps=5e4))
    ds = pyramid.images_dataset(
        tiny_corpus["images"], columns=["image_id", "w", "h", "gt", "srs"]
    )
    out = spatial.spatial_join(ds, coverage_tbl, knn_eps=5e4).to_pandas()
    engine = sorted(zip(out["image_id"], out["region_id"]))
    assert engine == gold  # join output rows EXACT (BASELINE.json:14)


def test_spatial_join_variants(ray_session, tiny_corpus, tables):
    images_tbl, coverage_tbl = tables
    n = images_tbl.num_rows
    ds = pyramid.images_dataset(
        tiny_corpus["images"], columns=["image_id", "w", "h", "gt", "srs"]
    )
    inner = spatial.spatial_join(ds, coverage_tbl, how="inner").count()
    left = spatial.spatial_join(ds, coverage_tbl, how="left").count()
    semi = spatial.spatial_join(ds, coverage_tbl, how="semi").count()
    anti = spatial.spatial_join(ds, coverage_tbl, how="anti").count()
    assert left == n
    assert semi + anti == n
    assert inner == semi  # centroid join is 1:≤1 (first-match PIP)


def test_knn_stage(ray_session, tiny_corpus, tables):
    _, coverage_tbl = tables
    ds = pyramid.images_dataset(
        tiny_corpus["images"], columns=["image_id", "w", "h", "gt", "srs"]
    )
    import ray

    ref = ray.put(coverage_tbl)
    out = ds.map_batches(
        spatial.NearestRegion,
        fn_constructor_kwargs={"coverage_ref": ref, "k": 3},
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    assert len(out) == 3 * ds.count()
    assert set(out["rank"]) == {0, 1, 2}
    # rank-0 assignment is deterministic: re-run equals itself
    out2 = ds.map_batches(
        spatial.NearestRegion,
        fn_constructor_kwargs={"coverage_ref": ref, "k": 3},
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    a = out.sort_values(["image_id", "rank"]).reset_index(drop=True)
    b = out2.sort_values(["image_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_georef_parser_recovers_gt(ray_session, tiny_corpus, tables):
    images_tbl, _ = tables
    ds = pyramid.images_dataset(
        tiny_corpus["images"], columns=["image_id", "georef_text"]
    )
    parsed = georef.attach_parsed_georef(ds).to_pandas().set_index("image_id")
    ids = images_tbl.column("image_id").to_pylist()
    gts = images_tbl.column("gt").to_pylist()
    srss = images_tbl.column("srs").to_pylist()
    cuts = images_tbl.column("cutline_wkb").to_pylist()
    n_shifted = 0
    for i, iid in enumerate(ids):
        row = parsed.loc[iid]
        np.testing.assert_allclose(row["gt_parsed"], gts[i], rtol=1e-6, atol=1e-6)
        assert row["srs_parsed"] == srss[i]
        ring_a = raster.parse_wkb_polygon(bytes(row["cutline_wkb_parsed"]))
        ring_b = raster.parse_wkb_polygon(cuts[i])
        np.testing.assert_allclose(ring_a, ring_b, atol=1e-3)
        n_shifted += row["datum"] != "WGS 84"
    assert n_shifted > 0  # the datum-table path was exercised


def test_georef_parser_rejects_garbage():
    with pytest.raises(ValueError):
        georef.parse_georef_text("not a sidecar")
    with pytest.raises(ValueError):
        georef.parse_georef_text(
            "OziExplorer Map Data File Version 2.2\nimg\nMARS-DATUM,EPSG:3857"
        )


@pytest.fixture(scope="module")
def base_tiles_df(ray_session, tiny_corpus):
    z_base = pyramid.auto_zoom(tiny_corpus["images"])
    ds = pyramid.base_tiles(tiny_corpus["images"], z_base=z_base).materialize()
    return z_base, ds, ds.to_pandas()


def test_merge_self_is_identity_pixels(ray_session, tiny_corpus, base_tiles_df):
    """Merging a tileset with itself: opaque-pixel sets identical,
    pixels unchanged wherever alpha is binary (self-over is idempotent
    for full alpha)."""
    z_base, ds_a, df = base_tiles_df
    merged = tileset.merge_tilesets([ds_a, ds_a]).to_pandas()
    assert sorted(merged["tile_key"]) == sorted(df["tile_key"])
    a = df.set_index("tile_key")
    for row in merged.itertuples(index=False):
        pa_ = tiling.unpack_pixels(a.loc[row.tile_key, "pixels"])
        pb = tiling.unpack_pixels(row.pixels)
        assert np.array_equal(pa_, pb)


def test_merge_priority(ray_session):
    """Second tileset paints over the first on collisions."""
    import ray.data as rd

    red = np.zeros((256, 256, 4), np.uint8)
    red[..., 0] = 255
    red[..., 3] = 255
    blue = np.zeros((256, 256, 4), np.uint8)
    blue[..., 2] = 255
    blue[..., 3] = 255
    key = int(tg.pack_key(5, 3, 4))

    def one(pixels, cap):
        return rd.from_items(
            [
                {
                    "tile_key": key,
                    "z": 5,
                    "x": 3,
                    "y": 4,
                    "pixels": tiling.pack_pixels(pixels),
                    "caption": cap,
                    "src_ids": [cap],
                    "checksum": 0,
                    "part": 0,
                }
            ]
        )

    merged = tileset.merge_tilesets([one(red, "red"), one(blue, "blue")]).to_pandas()
    assert len(merged) == 1
    out = tiling.unpack_pixels(merged["pixels"][0])
    assert np.array_equal(out, blue)
    assert list(merged["src_ids"][0]) == ["red", "blue"]


def test_layout_paths_match_scalar_codec(ray_session):
    """Vectorized with_layout_paths (pyarrow binary_join chains) ≡ the
    scalar registry contract tg.coord_to_path, string-for-string —
    including sasplanet's z+1 / 1024-bucket arithmetic past the first
    bucket and tms's (2^z - 1 - y) flip at mixed zooms."""
    import itertools

    import pandas as pd
    import ray.data as rd

    coords = [
        (z, x, y)
        for z, x, y in itertools.product(
            [0, 1, 5, 11, 12], [0, 1, 1023, 1024, 2500], [0, 1, 1023, 1024, 2047]
        )
        if x < 2**z and y < 2**z
    ]
    df = pd.DataFrame(coords, columns=["z", "x", "y"])
    ds = rd.from_pandas(df)
    for layout in tg.TILE_LAYOUTS:
        for ext in ("png", "jpg"):
            got = (
                tileset.with_layout_paths(ds, layout=layout, ext=ext)
                .to_pandas()
                .sort_values(["z", "x", "y"])
            )
            expect = [
                tg.coord_to_path(z, x, y, layout=layout, ext=ext)
                for z, x, y in got[["z", "x", "y"]].itertuples(index=False)
            ]
            assert got["path"].tolist() == expect, layout


def test_convert_export_import_roundtrip(
    ray_session, tiny_corpus, base_tiles_df, tmp_path
):
    z_base, full_ds, df = base_tiles_df
    sub = df.head(20)
    keep = set(sub["tile_key"])
    ds = full_ds.filter(lambda row: row["tile_key"] in keep)
    # path codec column
    for layout in tg.TILE_LAYOUTS:
        p = tileset.with_layout_paths(ds, layout=layout).to_pandas()
        for row in p.itertuples(index=False):
            assert tg.path_to_coord(row.path, layout=layout) == (
                row.z,
                row.x,
                row.y,
            )
    # export a real tree (png) then read it back
    root = str(tmp_path / "tree")
    meta = tileset.export_tree(ds, root, layout="sasplanet", fmt="png")
    assert meta["n_tiles"] == len(sub)
    back = tileset.read_tile_tree(root, layout="sasplanet")
    back = tileset.decode_tree_tiles(back).to_pandas()
    assert sorted(back["tile_key"]) == sorted(sub["tile_key"])
    orig = sub.set_index("tile_key")
    for row in back.itertuples(index=False):
        a = tiling.unpack_pixels(orig.loc[row.tile_key, "pixels"])
        b = tiling.unpack_pixels(row.pixels)
        assert np.array_equal(a, b)  # png roundtrip byte-exact


def test_export_tree_skip_existing(ray_session, base_tiles_df, tmp_path):
    """--noclobber equivalent: a second export with skip_existing=True
    rewrites nothing (0 writes), keeps files byte-identical, and
    reports the same per-zoom stats (from the writer's own rows, no
    re-execution of the input pipeline)."""
    import os

    z_base, full_ds, df = base_tiles_df
    sub = df.head(12)
    keep = set(sub["tile_key"])
    ds = full_ds.filter(lambda row: row["tile_key"] in keep)
    root = str(tmp_path / "tree2")
    meta1 = tileset.export_tree(ds, root, layout="xyz", fmt="png")
    assert meta1["n_written"] == len(sub) and meta1["n_skipped"] == 0
    mtimes = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".png"):
                p = os.path.join(dirpath, f)
                mtimes[p] = os.stat(p).st_mtime_ns
    meta2 = tileset.export_tree(ds, root, layout="xyz", fmt="png", skip_existing=True)
    assert meta2["n_written"] == 0 and meta2["n_skipped"] == len(sub)
    assert meta2["zooms"] == meta1["zooms"]
    for p, m in mtimes.items():
        assert os.stat(p).st_mtime_ns == m, f"rewritten: {p}"


def test_read_level_ignores_stale_tmp(ray_session, tiny_corpus, tmp_path):
    """A crashed writer's part-*.parquet.tmp.<pid> files must be
    invisible to resume/stats reads (file_extensions guard)."""
    import os

    from tilers_tools_ray.pipelines import pyramid

    out = str(tmp_path / "pyr")
    pyramid.write_pyramid(tiny_corpus["images"], out, z_min=6, salt=False)
    z = max(
        int(d.split("=")[1]) for d in os.listdir(os.path.join(out, "tiles"))
    )
    n_before = pyramid.read_tiles(out, z=z).count()
    stale = os.path.join(out, "tiles", f"z={z}", "part-9.parquet.tmp.12345")
    with open(stale, "wb") as f:
        f.write(b"truncated-not-parquet")
    assert pyramid.read_tiles(out, z=z).count() == n_before


def test_tileset_stats(ray_session, base_tiles_df):
    z_base, ds, df = base_tiles_df
    stats = tileset.tileset_stats(ds).to_pandas()
    assert len(stats) == 1
    assert int(stats["n_tiles"][0]) == len(df)
    assert int(stats["min_x"][0]) == df["x"].min()
    assert int(stats["max_y"][0]) == df["y"].max()


def test_tile_bounds_table(ray_session, base_tiles_df):
    from tilers_tools_ray import tilegrid as tg

    z_base, ds, df = base_tiles_df
    out = tileset.tile_bounds_table(ds).to_pandas().head(10)
    for row in out.itertuples(index=False):
        minx, miny, maxx, maxy = tg.tile_bounds_merc(row.z, row.x, row.y)
        assert abs(row.minx - minx) < 1e-6 and abs(row.maxy - maxy) < 1e-6


def test_geo_parser_and_registry(tiny_corpus):
    """S4: ChartWorld .geo grammar — GCP solve, datum shift, border
    ring, registry dispatch via sniffing."""
    import numpy as np

    from tilers_tools_ray.stages import georef

    gt_true = [500000.0, 10.0, 0.0, 250000.0, 0.0, -10.0]
    from tilers_tools_ray import geometry as geo

    px = np.array([0.0, 800.0, 800.0, 0.0])
    py = np.array([0.0, 0.0, 600.0, 600.0])
    wx, wy = geo.apply_gt(np.array(gt_true), px, py)
    shift = georef.DATUM_TABLE["FAKE-SHIFTED"]
    lines = [";ChartWorld .geo", "Bitmap = chart01.png", "Datum = FAKE-SHIFTED",
             "Projection = EPSG:3857"]
    for i in range(4):
        lines.append(
            f"Point0{i + 1} = {px[i]}, {py[i]}, "
            f"{wx[i] + shift[0]}, {wy[i] + shift[1]}"
        )
    lines += [f"Vertex0{i + 1} = {vx}, {vy}"
              for i, (vx, vy) in enumerate([(0, 0), (800, 0), (800, 600), (0, 600)])]
    text = "\n".join(lines)
    assert georef.sniff_format(text) == "geo"
    gt, srs, ring, datum, poly = georef.parse_georef_any(text)
    assert srs == "EPSG:3857" and datum == "FAKE-SHIFTED"
    assert np.allclose(gt, gt_true, atol=1e-6)
    assert ring.shape == (4, 2)
    # malformed: too few GCPs
    import pytest

    with pytest.raises(ValueError):
        georef.parse_geo_header("Bitmap = x.png\nPoint01 = 0,0,1,1")


def test_unknown_srs_raises():
    """raster must fail loudly on an SRS it cannot project rather than
    silently treating it as mercator meters."""
    import numpy as np
    import pytest

    from tilers_tools_ray import raster

    gt = [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]
    # UTM (EPSG:326xx) and the lcc/aea conics (incl. EPSG:2154) are
    # implemented via proj.py; sinusoidal/LAEA remain unprojectable
    with pytest.raises(ValueError, match="unsupported srs"):
        raster.footprint_bbox_merc(gt, 10, 10, "EPSG:3035")
    with pytest.raises(ValueError, match="unsupported srs"):
        raster._source_coords(gt, "ESRI:54008", 5, np.arange(4), np.arange(4))


def test_export_tree_ozf_roundtrip(ray_session, base_tiles_df, tmp_path):
    """Tree export/import with the OZF container format: fmt column
    sniffs OZF4 and tiles decode back (palette-lossy vs the RGBA tile,
    alpha preserved as opaque)."""
    from tilers_tools_ray import codecs

    z_base, full_ds, df = base_tiles_df
    sub = df.head(6)
    keep = set(sub["tile_key"])
    ds = full_ds.filter(lambda row: row["tile_key"] in keep)
    root = str(tmp_path / "ozf_tree")
    meta = tileset.export_tree(ds, root, layout="xyz", fmt="ozf")
    assert meta["n_tiles"] == len(sub)
    back = tileset.read_tile_tree(root, layout="xyz").to_pandas()
    assert set(back["fmt"]) == {"ozf"}
    dec = tileset.decode_tree_tiles(
        tileset.read_tile_tree(root, layout="xyz")
    ).to_pandas()
    orig = sub.set_index("tile_key")
    for row in dec.itertuples(index=False):
        a = tiling.unpack_pixels(orig.loc[row.tile_key, "pixels"])
        b = tiling.unpack_pixels(row.pixels)
        # palette quantization: alpha binary-preserved, RGB close
        assert np.array_equal(a[:, :, 3] > 0, b[:, :, 3] > 0)
        opaque = a[:, :, 3] > 0
        if opaque.any():
            assert codecs.psnr(a[opaque][:, :3], b[opaque][:, :3]) >= 20.0


def test_dms_points_and_scalar():
    """§2.8 DMS→decimal scalar + the Ozi DMS Point record variant."""
    from tilers_tools_ray.stages import georef

    assert georef.dms_to_deg(40, 26.232) == pytest.approx(40.4372)
    assert georef.dms_to_deg(79, 58.93, hemi="W") == pytest.approx(-79.98216667)
    assert georef.dms_to_deg(12, 30, 36, hemi="S") == pytest.approx(-12.51)
    # a DMS-form sidecar solves to the same affine as its decimal twin
    lines = [
        "OziExplorer Map Data File Version 2.2",
        "chart",
        "WGS 84,EPSG:4326",
        "Point01,xy,0.0,0.0,dms,41,0.0,N,10,0.0,W",
        "Point02,xy,100.0,0.0,dms,41,0.0,N,9,30.0,W",
        "Point03,xy,100.0,100.0,dms,40,30.0,N,9,30.0,W",
        "Point04,xy,0.0,100.0,dms,40,30.0,N,10,0.0,W",
    ]
    gt, srs, ring, datum, poly = georef.parse_georef_text("\n".join(lines))
    assert srs == "EPSG:4326" and datum == "WGS 84"
    import numpy as np

    np.testing.assert_allclose(
        gt, [-10.0, 0.005, 0.0, 41.0, 0.0, -0.005], atol=1e-9
    )


def test_lanczos_resampling_kernel():
    """Lanczos-3 kernel: identity at integer-aligned samples, bounded
    output, and sharper than bilinear on an edge."""
    import numpy as np

    from tilers_tools_ray import raster

    rng = np.random.default_rng(5)
    src = rng.integers(0, 256, (40, 40, 4)).astype(np.uint8)
    src[:, :, 3] = 255
    # exact pixel centers → near-identity
    gy, gx = np.mgrid[5:15, 5:15]
    spx = (gx + 0.5).astype(np.float64)
    spy = (gy + 0.5).astype(np.float64)
    out, inb = raster._sample(src, spx, spy, "lanczos")
    assert inb.all()
    assert np.max(np.abs(out[:, :, :3].astype(int) - src[5:15, 5:15, :3].astype(int))) <= 1
    # a step edge: output bounded, midpoint near 50%, far sides exact
    edge = np.zeros((16, 16, 4), np.uint8)
    edge[:, 8:, :3] = 255
    edge[:, :, 3] = 255
    xs = np.linspace(4.0, 12.0, 65)[None, :]
    ys = np.full((1, 65), 8.0)
    lz, _ = raster._sample(edge, xs, ys, "lanczos")
    v = lz[0, :, 0].astype(int)
    assert 100 <= v[32] <= 155  # x=8.0 → ~half
    assert (v[:8] <= 30).all() and (v[-8:] >= 225).all()


def test_zonal_stats_matches_sequential(ray_session):
    """Distributed zonal statistics ≡ a sequential from-the-spec loop
    over the same rows (decode → ring→pixel transform → even-odd fill
    → masked int sums), for every region, exactly."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from tilers_tools_ray import codecs, corpus
    from tilers_tools_ray import geometry as geo
    from tilers_tools_ray.relational import ops
    from tilers_tools_ray.stages import spatial

    paths = corpus.generate("/tmp/ttr_zonal_t1", scale="tiny", n_rows=60, seed=77)
    imgs = pq.read_table(paths["images"])
    cov = pq.read_table(paths["coverage"])

    # sequential reference
    acc = {}
    cols = {c: imgs.column(c).to_pylist() for c in ("image_id", "bytes", "fmt", "w", "h", "gt", "srs")}
    rings = [
        (rid, np.asarray(r, dtype=np.float64))
        for rid, r in zip(cov.column("region_id").to_pylist(), cov.column("ring_xy").to_pylist())
    ]
    for i in range(imgs.num_rows):
        if cols["srs"][i] != "EPSG:3857":
            continue
        gt = cols["gt"][i]
        w, h = cols["w"][i], cols["h"][i]
        x0, x1 = gt[0], gt[0] + gt[1] * w
        y1, y0 = gt[3], gt[3] + gt[5] * h
        rgba = codecs.decode_image(cols["bytes"][i], cols["fmt"][i])
        for rid, ring in rings:
            if ring[:, 0].max() < x0 or ring[:, 0].min() > x1:
                continue
            if ring[:, 1].max() < y0 or ring[:, 1].min() > y1:
                continue
            px = np.stack(
                [(ring[:, 0] - gt[0]) / gt[1], (ring[:, 1] - gt[3]) / gt[5]], axis=1
            )
            sel = (geo.fill_polygon(px, h, w) > 0) & (rgba[:, :, 3] > 0)
            n = int(sel.sum())
            if not n:
                continue
            s = acc.setdefault(rid, [0, 0, 0, 0])
            ps = rgba[sel].astype(np.int64).sum(axis=0)
            s[0] += n; s[1] += int(ps[0]); s[2] += int(ps[1]); s[3] += int(ps[2])

    import pyarrow.compute as pc

    images_ds = rd.read_parquet(
        paths["images"], columns=["image_id", "bytes", "fmt", "w", "h", "gt", "srs"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t.column("srs"), "EPSG:3857")),
        batch_format="pyarrow",
    )
    got = (
        ops.grouped_sum_cb(
            spatial.zonal_stats(images_ds, cov).map_batches(
                lambda b: b, batch_format="pandas"
            ),
            ["region_id"],
            ["n_px", "sum_r", "sum_g", "sum_b"],
        )
        .to_pandas()
        .sort_values("region_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(acc)
    for _, row in got.iterrows():
        exp = acc[row["region_id"]]
        assert [row["n_px"], row["sum_r"], row["sum_g"], row["sum_b"]] == exp, row["region_id"]


def test_diff_tilesets(ray_session):
    """diff_tilesets labels added/removed/changed tiles and drops
    identical ones — verified against a pandas reference on synthetic
    key/checksum tables, including an all-same (empty-diff) pair."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tilers_tools_ray.pipelines import tileset

    rng = np.random.default_rng(23)
    n = 3000
    keys = np.arange(n, dtype=np.int64)
    z = np.full(n, 7, dtype=np.int64)
    x, y = keys % 128, keys // 128
    ck_a = rng.integers(0, 2**32, n)
    a = pd.DataFrame({"tile_key": keys, "z": z, "x": x, "y": y, "checksum": ck_a})
    # b: drop 50 (removed), add 60 new (added), change 40 checksums
    b = a.iloc[50:].copy()
    chg = b.index[:40]
    b.loc[chg, "checksum"] = b.loc[chg, "checksum"] + 1
    extra = pd.DataFrame(
        {
            "tile_key": np.arange(n, n + 60, dtype=np.int64),
            "z": 7, "x": 0, "y": 0,
            "checksum": rng.integers(0, 2**32, 60),
        }
    )
    b = pd.concat([b, extra], ignore_index=True)

    got = (
        tileset.diff_tilesets(
            rd.from_pandas(a).repartition(5), rd.from_pandas(b).repartition(4)
        )
        .to_pandas()
        .sort_values("tile_key")
        .reset_index(drop=True)
    )
    counts = got["status"].value_counts().to_dict()
    assert counts == {"removed": 50, "changed": 40, "added": 60}, counts
    assert set(got.loc[got["status"] == "removed", "tile_key"]) == set(range(50))
    assert set(got.loc[got["status"] == "added", "tile_key"]) == set(range(n, n + 60))

    # identical sets → empty diff (and the empty-bucket path is typed)
    same = tileset.diff_tilesets(
        rd.from_pandas(a).repartition(3), rd.from_pandas(a).repartition(6)
    ).to_pandas()
    assert len(same) == 0


def test_map_tiles_algebra(ray_session, tmp_path):
    """map_tiles applies the registered pixel transform per tile:
    invert∘invert restores the original checksums exactly; grayscale
    leaves r=g=b with alpha untouched."""
    import numpy as np
    import pandas as pd

    from tilers_tools_ray import corpus
    from tilers_tools_ray.pipelines import pyramid, tileset
    from tilers_tools_ray.stages import tiling as tl

    paths = corpus.generate(str(tmp_path / "c"), n_rows=12, seed=13)
    out = str(tmp_path / "p")
    pyramid.write_pyramid(paths["images"], out, z_min=7, salt=False)
    tiles = pyramid.read_tiles(out)
    orig = tiles.select_columns(["tile_key", "checksum"]).to_pandas()

    inv = tileset.map_tiles(tiles, "invert")
    inv2 = tileset.map_tiles(inv, "invert")
    back = inv2.select_columns(["tile_key", "checksum"]).to_pandas()
    pd.testing.assert_frame_equal(
        orig.sort_values("tile_key").reset_index(drop=True),
        back.sort_values("tile_key").reset_index(drop=True),
    )
    # inversion changes at least some checksums
    ichk = inv.select_columns(["tile_key", "checksum"]).to_pandas()
    merged = orig.merge(ichk, on="tile_key", suffixes=("_a", "_b"))
    assert (merged["checksum_a"] != merged["checksum_b"]).any()

    g = tileset.map_tiles(tiles, "grayscale").limit(3).to_pandas()
    for buf in g["pixels"]:
        px = tl.unpack_pixels(buf)
        assert np.array_equal(px[:, :, 0], px[:, :, 1])
        assert np.array_equal(px[:, :, 1], px[:, :, 2])
