"""Order-2 polynomial GCP solve + warp (SURVEY.md §2 gap "non-affine
GCP solves"; upstream: GDAL polynomial warps via ``gdal_translate
-gcp -order 2`` in reader_backend.py::MapTranslator [R]).

Covers: exact solve recovery, the auto order selection in
solve_gcps/parsers, warp-path consistency with the affine path when
the GCPs ARE affine, and the distributed pipeline vs the golden tiler
byte-for-byte on a quadratically-warped source.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tilers_tools_ray import codecs, corpus, geometry as geo, golden, raster
from tilers_tools_ray import tilegrid as tg
from tilers_tools_ray.pipelines import pyramid
from tilers_tools_ray.stages import georef

Z_MIN = 5


def _true_quad(px, py):
    """Known ground-truth quadratic pixel→lonlat mapping (a gently
    warped scan near 10E 45N, ~0.005°/px with a few-pixel bow)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    lon = 10.0 + 0.005 * px + 2.0e-4 * py + 6.0e-6 * px * py - 4.0e-6 * py * py
    lat = 45.0 - 0.005 * py + 1.5e-4 * px + 5.0e-6 * px * px - 3.0e-6 * px * py
    return lon, lat


def _grid_gcps(w, h, n=4):
    gx, gy = np.meshgrid(np.linspace(0, w, n), np.linspace(0, h, n))
    px, py = gx.ravel(), gy.ravel()
    wx, wy = _true_quad(px, py)
    return px, py, wx, wy


def test_solve_poly2_exact_recovery():
    w = h = 128
    px, py, wx, wy = _grid_gcps(w, h)
    p = geo.solve_poly2(px, py, wx, wy)
    # off-GCP probes: fwd reproduces the true quadratic to float noise
    qx = np.array([13.7, 101.2, 55.5, 3.1])
    qy = np.array([77.7, 12.9, 90.0, 120.4])
    fx, fy = geo.apply_poly2_fwd(p, qx, qy)
    tx, ty = _true_quad(qx, qy)
    assert np.allclose(fx, tx, atol=1e-9) and np.allclose(fy, ty, atol=1e-9)
    # Newton-refined inverse: roundtrip to float noise
    ix, iy = geo.apply_poly2_inv(p, fx, fy)
    assert np.allclose(ix, qx, atol=1e-6) and np.allclose(iy, qy, atol=1e-6)
    # the raw fitted inverse (refine=0) carries visible model error —
    # the refinement is load-bearing
    rx, ry = geo.apply_poly2_inv(p, fx, fy, refine=0)
    assert np.abs(rx - qx).max() > 1e-4


def test_solve_poly2_needs_six():
    with pytest.raises(ValueError, match="6 GCPs"):
        geo.solve_poly2([0, 1, 2], [0, 1, 2], [0, 1, 2], [0, 1, 2])


def test_solve_gcps_auto_order():
    w = h = 100
    # affine-consistent GCPs: auto keeps poly None even with 16 points
    gxp, gyp = np.meshgrid(np.linspace(0, w, 4), np.linspace(0, h, 4))
    gt_true = np.array([10.0, 0.01, 0.001, 45.0, 0.0005, -0.01])
    wx, wy = geo.apply_gt(gt_true, gxp.ravel(), gyp.ravel())
    gt, poly = georef.solve_gcps(gxp.ravel(), gyp.ravel(), wx, wy)
    assert poly is None
    assert np.allclose(gt, gt_true, atol=1e-9)
    # warped GCPs: auto upgrades to order 2
    px, py, wx, wy = _grid_gcps(w, h)
    gt, poly = georef.solve_gcps(px, py, wx, wy)
    assert poly is not None and len(poly) == geo.POLY2_LEN
    # order=1 forces affine-only; order=2 forces poly even when affine
    _, p1 = georef.solve_gcps(px, py, wx, wy, order=1)
    assert p1 is None
    _, p2 = georef.solve_gcps(
        gxp.ravel(), gyp.ravel(), *geo.apply_gt(gt_true, gxp.ravel(), gyp.ravel()),
        order=2,
    )
    assert p2 is not None


def test_poly_warp_matches_affine_when_affine():
    """An order-2 record fit to affine GCPs reproduces the affine
    source-coordinate path (the quadratic terms vanish)."""
    w = h = 160
    gt = np.array([10.0, 0.004, 0.0, 45.0, 0.0, -0.004])
    gxp, gyp = np.meshgrid(np.linspace(0, w, 4), np.linspace(0, h, 4))
    wx, wy = geo.apply_gt(gt, gxp.ravel(), gyp.ravel())
    _, poly = georef.solve_gcps(gxp.ravel(), gyp.ravel(), wx, wy, order=2)
    z = 10
    gx0, gx1, gy0, gy1 = raster.dest_pixel_window(gt, w, h, "EPSG:4326", z)
    gx = np.arange(gx0, gx1, dtype=np.float64)
    gy = np.arange(gy0, gy1, dtype=np.float64)
    ax, ay = raster._source_coords(gt, "EPSG:4326", z, gx, gy)
    bx, by = raster._source_coords(gt, "EPSG:4326", z, gx, gy, poly=poly)
    assert np.allclose(ax, bx, atol=1e-2) and np.allclose(ay, by, atol=1e-2)


def test_ozi_sidecar_with_warped_gcps_gets_poly():
    px, py, wx, wy = _grid_gcps(128, 128, n=3)
    lines = ["OziExplorer Map Data File Version 2.2", "warped chart",
             "WGS 84,EPSG:4326"]
    for i in range(len(px)):
        lines.append(f"Point{i+1:02d},xy,{px[i]},{py[i]},world,{wx[i]},{wy[i]}")
    lines += ["MMPXY,1,0,0", "MMPXY,2,128,0", "MMPXY,3,128,128", "MMPXY,4,0,128"]
    gt, srs, ring, datum, poly = georef.parse_georef_text("\n".join(lines))
    assert srs == "EPSG:4326" and poly is not None
    fx, fy = geo.apply_poly2_fwd(poly, px, py)
    assert np.allclose(fx, wx, atol=1e-9) and np.allclose(fy, wy, atol=1e-9)
    # 3-GCP sidecars (the common case) still parse with poly None
    short = lines[:3] + lines[3:6] + lines[-4:]
    _, _, _, _, p0 = georef.parse_georef_text("\n".join(short))
    assert p0 is None


def test_kml_rotation_rotates_corners():
    kml = """<GroundOverlay><name>rot</name>
    <LatLonBox><north>46.0</north><south>44.0</south>
    <east>11.0</east><west>9.0</west><rotation>30</rotation></LatLonBox>
    <!-- size 200x100 --></GroundOverlay>"""
    gt, srs, ring, datum, poly = georef.parse_kml_groundoverlay(kml)
    assert poly is None
    # NW pixel corner (0,0) → the rotated NW corner
    th = np.radians(30.0)
    cx, cy = 10.0, 45.0
    dx, dy = 9.0 - cx, 46.0 - cy
    exp_x = cx + dx * np.cos(th) - dy * np.sin(th)
    exp_y = cy + dx * np.sin(th) + dy * np.cos(th)
    wx, wy = geo.apply_gt(gt, np.array([0.0]), np.array([0.0]))
    assert np.allclose([wx[0], wy[0]], [exp_x, exp_y], atol=1e-9)
    # rotation=0 keeps the old unrotated behavior
    gt0, *_ = georef.parse_kml_groundoverlay(kml.replace(">30<", ">0<"))
    wx0, wy0 = geo.apply_gt(gt0, np.array([0.0]), np.array([0.0]))
    assert np.allclose([wx0[0], wy0[0]], [9.0, 46.0], atol=1e-12)


def _poly_rows(seed=31, n=5):
    """Images whose true georef is quadratic: table carries the affine
    fit in ``gt`` plus the order-2 record in ``poly``."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w = h = int(rng.choice([96, 128]))
        # shift each chart's quadratic domain so footprints overlap
        # partially but not fully
        ox, oy = rng.uniform(-40, 40, 2)
        px, py, wx, wy = _grid_gcps(w, h, n=3)
        wx = wx + ox * 0.005
        wy = wy + oy * 0.005
        gt, poly = georef.solve_gcps(px, py, wx, wy, order=2)
        assert poly is not None
        pixels = corpus.synth_pixels(rng, h, w)
        fmt = str(rng.choice(["raw", "png"]))
        data = codecs.encode_image(pixels, fmt)
        ring = np.array([[0, 0], [w, 0], [w, h], [0, h]], dtype=np.float64)
        rows.append(
            {
                "image_id": f"poly-{i:04d}",
                "bytes": data,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": f"poly caption {i}",
                "phash": codecs.phash64(codecs.decode_image(data, fmt)),
                "gt": gt.tolist(),
                "srs": "EPSG:4326",
                "cutline_wkb": raster.wkb_polygon(ring),
                "zorder": i,
                "georef_text": "",
                "poly": poly.tolist(),
            }
        )
    return rows


def _poly_table(rows):
    fields = list(corpus.IMAGES_SCHEMA) + [pa.field("poly", pa.list_(pa.float64()))]
    schema = pa.schema(fields)
    cols = {f.name: [r[f.name] for r in rows] for f in schema}
    return pa.table(cols, schema=schema)


@pytest.fixture(scope="module")
def poly_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("poly_corpus")
    path = str(root / "images.parquet")
    pq.write_table(_poly_table(_poly_rows()), path)
    return path


def _tiles_to_dict(df):
    from tilers_tools_ray.stages.tiling import unpack_pixels

    return {
        int(r.tile_key): (unpack_pixels(r.pixels), r.caption, list(r.src_ids))
        for r in df.itertuples(index=False)
    }


def test_poly_pyramid_matches_golden(ray_session, poly_corpus, tmp_path):
    imgs = golden.load_images(poly_corpus)
    z_base = golden.auto_zoom(imgs)
    gold = golden.tile_pyramid(imgs, z_base=z_base, z_min=Z_MIN)
    out = str(tmp_path / "poly_pyr")
    pyramid.write_pyramid(poly_corpus, out, z_min=Z_MIN, salt="auto")
    for z in sorted({int(tg.unpack_key(k)[0]) for k in gold}):
        df = pyramid.read_tiles(out, z).to_pandas()
        engine = _tiles_to_dict(df)
        gkeys = {k for k in gold if int(tg.unpack_key(k)[0]) == z}
        assert set(engine) == gkeys, z
        for k in sorted(gkeys):
            ep, ec, es = engine[k]
            gp, gc, gs = gold[k]
            assert np.array_equal(ep, gp), (z, k)
            assert ec == gc and es == gs, (z, k)


def test_tables_without_poly_column_still_read(ray_session, tmp_path):
    """Pre-poly tables lack the column; the optional-column pruning
    must keep every existing pipeline running unchanged."""
    rows = _poly_rows(seed=7, n=2)
    for r in rows:
        r.pop("poly")
    path = str(tmp_path / "nopoly.parquet")
    pq.write_table(corpus.rows_to_table(rows), path)
    ds = pyramid.images_dataset(path)
    assert "poly" not in ds.schema().names
    assert ds.count() == 2
