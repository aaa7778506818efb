"""Order-3 polynomial and thin-plate-spline GCP warps (SURVEY.md §2
"non-affine GCP solves"; upstream: the full ``gdal_translate -gcp
-order 1|2|3`` / ``-tps`` surface in reader_backend.py::MapTranslator
[R]).

Covers: exact order-3 recovery, TPS GCP interpolation + Newton-refined
inverse, record-kind dispatch, the solve_gcps order parameter, the
chunked TPS evaluation path, and the distributed pipeline vs the
golden tiler byte-for-byte on a TPS-warped source.
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


def _true_cubic(px, py):
    """Ground-truth cubic pixel→lonlat mapping (a paper scan with a
    cubic bow near 10E 45N, ~0.005°/px)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    u, v = px / 100.0, py / 100.0
    lon = 10.0 + 0.5 * u + 0.02 * v + 6e-4 * u * v + 2e-4 * u**3 - 1e-4 * v**3
    lat = 45.0 - 0.5 * v + 0.015 * u + 5e-4 * u * u - 2e-4 * u * u * v
    return lon, lat


def _true_tps_like(px, py):
    """A smooth non-polynomial mapping (sinusoidal paper stretch) that
    no finite polynomial reproduces exactly."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    lon = 10.0 + 0.005 * px + 0.01 * np.sin(py / 25.0)
    lat = 45.0 - 0.005 * py + 0.008 * np.cos(px / 30.0)
    return lon, lat


def _grid_gcps(fn, w, h, n):
    gx, gy = np.meshgrid(np.linspace(0, w, n), np.linspace(0, h, n))
    px, py = gx.ravel(), gy.ravel()
    wx, wy = fn(px, py)
    return px, py, wx, wy


def test_solve_poly3_exact_recovery():
    px, py, wx, wy = _grid_gcps(_true_cubic, 128, 128, 4)
    p = geo.solve_poly3(px, py, wx, wy)
    assert len(p) == geo.POLY3_LEN
    qx = np.array([13.7, 101.2, 55.5, 3.1, 88.8])
    qy = np.array([77.7, 12.9, 90.0, 120.4, 44.4])
    fx, fy = geo.apply_gcp_fwd(p, qx, qy)
    tx, ty = _true_cubic(qx, qy)
    assert np.allclose(fx, tx, atol=1e-9) and np.allclose(fy, ty, atol=1e-9)
    ix, iy = geo.apply_gcp_inv(p, fx, fy)
    assert np.allclose(ix, qx, atol=1e-6) and np.allclose(iy, qy, atol=1e-6)
    # the raw fitted inverse carries model error orders of magnitude
    # above the Newton-refined one — the refinement is load-bearing
    rx, ry = geo.apply_gcp_inv(p, fx, fy, refine=0)
    raw_err = max(np.abs(rx - qx).max(), np.abs(ry - qy).max())
    ref_err = max(np.abs(ix - qx).max(), np.abs(iy - qy).max())
    assert raw_err > 100.0 * max(ref_err, 1e-12)


def test_poly3_beats_poly2_on_cubic():
    px, py, wx, wy = _grid_gcps(_true_cubic, 128, 128, 4)
    p2 = geo.solve_poly2(px, py, wx, wy)
    p3 = geo.solve_poly3(px, py, wx, wy)
    qx = np.linspace(5, 123, 25)
    qy = np.linspace(5, 123, 25)
    tx, ty = _true_cubic(qx, qy)
    e2 = np.abs(np.subtract(geo.apply_gcp_fwd(p2, qx, qy), (tx, ty))).max()
    e3 = np.abs(np.subtract(geo.apply_gcp_fwd(p3, qx, qy), (tx, ty))).max()
    assert e3 < e2 * 1e-3  # cubic terms are real, order-3 captures them


def test_solve_poly3_needs_ten():
    with pytest.raises(ValueError, match="10 GCPs"):
        geo.solve_poly(
            np.arange(9), np.arange(9), np.arange(9), np.arange(9), order=3
        )
    with pytest.raises(ValueError, match="order must be 2 or 3"):
        geo.solve_poly([0] * 12, [0] * 12, [0] * 12, [0] * 12, order=4)


def test_solve_tps_interpolates_and_inverts():
    px, py, wx, wy = _grid_gcps(_true_tps_like, 150, 150, 3)
    p = geo.solve_tps(px, py, wx, wy)
    n = len(px)
    assert len(p) == 8 * n + 21
    # TPS interpolates the GCPs exactly (polynomials of any order don't)
    fx, fy = geo.apply_gcp_fwd(p, px, py)
    assert np.allclose(fx, wx, atol=1e-9) and np.allclose(fy, wy, atol=1e-9)
    # inverse roundtrip over a dense grid: fwd(inv(w)) == w
    gx, gy = np.meshgrid(np.linspace(5, 145, 40), np.linspace(5, 145, 40))
    wxg, wyg = geo.apply_gcp_fwd(p, gx, gy)
    ix, iy = geo.apply_gcp_inv(p, wxg, wyg)
    assert ix.shape == gx.shape
    assert np.abs(ix - gx).max() < 1e-6 and np.abs(iy - gy).max() < 1e-6


def test_solve_tps_needs_four():
    with pytest.raises(ValueError, match="4 GCPs"):
        geo.solve_tps([0, 1, 2], [0, 1, 2], [0, 1, 2], [0, 1, 2])


def test_tps_chunked_evaluation_matches_unchunked(monkeypatch):
    """The internal (points × centers) chunking is a pure memory bound
    — forcing tiny chunks must not change a single output value."""
    px, py, wx, wy = _grid_gcps(_true_tps_like, 100, 100, 4)
    p = geo.solve_tps(px, py, wx, wy)
    qx = np.linspace(0, 100, 777)
    qy = np.linspace(100, 0, 777)
    full = geo.apply_gcp_fwd(p, qx, qy)
    inv_full = geo.apply_gcp_inv(p, *full)
    monkeypatch.setattr(geo, "_TPS_CHUNK_PAIRS", 64)
    tiny = geo.apply_gcp_fwd(p, qx, qy)
    inv_tiny = geo.apply_gcp_inv(p, *tiny)
    assert np.array_equal(full[0], tiny[0]) and np.array_equal(full[1], tiny[1])
    assert np.array_equal(inv_full[0], inv_tiny[0])
    assert np.array_equal(inv_full[1], inv_tiny[1])


def test_record_kind_dispatch():
    px, py, wx, wy = _grid_gcps(_true_cubic, 64, 64, 4)
    assert geo._record_kind(geo.solve_poly2(px, py, wx, wy)) == ("poly", 2)
    assert geo._record_kind(geo.solve_poly3(px, py, wx, wy)) == ("poly", 3)
    assert geo._record_kind(geo.solve_tps(px[:5], py[:5], wx[:5], wy[:5])) == (
        "tps",
        5,
    )
    with pytest.raises(ValueError, match="unrecognized"):
        geo._record_kind(np.zeros(40))


def test_solve_gcps_order_3_and_tps():
    px, py, wx, wy = _grid_gcps(_true_cubic, 128, 128, 4)
    _, p3 = georef.solve_gcps(px, py, wx, wy, order=3)
    assert p3 is not None and len(p3) == geo.POLY3_LEN
    _, pt = georef.solve_gcps(px, py, wx, wy, order="tps")
    assert pt is not None and len(pt) % 2 == 1
    # auto never escalates past order 2 on its own
    _, pa_ = georef.solve_gcps(px, py, wx, wy)
    assert pa_ is None or len(pa_) == geo.POLY2_LEN
    # parser threading: a warped Ozi sidecar solved as TPS
    lines = [
        "OziExplorer Map Data File Version 2.2",
        "warped chart",
        "WGS 84,EPSG:4326",
    ]
    for i in range(len(px)):
        lines.append(
            f"Point{i + 1:02d},xy,{px[i]},{py[i]},world,{wx[i]},{wy[i]}"
        )
    _, _, _, _, poly = georef.parse_georef_text(
        "\n".join(lines), order="tps"
    )
    assert poly is not None and geo._record_kind(poly)[0] == "tps"


def test_tps_warp_matches_affine_when_affine():
    """A TPS fit to affine GCPs reproduces the affine source-coordinate
    path (the spline weights vanish)."""
    w = h = 160
    gt = np.array([10.0, 0.004, 0.0, 45.0, 0.0, -0.004])
    gxp, gyp = np.meshgrid(np.linspace(0, w, 3), np.linspace(0, h, 3))
    wx, wy = geo.apply_gt(gt, gxp.ravel(), gyp.ravel())
    _, poly = georef.solve_gcps(gxp.ravel(), gyp.ravel(), wx, wy, order="tps")
    z = 10
    gx0, gx1, gy0, gy1 = raster.dest_pixel_window(gt, w, h, "EPSG:4326", z)
    gx = np.arange(gx0, gx1, dtype=np.float64)
    gy = np.arange(gy0, gy1, dtype=np.float64)
    ax, ay = raster._source_coords(gt, "EPSG:4326", z, gx, gy)
    bx, by = raster._source_coords(gt, "EPSG:4326", z, gx, gy, poly=poly)
    assert np.allclose(ax, bx, atol=1e-2) and np.allclose(ay, by, atol=1e-2)


def _tps_rows(seed=41, n=4):
    """Images whose true georef is the sinusoidal stretch: table
    carries the affine fit in ``gt`` plus the TPS record in ``poly``."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w = h = int(rng.choice([96, 128]))
        ox, oy = rng.uniform(-40, 40, 2)
        px, py, wx, wy = _grid_gcps(_true_tps_like, w, h, 3)
        wx = wx + ox * 0.005
        wy = wy + oy * 0.005
        gt, poly = georef.solve_gcps(px, py, wx, wy, order="tps")
        assert poly is not None
        pixels = corpus.synth_pixels(rng, h, w)
        fmt = str(rng.choice(["raw", "png"]))
        data = codecs.encode_image(pixels, fmt)
        ring = np.array([[0, 0], [w, 0], [w, h], [0, h]], dtype=np.float64)
        rows.append(
            {
                "image_id": f"tps-{i:04d}",
                "bytes": data,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": f"tps caption {i}",
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
    fields = list(corpus.IMAGES_SCHEMA) + [
        pa.field("poly", pa.list_(pa.float64()))
    ]
    schema = pa.schema(fields)
    cols = {f.name: [r[f.name] for r in rows] for f in schema}
    return pa.table(cols, schema=schema)


def _tiles_to_dict(df):
    from tilers_tools_ray.stages.tiling import unpack_pixels

    return {
        int(r.tile_key): (unpack_pixels(r.pixels), r.caption, list(r.src_ids))
        for r in df.itertuples(index=False)
    }


def test_tps_pyramid_matches_golden(ray_session, tmp_path):
    path = str(tmp_path / "tps_images.parquet")
    pq.write_table(_poly_table(_tps_rows()), path)
    imgs = golden.load_images(path)
    z_base = golden.auto_zoom(imgs)
    gold = golden.tile_pyramid(imgs, z_base=z_base, z_min=Z_MIN)
    out = str(tmp_path / "tps_pyr")
    pyramid.write_pyramid(path, out, z_min=Z_MIN, salt="auto")
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
