"""Lambert-conformal / Albers conic sources (SURVEY.md §2
"arbitrary-SRS warp" gap, second family after UTM; upstream delegates
any proj4 SRS to GDAL — reader_backend.py proj tables [R]).

Math checks are external/closed-form (published Lambert-93 point,
standard-parallel scale = 1, equal-area Jacobian = 1); the e2e check
runs conic-georeferenced images through the distributed pyramid and
compares byte-for-byte against the golden single-process tiler."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from tilers_tools_ray import corpus, golden, proj, raster
from tilers_tools_ray import tilegrid as tg
from tilers_tools_ray.pipelines import pyramid

A = proj.WGS84_A
E2 = 1.0 - (1.0 - proj.WGS84_F) ** 2


def test_lambert93_published_point():
    """Paris (2.3522°E, 48.8566°N) in EPSG:2154 — sub-meter agreement
    with the published RGF93/Lambert-93 coordinate."""
    lcc = proj.parse_srs("EPSG:2154")
    x, y = lcc.forward(2.3522, 48.8566)
    assert abs(x - 652469.02) < 1.0
    assert abs(y - 6862035.26) < 1.0


@pytest.mark.parametrize(
    "srs,lon_lo,lon_hi,lat_lo,lat_hi",
    [
        ("EPSG:2154", -4.0, 9.0, 42.0, 51.0),
        ("EPSG:3978", -135.0, -55.0, 42.0, 80.0),
        ("EPSG:5070", -120.0, -75.0, 25.0, 49.0),
        ("+proj=lcc +lat_1=-35 +lat_2=-45 +lat_0=-40 +lon_0=145", 135.0, 155.0, -48.0, -32.0),
        ("+proj=lcc +lat_1=40 +lat_0=40 +lon_0=-97 +k_0=0.9999", -100.0, -94.0, 37.0, 43.0),
        ("+proj=aea +lat_1=15 +lat_2=35 +lat_0=25 +lon_0=100", 90.0, 110.0, 10.0, 40.0),
    ],
)
def test_conic_roundtrip(srs, lon_lo, lon_hi, lat_lo, lat_hi):
    kern = proj.parse_srs(srs)
    rng = np.random.default_rng(4)
    lon = rng.uniform(lon_lo, lon_hi, 2000)
    lat = rng.uniform(lat_lo, lat_hi, 2000)
    x, y = kern.forward(lon, lat)
    lo, la = kern.inverse(x, y)
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9


def test_lcc_scale_one_at_standard_parallels():
    """k = 1 along both standard parallels (the defining property of a
    2SP conformal conic), measured by numerical differentiation
    against the true ellipsoidal parallel arc length."""
    lcc = proj.parse_srs("EPSG:2154")
    eps = 1e-6
    for p in (49.0, 44.0):
        x1, y1 = lcc.forward(3.0, p)
        x2, y2 = lcc.forward(3.0 + eps, p)
        sp = np.sin(np.radians(p))
        arc = A * np.cos(np.radians(p)) / np.sqrt(1 - E2 * sp * sp) * np.radians(eps)
        k = np.hypot(x2 - x1, y2 - y1) / arc
        assert abs(k - 1.0) < 1e-6, (p, k)
    # and k > 1 strictly outside the parallel band (conformal cone)
    x1, y1 = lcc.forward(3.0, 55.0)
    x2, y2 = lcc.forward(3.0 + eps, 55.0)
    sp = np.sin(np.radians(55.0))
    arc = A * np.cos(np.radians(55.0)) / np.sqrt(1 - E2 * sp * sp) * np.radians(eps)
    assert np.hypot(x2 - x1, y2 - y1) / arc > 1.0


def test_aea_preserves_area():
    """Jacobian of the forward map = ellipsoidal area element
    everywhere (the defining property of Albers), sampled across the
    CONUS window."""
    aea = proj.parse_srs("EPSG:5070")
    eps = 1e-6
    rng = np.random.default_rng(6)
    for _ in range(50):
        lo = float(rng.uniform(-120, -75))
        la = float(rng.uniform(25, 49))
        x0, y0 = aea.forward(lo, la)
        x1, y1 = aea.forward(lo + eps, la)
        x2, y2 = aea.forward(lo, la + eps)
        jac = abs((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0))
        sp = np.sin(np.radians(la))
        den = 1 - E2 * sp * sp
        m_rad = A * (1 - E2) / den**1.5
        n_rad = A / np.sqrt(den)
        d_area = m_rad * np.radians(eps) * n_rad * np.cos(np.radians(la)) * np.radians(eps)
        assert abs(jac / d_area - 1.0) < 1e-5, (lo, la)


def test_conic_parse_errors():
    with pytest.raises(ValueError, match="lat_1"):
        proj.parse_srs("+proj=lcc +lon_0=3")
    with pytest.raises(ValueError, match="ellipsoid"):
        proj.parse_srs("+proj=aea +lat_1=20 +ellps=clrk66")
    assert proj.parse_srs("EPSG:4326") is None  # builtin stays builtin


def test_degenerate_cones_fail_loudly():
    """n = 0 / NaN cones must raise, not emit inf/NaN coordinates."""
    for bad in (
        "+proj=lcc +lat_1=0",
        "+proj=lcc +lat_1=30 +lat_2=-30",
        "+proj=lcc +lat_1=90",
        "+proj=aea +lat_1=0",
    ):
        with pytest.raises(ValueError, match="degenerate"):
            proj.parse_srs(bad)


def test_non_wgs84_datum_spellings_fail_loudly():
    """Every proj4 spelling of a non-WGS84 datum is rejected — NAD27
    Lambert charts computed silently on WGS84 would land ~100m off."""
    for bad in (
        "+proj=lcc +lat_1=33 +lat_2=45 +datum=NAD27",
        "+proj=utm +zone=15 +datum=NAD27",
        "+proj=lcc +lat_1=33 +a=6378206.4 +b=6356583.8",
        "+proj=tmerc +lon_0=9 +towgs84=598.1,73.7,418.2",
    ):
        with pytest.raises(ValueError):
            proj.parse_srs(bad)
    # a zero shift is WGS84 by another name — accepted
    assert proj.parse_srs("+proj=utm +zone=33 +towgs84=0,0,0") is not None


def _tiles_to_dict(df):
    from tilers_tools_ray.stages.tiling import unpack_pixels

    return {
        int(r.tile_key): (unpack_pixels(r.pixels), r.caption, list(r.src_ids))
        for r in df.itertuples(index=False)
    }


@pytest.mark.parametrize(
    "srs,lon_c,lat_c",
    [
        ("EPSG:2154", 3.0, 46.5),
        ("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96", -96.0, 38.0),
    ],
)
def test_conic_pyramid_matches_golden(ray_session, tmp_path, srs, lon_c, lat_c):
    path = str(tmp_path / "conic.parquet")
    pq.write_table(
        corpus.rows_to_table(corpus.conic_rows(srs, lon_c, lat_c, n=5)), path
    )
    imgs = golden.load_images(path)
    z_base = golden.auto_zoom(imgs)
    gold = golden.tile_pyramid(imgs, z_base=z_base, z_min=5)
    out = str(tmp_path / "pyr")
    pyramid.write_pyramid(path, out, z_min=5, salt="auto")
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


def test_conic_footprint_covers_warp(ray_session):
    """Densified footprint bbox contains every dest pixel the conic
    warp lights (curvature-sag guard, conic leg)."""
    kern = proj.parse_srs("EPSG:2154")
    w = h = 200
    ex, ny_ = kern.forward(3.0, 46.5)
    gt = [float(ex) - 100 * 500.0, 500.0, 0.0, float(ny_) + 100 * 500.0, 0.0, -500.0]
    z = 8
    gx0, gx1, gy0, gy1 = raster.dest_pixel_window(gt, w, h, "EPSG:2154", z)
    _, _, warped = raster.warp_image_to_base(
        np.full((h, w, 4), 255, np.uint8), gt, "EPSG:2154", None, z
    )
    ys, xs = np.nonzero(warped[:, :, 3])
    assert len(xs) > 0
    minx, miny, maxx, maxy = raster.footprint_bbox_profile(gt, w, h, "EPSG:2154")
    txs, tys = tg.tiles_overlapping_bbox(minx, miny, maxx, maxy, z)
    lit_tiles = {(gx // 256, gy // 256) for gx, gy in zip(xs + gx0, ys + gy0)}
    assert lit_tiles <= set(zip(txs.tolist(), tys.tolist()))
