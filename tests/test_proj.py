"""Transverse-Mercator / UTM projection kernel (proj.py).

Independent checks: the meridian-arc series against direct numerical
integration of the ellipsoidal integrand; known closed-form UTM
identities (central meridian → easting 500 000, equator origin →
northing 0/10 000 000, point scale k0 on the central meridian); and
forward∘inverse roundtrips at sub-micro-degree tolerance.
"""

import numpy as np
import pytest

from tilers_tools_ray import proj


def _meridian_arc_numeric(lat_deg, n=200_000):
    """∫₀^φ a(1−e²)/(1−e²sin²t)^{3/2} dt by composite trapezoid."""
    a, f = proj.WGS84_A, proj.WGS84_F
    e2 = f * (2 - f)
    t = np.linspace(0.0, np.radians(lat_deg), n)
    integrand = a * (1 - e2) / (1 - e2 * np.sin(t) ** 2) ** 1.5
    return np.trapz(integrand, t)


def test_meridian_arc_matches_numeric_integration():
    for lat in (15.0, 45.0, 80.0, -33.0):
        series = proj.meridian_arc(np.radians(lat))
        numeric = _meridian_arc_numeric(lat)
        assert abs(series - numeric) < 0.01, lat  # < 1 cm


def test_utm_central_meridian_identities():
    p = proj.parse_srs("EPSG:32633")  # zone 33N, lon0 = 15°E
    assert p.lon0 == 15.0
    # any latitude on the central meridian → easting exactly 500 000
    x, y = p.forward(np.full(4, 15.0), np.array([0.0, 20.0, 47.0, 70.0]))
    assert np.allclose(x, 500000.0, atol=1e-6)
    # equator on the central meridian → northing 0 (north hemi)
    assert abs(np.asarray(y)[0]) < 1e-6
    # northing on the central meridian = k0 · meridian arc
    assert np.allclose(
        np.asarray(y),
        0.9996 * proj.meridian_arc(np.radians([0.0, 20.0, 47.0, 70.0])),
        atol=1e-6,
    )
    # south zone: false northing 10 000 000 at the equator
    ps = proj.parse_srs("EPSG:32733")
    _, ys = ps.forward(15.0, 0.0)
    assert abs(float(ys) - 10000000.0) < 1e-6


def test_utm_point_scale_is_k0_on_central_meridian():
    """Finite-difference point scale along a parallel at the central
    meridian equals k0·(parallel-circle metric): dx/dλ = k0·ν·cosφ."""
    p = proj.parse_srs("EPSG:32631")  # lon0 = 3°E
    lat = 52.0
    dlon = 1e-6
    (x1, _), (x2, _) = p.forward(3.0 - dlon / 2, lat), p.forward(3.0 + dlon / 2, lat)
    e2 = proj.WGS84_F * (2 - proj.WGS84_F)
    nu = proj.WGS84_A / np.sqrt(1 - e2 * np.sin(np.radians(lat)) ** 2)
    expect = 0.9996 * nu * np.cos(np.radians(lat)) * np.radians(dlon)
    assert abs((float(x2) - float(x1)) / expect - 1.0) < 1e-6


def test_roundtrip_grid():
    p = proj.parse_srs("EPSG:32610")  # zone 10N, lon0 = −123°
    lon = np.linspace(-126.0, -120.0, 25)  # full zone width
    lat = np.linspace(-2.0, 72.0, 25)
    LON, LAT = np.meshgrid(lon, lat)
    x, y = p.forward(LON, LAT)
    lon2, lat2 = p.inverse(x, y)
    # ~9e-9° ≈ 1 mm: the documented series truncation at zone edges
    assert np.abs(lon2 - LON).max() < 5e-8
    assert np.abs(lat2 - LAT).max() < 5e-8


def test_roundtrip_south_and_tmerc_custom():
    ps = proj.parse_srs("+proj=utm +zone=56 +south +ellps=WGS84")
    x, y = ps.forward(151.2, -33.85)  # Sydney-ish
    assert 0 < float(y) < 10000000.0  # false northing applied
    lon2, lat2 = ps.inverse(x, y)
    assert abs(float(lon2) - 151.2) < 1e-8
    assert abs(float(lat2) + 33.85) < 1e-8
    pt = proj.parse_srs(
        "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
        "+x_0=400000 +y_0=-100000 +ellps=GRS80"
    )
    # OSGB-style grid (GRS80 stand-in): origin identities
    x0, y0 = pt.forward(-2.0, 49.0)
    assert abs(float(x0) - 400000.0) < 1e-6
    assert abs(float(y0) + 100000.0) < 1e-6
    lon2, lat2 = pt.inverse(*pt.forward(-0.5, 52.5))
    assert abs(float(lon2) + 0.5) < 1e-8 and abs(float(lat2) - 52.5) < 1e-8


def test_parse_srs_rejects_and_passes_through():
    assert proj.parse_srs("EPSG:3857") is None
    assert proj.parse_srs("EPSG:4326") is None
    assert proj.parse_srs("PIXEL") is None
    with pytest.raises(ValueError):
        proj.parse_srs("EPSG:32661")  # zone 61 doesn't exist
    with pytest.raises(ValueError):
        proj.parse_srs("+proj=utm +ellps=WGS84")  # missing zone
    with pytest.raises(ValueError):
        proj.parse_srs("+proj=tmerc +lon_0=9 +ellps=bessel")  # ellipsoid
    assert proj.utm_srs(33) == "EPSG:32633"
    assert proj.utm_srs(33, south=True) == "EPSG:32733"


def test_zone_width_accuracy_against_series_symmetry():
    """f(λ0+Δ) and f(λ0−Δ) must mirror in easting about 500 km and
    match exactly in northing (series is even/odd in Δλ as required)."""
    p = proj.parse_srs("EPSG:32633")
    xw, yw = p.forward(12.0, 45.0)
    xe, ye = p.forward(18.0, 45.0)
    assert abs((float(xw) - 500000.0) + (float(xe) - 500000.0)) < 1e-6
    assert abs(float(yw) - float(ye)) < 1e-6
