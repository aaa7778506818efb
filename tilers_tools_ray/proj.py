"""Projection kernels for non-axis-separable source SRS: UTM /
transverse Mercator (SURVEY.md §2 gap "arbitrary-SRS warp", upstream
``gdal_tiler.py`` warp path + ``reader_backend.py`` proj tables [R]).

The reference delegates any proj4 SRS to GDAL/proj; this engine has no
projection library, so the one family real charts actually use beyond
lat/lon and web-mercator — UTM / transverse Mercator — is implemented
here directly: the classic ellipsoidal series (Snyder, *Map
Projections — A Working Manual*, USGS PP 1395, eqs. 3-21, 8-9..8-25),
vectorized over numpy arrays. Accuracy is ~1 mm within a UTM zone
(|Δλ| ≲ 6°), degrading gracefully to ~cm at zone edges — far below
the half-pixel that could flip a nearest-neighbor sample.

Unlike mercator↔lonlat, the transverse-Mercator mapping is NOT
axis-separable (x depends on both lon and lat), so the warp path
builds a full 2-D grid for these sources (raster._source_coords)
instead of the separable 1-D broadcast used for the builtin SRS.
"""

from __future__ import annotations

import re

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
_E2 = WGS84_F * (2.0 - WGS84_F)
_E4 = _E2 * _E2
_E6 = _E4 * _E2
_EP2 = _E2 / (1.0 - _E2)
# meridian-arc series coefficients (Snyder 3-21)
_M0C = 1.0 - _E2 / 4.0 - 3.0 * _E4 / 64.0 - 5.0 * _E6 / 256.0
_M2C = 3.0 * _E2 / 8.0 + 3.0 * _E4 / 32.0 + 45.0 * _E6 / 1024.0
_M4C = 15.0 * _E4 / 256.0 + 45.0 * _E6 / 1024.0
_M6C = 35.0 * _E6 / 3072.0
# footpoint-latitude series (Snyder 3-26), e1 = (1-√(1-e²))/(1+√(1-e²))
_E1 = (1.0 - np.sqrt(1.0 - _E2)) / (1.0 + np.sqrt(1.0 - _E2))
_F2C = 3.0 * _E1 / 2.0 - 27.0 * _E1**3 / 32.0
_F4C = 21.0 * _E1**2 / 16.0 - 55.0 * _E1**4 / 32.0
_F6C = 151.0 * _E1**3 / 96.0
_F8C = 1097.0 * _E1**4 / 512.0


def meridian_arc(lat_rad):
    """Meridian distance from the equator to latitude (WGS84 meters),
    Snyder eq. 3-21. Independently checkable by numerically
    integrating a(1-e²)/(1-e²sin²φ)^{3/2} — the unit tests do."""
    p = np.asarray(lat_rad, dtype=np.float64)
    return WGS84_A * (
        _M0C * p
        - _M2C * np.sin(2.0 * p)
        + _M4C * np.sin(4.0 * p)
        - _M6C * np.sin(6.0 * p)
    )


class Tmerc:
    """Ellipsoidal transverse Mercator on WGS84.

    Parameters mirror proj4's: central meridian ``lon0``, latitude of
    origin ``lat0``, scale ``k0``, false easting/northing ``x0/y0``.
    UTM zone N ⇒ lon0 = 6N−183, k0 = 0.9996, x0 = 500 000,
    y0 = 0 (north) / 10 000 000 (south).
    """

    __slots__ = ("lon0", "lat0", "k0", "x0", "y0", "_m0")

    def __init__(self, lon0, lat0=0.0, k0=0.9996, x0=500000.0, y0=0.0):
        self.lon0 = float(lon0)
        self.lat0 = float(lat0)
        self.k0 = float(k0)
        self.x0 = float(x0)
        self.y0 = float(y0)
        self._m0 = float(meridian_arc(np.radians(self.lat0)))

    def __eq__(self, other):
        return isinstance(other, Tmerc) and all(
            getattr(self, s) == getattr(other, s) for s in self.__slots__
        )

    def __repr__(self):
        return (
            f"Tmerc(lon0={self.lon0}, lat0={self.lat0}, k0={self.k0}, "
            f"x0={self.x0}, y0={self.y0})"
        )

    def forward(self, lon, lat):
        """(lon, lat) degrees → (easting, northing) meters. Vectorized;
        Snyder eqs. 8-9..8-14."""
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        dlam = np.radians(np.asarray(lon, dtype=np.float64) - self.lon0)
        # wrap Δλ to (−π, π] so zone-straddling inputs stay sane
        dlam = (dlam + np.pi) % (2.0 * np.pi) - np.pi
        sp = np.sin(phi)
        cp = np.cos(phi)
        tp = np.tan(phi)
        n = WGS84_A / np.sqrt(1.0 - _E2 * sp * sp)
        t = tp * tp
        c = _EP2 * cp * cp
        a = dlam * cp
        a2 = a * a
        m = meridian_arc(phi)
        x = self.x0 + self.k0 * n * a * (
            1.0
            + a2 / 6.0 * (1.0 - t + c)
            + a2 * a2 / 120.0 * (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * _EP2)
        )
        y = self.y0 + self.k0 * (
            m
            - self._m0
            + n
            * tp
            * a2
            * (
                0.5
                + a2 / 24.0 * (5.0 - t + 9.0 * c + 4.0 * c * c)
                + a2
                * a2
                / 720.0
                * (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * _EP2)
            )
        )
        return x, y

    def inverse(self, x, y):
        """(easting, northing) meters → (lon, lat) degrees. Vectorized;
        Snyder eqs. 8-17..8-25 via the footpoint latitude."""
        x = np.asarray(x, dtype=np.float64) - self.x0
        y = np.asarray(y, dtype=np.float64) - self.y0
        m = self._m0 + y / self.k0
        mu = m / (WGS84_A * _M0C)
        phi1 = (
            mu
            + _F2C * np.sin(2.0 * mu)
            + _F4C * np.sin(4.0 * mu)
            + _F6C * np.sin(6.0 * mu)
            + _F8C * np.sin(8.0 * mu)
        )
        sp1 = np.sin(phi1)
        cp1 = np.cos(phi1)
        tp1 = np.tan(phi1)
        den = 1.0 - _E2 * sp1 * sp1
        n1 = WGS84_A / np.sqrt(den)
        r1 = WGS84_A * (1.0 - _E2) / (den * np.sqrt(den))
        t1 = tp1 * tp1
        c1 = _EP2 * cp1 * cp1
        d = x / (n1 * self.k0)
        d2 = d * d
        phi = phi1 - (n1 * tp1 / r1) * d2 * (
            0.5
            - d2 / 24.0 * (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1 * c1 - 9.0 * _EP2)
            + d2
            * d2
            / 720.0
            * (
                61.0
                + 90.0 * t1
                + 298.0 * c1
                + 45.0 * t1 * t1
                - 252.0 * _EP2
                - 3.0 * c1 * c1
            )
        )
        lam = d * (
            1.0
            - d2 / 6.0 * (1.0 + 2.0 * t1 + c1)
            + d2
            * d2
            / 120.0
            * (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1 * c1 + 8.0 * _EP2 + 24.0 * t1 * t1)
        ) / cp1
        return self.lon0 + np.degrees(lam), np.degrees(phi)


def _check_datum_kv(kv, srs):
    """Reject proj4 strings whose datum/ellipsoid is NOT WGS84/GRS80 —
    computing them on WGS84 anyway would silently shift charts by up
    to a few hundred meters (NAD27 Lambert State Plane is the classic
    case). Checks every spelling: +ellps, +datum, explicit +a/+b/+R/
    +rf axes, and non-zero +towgs84 shifts."""
    if kv.get("ellps", "WGS84") not in ("WGS84", "GRS80"):
        raise ValueError(f"unsupported ellipsoid in {srs!r}: WGS84/GRS80 only")
    if kv.get("datum", "WGS84") not in ("WGS84",):
        raise ValueError(f"unsupported datum in {srs!r}: WGS84 only")
    for ax in ("a", "b", "R", "rf"):
        if ax in kv:
            raise ValueError(
                f"custom ellipsoid axis +{ax}= in {srs!r}: WGS84/GRS80 only"
            )
    tow = kv.get("towgs84")
    if tow and any(abs(float(p)) > 1e-9 for p in tow.split(",")):
        raise ValueError(
            f"non-zero +towgs84 shift in {srs!r}: datum shifts not implemented"
        )


_UTM_EPSG_RE = re.compile(r"^EPSG:32([67])(\d{2})$")
_P4_UTM_RE = re.compile(r"\+proj=utm\b")
_P4_TMERC_RE = re.compile(r"\+proj=tmerc\b")
_P4_KV_RE = re.compile(r"\+([A-Za-z_0-9]+)(?:=([^\s]+))?")  # +R is uppercase


def utm_srs(zone, south=False):
    """Zone number → the canonical EPSG string this module parses."""
    return f"EPSG:32{7 if south else 6}{int(zone):02d}"


def parse_srs(srs):
    """SRS string → Tmerc descriptor, or None when the SRS is one of
    the builtin axis-separable ones (handled in raster.py) or not
    recognized. Accepted spellings (the ones upstream map sidecars
    actually carry):

    - ``EPSG:326NN`` / ``EPSG:327NN`` — UTM zone NN north/south, WGS84
    - ``+proj=utm +zone=NN [+south] ...``
    - ``+proj=tmerc +lat_0=.. +lon_0=.. +k=.. +x_0=.. +y_0=.. ...``
    - ``+proj=lcc`` / ``+proj=aea`` conics (+ EPSG 2154/3978/5070)
    """
    if not isinstance(srs, str):
        return None
    s = srs.strip()
    conic = _parse_conic(s)
    if conic is not None:
        return conic
    m = _UTM_EPSG_RE.match(s)
    if m:
        hemi, zone = m.group(1), int(m.group(2))
        if not 1 <= zone <= 60:
            raise ValueError(f"UTM zone out of range in {srs!r}")
        return Tmerc(
            lon0=6 * zone - 183,
            y0=10000000.0 if hemi == "7" else 0.0,
        )
    if _P4_UTM_RE.search(s) or _P4_TMERC_RE.search(s):
        kv = {m.group(1): m.group(2) for m in _P4_KV_RE.finditer(s)}
        _check_datum_kv(kv, srs)
        if _P4_UTM_RE.search(s):
            if "zone" not in kv or kv["zone"] is None:
                raise ValueError(f"+proj=utm needs +zone= in {srs!r}")
            zone = int(kv["zone"])
            if not 1 <= zone <= 60:
                raise ValueError(f"UTM zone out of range in {srs!r}")
            return Tmerc(lon0=6 * zone - 183, y0=10000000.0 if "south" in kv else 0.0)
        return Tmerc(
            lon0=float(kv.get("lon_0", 0.0) or 0.0),
            lat0=float(kv.get("lat_0", 0.0) or 0.0),
            k0=float(kv.get("k", kv.get("k_0", 1.0) or 1.0) or 1.0),
            x0=float(kv.get("x_0", 0.0) or 0.0),
            y0=float(kv.get("y_0", 0.0) or 0.0),
        )
    return None


# ---------------------------------------------------------------------------
# Conic projections: Lambert conformal (lcc) and Albers equal-area (aea)
# — the second family real charts carry beyond UTM (aeronautical charts,
# State Plane, national grids like Lambert-93). Same duck-typed
# forward/inverse contract as Tmerc, so raster.py's 2-D grid warp path
# picks them up unchanged. Snyder, USGS PP 1395, chs. 14–15.
# ---------------------------------------------------------------------------

_E = float(np.sqrt(_E2))


def _conic_t(phi):
    """Snyder 15-9: isometric-colatitude factor t(φ)."""
    sp = _E * np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - sp) / (1.0 + sp)) ** (
        _E / 2.0
    )


def _conic_m(phi):
    """Snyder 14-15: m(φ) = cosφ / √(1 − e²sin²φ)."""
    sp = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - _E2 * sp * sp)


def _conic_q(phi):
    """Snyder 3-12: authalic q(φ)."""
    sp = np.sin(phi)
    esp = _E * sp
    return (1.0 - _E2) * (
        sp / (1.0 - _E2 * sp * sp)
        - (0.5 / _E) * np.log((1.0 - esp) / (1.0 + esp))
    )


def _check_cone(n, lat1, lat2):
    """Fail loudly (raster.py policy) on degenerate cone constants:
    symmetric-about-equator or equatorial parallels give n = 0 (the
    cone opens into a cylinder — that's what Mercator is for), polar
    parallels give NaN/inf."""
    if not np.isfinite(n) or abs(n) < 1e-12:
        raise ValueError(
            f"degenerate conic standard parallels (lat_1={lat1}, "
            f"lat_2={lat2}): cone constant n={n!r}; a conic projection "
            "needs parallels in one hemisphere away from 0/90 deg"
        )


def _phi_from_t(t):
    """Invert Snyder 15-9 for φ (eq. 7-9 iteration; converges in <6)."""
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        sp = _E * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - sp) / (1.0 + sp)) ** (_E / 2.0)
        )
    return phi


class Lcc:
    """Ellipsoidal Lambert conformal conic on WGS84/GRS80, one or two
    standard parallels (Snyder eqs. 15-1..15-11). proj4-style params:
    ``lat1``/``lat2`` standard parallels (lat2 defaults to lat1 → 1SP),
    origin ``lat0``/``lon0``, scale ``k0`` (1SP charts), false
    easting/northing ``x0``/``y0``."""

    __slots__ = ("lat1", "lat2", "lat0", "lon0", "k0", "x0", "y0",
                 "_n", "_f", "_rho0")

    def __init__(self, lat1, lat2=None, lat0=0.0, lon0=0.0, k0=1.0,
                 x0=0.0, y0=0.0):
        self.lat1 = float(lat1)
        self.lat2 = float(lat1 if lat2 is None else lat2)
        self.lat0, self.lon0 = float(lat0), float(lon0)
        self.k0, self.x0, self.y0 = float(k0), float(x0), float(y0)
        p1, p2 = np.radians(self.lat1), np.radians(self.lat2)
        with np.errstate(divide="ignore", invalid="ignore"):
            m1, t1 = _conic_m(p1), _conic_t(p1)
            if abs(self.lat1 - self.lat2) < 1e-12:
                self._n = float(np.sin(p1))
            else:
                m2, t2 = _conic_m(p2), _conic_t(p2)
                self._n = float(
                    (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
                )
            _check_cone(self._n, self.lat1, self.lat2)
            self._f = float(m1 / (self._n * t1**self._n))
            self._rho0 = float(
                WGS84_A * self._f * self.k0
                * _conic_t(np.radians(self.lat0)) ** self._n
            )
        if not (np.isfinite(self._f) and np.isfinite(self._rho0)):
            raise ValueError(
                f"degenerate Lambert cone (lat_1={self.lat1}, "
                f"lat_2={self.lat2}, lat_0={self.lat0})"
            )

    def __eq__(self, other):
        return isinstance(other, Lcc) and all(
            getattr(self, s) == getattr(other, s) for s in self.__slots__
        )

    def __repr__(self):
        return (
            f"Lcc(lat1={self.lat1}, lat2={self.lat2}, lat0={self.lat0}, "
            f"lon0={self.lon0}, k0={self.k0}, x0={self.x0}, y0={self.y0})"
        )

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        dlam = np.radians(np.asarray(lon, dtype=np.float64) - self.lon0)
        dlam = (dlam + np.pi) % (2.0 * np.pi) - np.pi
        rho = WGS84_A * self._f * self.k0 * _conic_t(phi) ** self._n
        th = self._n * dlam
        return (
            self.x0 + rho * np.sin(th),
            self.y0 + self._rho0 - rho * np.cos(th),
        )

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.x0
        yp = self._rho0 - (np.asarray(y, dtype=np.float64) - self.y0)
        rho = np.sign(self._n) * np.hypot(x, yp)
        t = (rho / (WGS84_A * self._f * self.k0)) ** (1.0 / self._n)
        th = np.arctan2(np.sign(self._n) * x, np.sign(self._n) * yp)
        return (
            self.lon0 + np.degrees(th / self._n),
            np.degrees(_phi_from_t(t)),
        )


class Aea:
    """Ellipsoidal Albers equal-area conic on WGS84/GRS80 (Snyder
    eqs. 14-1..14-21); same parameter spelling as :class:`Lcc`."""

    __slots__ = ("lat1", "lat2", "lat0", "lon0", "x0", "y0",
                 "_n", "_c", "_rho0")

    def __init__(self, lat1, lat2=None, lat0=0.0, lon0=0.0, x0=0.0, y0=0.0):
        self.lat1 = float(lat1)
        self.lat2 = float(lat1 if lat2 is None else lat2)
        self.lat0, self.lon0 = float(lat0), float(lon0)
        self.x0, self.y0 = float(x0), float(y0)
        p1, p2 = np.radians(self.lat1), np.radians(self.lat2)
        with np.errstate(divide="ignore", invalid="ignore"):
            m1, q1 = _conic_m(p1), _conic_q(p1)
            if abs(self.lat1 - self.lat2) < 1e-12:
                self._n = float(np.sin(p1))
            else:
                m2, q2 = _conic_m(p2), _conic_q(p2)
                self._n = float((m1 * m1 - m2 * m2) / (q2 - q1))
            _check_cone(self._n, self.lat1, self.lat2)
            self._c = float(m1 * m1 + self._n * q1)
            self._rho0 = float(
                WGS84_A
                * np.sqrt(self._c - self._n * _conic_q(np.radians(self.lat0)))
                / self._n
            )
        if not (np.isfinite(self._c) and np.isfinite(self._rho0)):
            raise ValueError(
                f"degenerate Albers cone (lat_1={self.lat1}, "
                f"lat_2={self.lat2}, lat_0={self.lat0})"
            )

    def __eq__(self, other):
        return isinstance(other, Aea) and all(
            getattr(self, s) == getattr(other, s) for s in self.__slots__
        )

    def __repr__(self):
        return (
            f"Aea(lat1={self.lat1}, lat2={self.lat2}, lat0={self.lat0}, "
            f"lon0={self.lon0}, x0={self.x0}, y0={self.y0})"
        )

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        dlam = np.radians(np.asarray(lon, dtype=np.float64) - self.lon0)
        dlam = (dlam + np.pi) % (2.0 * np.pi) - np.pi
        rho = WGS84_A * np.sqrt(self._c - self._n * _conic_q(phi)) / self._n
        th = self._n * dlam
        return (
            self.x0 + rho * np.sin(th),
            self.y0 + self._rho0 - rho * np.cos(th),
        )

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.x0
        yp = self._rho0 - (np.asarray(y, dtype=np.float64) - self.y0)
        rho = np.sign(self._n) * np.hypot(x, yp)
        q = (self._c - (rho * self._n / WGS84_A) ** 2) / self._n
        th = np.arctan2(np.sign(self._n) * x, np.sign(self._n) * yp)
        # Snyder 3-16 iteration for φ from authalic q
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        for _ in range(8):
            sp = np.sin(phi)
            esp = _E * sp
            den = 1.0 - _E2 * sp * sp
            phi = phi + (den * den / (2.0 * np.cos(phi))) * (
                q / (1.0 - _E2)
                - sp / den
                + (0.5 / _E) * np.log((1.0 - esp) / (1.0 + esp))
            )
        return (
            self.lon0 + np.degrees(th / self._n),
            np.degrees(phi),
        )


#: common EPSG codes on GRS80/WGS84-equivalent datums (RGF93, NAD83 and
#: ETRS89 agree with WGS84 at the sub-meter level — far below chart
#: resolution; upstream relied on GDAL's datum tables for the same).
_CONIC_EPSG = {
    "EPSG:2154": lambda: Lcc(49.0, 44.0, lat0=46.5, lon0=3.0,
                             x0=700000.0, y0=6600000.0),  # Lambert-93
    "EPSG:3978": lambda: Lcc(49.0, 77.0, lat0=49.0, lon0=-95.0),  # Canada
    "EPSG:5070": lambda: Aea(29.5, 45.5, lat0=23.0, lon0=-96.0),  # CONUS
}

_P4_LCC_RE = re.compile(r"\+proj=lcc\b")
_P4_AEA_RE = re.compile(r"\+proj=aea\b")


def _parse_conic(srs):
    """Conic kernel for lcc/aea SRS strings, else None (same contract
    as the tmerc branch of parse_srs; raises on malformed conic SRS)."""
    if not isinstance(srs, str):
        return None
    s = srs.strip()
    if s in _CONIC_EPSG:
        return _CONIC_EPSG[s]()
    is_lcc = bool(_P4_LCC_RE.search(s))
    is_aea = bool(_P4_AEA_RE.search(s))
    if not (is_lcc or is_aea):
        return None
    kv = {m.group(1): m.group(2) for m in _P4_KV_RE.finditer(s)}
    _check_datum_kv(kv, srs)
    if "lat_1" not in kv or kv["lat_1"] is None:
        raise ValueError(f"+proj={'lcc' if is_lcc else 'aea'} needs +lat_1= in {srs!r}")
    lat1 = float(kv["lat_1"])
    lat2 = float(kv["lat_2"]) if kv.get("lat_2") is not None else None
    common = dict(
        lat0=float(kv.get("lat_0", 0.0) or 0.0),
        lon0=float(kv.get("lon_0", 0.0) or 0.0),
        x0=float(kv.get("x_0", 0.0) or 0.0),
        y0=float(kv.get("y_0", 0.0) or 0.0),
    )
    if is_lcc:
        return Lcc(
            lat1, lat2,
            k0=float(kv.get("k", kv.get("k_0", 1.0) or 1.0) or 1.0),
            **common,
        )
    return Aea(lat1, lat2, **common)
