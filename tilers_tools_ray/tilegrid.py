"""Tile pyramid math — pure numpy, no Ray.

Reimplements the coordinate math of the public tilers-tools pyramid
(``gdal_tiler.py::Pyramid`` coordinate methods — SURVEY.md §2 M5 [C]):
Web-Mercator world extent, per-zoom resolution, lon/lat ↔ mercator ↔
pixel ↔ tile transforms, TMS/XYZ y-flip, and the path/key codecs of
``tiles_convert.py`` (SURVEY.md §2 M9). Everything here is vectorized
over numpy arrays and is used *inside* Ray ``map_batches`` stages —
never per-row Python in the hot path.

Tile addressing convention: internal addresses are XYZ ("Google"):
x grows east, y grows SOUTH from the top-left of the world; z=0 is one
256x256 tile covering the world (mercator profile). TMS flips y:
``y_tms = 2**z - 1 - y_xyz``.

tile_key packing: ``(z << 58) | (x << 29) | y`` — z in 6 bits (≤31),
x/y in 29 bits each; fits a signed int64 for z ≤ 17 per-axis-overflow-
free at any zoom ≤ 29 (we cap MAX_ZOOM at 24).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

EARTH_RADIUS = 6378137.0
ORIGIN = np.pi * EARTH_RADIUS  # 20037508.342789244
TILE_SIZE = 256
MAX_ZOOM = 24

# ---------------------------------------------------------------------------
# tile_key codec
# ---------------------------------------------------------------------------

_Y_BITS = 29
_X_BITS = 29
_X_SHIFT = _Y_BITS
_Z_SHIFT = _Y_BITS + _X_BITS
_XY_MASK = (1 << _Y_BITS) - 1


def pack_key(z, x, y):
    """(z, x, y) → int64 tile_key. Vectorized over numpy arrays."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return (z << _Z_SHIFT) | (x << _X_SHIFT) | y


def unpack_key(key):
    """int64 tile_key → (z, x, y) int64 arrays."""
    key = np.asarray(key, dtype=np.int64)
    z = key >> _Z_SHIFT
    x = (key >> _X_SHIFT) & _XY_MASK
    y = key & _XY_MASK
    return z, x, y


def parent_key(key):
    """tile_key at z → tile_key of the 2x2-parent at z-1 (A2 overview key)."""
    z, x, y = unpack_key(key)
    return pack_key(z - 1, x >> 1, y >> 1)


# ---------------------------------------------------------------------------
# mercator profile math
# ---------------------------------------------------------------------------


def resolution(z):
    """Meters per pixel at zoom z (mercator profile, 256px tiles)."""
    return 2.0 * ORIGIN / (TILE_SIZE * (1 << int(z))) if np.isscalar(z) else (
        2.0 * ORIGIN / (TILE_SIZE * np.exp2(np.asarray(z, dtype=np.float64)))
    )


def lonlat_to_merc(lon, lat):
    """EPSG:4326 degrees → EPSG:3857 meters. Vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    mx = EARTH_RADIUS * np.radians(lon)
    my = EARTH_RADIUS * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return mx, my


def merc_to_lonlat(mx, my):
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lon = np.degrees(mx / EARTH_RADIUS)
    lat = np.degrees(2.0 * np.arctan(np.exp(my / EARTH_RADIUS)) - np.pi / 2.0)
    return lon, lat


def merc_to_pixel(mx, my, z):
    """Mercator meters → global pixel coords at zoom z (y down from top)."""
    res = 2.0 * ORIGIN / (TILE_SIZE * (1 << int(z)))
    px = (np.asarray(mx, dtype=np.float64) + ORIGIN) / res
    py = (ORIGIN - np.asarray(my, dtype=np.float64)) / res
    return px, py


def pixel_to_merc(px, py, z):
    res = 2.0 * ORIGIN / (TILE_SIZE * (1 << int(z)))
    mx = np.asarray(px, dtype=np.float64) * res - ORIGIN
    my = ORIGIN - np.asarray(py, dtype=np.float64) * res
    return mx, my


def merc_to_tile(mx, my, z):
    """Mercator meters → integer (tx, ty) XYZ tile containing the point."""
    px, py = merc_to_pixel(mx, my, z)
    n = 1 << int(z)
    tx = np.clip(np.floor(px / TILE_SIZE), 0, n - 1).astype(np.int64)
    ty = np.clip(np.floor(py / TILE_SIZE), 0, n - 1).astype(np.int64)
    return tx, ty


def tile_bounds_merc(z, x, y):
    """XYZ tile → (minx, miny, maxx, maxy) in mercator meters."""
    res = 2.0 * ORIGIN / (TILE_SIZE * (1 << int(z)))
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    minx = x * TILE_SIZE * res - ORIGIN
    maxx = (x + 1) * TILE_SIZE * res - ORIGIN
    maxy = ORIGIN - y * TILE_SIZE * res
    miny = ORIGIN - (y + 1) * TILE_SIZE * res
    return minx, miny, maxx, maxy


def tiles_overlapping_bbox(minx, miny, maxx, maxy, z):
    """All XYZ (x, y) tiles at zoom z intersecting a mercator bbox.

    Returns (xs, ys) int64 arrays (meshgrid, flattened). Mirrors the
    tile-enumeration loop of gdal_tiler's base-layer cut [C semantics].
    """
    n = 1 << int(z)
    res = 2.0 * ORIGIN / (TILE_SIZE * n)
    tx0 = int(np.clip(np.floor((minx + ORIGIN) / (TILE_SIZE * res)), 0, n - 1))
    tx1 = int(np.clip(np.ceil((maxx + ORIGIN) / (TILE_SIZE * res)) - 1, 0, n - 1))
    ty0 = int(np.clip(np.floor((ORIGIN - maxy) / (TILE_SIZE * res)), 0, n - 1))
    ty1 = int(np.clip(np.ceil((ORIGIN - miny) / (TILE_SIZE * res)) - 1, 0, n - 1))
    xs = np.arange(tx0, tx1 + 1, dtype=np.int64)
    ys = np.arange(ty0, ty1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return gx.ravel(), gy.ravel()


def auto_base_zoom(src_res_m):
    """Max zoom whose tile resolution is ≥ as fine as the source pixel.

    Mirrors gdal_tiler's default max-zoom choice: smallest z with
    res(z) <= source resolution [C semantics]. Vectorized.
    """
    src = np.asarray(src_res_m, dtype=np.float64)
    z = np.ceil(np.log2(2.0 * ORIGIN / (TILE_SIZE * src)))
    return np.clip(z, 0, MAX_ZOOM).astype(np.int64)


# ---------------------------------------------------------------------------
# profiles (§2.10 registry c)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TileGrid:
    """Pyramid profile geometry — mirrors gdal_tiler's profile classes
    (mercator / geodetic / raster) as data, not subclasses."""

    name: str
    tiles_at_zoom0: tuple  # (nx, ny)
    world: tuple  # (minx, miny, maxx, maxy) in profile units
    units_per_degree: bool  # True for geodetic (degrees), False meters


MERCATOR = TileGrid("mercator", (1, 1), (-ORIGIN, -ORIGIN, ORIGIN, ORIGIN), False)
GEODETIC = TileGrid("geodetic", (2, 1), (-180.0, -90.0, 180.0, 90.0), True)

PROFILES = {g.name: g for g in (MERCATOR, GEODETIC)}


@dataclass(frozen=True)
class RasterGrid:
    """Non-georeferenced pixel-canvas profile (gdal_tiler ``-p raster``
    [C semantics]): world units are canvas PIXELS of a width×height
    virtual canvas, origin top-left, y DOWN. ``z_base`` is the zoom
    where one dest pixel equals one canvas pixel; coarser zooms halve.
    Sources use srs="PIXEL" with a gt mapping source px → canvas px."""

    width: int
    height: int

    name = "raster"

    @property
    def z_base(self):
        n_tiles = -(-max(self.width, self.height) // TILE_SIZE)
        return max(int(np.ceil(np.log2(max(n_tiles, 1)))), 0)

    def resolution(self, z):
        """Canvas pixels per dest pixel at zoom z."""
        return float(2 ** (self.z_base - int(z)))

    def dims(self, z):
        res = self.resolution(z)
        span = TILE_SIZE * res
        return int(-(-self.width // span)), int(-(-self.height // span))

    def tiles_overlapping_bbox(self, minx, miny, maxx, maxy, z):
        """Canvas-pixel bbox (y down) → (xs, ys) tile arrays at z."""
        nx, ny = self.dims(z)
        span = TILE_SIZE * self.resolution(z)
        tx0 = int(np.clip(np.floor(minx / span), 0, nx - 1))
        tx1 = int(np.clip(np.ceil(maxx / span) - 1, 0, nx - 1))
        ty0 = int(np.clip(np.floor(miny / span), 0, ny - 1))
        ty1 = int(np.clip(np.ceil(maxy / span) - 1, 0, ny - 1))
        xs = np.arange(tx0, tx1 + 1, dtype=np.int64)
        ys = np.arange(ty0, ty1 + 1, dtype=np.int64)
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        return gx.ravel(), gy.ravel()


def profile_tag(profile):
    """Stable string id of a profile (lineage job meta)."""
    if isinstance(profile, RasterGrid):
        return f"raster:{profile.width}x{profile.height}"
    return str(profile)


def grid_dims(profile, z):
    """(nx, ny) tile-grid dimensions of ``profile`` at zoom z."""
    if isinstance(profile, RasterGrid):
        return profile.dims(z)
    g = PROFILES[profile] if isinstance(profile, str) else profile
    return g.tiles_at_zoom0[0] << int(z), g.tiles_at_zoom0[1] << int(z)


# --- geodetic (plate-carrée) profile math: 2×1 tiles at z0, world =
# --- (-180..180, -90..90) degrees, same deg/px on both axes ----------------


def geodetic_resolution(z):
    """Degrees per pixel at zoom z (geodetic profile, 256px tiles)."""
    return 180.0 / (TILE_SIZE * (1 << int(z)))


def lonlat_to_pixel_geodetic(lon, lat, z):
    """Degrees → global pixel coords at zoom z (y down from +90°)."""
    res = geodetic_resolution(z)
    px = (np.asarray(lon, dtype=np.float64) + 180.0) / res
    py = (90.0 - np.asarray(lat, dtype=np.float64)) / res
    return px, py


def tile_bounds_geodetic(z, x, y):
    """Geodetic tile → (minlon, minlat, maxlon, maxlat) degrees."""
    res = geodetic_resolution(z)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    minlon = x * TILE_SIZE * res - 180.0
    maxlon = (x + 1) * TILE_SIZE * res - 180.0
    maxlat = 90.0 - y * TILE_SIZE * res
    minlat = 90.0 - (y + 1) * TILE_SIZE * res
    return minlon, minlat, maxlon, maxlat


def tiles_overlapping_bbox_geodetic(minlon, minlat, maxlon, maxlat, z):
    """All geodetic (x, y) tiles at zoom z intersecting a degree bbox."""
    nx, ny = grid_dims("geodetic", z)
    res = geodetic_resolution(z)
    span = TILE_SIZE * res
    tx0 = int(np.clip(np.floor((minlon + 180.0) / span), 0, nx - 1))
    tx1 = int(np.clip(np.ceil((maxlon + 180.0) / span) - 1, 0, nx - 1))
    ty0 = int(np.clip(np.floor((90.0 - maxlat) / span), 0, ny - 1))
    ty1 = int(np.clip(np.ceil((90.0 - minlat) / span) - 1, 0, ny - 1))
    xs = np.arange(tx0, tx1 + 1, dtype=np.int64)
    ys = np.arange(ty0, ty1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return gx.ravel(), gy.ravel()


def auto_base_zoom_geodetic(src_res_deg):
    """Max zoom whose geodetic tile resolution is ≥ as fine as the
    source resolution in degrees."""
    src = np.asarray(src_res_deg, dtype=np.float64)
    z = np.ceil(np.log2(180.0 / (TILE_SIZE * src)))
    return np.clip(z, 0, MAX_ZOOM).astype(np.int64)


# ---------------------------------------------------------------------------
# path/key codecs (tiles_convert.py::TileSet*.coord2path — M9)
# ---------------------------------------------------------------------------


def xyz_to_tms_y(z, y):
    """TMS ↔ XYZ y-flip (involution): y' = 2**z - 1 - y."""
    z = np.asarray(z, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return (np.int64(1) << z) - 1 - y


def coord_to_path(z, x, y, layout="xyz", ext="png"):
    """(z, x, y) XYZ-addressed → relative path string per cache layout.

    Layouts (tiles_convert.py TileSet hierarchy [C semantics]):
      xyz  — z/x/y.ext, y down (OSM/Google)
      tms  — z/x/y.ext, y up (flipped)
      zyx  — z/y/x.ext, y down
      sasplanet — zN/x/xXXXX/y/yYYYY bucketed dirs (1024-tile buckets),
                  zoom dir is z+1 (SASPlanet is 1-based)
    """
    z = int(z)
    x = int(x)
    y = int(y)
    if layout == "xyz":
        return f"{z}/{x}/{y}.{ext}"
    if layout == "tms":
        return f"{z}/{x}/{(1 << z) - 1 - y}.{ext}"
    if layout == "zyx":
        return f"{z}/{y}/{x}.{ext}"
    if layout == "sasplanet":
        return f"z{z + 1}/{x // 1024}/x{x}/{y // 1024}/y{y}.{ext}"
    raise ValueError(f"unknown layout {layout!r}")


def path_to_coord(path, layout="xyz"):
    """Relative path string → (z, x, y) XYZ-addressed. Inverse of
    :func:`coord_to_path` for every layout."""
    stem = path.rsplit(".", 1)[0]
    parts = stem.split("/")
    if layout == "xyz":
        z, x, y = int(parts[-3]), int(parts[-2]), int(parts[-1])
    elif layout == "tms":
        z, x, yt = int(parts[-3]), int(parts[-2]), int(parts[-1])
        y = (1 << z) - 1 - yt
    elif layout == "zyx":
        z, y, x = int(parts[-3]), int(parts[-2]), int(parts[-1])
    elif layout == "sasplanet":
        z = int(parts[-5][1:]) - 1
        x = int(parts[-3][1:])
        y = int(parts[-1][1:])
    else:
        raise ValueError(f"unknown layout {layout!r}")
    return z, x, y


TILE_LAYOUTS = ("xyz", "tms", "zyx", "sasplanet")


# ---------------------------------------------------------------------------
# zoom-spec parser (tiler_functions.py option parsing — §2.8)
# ---------------------------------------------------------------------------


def parse_zoom_spec(spec, z_min_default=0, z_max_default=MAX_ZOOM):
    """Parse "8:12,15" / "5" / "8:" / ":10" → sorted list of zooms.

    Mirrors the --zoom option grammar of gdal_tiler/tiles_convert [C]."""
    if spec is None or spec == "":
        return list(range(z_min_default, z_max_default + 1))
    zooms = set()
    for part in str(spec).split(","):
        part = part.strip()
        if ":" in part:
            lo_s, hi_s = part.split(":", 1)
            lo = int(lo_s) if lo_s else z_min_default
            hi = int(hi_s) if hi_s else z_max_default
            zooms.update(range(lo, hi + 1))
        else:
            zooms.add(int(part))
    out = sorted(z for z in zooms if 0 <= z <= MAX_ZOOM)
    if not out:
        raise ValueError(f"empty zoom spec {spec!r}")
    return out
