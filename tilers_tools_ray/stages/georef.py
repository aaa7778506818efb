"""Georeference ingestion — the map2gdal equivalent (SURVEY.md §3.2).

The reference's readers (reader_ozi.py / reader_bsb.py / reader_geo.py
/ reader_kml.py) parse per-format header text into (srs, GCP refs,
cutline, datum shift) and delegate the transform solve to gdal [C].
Engine equivalent: a column-producing ``map_batches`` stage that
parses the Ozi-style sidecar text (corpus.py grammar), resolves the
datum via the broadcast DATUM_TABLE (J1/T4 — the reference's only
"join table"), solves the affine via batched least squares (M3), and
emits gt/srs/cutline columns. Pure tasks — no actor state needed
(the datum table ships via closure capture, Ray's broadcast for
module constants).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .. import geometry as geo
from .. import raster
from ..corpus import DATUM_TABLE

_POINT_RE = re.compile(
    r"^Point\d+,xy,([-\d.]+),([-\d.]+),world,([-\d.]+),([-\d.]+)$"
)
# DMS variant (real Ozi Point records carry deg,min + hemisphere for
# lat then lon): PointNN,xy,px,py,dms,DD,MM.MMM,N|S,DD,MM.MMM,E|W
_POINT_DMS_RE = re.compile(
    r"^Point\d+,xy,([-\d.]+),([-\d.]+),dms,"
    r"(\d+),([\d.]+),([NS]),(\d+),([\d.]+),([EW])$"
)
_MMPXY_RE = re.compile(r"^MMPXY,\d+,([-\d.]+),([-\d.]+)$")


def dms_to_deg(deg, minutes=0.0, seconds=0.0, hemi=""):
    """DMS → signed decimal degrees (§2.8 scalar — the readers'
    coordinate-normalization helper; S/W hemispheres negate)."""
    v = abs(float(deg)) + float(minutes) / 60.0 + float(seconds) / 3600.0
    if str(hemi).upper() in ("S", "W") or float(deg) < 0:
        v = -v
    return v


#: affine max-residual (source px) beyond which ≥6-GCP sidecars get an
#: order-2 polynomial refinement (the reference's `gdal_translate
#: -gcp -order 2` path for warped paper scans [R])
GCP_POLY_RESIDUAL_PX = 0.5


def solve_gcps(px, py, wx, wy, order="auto"):
    """GCPs → (gt, poly): always the affine fit (M3), plus a warp
    record when the GCPs call for one — the full upstream
    ``gdal_translate -gcp -order 1|2|3`` / ``-tps`` surface [R]:

      order='auto'  order-2 refinement when ≥6 GCPs and the affine
                    residual exceeds GCP_POLY_RESIDUAL_PX source px
                    (scanned charts with warped paper)
      order=1       affine-only
      order=2 / 3   force that polynomial order (geometry.solve_poly)
      order='tps'   thin-plate spline (geometry.solve_tps)

    auto stays conservative (never escalates past order 2 on its own:
    higher orders interpolate GCP noise unless explicitly asked for)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    wx = np.asarray(wx, dtype=np.float64)
    wy = np.asarray(wy, dtype=np.float64)
    gt = geo.solve_affine(px, py, wx, wy)
    poly = None
    if order == "tps":
        poly = geo.solve_tps(px, py, wx, wy)
    elif order == 3:
        poly = geo.solve_poly(px, py, wx, wy, order=3)
    elif order == 2 or (order == "auto" and len(px) >= 6):
        inv = geo.invert_gt(gt)
        rx = inv[0] + inv[1] * wx + inv[2] * wy - px
        ry = inv[3] + inv[4] * wx + inv[5] * wy - py
        resid = float(np.hypot(rx, ry).max())
        if order == 2 or resid > GCP_POLY_RESIDUAL_PX:
            poly = geo.solve_poly2(px, py, wx, wy)
    return gt, poly


def parse_georef_text(text, order="auto"):
    """One sidecar → (gt, srs, cutline ring, datum, poly). Raises
    ValueError on malformed input (tested contract). ``poly`` is the
    order-2 refinement record or None (see solve_gcps)."""
    lines = text.splitlines()
    if not lines or not lines[0].startswith("OziExplorer Map Data File"):
        raise ValueError("not an Ozi-style sidecar")
    datum, srs = lines[2].split(",", 1)
    if datum not in DATUM_TABLE:
        raise ValueError(f"unknown datum {datum!r}")
    shift = DATUM_TABLE[datum]
    px, py, wx, wy = [], [], [], []
    ring = []
    for ln in lines[3:]:
        m = _POINT_RE.match(ln)
        if m:
            px.append(float(m.group(1)))
            py.append(float(m.group(2)))
            wx.append(float(m.group(3)) - shift[0])
            wy.append(float(m.group(4)) - shift[1])
            continue
        m = _POINT_DMS_RE.match(ln)
        if m:  # lat-dms then lon-dms, as in real Ozi Point records
            px.append(float(m.group(1)))
            py.append(float(m.group(2)))
            lat = dms_to_deg(m.group(3), m.group(4), hemi=m.group(5))
            lon = dms_to_deg(m.group(6), m.group(7), hemi=m.group(8))
            wx.append(lon - shift[0])
            wy.append(lat - shift[1])
            continue
        m = _MMPXY_RE.match(ln)
        if m:
            ring.append((float(m.group(1)), float(m.group(2))))
    if len(px) < 3:
        raise ValueError("need ≥3 GCPs to solve an affine")
    gt, poly = solve_gcps(px, py, wx, wy, order=order)
    return gt, srs, np.array(ring, dtype=np.float64), datum, poly


_KML_BOX_RE = re.compile(
    r"<(north|south|east|west|rotation)>\s*([-\d.eE]+)\s*</\1>"
)
_KML_NAME_RE = re.compile(r"<name>\s*([^<]+?)\s*</name>")
_KML_SIZE_RE = re.compile(r"<!--\s*size\s+(\d+)x(\d+)\s*-->")


def parse_kml_groundoverlay(text, order="auto"):  # noqa: ARG001 — 4 exact corners; order is moot
    """KML GroundOverlay reader (reader_kml.py equivalent, S5 [R]):
    ``<LatLonBox>`` north/south/east/west (+rotation) → corner GCPs →
    affine in EPSG:4326. ``<rotation>`` follows the KML spec: degrees
    counter-clockwise about the box center, applied in the flat
    lon/lat plane — the box corners are rotated before the solve, and
    the 4-corner affine fit is then exact (rotated affine). The pixel
    size comes from a ``<!-- size WxH -->`` annotation (the reference
    reads it from the image file; payloads here are opaque to the
    parser)."""
    vals = {m.group(1): float(m.group(2)) for m in _KML_BOX_RE.finditer(text)}
    for k in ("north", "south", "east", "west"):
        if k not in vals:
            raise ValueError(f"KML GroundOverlay missing <{k}>")
    m = _KML_SIZE_RE.search(text)
    if not m:
        raise ValueError("missing size annotation")
    w, h = int(m.group(1)), int(m.group(2))
    # corners: pixel (0,0)=NW, (w,0)=NE, (w,h)=SE, (0,h)=SW
    px = np.array([0.0, w, w, 0.0])
    py = np.array([0.0, 0.0, h, h])
    wx = np.array([vals["west"], vals["east"], vals["east"], vals["west"]])
    wy = np.array([vals["north"], vals["north"], vals["south"], vals["south"]])
    rot = np.radians(vals.get("rotation", 0.0))
    if rot != 0.0:
        cx, cy = wx.mean(), wy.mean()
        dx, dy = wx - cx, wy - cy
        wx = cx + dx * np.cos(rot) - dy * np.sin(rot)
        wy = cy + dx * np.sin(rot) + dy * np.cos(rot)
    gt = geo.solve_affine(px, py, wx, wy)
    ring = np.array([[0, 0], [w, 0], [w, h], [0, h]], dtype=np.float64)
    return gt, "EPSG:4326", ring, "WGS 84", None


_BSB_REF_RE = re.compile(
    r"^REF/\d+,([-\d.]+),([-\d.]+),([-\d.]+),([-\d.]+)\s*$"
)
_BSB_PLY_RE = re.compile(r"^PLY/\d+,([-\d.]+),([-\d.]+)\s*$")
_BSB_GD_RE = re.compile(r"^KNP/.*GD=([^,]+)")


def parse_bsb_header(text, order="auto"):
    """BSB/KAP chart-header reader (reader_bsb.py equivalent, S3 [C
    semantics]): ``REF/n,px,py,lat,lon`` GCP records → affine in
    EPSG:4326, ``PLY/n,px,py`` border polygon, ``KNP/...GD=`` datum
    name resolved via the datum table (J1)."""
    px, py, wx, wy = [], [], [], []
    ring = []
    datum = "WGS 84"
    for ln in text.splitlines():
        m = _BSB_REF_RE.match(ln)
        if m:
            px.append(float(m.group(1)))
            py.append(float(m.group(2)))
            wy.append(float(m.group(3)))  # lat
            wx.append(float(m.group(4)))  # lon
            continue
        m = _BSB_PLY_RE.match(ln)
        if m:
            ring.append((float(m.group(1)), float(m.group(2))))
            continue
        m = _BSB_GD_RE.match(ln)
        if m:
            datum = m.group(1).strip()
    if datum not in DATUM_TABLE:
        raise ValueError(f"unknown datum {datum!r}")
    if len(px) < 3:
        raise ValueError("need ≥3 REF records to solve an affine")
    shift = DATUM_TABLE[datum]
    wx = np.asarray(wx) - shift[0]
    wy = np.asarray(wy) - shift[1]
    gt, poly = solve_gcps(px, py, wx, wy, order=order)
    return gt, "EPSG:4326", np.array(ring, dtype=np.float64), datum, poly


_GEO_KV_RE = re.compile(r"^\s*(\w+)\s*=\s*(.*?)\s*$")
_GEO_POINT_RE = re.compile(
    r"^Point\d+$"  # key side; values parsed as px, py, wx, wy
)
_GEO_VERTEX_RE = re.compile(r"^Vertex\d+$")


def parse_geo_header(text, order="auto"):
    """ChartWorld ``.geo`` header reader (reader_geo.py equivalent,
    S4 [C semantics]): ``Name = value`` records —

      ``Datum = <name>``           datum resolved via DATUM_TABLE (J1)
      ``Projection = <srs>``       default EPSG:4326
      ``PointNN = px, py, wx, wy`` GCPs (≥3 → affine solve, M3)
      ``VertexNN = px, py``        border polygon vertices

    Returns (gt, srs, ring, datum) like every registry parser."""
    datum = "WGS 84"
    srs = "EPSG:4326"
    px, py, wx, wy = [], [], [], []
    ring = []
    saw_geo = False
    for ln in text.splitlines():
        m = _GEO_KV_RE.match(ln)
        if not m:
            continue
        key, val = m.group(1), m.group(2)
        if key in ("Bitmap", "Name"):
            saw_geo = True
        elif key == "Datum":
            datum = val
        elif key == "Projection":
            srs = val
        elif _GEO_POINT_RE.match(key):
            parts = [float(v) for v in val.split(",")]
            if len(parts) != 4:
                raise ValueError(f"malformed .geo GCP: {ln!r}")
            px.append(parts[0])
            py.append(parts[1])
            wx.append(parts[2])
            wy.append(parts[3])
        elif _GEO_VERTEX_RE.match(key):
            parts = [float(v) for v in val.split(",")]
            if len(parts) != 2:
                raise ValueError(f"malformed .geo vertex: {ln!r}")
            ring.append((parts[0], parts[1]))
    if not saw_geo:
        raise ValueError("not a .geo header (no Bitmap/Name record)")
    if datum not in DATUM_TABLE:
        raise ValueError(f"unknown datum {datum!r}")
    if len(px) < 3:
        raise ValueError("need ≥3 Point records to solve an affine")
    shift = DATUM_TABLE[datum]
    gt, poly = solve_gcps(
        px, py, np.asarray(wx) - shift[0], np.asarray(wy) - shift[1],
        order=order,
    )
    return gt, srs, np.array(ring, dtype=np.float64), datum, poly


#: reader registry keyed by sidecar format — the engine's equivalent of
#: the reference's reader_*.py dispatch (map2gdal format sniffing,
#: SURVEY.md §2.10 extension point a). New formats plug in here; the
#: Ray topology never changes.
GEOREF_PARSERS = {
    "ozi": parse_georef_text,
    "kml": parse_kml_groundoverlay,
    "bsb": parse_bsb_header,
    "geo": parse_geo_header,
}


def sniff_format(text):
    if text.lstrip().startswith("OziExplorer Map Data File"):
        return "ozi"
    if "<GroundOverlay" in text or "<LatLonBox" in text:
        return "kml"
    if re.search(r"^(KNP/|REF/\d)", text, re.M):
        return "bsb"
    if re.search(r"^\s*(Bitmap|Name)\s*=", text, re.M):
        return "geo"
    raise ValueError("unrecognized georef sidecar format")


def parse_georef_any(text, order="auto"):
    return GEOREF_PARSERS[sniff_format(text)](text, order=order)


def parse_georef_batch(batch: pa.Table, order="auto") -> pa.Table:
    """images rows (image_id, georef_text) → parsed georef columns.
    ``poly_parsed`` is null for affine-only sidecars; ``order`` is the
    GCP solve policy (see solve_gcps: auto|1|2|3|'tps')."""
    ids = batch.column("image_id").to_pylist()
    texts = batch.column("georef_text").to_pylist()
    gts, srss, cuts, datums, polys = [], [], [], [], []
    for t in texts:
        gt, srs, ring, datum, poly = parse_georef_any(t, order=order)
        gts.append(gt.tolist())
        srss.append(srs)
        cuts.append(raster.wkb_polygon(ring))
        datums.append(datum)
        polys.append(None if poly is None else poly.tolist())
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "gt_parsed": pa.array(gts, pa.list_(pa.float64())),
            "srs_parsed": pa.array(srss, pa.string()),
            "cutline_wkb_parsed": pa.array(cuts, pa.binary()),
            "datum": pa.array(datums, pa.string()),
            "poly_parsed": pa.array(polys, pa.list_(pa.float64())),
        }
    )


def attach_parsed_georef(images_ds, order="auto"):
    """Dataset stage: parse sidecars for every row (stateless tasks)."""
    import functools

    fn = functools.partial(parse_georef_batch, order=order)
    return images_ds.map_batches(fn, batch_format="pyarrow")
