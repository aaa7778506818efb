"""Single-process reference tiler — the conformance target.

GDAL and the upstream scripts are absent (SURVEY.md §0: the reference
snapshot is empty), so "match the reference on its own inputs" is
operationalized as "match this module, which implements the public
tile-math spec verbatim in plain, sequential numpy" (SURVEY.md §7.6 —
substitution documented). No Ray anywhere in this file; orchestration
is a dict-of-lists loop, so any agreement with the distributed engine
validates the engine's fan-out / shuffle / salting / resume logic.

Outputs:
  tile_pyramid(...)  → {tile_key: (pixels, caption, src_ids)} for all
                       zooms in [z_min, z_base]
  spatial_join(...)  → list of (image_id, region_id) rows
  tile_assignments(...) → list of (image_id, tile_key) rows (base zoom)
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from . import codecs
from . import geometry as geo
from . import raster
from . import tilegrid as tg


def load_images(images_path):
    return pq.read_table(images_path)


def auto_zoom(images_table):
    """Global base zoom = max over images of the per-image optimal zoom
    (gdal_tiler's default max-zoom rule, applied job-wide)."""
    gts = images_table.column("gt").to_pylist()
    srs = images_table.column("srs").to_pylist()
    res = []
    for g, s in zip(gts, srs):
        r = abs(g[1])
        tm = raster._tmerc_of(s)
        if tm is not None:  # UTM ground meters → merc meters (1/cosφ)
            _, lat0 = tm.inverse(g[0], g[3])
            r = r / max(np.cos(np.radians(float(lat0))), 1e-6)
        elif s == "EPSG:4326":
            r = r * tg.ORIGIN / 180.0
        res.append(r)
    return int(max(int(tg.auto_base_zoom(r)) for r in res))


def iter_image_rows(images_table):
    cols = {name: images_table.column(name).to_pylist() for name in
            ("image_id", "bytes", "fmt", "caption", "gt", "srs",
             "cutline_wkb", "zorder")}
    cols["poly"] = (
        images_table.column("poly").to_pylist()
        if "poly" in images_table.schema.names
        else [None] * images_table.num_rows
    )
    for i in range(images_table.num_rows):
        row = {k: v[i] for k, v in cols.items()}
        if row["poly"] is not None:
            row["poly"] = np.asarray(row["poly"], dtype=np.float64)
        yield row


def tile_pyramid(images_table, z_base=None, z_min=4, resampling="nearest"):
    """Cut base tiles and build overviews, sequentially."""
    if z_base is None:
        z_base = auto_zoom(images_table)
    per_tile = {}
    for row in iter_image_rows(images_table):
        pixels = codecs.decode_image(row["bytes"], row["fmt"])
        cutline = raster.parse_wkb_polygon(row["cutline_wkb"])
        gt = np.asarray(row["gt"], dtype=np.float64)
        for z, x, y, frag in raster.emit_fragments_for_image(
            pixels, gt, row["srs"], cutline, [z_base], resampling,
            poly=row["poly"],
        ):
            key = int(tg.pack_key(z, x, y))
            per_tile.setdefault(key, []).append(
                (row["zorder"], row["image_id"], row["caption"], frag)
            )
    out = {}
    for key, entries in per_tile.items():
        out[key] = raster.reduce_base_group(entries)
    # overview loop z_base-1 .. z_min
    level = {k: v for k, v in out.items()}
    for z in range(z_base - 1, z_min - 1, -1):
        parents = {}
        for key, val in level.items():
            kz, kx, ky = (int(v) for v in tg.unpack_key(key))
            pkey = int(tg.pack_key(z, kx >> 1, ky >> 1))
            parents.setdefault(pkey, {})[(kx & 1, ky & 1)] = val
        level = {pk: raster.reduce_parent_group(ch) for pk, ch in parents.items()}
        out.update(level)
    return out


def tile_assignments(images_table, z_base=None, resampling="nearest"):
    """(image_id, tile_key) rows at base zoom — the 'tile assignment'
    invariant of BASELINE.json:14 (exact-match gate)."""
    if z_base is None:
        z_base = auto_zoom(images_table)
    rows = []
    for row in iter_image_rows(images_table):
        pixels = codecs.decode_image(row["bytes"], row["fmt"])
        cutline = raster.parse_wkb_polygon(row["cutline_wkb"])
        gt = np.asarray(row["gt"], dtype=np.float64)
        for z, x, y, _ in raster.emit_fragments_for_image(
            pixels, gt, row["srs"], cutline, [z_base], resampling,
            poly=row["poly"],
        ):
            rows.append((row["image_id"], int(tg.pack_key(z, x, y))))
    return rows


def spatial_join(images_table, coverage_table, knn_eps=None, level=7):
    """(image_id, region_id) rows: image footprint centroid assigned to
    a coverage region via cell-prefiltered PIP (+ optional kNN ε
    fallback). Unmatched images are dropped (inner-join semantics)."""
    idx = geo.CoverageIndex(
        coverage_table.column("region_id").to_pylist(),
        coverage_table.column("ring_xy").to_pylist(),
        level=level,
    )
    ids = images_table.column("image_id").to_pylist()
    gts = images_table.column("gt").to_pylist()
    srs = images_table.column("srs").to_pylist()
    ws = images_table.column("w").to_pylist()
    hs = images_table.column("h").to_pylist()
    cx = np.empty(len(ids))
    cy = np.empty(len(ids))
    for i in range(len(ids)):
        corners = raster.source_to_merc_corners(
            np.asarray(gts[i]), ws[i], hs[i], srs[i]
        )
        cx[i], cy[i] = corners[:, 0].mean(), corners[:, 1].mean()
    ordinals = idx.assign(cx, cy, knn_eps=knn_eps)
    return [
        (ids[i], idx.region_ids[int(o)])
        for i, o in enumerate(ordinals)
        if o >= 0
    ]
