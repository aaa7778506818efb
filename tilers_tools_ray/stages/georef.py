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
_MMPXY_RE = re.compile(r"^MMPXY,\d+,([-\d.]+),([-\d.]+)$")


def parse_georef_text(text):
    """One sidecar → (gt, srs, cutline ring, datum). Raises ValueError
    on malformed input (tested contract)."""
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
        m = _MMPXY_RE.match(ln)
        if m:
            ring.append((float(m.group(1)), float(m.group(2))))
    if len(px) < 3:
        raise ValueError("need ≥3 GCPs to solve an affine")
    gt = geo.solve_affine(np.array(px), np.array(py), np.array(wx), np.array(wy))
    return gt, srs, np.array(ring, dtype=np.float64), datum


def parse_georef_batch(batch: pa.Table) -> pa.Table:
    """images rows (image_id, georef_text) → parsed georef columns."""
    ids = batch.column("image_id").to_pylist()
    texts = batch.column("georef_text").to_pylist()
    gts, srss, cuts, datums = [], [], [], []
    for t in texts:
        gt, srs, ring, datum = parse_georef_text(t)
        gts.append(gt.tolist())
        srss.append(srs)
        cuts.append(raster.wkb_polygon(ring))
        datums.append(datum)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "gt_parsed": pa.array(gts, pa.list_(pa.float64())),
            "srs_parsed": pa.array(srss, pa.string()),
            "cutline_wkb_parsed": pa.array(cuts, pa.binary()),
            "datum": pa.array(datums, pa.string()),
        }
    )


def attach_parsed_georef(images_ds):
    """Dataset stage: parse sidecars for every row (stateless tasks)."""
    return images_ds.map_batches(parse_georef_batch, batch_format="pyarrow")
