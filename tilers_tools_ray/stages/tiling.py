"""Ray Data stages for the tile pyramid (SURVEY.md §3.1 engine flow).

Design: the engine's ONE big shuffle per level is a
``groupby(part)`` where ``part`` is the tile's quadtree ancestor cell
at a coarse zoom (z_part). A part is the unit of:
  - the composite reduce (every tile's fragments land in one group,
    because tile cells nest inside part cells),
  - the output parquet file (one file per part → resumable),
  - the lineage manifest row (per-partition lineage, BASELINE.json:14).

Skew (§4.2): hot parts get salted into contiguous-zorder ranges —
``salt = zorder * s // n_zorder`` — partial-composited per
(part, salt), then merged per part in salt order. Exact because
fragment alpha is binary (cutline mask), so composite is
"latest-opaque-wins per pixel", associative over ordered ranges.

All hot stages use ``batch_format="pyarrow"``; pixels travel as
zlib-1-packed RGBA ``binary`` values (≈17× smaller than raw for map
imagery at >250 MB/s — the shuffle moves ~150 MB instead of 2.5 GB
per 10k fragments) — never Python objects. ``pack_pixels`` /
``unpack_pixels`` are the only codec for in-flight tile pixels.

Reference parity: decode = M1 (PIL in the reference), warp-cut =
gdal_tiler's per-tile warp window (M4–M7), composite = tiles_merge
paste-with-mask (A1/J4), overview = gdal_tiler overview loop (A2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import codecs, raster
from .. import tilegrid as tg

TILE = tg.TILE_SIZE

FRAGMENT_SCHEMA = pa.schema(
    [
        ("part", pa.int64()),
        ("salt", pa.int32()),
        ("tile_key", pa.int64()),
        ("zorder", pa.int32()),
        ("image_id", pa.string()),
        ("caption", pa.string()),
        ("frag", pa.binary()),
    ]
)

TILE_SCHEMA = pa.schema(
    [
        ("part", pa.int64()),
        ("tile_key", pa.int64()),
        ("z", pa.int8()),
        ("x", pa.int32()),
        ("y", pa.int32()),
        ("pixels", pa.binary()),
        ("caption", pa.string()),
        ("src_ids", pa.list_(pa.string())),
        ("checksum", pa.int64()),
    ]
)

PARTIAL_SCHEMA = pa.schema(
    [
        ("part", pa.int64()),
        ("salt", pa.int32()),
        ("tile_key", pa.int64()),
        ("pixels", pa.binary()),
        ("best_cov", pa.int64()),
        ("best_id", pa.string()),
        ("best_caption", pa.string()),
        ("src_ids", pa.list_(pa.string())),
    ]
)


def pack_pixels(arr):
    """256×256×4 uint8 → zlib-1 bytes (the in-flight pixel format)."""
    import zlib

    return zlib.compress(np.ascontiguousarray(arr).tobytes(), 1)


def unpack_pixels(buf):
    import zlib

    return np.frombuffer(zlib.decompress(buf), dtype=np.uint8).reshape(
        TILE, TILE, 4
    )


_np_frag = unpack_pixels  # internal alias


def part_of_key(key, z_part):
    """Quadtree ancestor cell of tile_key at zoom z_part (vectorized)."""
    z, x, y = tg.unpack_key(key)
    shift = z - z_part
    return tg.pack_key(np.full_like(z, z_part), x >> shift, y >> shift)


def _maybe_get(ref):
    if ref is None or isinstance(ref, (dict, set, frozenset)):
        return ref
    import ray

    return ray.get(ref)


class FragmentEmitter:
    """Decode (M1) + warp-cut (M4–M7) actor-pool stage (T1/T2).

    State built once per actor: broadcast salt plan + done-part set
    (``ray.put`` ObjectRefs resolved in __init__, never per batch).
    Resume (D2/§4.3): tiles whose part is in ``done_parts`` are not
    emitted; an image is not even decoded when ALL its tiles are done.
    """

    def __init__(
        self,
        z_base,
        z_part,
        resampling="nearest",
        salt_plan=None,
        n_zorder=1,
        done_parts=None,
        profile="mercator",
        on_bad="raise",
    ):
        self.z_base = int(z_base)
        self.z_part = int(z_part)
        self.resampling = resampling
        self.salt_plan = _maybe_get(salt_plan) or {}
        self.n_zorder = max(int(n_zorder), 1)
        self.done_parts = _maybe_get(done_parts) or frozenset()
        self.profile = profile
        # "raise" (default) fails the job on a corrupt row; "skip"
        # drops the image whole (per-image buffering below guarantees
        # no partial fragments) and logs it — at the 100 TB target a
        # handful of corrupt blobs must not kill a multi-hour job
        self.on_bad = on_bad

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in FRAGMENT_SCHEMA.names}
        cols = {
            name: batch.column(name).to_pylist()
            for name in (
                "image_id",
                "bytes",
                "w",
                "h",
                "fmt",
                "caption",
                "gt",
                "srs",
                "cutline_wkb",
                "zorder",
            )
        }
        # optional order-2 GCP polynomial column (null → affine gt)
        cols["poly"] = (
            batch.column("poly").to_pylist()
            if "poly" in batch.schema.names
            else [None] * batch.num_rows
        )
        shift = self.z_base - self.z_part
        for i in range(batch.num_rows):
            mine = {k: [] for k in FRAGMENT_SCHEMA.names}  # per-image
            # buffer: on a mid-image failure nothing partial is emitted
            try:
                gt = np.asarray(cols["gt"][i], dtype=np.float64)
                srs = cols["srs"][i]
                zo = int(cols["zorder"][i])
                for z, x, y, frag in self._fragments(cols, i, gt, srs):
                    key = int(tg.pack_key(z, x, y))
                    part = int(
                        tg.pack_key(self.z_part, x >> shift, y >> shift)
                    )
                    if part in self.done_parts:
                        continue
                    s = self.salt_plan.get(part, 1)
                    salt = zo * s // self.n_zorder if s > 1 else 0
                    mine["part"].append(part)
                    mine["salt"].append(salt)
                    mine["tile_key"].append(key)
                    mine["zorder"].append(zo)
                    mine["image_id"].append(cols["image_id"][i])
                    mine["caption"].append(cols["caption"][i])
                    mine["frag"].append(pack_pixels(frag))
            except Exception as ex:
                if self.on_bad != "skip":
                    raise
                import logging

                logging.getLogger(__name__).warning(
                    "skipping bad image %r: %s", cols["image_id"][i], ex
                )
                continue
            for k in out:
                out[k].extend(mine[k])
        return pa.table(out, schema=FRAGMENT_SCHEMA)

    def _fragments(self, cols, i, gt, srs):
        """Lazy decode: the touched-tile list comes from georef + (w, h)
        columns alone, so an image whose parts are ALL done is never
        decoded (resume fast path, §4.3)."""
        w, h = int(cols["w"][i]), int(cols["h"][i])
        poly = cols["poly"][i]
        if poly is not None:
            poly = np.asarray(poly, dtype=np.float64)
        xs, ys = raster.base_tiles_for_image(
            gt, w, h, srs, self.z_base, profile=self.profile, poly=poly
        )
        shift = self.z_base - self.z_part
        todo = [
            (int(x), int(y))
            for x, y in zip(xs.tolist(), ys.tolist())
            if int(tg.pack_key(self.z_part, x >> shift, y >> shift))
            not in self.done_parts
        ]
        if not todo:
            return
        pixels = codecs.decode_image(cols["bytes"][i], cols["fmt"][i])
        cutline = raster.parse_wkb_polygon(cols["cutline_wkb"][i])
        only = set(todo) if len(todo) < len(xs) else None
        yield from raster.emit_fragments_for_image(
            pixels, gt, srs, cutline, [self.z_base], self.resampling,
            only_tiles=only, profile=self.profile, poly=poly,
        )


class TouchedParts:
    """Georef-only pre-pass (no decode): emit (part, n_frags) partial
    counts per batch — the census feeding the salt plan (§4.2) and the
    per-part fragment estimate. Pre-aggregated inside the batch so the
    following groupby shuffles one row per (batch, part)."""

    def __init__(self, z_base, z_part, profile="mercator"):
        self.z_base = int(z_base)
        self.z_part = int(z_part)
        self.profile = profile

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = {}
        gts = batch.column("gt").to_pylist()
        srss = batch.column("srs").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        polys = (
            batch.column("poly").to_pylist()
            if "poly" in batch.schema.names
            else [None] * batch.num_rows
        )
        shift = self.z_base - self.z_part
        for i in range(batch.num_rows):
            gt = np.asarray(gts[i], dtype=np.float64)
            poly = polys[i]
            if poly is not None:
                poly = np.asarray(poly, dtype=np.float64)
            xs, ys = raster.base_tiles_for_image(
                gt, ws[i], hs[i], srss[i], self.z_base, profile=self.profile,
                poly=poly,
            )
            parts = tg.pack_key(
                np.full(len(xs), self.z_part, dtype=np.int64),
                xs >> shift,
                ys >> shift,
            )
            uniq, cnt = np.unique(parts, return_counts=True)
            for p, c in zip(uniq.tolist(), cnt.tolist()):
                counts[p] = counts.get(p, 0) + c
        return pa.table(
            {
                "part": pa.array(list(counts), pa.int64()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )


# ---------------------------------------------------------------------------
# part-group reduces
# ---------------------------------------------------------------------------


def _tile_rows(reduced):
    """reduced: list of (part, tile_key, pixels, caption, src_ids)."""
    out = {k: [] for k in TILE_SCHEMA.names}
    for part, key, pixels, caption, src_ids in reduced:
        z, x, y = (int(v) for v in tg.unpack_key(key))
        out["part"].append(part)
        out["tile_key"].append(key)
        out["z"].append(z)
        out["x"].append(x)
        out["y"].append(y)
        out["pixels"].append(pack_pixels(pixels))
        out["caption"].append(caption)
        out["src_ids"].append(src_ids)
        out["checksum"].append(raster.tile_checksum(pixels))
    return pa.table(out, schema=TILE_SCHEMA)


def composite_part_group(group: pa.Table) -> pa.Table:
    """All fragments of one part → that part's tile rows (A1/J4).

    Fast path: a tile with a single contributing fragment passes its
    packed pixel buffer straight through (no decompress → composite →
    recompress cycle); most tiles are single-source in practice."""
    keys = group.column("tile_key").to_pylist()
    zo = group.column("zorder").to_pylist()
    ids = group.column("image_id").to_pylist()
    caps = group.column("caption").to_pylist()
    frags = group.column("frag").to_pylist()
    part = int(group.column("part")[0].as_py())
    per_tile = {}
    for i, k in enumerate(keys):
        per_tile.setdefault(k, []).append(i)
    out = {c: [] for c in TILE_SCHEMA.names}
    for k in sorted(per_tile):
        idx = per_tile[k]
        if len(idx) == 1:
            i = idx[0]
            buf, caption, src_ids = frags[i], caps[i], [ids[i]]
            checksum = raster.tile_checksum(_np_frag(buf))
        else:
            entries = [(zo[i], ids[i], caps[i], _np_frag(frags[i])) for i in idx]
            pixels, caption, src_ids = raster.reduce_base_group(entries)
            buf = pack_pixels(pixels)
            checksum = raster.tile_checksum(pixels)
        z, x, y = (int(v) for v in tg.unpack_key(k))
        out["part"].append(part)
        out["tile_key"].append(k)
        out["z"].append(z)
        out["x"].append(x)
        out["y"].append(y)
        out["pixels"].append(buf)
        out["caption"].append(caption)
        out["src_ids"].append(src_ids)
        out["checksum"].append(checksum)
    return pa.table(out, schema=TILE_SCHEMA)


def partial_composite_group(group: pa.Table) -> pa.Table:
    """Salted variant stage 1: composite one (part, salt) zorder-range."""
    keys = group.column("tile_key").to_pylist()
    zo = group.column("zorder").to_pylist()
    ids = group.column("image_id").to_pylist()
    caps = group.column("caption").to_pylist()
    frags = group.column("frag").to_pylist()
    part = int(group.column("part")[0].as_py())
    salt = int(group.column("salt")[0].as_py())
    per_tile = {}
    for i, k in enumerate(keys):
        per_tile.setdefault(k, []).append(i)
    out = {k: [] for k in PARTIAL_SCHEMA.names}
    for k in sorted(per_tile):
        idx = per_tile[k]
        out["part"].append(part)
        out["salt"].append(salt)
        out["tile_key"].append(k)
        if len(idx) == 1:
            # single fragment in this salt range → reuse its packed
            # buffer; unpack only for the opaque-coverage count the
            # caption policy needs at merge time
            i = idx[0]
            out["pixels"].append(frags[i])
            out["best_cov"].append(int((_np_frag(frags[i])[:, :, 3] > 0).sum()))
            out["best_id"].append(ids[i])
            out["best_caption"].append(caps[i])
            out["src_ids"].append([ids[i]])
            continue
        entries = sorted(
            ((zo[i], ids[i], caps[i], _np_frag(frags[i])) for i in idx),
            key=lambda e: (e[0], e[1]),
        )
        pixels = raster.composite_fragments([e[3] for e in entries])
        covs = [int((e[3][:, :, 3] > 0).sum()) for e in entries]
        bi = max(
            range(len(entries)),
            key=lambda j: (covs[j], raster._neg_id(entries[j][1])),
        )
        out["pixels"].append(pack_pixels(pixels))
        out["best_cov"].append(covs[bi])
        out["best_id"].append(entries[bi][1])
        out["best_caption"].append(entries[bi][2])
        out["src_ids"].append([e[1] for e in entries])
    return pa.table(out, schema=PARTIAL_SCHEMA)


def merge_partials_group(group: pa.Table) -> pa.Table:
    """Salted variant stage 2: merge one part's partials, per tile, in
    ascending salt (= ascending zorder range) order."""
    part = int(group.column("part")[0].as_py())
    keys = group.column("tile_key").to_pylist()
    salts = group.column("salt").to_pylist()
    pix = group.column("pixels").to_pylist()
    covs = group.column("best_cov").to_pylist()
    bids = group.column("best_id").to_pylist()
    bcaps = group.column("best_caption").to_pylist()
    srcs = group.column("src_ids").to_pylist()
    per_tile = {}
    for i, k in enumerate(keys):
        per_tile.setdefault(k, []).append(i)
    out = {c: [] for c in TILE_SCHEMA.names}
    for k in sorted(per_tile):
        idx = sorted(per_tile[k], key=lambda i: salts[i])
        if len(idx) == 1:
            # single partial (unsalted part) → pass the buffer through
            i = idx[0]
            buf, caption, src_ids = pix[i], bcaps[i], list(srcs[i])
            checksum = raster.tile_checksum(_np_frag(buf))
        else:
            pixels = raster.composite_fragments([_np_frag(pix[i]) for i in idx])
            bi = max(idx, key=lambda i: (covs[i], raster._neg_id(bids[i])))
            buf = pack_pixels(pixels)
            caption = bcaps[bi]
            src_ids = [s for i in idx for s in srcs[i]]
            checksum = raster.tile_checksum(pixels)
        z, x, y = (int(v) for v in tg.unpack_key(k))
        out["part"].append(part)
        out["tile_key"].append(k)
        out["z"].append(z)
        out["x"].append(x)
        out["y"].append(y)
        out["pixels"].append(buf)
        out["caption"].append(caption)
        out["src_ids"].append(src_ids)
        out["checksum"].append(checksum)
    return pa.table(out, schema=TILE_SCHEMA)


# ---------------------------------------------------------------------------
# overview level (A2)
# ---------------------------------------------------------------------------


def add_parent_part(batch: pa.Table, z_part: int) -> pa.Table:
    """Tile rows at z → add (part at z_part of the PARENT key) + parent
    key columns for the next level's groupby."""
    keys = batch.column("tile_key").to_numpy()
    pk = tg.parent_key(keys)
    pz, px, py = tg.unpack_key(pk)
    shift = pz - z_part
    part = tg.pack_key(np.full_like(pz, z_part), px >> shift, py >> shift)
    batch = batch.drop_columns(["part"]) if "part" in batch.schema.names else batch
    batch = batch.append_column("parent_key", pa.array(pk, pa.int64()))
    return batch.append_column("part", pa.array(part, pa.int64()))


def downsample_part_group(group: pa.Table, mode="box") -> pa.Table:
    """All child tiles of one parent-part → parent tile rows (A2)."""
    part = int(group.column("part")[0].as_py())
    pkeys = group.column("parent_key").to_pylist()
    xs = group.column("x").to_pylist()
    ys = group.column("y").to_pylist()
    caps = group.column("caption").to_pylist()
    srcs = group.column("src_ids").to_pylist()
    pix = group.column("pixels").to_pylist()
    by_parent = {}
    for i, pk in enumerate(pkeys):
        by_parent.setdefault(pk, {})[(xs[i] & 1, ys[i] & 1)] = (
            _np_frag(pix[i]),
            caps[i],
            srcs[i],
        )
    reduced = []
    for pk in sorted(by_parent):
        pixels, caption, src_ids = raster.reduce_parent_group(
            by_parent[pk], mode
        )
        reduced.append((part, pk, pixels, caption, src_ids))
    return _tile_rows(reduced)


def cascade_part_group(group: pa.Table, z_min: int, z_base: int, mode="box"):
    """ONE group = all base tiles under one z_min-ancestor cell →
    the ENTIRE overview cascade z_base-1 … z_min for that cell, built
    locally (A2 applied level by level in-memory). Replaces one
    shuffle per level with a single shuffle for all levels — the
    per-level groupby chain was pure fixed overhead at cluster scale.

    Returns {z: tile-rows pa.Table}. Group size is bounded by
    4^(z_base - z_min) child tiles (the caller caps the span)."""
    part = int(group.column("part")[0].as_py())
    level = {}
    caps = group.column("caption").to_pylist()
    srcs = group.column("src_ids").to_pylist()
    pix = group.column("pixels").to_pylist()
    for i, k in enumerate(group.column("tile_key").to_pylist()):
        level[k] = (_np_frag(pix[i]), caps[i], list(srcs[i]))
    out = {}
    for z in range(z_base - 1, z_min - 1, -1):
        parents = {}
        for k, val in level.items():
            kz, kx, ky = (int(v) for v in tg.unpack_key(k))
            pk = int(tg.pack_key(z, kx >> 1, ky >> 1))
            parents.setdefault(pk, {})[(kx & 1, ky & 1)] = val
        level = {
            pk: raster.reduce_parent_group(ch, mode)
            for pk, ch in parents.items()
        }
        out[z] = _tile_rows(
            [(part, pk, v[0], v[1], v[2]) for pk, v in sorted(level.items())]
        )
    return out


# ---------------------------------------------------------------------------
# encode sink stage (M2)
# ---------------------------------------------------------------------------


class EncodeTiles:
    """Encode raw tile pixels into the requested format (actor pool)."""

    def __init__(self, fmt="png"):
        self.fmt = fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = [
            codecs.encode_image(_np_frag(p), self.fmt)
            for p in batch.column("pixels").to_pylist()
        ]
        out = batch.append_column("tile_bytes", pa.array(blobs, pa.binary()))
        return out.append_column(
            "fmt", pa.array([self.fmt] * batch.num_rows, pa.string())
        )
