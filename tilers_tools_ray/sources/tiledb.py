"""SQLite and gdbm tile-DB sources/sinks (SURVEY.md §2 S8).

The reference's ``tiles_convert.py`` supports SQLite tile caches
(Maemo-Mapper layout: one table ``maps(zoom, x, y, tile BLOB)``) and
Maemo-Mapper **gdbm** key/value caches alongside directory trees
[C semantics]. Engine equivalents:

  export_sqlite — tile Dataset → one SQLite file. SQLite is a
      single-writer store, so the sink deliberately funnels through
      the driver via ``iter_batches`` (streaming, bounded memory) —
      the scalable sink remains partitioned parquet; a tile DB is an
      interchange format, not a data lake.
  read_sqlite   — SQLite file → tile Dataset (driver reads row chunks,
      ``from_arrow_refs``-style via from_items batches).

Zoom convention note: Maemo-Mapper stores ``zoom = z + 1`` shifts in
some variants; we store plain XYZ (z, x, y) and record the layout name
in a ``meta`` table for self-description.
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np
import pyarrow as pa

from .. import tilegrid as tg


def export_sqlite(tiles_ds, db_path, *, fmt="png", batch_size=256):
    """Write (z, x, y, tile_bytes|pixels) rows into a SQLite tile DB.

    Accepts either pre-encoded ``tile_bytes`` or packed ``pixels``
    (encoded on the fly to ``fmt``). Returns the tile count."""
    from .. import codecs
    from ..stages import tiling

    if os.path.exists(db_path):
        os.remove(db_path)
    con = sqlite3.connect(db_path)
    con.execute(
        "CREATE TABLE maps (zoom INTEGER, x INTEGER, y INTEGER, tile BLOB, "
        "PRIMARY KEY (zoom, x, y))"
    )
    con.execute("CREATE TABLE meta (key TEXT PRIMARY KEY, value TEXT)")
    con.execute("INSERT INTO meta VALUES ('layout', 'xyz')")
    con.execute("INSERT INTO meta VALUES ('fmt', ?)", (fmt,))
    n = 0
    for batch in tiles_ds.iter_batches(
        batch_size=batch_size, batch_format="pyarrow"
    ):
        zs = batch.column("z").to_pylist()
        xs = batch.column("x").to_pylist()
        ys = batch.column("y").to_pylist()
        if "tile_bytes" in batch.schema.names:
            blobs = batch.column("tile_bytes").to_pylist()
        else:
            blobs = [
                codecs.encode_image(tiling.unpack_pixels(p), fmt)
                for p in batch.column("pixels").to_pylist()
            ]
        con.executemany(
            "INSERT OR REPLACE INTO maps VALUES (?,?,?,?)",
            zip(zs, xs, ys, blobs),
        )
        n += len(zs)
    con.commit()
    con.close()
    return n


_GDBM_META_PREFIX = b"meta:"


def _dbm_open(path, flag):
    """Open a key/value tile cache via the stdlib ``dbm`` family.

    Upstream ``tiles_convert.py`` reads/writes Maemo-Mapper **gdbm**
    caches [C semantics]. This container ships no ``_gdbm`` C module,
    so ``dbm.open`` transparently falls back to the pure-Python
    ``dbm.dumb`` backend — same key/value contract, different on-disk
    bytes. Where ``dbm.gnu`` is importable it is used natively; the
    layout code below is backend-agnostic by construction.
    """
    import dbm

    return dbm.open(path, flag)


def export_gdbm(tiles_ds, db_path, *, fmt="png", batch_size=256):
    """Write tile rows into a gdbm-style key/value cache.

    Key encoding follows the Maemo-Mapper convention the reference
    converts from: ``struct.pack('>III', zoom + 1, x, y)`` (zoom is
    stored off-by-one) [tiles_convert.py::gdbm layout, C semantics].
    Self-description lives under ``meta:*`` string keys. Like the
    SQLite sink this funnels through the driver (single-writer store;
    an interchange format, not a data lake). Returns the tile count.
    """
    import struct

    from .. import codecs
    from ..stages import tiling

    with _dbm_open(db_path, "n") as db:
        db[b"meta:layout"] = b"maemo-gdbm"
        db[b"meta:fmt"] = fmt.encode()
        n = 0
        for batch in tiles_ds.iter_batches(
            batch_size=batch_size, batch_format="pyarrow"
        ):
            zs = batch.column("z").to_pylist()
            xs = batch.column("x").to_pylist()
            ys = batch.column("y").to_pylist()
            if "tile_bytes" in batch.schema.names:
                blobs = batch.column("tile_bytes").to_pylist()
            else:
                blobs = [
                    codecs.encode_image(tiling.unpack_pixels(p), fmt)
                    for p in batch.column("pixels").to_pylist()
                ]
            for z, x, y, blob in zip(zs, xs, ys, blobs):
                db[struct.pack(">III", z + 1, x, y)] = blob
                n += 1
    return n


def read_gdbm(db_path):
    """gdbm-style tile cache → Dataset of (tile_key, z, x, y, tile_bytes, fmt).

    Driver-side key scan (dbm stores are single-process); downstream
    decode/transform stages run distributed, same shape as
    ``read_sqlite``."""
    import struct

    import ray.data as rd

    items = []
    with _dbm_open(db_path, "r") as db:
        raw_fmt = db.get(b"meta:fmt", b"png")
        fmt = raw_fmt.decode()
        if hasattr(db, "firstkey"):  # gdbm iteration protocol
            keys, k = [], db.firstkey()
            while k is not None:
                keys.append(k)
                k = db.nextkey(k)
        else:  # dumb/ndbm expose keys() directly
            keys = list(db.keys())
        for key in keys:
            if key.startswith(_GDBM_META_PREFIX):
                continue
            if len(key) != 12:
                raise ValueError(f"corrupt gdbm tile key: {key!r}")
            z1, x, y = struct.unpack(">III", key)
            z = z1 - 1
            items.append(
                {
                    "tile_key": int(tg.pack_key(z, x, y)),
                    "z": z,
                    "x": int(x),
                    "y": int(y),
                    "tile_bytes": bytes(db[key]),
                    "fmt": fmt,
                }
            )
    items.sort(key=lambda r: r["tile_key"])
    return rd.from_items(items)


def read_sqlite(db_path, chunk_rows=1024):
    """SQLite tile DB → Dataset of (tile_key, z, x, y, tile_bytes, fmt).

    The driver streams fixed-size row chunks out of SQLite (single
    reader by design) and hands them to Ray as items; downstream
    decode/transform stages then run distributed."""
    import ray.data as rd

    con = sqlite3.connect(db_path)
    try:
        fmt = con.execute("SELECT value FROM meta WHERE key='fmt'").fetchone()
        fmt = fmt[0] if fmt else "png"
        rows = []
        cur = con.execute("SELECT zoom, x, y, tile FROM maps ORDER BY zoom, x, y")
        while True:
            chunk = cur.fetchmany(chunk_rows)
            if not chunk:
                break
            rows.extend(chunk)
    finally:
        con.close()
    items = [
        {
            "tile_key": int(tg.pack_key(z, x, y)),
            "z": int(z),
            "x": int(x),
            "y": int(y),
            "tile_bytes": bytes(blob),
            "fmt": fmt,
        }
        for z, x, y, blob in rows
    ]
    return rd.from_items(items)
