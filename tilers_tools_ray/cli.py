"""CLI — the reference's script surface, Ray-Data-backed.

Subcommands mirror the upstream tools' contracts (SURVEY.md §3):

  tiler     — gdal_tiler.py: images table → tile pyramid
              (--zoom, --base-resampling, salted shuffle, resume)
  merge     — tiles_merge.py: N tile pyramids → one (CLI order wins)
  convert   — tiles_convert.py: tiles parquet ↔ z/x/y trees / SQLite
              (--from-layout/--to-layout, --to-fmt re-encode)
  map2gdal  — reader_* family: sidecar text → georef columns parquet
  join      — the graft spatial join: images × coverage polygons
  stats     — per-zoom tile-set statistics

The CLI owns the Ray session (guarded init); library code never does.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_tiler(args):
    _ray()
    from .pipelines import pyramid
    from . import tilegrid as tg

    zooms = tg.parse_zoom_spec(args.zoom) if args.zoom else None
    z_min = zooms[0] if zooms else args.z_min
    z_base = zooms[-1] if zooms else None
    profile = args.profile
    if profile == "raster":
        if not args.canvas:
            raise SystemExit("--profile raster requires --canvas WxH")
        w, h = (int(v) for v in args.canvas.lower().split("x"))
        profile = tg.RasterGrid(w, h)
    summary = pyramid.write_pyramid(
        args.src,
        args.out,
        z_base=z_base,
        z_min=z_min,
        resampling=args.base_resampling,
        salt="auto" if not args.no_salt else None,
        profile=profile,
        overview_resampling=args.overview_resampling,
        on_bad_image="skip" if args.skip_bad else "raise",
    )
    print(json.dumps({str(k): v for k, v in summary.items()}, indent=1))


def cmd_merge(args):
    _ray()
    from .pipelines import pyramid, tileset

    datasets = [pyramid.read_tiles(src) for src in args.src]
    merged = tileset.merge_tilesets(datasets)
    merged.write_parquet(args.out)
    print(json.dumps({"tiles": merged.count()}))


def cmd_convert(args):
    _ray()
    from .pipelines import pyramid, tileset
    from .sources import tiledb

    if args.src.endswith(".db"):
        tiles = tiledb.read_sqlite(args.src)
        tiles = tileset.decode_tree_tiles(tiles)
    elif args.src.endswith(".gdbm"):
        tiles = tiledb.read_gdbm(args.src)
        tiles = tileset.decode_tree_tiles(tiles)
    elif args.from_layout:
        tiles = tileset.read_tile_tree(args.src, layout=args.from_layout)
        tiles = tileset.decode_tree_tiles(tiles)
    else:
        tiles = pyramid.read_tiles(args.src)
    if args.zoom:
        tiles = tileset.filter_zoom(tiles, args.zoom)
    if args.pixel_fn:
        tiles = tileset.map_tiles(tiles, args.pixel_fn)
    if args.out.endswith(".db"):
        n = tiledb.export_sqlite(tiles, args.out, fmt=args.to_fmt)
        print(json.dumps({"tiles": n, "sink": "sqlite"}))
    elif args.out.endswith(".gdbm"):
        n = tiledb.export_gdbm(tiles, args.out, fmt=args.to_fmt)
        print(json.dumps({"tiles": n, "sink": "gdbm"}))
    elif args.to_layout:
        meta = tileset.export_tree(
            tiles,
            args.out,
            layout=args.to_layout,
            fmt=args.to_fmt,
            skip_existing=args.noclobber,
        )
        print(json.dumps(meta))
    else:
        tiles.write_parquet(args.out)
        print(json.dumps({"sink": "parquet"}))


def cmd_map2gdal(args):
    _ray()
    import ray.data as rd

    from .stages import georef

    order = args.gcp_order
    if order in ("1", "2", "3"):
        order = int(order)
    from .relational.ops import _aligned_num_blocks

    ds = rd.read_parquet(
        args.src,
        columns=["image_id", "georef_text"],
        override_num_blocks=_aligned_num_blocks(args.src),
    )
    out = georef.attach_parsed_georef(ds, order=order)
    out.write_parquet(args.out)
    print(json.dumps({"rows": out.count()}))


def cmd_join(args):
    _ray()
    import pyarrow.parquet as pq

    from .pipelines import pyramid
    from .stages import spatial

    coverage = pq.read_table(args.coverage)
    ds = pyramid.images_dataset(
        args.src, columns=["image_id", "w", "h", "gt", "srs"]
    )
    out = spatial.spatial_join(
        ds, coverage, knn_eps=args.knn_eps, how=args.how
    )
    out.write_parquet(args.out)
    print(json.dumps({"rows": out.count()}))


def cmd_stats(args):
    _ray()
    from .pipelines import pyramid, tileset

    tiles = pyramid.read_tiles(args.src)
    df = tileset.tileset_stats(tiles).to_pandas().sort_values("z")
    print(df.to_string(index=False))


def cmd_diff(args):
    """Change detection between two pyramids (added/removed/changed)."""
    _ray()
    from .pipelines import pyramid, tileset

    d = tileset.diff_tilesets(
        pyramid.read_tiles(args.a), pyramid.read_tiles(args.b)
    ).to_pandas()
    if len(d) == 0:
        print("identical tile sets")
        return
    d = d.sort_values(["status", "z", "x", "y"])
    print(d.groupby("status").size().to_string())
    print(d.head(args.limit).to_string(index=False))


def cmd_query(args):
    """Run a registered relational/dedup/ANN/text query standalone."""
    _ray()
    import pandas as pd

    from .relational import queries as Q

    if args.list or not args.name:
        oracled = set(Q.ORACLES)
        for name in sorted(Q.QUERIES):
            tag = "sql-oracled" if name in oracled else "rows-only"
            print(f"{name:32s} {tag}")
        return
    if args.name not in Q.QUERIES:
        raise SystemExit(
            f"unknown query {args.name!r} — run `query --list` for names"
        )
    res = Q.QUERIES[args.name](args.sf_dir)
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    if args.out:
        if args.out.endswith(".csv"):
            res.to_csv(args.out, index=False)
        else:
            res.to_parquet(args.out, index=False)
        print(f"{len(res)} rows -> {args.out}")
    else:
        with pd.option_context("display.max_rows", args.max_rows):
            print(res.to_string(index=False, max_rows=args.max_rows))


def build_parser():
    p = argparse.ArgumentParser(prog="tilers-tools-ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("tiler", help="images table → tile pyramid")
    t.add_argument("--src", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--zoom", default=None, help="e.g. 5:9 (min:max)")
    t.add_argument("--z-min", type=int, default=4)
    t.add_argument(
        "--base-resampling",
        default="nearest",
        choices=["nearest", "bilinear", "bicubic", "lanczos"],
    )
    t.add_argument(
        "--overview-resampling",
        default="box",
        choices=["box", "nearest", "bilinear", "lanczos"],
        help="box = antialias-equivalent 2x2 mean (default); "
        "bilinear = PIL-style 4-tap tent; lanczos = 12-tap "
        "scaled Lanczos-3",
    )
    t.add_argument(
        "--skip-bad",
        action="store_true",
        help="drop undecodable images (logged) instead of failing the job",
    )
    t.add_argument(
        "--profile",
        default="mercator",
        choices=["mercator", "geodetic", "raster"],
    )
    t.add_argument(
        "--canvas",
        default=None,
        help="raster-profile canvas size as WxH (canvas pixels)",
    )
    t.add_argument("--no-salt", action="store_true")
    t.set_defaults(fn=cmd_tiler)

    m = sub.add_parser("merge", help="merge tile pyramids (CLI order wins)")
    m.add_argument("src", nargs="+")
    m.add_argument("--out", required=True)
    m.set_defaults(fn=cmd_merge)

    c = sub.add_parser("convert", help="convert layouts / formats / sinks")
    c.add_argument("--src", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--from-layout", default=None, choices=[None, "xyz", "tms", "zyx", "sasplanet"])
    c.add_argument("--to-layout", default=None, choices=[None, "xyz", "tms", "zyx", "sasplanet"])
    c.add_argument("--to-fmt", default="png", choices=["png", "raw", "dct", "png8", "ozf"])
    c.add_argument(
        "--pixel-fn",
        default=None,
        choices=["invert", "grayscale"],
        help="map-algebra transform applied to every tile's pixels",
    )
    c.add_argument("--zoom", default=None)
    c.add_argument(
        "--noclobber",
        action="store_true",
        help="skip tiles whose destination file already exists",
    )
    c.set_defaults(fn=cmd_convert)

    g = sub.add_parser("map2gdal", help="parse georef sidecars → columns")
    g.add_argument("--src", required=True)
    g.add_argument("--out", required=True)
    g.add_argument(
        "--gcp-order",
        default="auto",
        choices=["auto", "1", "2", "3", "tps"],
        help="GCP solve: auto = affine with order-2 escalation on "
        "residual; 1-3 = polynomial order; tps = thin-plate spline",
    )
    g.set_defaults(fn=cmd_map2gdal)

    j = sub.add_parser("join", help="spatial join images × coverage")
    j.add_argument("--src", required=True)
    j.add_argument("--coverage", required=True)
    j.add_argument("--out", required=True)
    j.add_argument("--knn-eps", type=float, default=None)
    j.add_argument("--how", default="inner", choices=["inner", "left", "semi", "anti"])
    j.set_defaults(fn=cmd_join)

    s = sub.add_parser("stats", help="per-zoom tile-set statistics")
    s.add_argument("--src", required=True)
    s.set_defaults(fn=cmd_stats)

    df = sub.add_parser("diff", help="diff two pyramids (added/removed/changed)")
    df.add_argument("a")
    df.add_argument("b")
    df.add_argument("--limit", type=int, default=20)
    df.set_defaults(fn=cmd_diff)

    q = sub.add_parser(
        "query",
        help="run a registered relational/dedup/ANN/text query",
    )
    q.add_argument("name", nargs="?", default=None)
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--out", default=None, help=".parquet or .csv output")
    q.add_argument("--max-rows", type=int, default=50)
    q.add_argument("--list", action="store_true", help="list query names")
    q.set_defaults(fn=cmd_query)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
