"""The flagship pipeline: images table → tile pyramid (SURVEY.md §3.1).

Engine equivalent of ``gdal_tiler.py``, as one streaming Ray Data
pipeline per level:

  read images (column-pruned)
   → map_batches(FragmentEmitter actor pool)      fan-out, M1/M4–M7
   → groupby(part)[.map_groups]                   the ONE shuffle (A1)
        plain: composite_part_group
        salted: groupby(part, salt) partials → groupby(part) merge
   → per-part atomic parquet commit + lineage row (§4.3)
  then per overview level z-1 … z_min:
  read level z parquet → add_parent_part → groupby(part) downsample (A2)

Control returns to the driver only between levels (same as the
reference's overview loop). Resume: committed (level, part) pairs are
broadcast and pruned at the emitter — replays only incomplete tiles.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# NOTE: intra-package imports used inside WORKER-executed functions
# must live at module top, not inside the function: the driver contract
# ships this package to workers via cloudpickle
# register_pickle_by_value (workers may have no importable copy), which
# covers globals of pickled functions but NOT imports executed at call
# time on the worker (ModuleNotFoundError under a path-less driver).
from .. import raster
from .. import tilegrid as tg
from ..stages import tiling
from ..state import lineage

FRAG_COLUMNS = [
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
    "poly",
]

GEOREF_COLUMNS = ["image_id", "w", "h", "gt", "srs", "zorder", "poly"]

#: columns silently dropped from a requested list when the input table
#: lacks them (older tables predate the order-2 GCP ``poly`` column);
#: every other missing column still fails loudly in read_parquet
OPTIONAL_COLUMNS = frozenset({"poly"})


def _prune_optional(images_path, columns):
    try:
        if os.path.isfile(images_path):
            names = set(pq.read_schema(images_path).names)
        else:
            f = next(
                p for p in sorted(os.listdir(images_path))
                if p.endswith(".parquet")
            )
            names = set(pq.read_schema(os.path.join(images_path, f)).names)
    except (OSError, StopIteration):
        return columns
    return [c for c in columns if c in names or c not in OPTIONAL_COLUMNS]


def images_dataset(images_path, columns=None, num_blocks=None):
    import ray.data as rd

    from ..sources import lance_source

    if lance_source.is_lance_uri(images_path):  # S9 native scan
        return lance_source.read_lance(
            images_path,
            columns=[c for c in (columns or FRAG_COLUMNS)
                     if c not in OPTIONAL_COLUMNS],
            num_blocks=num_blocks,
        )
    columns = _prune_optional(images_path, columns or FRAG_COLUMNS)
    if num_blocks is None:
        # block count sets downstream TASK granularity: ~8 blocks/CPU
        # keeps the actor-pool tail short (per-image work is highly
        # variable); a single big parquet otherwise reads as ONE task
        try:
            import ray

            num_blocks = max(64, int(ray.cluster_resources().get("CPU", 8)) * 4)
        except Exception:
            num_blocks = 64
    return rd.read_parquet(
        images_path,
        columns=columns,
        override_num_blocks=num_blocks,
    )


def _effective_res(batch: pa.Table, profile="mercator") -> pa.Table:
    """Per-image source resolution in dest-PROFILE units (meters for
    mercator, degrees for geodetic). Vectorized: geotransforms arrive
    as one (n, 6) float view of the list column, srs strings are
    factorized, and each DISTINCT srs (a handful per corpus — one
    projection parse each, not one per image) takes a single
    array-kernel pass; tmerc/conic ``inverse`` is numpy-vectorized."""
    n = batch.num_rows
    gt = np.asarray(
        batch.column("gt").combine_chunks().flatten(), dtype=np.float64
    ).reshape(n, 6)
    srs = np.asarray(batch.column("srs").to_pylist(), dtype=object)
    res = np.abs(gt[:, 1])
    deg_per_m = 180.0 / tg.ORIGIN
    uniq, inv = np.unique(srs, return_inverse=True)
    for j, s in enumerate(uniq):
        sel = inv == j
        tm = raster._tmerc_of(s)
        if tm is not None:
            # UTM meters ≈ ground meters; mercator meters inflate by
            # 1/cos(lat) — evaluate at the image origin's latitude
            _, lat0 = tm.inverse(gt[sel, 0], gt[sel, 3])
            if profile == "geodetic":
                res[sel] *= deg_per_m
            else:
                res[sel] /= np.maximum(np.cos(np.radians(lat0)), 1e-6)
        elif profile == "geodetic":
            if s != "EPSG:4326":
                res[sel] *= deg_per_m
        elif s == "EPSG:4326":
            res[sel] /= deg_per_m
    return pa.table({"res": pa.array(res, pa.float64())})


def auto_zoom(images_path, profile="mercator"):
    """Job-wide base zoom: finest per-image optimal zoom (distributed
    min-reduce over the georef columns only — no pixel decode). For a
    RasterGrid profile the base zoom is the canvas's own (1 dest px =
    1 canvas px)."""
    if isinstance(profile, tg.RasterGrid):
        return profile.z_base
    ds = images_dataset(images_path, columns=["gt", "srs"])
    min_res = ds.map_batches(
        lambda b, _p=profile: _effective_res(b, _p), batch_format="pyarrow"
    ).min("res")
    if min_res is None:
        raise ValueError(f"empty images table: {images_path}")
    if profile == "geodetic":
        return int(tg.auto_base_zoom_geodetic(min_res))
    return int(tg.auto_base_zoom(min_res))


def _count_rows(images_path):
    """Total input rows (= zorder span) from parquet footers only."""
    if os.path.isfile(images_path):
        return int(pq.read_metadata(images_path).num_rows)
    return int(
        sum(
            pq.read_metadata(os.path.join(images_path, f)).num_rows
            for f in os.listdir(images_path)
            if f.endswith(".parquet")
        )
    )


def default_z_part(z):
    """Partition cell zoom: 4 levels above the tiles (≤256 tiles/part)."""
    return max(z - 4, 0)


def census_parts(images_path, z_base, z_part, batch_size=512, profile="mercator"):
    """Georef-only census: fragments per part (upper bound — cutline
    drops are not modeled). Small result → driver. Feeds the salt plan
    (§4.2) and the skew report."""
    ds = images_dataset(images_path, columns=["gt", "srs", "w", "h", "poly"])
    parts = ds.map_batches(
        tiling.TouchedParts(z_base, z_part, profile=profile),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    agg = parts.groupby("part").sum("n")
    return agg.to_pandas()  # small: one row per part


def make_salt_plan(census_df, threshold=2000, target=1000):
    """parts whose fragment count exceeds ``threshold`` get
    ceil(n/target) contiguous-zorder salt ranges."""
    col = "sum(n)" if "sum(n)" in census_df.columns else "n"
    hot = census_df[census_df[col] > threshold]
    return {
        int(p): int(-(-int(n) // target))
        for p, n in zip(hot["part"], hot[col])
    }


def fragments_dataset(
    images_path,
    z_base,
    z_part,
    *,
    resampling="nearest",
    salt_plan=None,
    n_zorder=1,
    done_parts=None,
    batch_size=32,
    concurrency=None,
    profile="mercator",
    on_bad="raise",
):
    """images → fragment rows (the pre-shuffle fan-out stage)."""
    import ray

    ds = images_dataset(images_path)
    try:
        _ncpu_total = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        _ncpu_total = 8
    if concurrency is None:
        # fixed-size actor pool at 7/8 of cluster CPUs — PROPORTIONAL
        # headroom for the read/reduce stages (a fixed "-2" skews
        # cross-parallelism comparisons: 2 of 8 is 25%, 2 of 32 is 6%;
        # on a real N-node cluster per-node overheads replicate, so the
        # proportion is the faithful model). Fixed beats autoscaling:
        # pool ramp-up from min_size=1 dominates short stages.
        ncpu = _ncpu_total
        # never claim EVERY cpu: at tiny clusters (2-4) a full-width
        # fixed pool starves the groupby reduce tasks behind it and the
        # executor deadlocks (observed at num_cpus=2: 2 actors held both
        # CPUs while the sort waited forever)
        concurrency = max(1, min(ncpu - 1, ncpu * 7 // 8))
    salt_ref = ray.put(salt_plan) if salt_plan else None
    done_ref = ray.put(done_parts) if done_parts else None
    ctor_kwargs = {
        "z_base": z_base,
        "z_part": z_part,
        "resampling": resampling,
        "salt_plan": salt_ref,
        "n_zorder": n_zorder,
        "done_parts": done_ref,
        "profile": profile,
        "on_bad": on_bad,
    }
    if _ncpu_total <= 1:
        # 1-CPU cluster: a 1-actor pool would hold the ONLY cpu ahead
        # of the groupby reduce — the num_cpus=2 deadlock shape, one
        # worse. Run the emitter as stateless tasks instead: tasks
        # release the cpu between blocks so the reduce can schedule.
        # The per-task cache keeps construction once per block, not
        # once per batch.
        _state = {}

        def _emit_stateless(batch):
            em = _state.get("em")
            if em is None:
                em = _state["em"] = tiling.FragmentEmitter(**ctor_kwargs)
            return em(batch)

        return ds.map_batches(
            _emit_stateless,
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=1,
        )
    return ds.map_batches(
        tiling.FragmentEmitter,
        fn_constructor_kwargs=ctor_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        concurrency=concurrency,
    )


def base_tiles(
    images_path,
    z_base=None,
    *,
    z_part=None,
    resampling="nearest",
    salt_plan=None,
    n_zorder=1,
    batch_size=16,
    concurrency=None,
    profile="mercator",
):
    """Pure (no side effects) base-tile Dataset — tests / entry()."""
    if z_base is None:
        z_base = auto_zoom(images_path, profile=profile)
    if z_part is None:
        z_part = default_z_part(z_base)
    frags = fragments_dataset(
        images_path,
        z_base,
        z_part,
        resampling=resampling,
        salt_plan=salt_plan,
        n_zorder=n_zorder,
        batch_size=batch_size,
        concurrency=concurrency,
        profile=profile,
    )
    if salt_plan:
        partials = frags.groupby(["part", "salt"]).map_groups(
            tiling.partial_composite_group, batch_format="pyarrow"
        )
        return partials.groupby("part").map_groups(
            tiling.merge_partials_group, batch_format="pyarrow"
        )
    return frags.groupby("part").map_groups(
        tiling.composite_part_group, batch_format="pyarrow"
    )


def overview_tiles(tiles_ds, z_child, *, z_part=None, overview_resampling="box"):
    """One overview step: tiles at z_child → tiles at z_child-1 (pure)."""
    if z_part is None:
        z_part = default_z_part(z_child - 1)
    with_parent = tiles_ds.map_batches(
        lambda b: tiling.add_parent_part(b, z_part), batch_format="pyarrow"
    )
    return with_parent.groupby("part").map_groups(
        lambda g, _m=overview_resampling: tiling.downsample_part_group(g, _m),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# checkpointed job (write_pyramid)
# ---------------------------------------------------------------------------


def _commit_group_fn(out_dir, z, reduce_fn):
    """Wrap a part-reduce fn into a commit-to-disk fn returning one
    lineage row. Runs inside the reduce task → per-partition atomic
    checkpoint (§4.3)."""

    def commit(group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        tiles_tbl = reduce_fn(group)
        part = int(tiles_tbl.column("part")[0].as_py())
        manifest = _part_manifest(z, part, tiles_tbl, t0)
        lineage.commit_part(out_dir, z, part, tiles_tbl, manifest)
        return pa.table(
            {
                "z": pa.array([z], pa.int32()),
                "part": pa.array([part], pa.int64()),
                "n_tiles": pa.array([tiles_tbl.num_rows], pa.int64()),
                "checksum_xor": pa.array([manifest["checksum_xor"]], pa.int64()),
            }
        )

    return commit


def _part_manifest(z, part, tiles_tbl, t0):
    """Slim per-partition lineage record. The committed parquet file
    itself is the authoritative carrier of tile_keys / src_ids /
    per-tile checksums (they are columns); the manifest stores the
    rollup + key range so audits and resume stay O(1) per part."""
    checksum_xor = 0
    for c in tiles_tbl.column("checksum").to_pylist():
        checksum_xor ^= int(c)
    keys = tiles_tbl.column("tile_key")
    n_inputs = len(
        {s for lst in tiles_tbl.column("src_ids").to_pylist() for s in lst}
    )
    import pyarrow.compute as pc

    return {
        "z": z,
        "part": part,
        "n_tiles": tiles_tbl.num_rows,
        "key_min": int(pc.min(keys).as_py()) if tiles_tbl.num_rows else 0,
        "key_max": int(pc.max(keys).as_py()) if tiles_tbl.num_rows else 0,
        "n_inputs": n_inputs,
        "checksum_xor": checksum_xor,
        "wall_s": round(time.monotonic() - t0, 4),
    }


def _read_level(out_dir, z, columns=None):
    import ray.data as rd

    from ..relational.ops import _aligned_num_blocks

    # file_extensions guards against stale part-*.parquet.tmp.<pid> files
    # left by a crashed writer: resume/merge must only see committed parts.
    # Block count is row-group-aligned: Ray's 200-block floor re-reads
    # whole row groups when parts are fewer — on PIXEL columns that is
    # the most expensive possible amplification (see ops._aligned_num_blocks).
    d = lineage.level_dir(out_dir, z)
    return rd.read_parquet(
        d, columns=columns,
        file_extensions=["parquet"],
        override_num_blocks=_aligned_num_blocks(d),
    )


def write_pyramid(
    images_path,
    out_dir,
    *,
    z_base=None,
    z_min=4,
    resampling="nearest",
    salt="auto",
    salt_threshold=1000,
    salt_target=400,
    batch_size=16,
    concurrency=None,
    profile="mercator",
    overview_resampling="box",
    on_bad_image="raise",
):
    """Full checkpointed pyramid build. Returns the job summary (A5).

    ``profile`` selects the dest tile grid (mercator | geodetic —
    gdal_tiler's profile option; the cut/composite/overview machinery
    is profile-agnostic once fragments carry tile keys).

    Resume semantics: committed (level, part) partitions are skipped —
    fragment emission prunes done parts (an image whose parts are all
    committed is never decoded), and completed levels short-circuit."""
    if z_base is None:
        z_base = auto_zoom(images_path, profile=profile)
    os.makedirs(out_dir, exist_ok=True)
    lineage.check_job_meta(
        out_dir,
        {
            "profile": tg.profile_tag(profile),
            "z_base": int(z_base),
            "z_min": int(z_min),
            "resampling": resampling,
            "overview_resampling": overview_resampling,
        },
    )
    # --- base level --------------------------------------------------------
    if not lineage.level_is_complete(out_dir, z_base):
        z_part = default_z_part(z_base)
        done = lineage.done_parts(out_dir, z_base)
        salt_plan = None
        n_zorder = 1
        # The salted partial-composite-then-merge path is byte-exact
        # only for NEAREST resampling (binary fragment alpha makes the
        # composite associative); bilinear/bicubic fragments carry
        # fractional alpha, where per-stage uint8 rounding would make
        # salted != unsalted. Auto-salting therefore degrades to the
        # unsalted single-stage fold for non-nearest kernels.
        if resampling != "nearest":
            if isinstance(salt, dict):
                raise ValueError(
                    "explicit salt plan requires resampling='nearest' "
                    "(salted merge is not byte-exact for fractional-alpha "
                    f"fragments; got resampling={resampling!r})"
                )
            salt = False
        if salt == "auto" or salt is True:
            census = census_parts(images_path, z_base, z_part, profile=profile)
            salt_plan = make_salt_plan(census, salt_threshold, salt_target)
            n_zorder = _count_rows(images_path)
        elif isinstance(salt, dict):
            salt_plan = salt
        frags = fragments_dataset(
            images_path,
            z_base,
            z_part,
            resampling=resampling,
            salt_plan=salt_plan,
            n_zorder=n_zorder,
            done_parts=done,
            batch_size=batch_size,
            concurrency=concurrency,
            profile=profile,
            on_bad=on_bad_image,
        )
        if salt_plan:
            partials = frags.groupby(["part", "salt"]).map_groups(
                tiling.partial_composite_group, batch_format="pyarrow"
            )
            out = partials.groupby("part").map_groups(
                _commit_group_fn(out_dir, z_base, tiling.merge_partials_group),
                batch_format="pyarrow",
            )
        else:
            out = frags.groupby("part").map_groups(
                _commit_group_fn(out_dir, z_base, tiling.composite_part_group),
                batch_format="pyarrow",
            )
        stats = out.to_pandas()  # tiny: one row per part
        lineage.mark_level_complete(
            out_dir,
            z_base,
            {
                "z": z_base,
                "parts": int(len(stats)) + len(done),
                "tiles": int(stats["n_tiles"].sum()) if len(stats) else 0,
            },
        )
    # --- overview cascade: ONE shuffle for levels z_base-1 … anchor_z ------
    # (one per-level groupby each was pure fixed overhead; a z_min-cell
    # group holds ≤ 4^span base tiles, so the whole sub-pyramid builds
    # locally inside the reduce). Levels above the anchor (tiny) fall
    # back to the per-level loop.
    anchor_z = max(z_min, z_base - 6)
    cascade = [z for z in range(z_base - 1, anchor_z - 1, -1)]
    if cascade and not all(lineage.level_is_complete(out_dir, z) for z in cascade):
        done_anchor = None
        for z in cascade:
            d = lineage.done_parts(out_dir, z)
            done_anchor = d if done_anchor is None else (done_anchor & d)
        child = _read_level(out_dir, z_base)
        done_arr = np.array(sorted(done_anchor or ()), dtype=np.int64)

        def _anchor(batch, _az=anchor_z, _done=done_arr):
            keys = batch.column("tile_key").to_numpy()
            z_, x_, y_ = tg.unpack_key(keys)
            shift = z_ - _az
            part = tg.pack_key(np.full_like(z_, _az), x_ >> shift, y_ >> shift)
            if "part" in batch.schema.names:
                batch = batch.drop_columns(["part"])
            batch = batch.append_column("part", pa.array(part, pa.int64()))
            if len(_done):
                batch = batch.filter(pa.array(~np.isin(part, _done)))
            return batch

        def _commit_cascade(group: pa.Table) -> pa.Table:
            t0 = time.monotonic()
            per_level = tiling.cascade_part_group(
                group, anchor_z, z_base, overview_resampling
            )
            part = int(group.column("part")[0].as_py())
            rows = {"z": [], "part": [], "n_tiles": [], "checksum_xor": []}
            for z, tbl in per_level.items():
                # per-level INCREMENT (resetting t0 per commit) — a
                # shared t0 made every level's wall_s report the whole
                # cascade compute, quadruple-counting it in rollups
                manifest = _part_manifest(z, part, tbl, t0)
                t0 = time.monotonic()
                lineage.commit_part(out_dir, z, part, tbl, manifest)
                rows["z"].append(z)
                rows["part"].append(part)
                rows["n_tiles"].append(tbl.num_rows)
                rows["checksum_xor"].append(manifest["checksum_xor"])
            return pa.table(
                {
                    "z": pa.array(rows["z"], pa.int32()),
                    "part": pa.array(rows["part"], pa.int64()),
                    "n_tiles": pa.array(rows["n_tiles"], pa.int64()),
                    "checksum_xor": pa.array(rows["checksum_xor"], pa.int64()),
                }
            )

        stats = (
            child.map_batches(_anchor, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_commit_cascade, batch_format="pyarrow")
            .to_pandas()
        )
        for z in cascade:
            lv = stats[stats["z"] == z] if len(stats) else stats
            lineage.mark_level_complete(
                out_dir,
                z,
                {
                    "z": z,
                    "parts": int(len(lv)),
                    "tiles": int(lv["n_tiles"].sum()) if len(lv) else 0,
                },
            )
    # --- remaining top levels (z < anchor_z): per-level loop ---------------
    for z in range(anchor_z - 1, z_min - 1, -1):
        if lineage.level_is_complete(out_dir, z):
            continue
        z_part = default_z_part(z)
        done = lineage.done_parts(out_dir, z)
        child = _read_level(out_dir, z + 1)
        if done:
            done_arr = np.array(sorted(done), dtype=np.int64)

            def _prune(batch, _done=done_arr, _zp=z_part):
                b = tiling.add_parent_part(batch, _zp)
                mask = ~np.isin(b.column("part").to_numpy(), _done)
                return b.filter(pa.array(mask))

            with_parent = child.map_batches(_prune, batch_format="pyarrow")
        else:
            with_parent = child.map_batches(
                lambda b, _zp=z_part: tiling.add_parent_part(b, _zp),
                batch_format="pyarrow",
            )
        out = with_parent.groupby("part").map_groups(
            _commit_group_fn(
                out_dir,
                z,
                lambda g, _m=overview_resampling: tiling.downsample_part_group(
                    g, _m
                ),
            ),
            batch_format="pyarrow",
        )
        stats = out.to_pandas()
        lineage.mark_level_complete(
            out_dir,
            z,
            {
                "z": z,
                "parts": int(len(stats)) + len(done),
                "tiles": int(stats["n_tiles"].sum()) if len(stats) else 0,
            },
        )
    return lineage.job_summary(out_dir)


def read_tiles(out_dir, z=None, columns=None):
    """Read the written pyramid back as a Dataset (optionally one level)."""
    import ray.data as rd

    if z is not None:
        return _read_level(out_dir, z, columns)
    root = os.path.join(out_dir, "tiles")
    paths = [
        os.path.join(root, d, f)
        for d in sorted(os.listdir(root))
        for f in sorted(os.listdir(os.path.join(root, d)))
        if f.endswith(".parquet")
    ]
    from ..relational.ops import _aligned_num_blocks

    # row-group-aligned (pixel columns — amplification is costliest here)
    return rd.read_parquet(
        paths, columns=columns, override_num_blocks=_aligned_num_blocks(paths)
    )
