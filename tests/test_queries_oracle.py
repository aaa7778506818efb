"""Driver-contract harness: run every queries() entry at sf0.001 and
compare SQL-expressible ones against DuckDB — the same check the
round driver performs at sf0.01 (order-insensitive value comparison
after sorting columns by name)."""

import os

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _to_pandas(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return pd.DataFrame(res)


def _duck(sql):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def registry(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = _to_pandas(e.entry())
    assert len(df) >= 1
    assert "n_tiles" in df.columns


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "q3_top_revenue_orders",
        "q5_nation_revenue",
        "q10_returned_items",
        "q18_large_orders",
        "stratified_sample_orders",
        "top_orders_by_price",
        "top_orders_per_segment",
        "sample_documents_hash",
        "part_heavy_hitters",
        "segment_stats",
        "events_hourly",
        "events_sessionize",
        "events_sliding_window",
        "events_asof_last_click",
        "customer_order_windows",
        "customer_cumulative_spend",
        "customers_inactive_1995",
        "word_postings",
        "returnflag_price_stats",
        "segment_year_revenue_pivot",
        "brand_volume",
        "orders_price_band_join",
        "order_price_quantiles",
        "segment_distinct_customers",
        "doc_token_stats",
        "doc_top_terms",
        "dedup_exact_docs",
        "ngram_jaccard_pairs",
        "doc_quality",
        "lang_id",
        "ann_cosine_topk",
        "embedding_dup_pairs",
        "q17_small_quantity_revenue",
        "nation_year_rollup",
        "doc_bigrams",
        "q13_order_distribution",
        "acctbal_quartiles",
        "orders_events_daily_outer",
        "doc_salient_terms",
        "balanced_docs_per_source",
        "q6_revenue_forecast",
        "q4_order_priority",
        "q12_priority_by_returnflag",
        "q14_promo_revenue",
        "q22_idle_rich_customers",
        "q7_nation_trade_volume",
        "q8_market_share",
        "q9_product_profit",
        "q11_important_parts",
        "q15_top_supplier",
        "q16_brand_size_suppliers",
        "q2_min_cost_supplier",
        "q19_discounted_revenue",
        "q20_big_blue_suppliers",
        "q21_waiting_suppliers",
        "doc_repetition",
        "benchmark_contamination",
        "pack_documents",
        "user_retention_cohorts",
        "event_funnel",
        "events_props_stats",
        "source_normalization_stats",
        "pii_scrub_stats",
        "train_val_test_split",
        "ngram_decontamination",
        "nation_segment_cube",
    ],
)
def test_oracle_match(registry, name):
    qs, oracles = registry
    ray_df = _normalize(_to_pandas(qs[name](SF)))
    duck_df = _normalize(_duck(oracles[name]))
    assert list(ray_df.columns) == list(duck_df.columns), (
        f"{name}: columns {list(ray_df.columns)} vs {list(duck_df.columns)}"
    )
    assert len(ray_df) == len(duck_df), (
        f"{name}: row counts {len(ray_df)} vs {len(duck_df)}"
    )
    pd.testing.assert_frame_equal(ray_df, duck_df, check_dtype=False)


@pytest.mark.parametrize(
    "name",
    [
        "doc_fingerprints",
        "minhash_near_dups",
        "simhash_near_dups",
        "dedup_clean_corpus",
        "ivf_ann_topk",
        "embedding_lsh_dups",
        "distinct_parts_hll",
        "event_users_hll",
        "order_price_quantile_sketch",
        "priority_quantiles_sketch",
        "tile_pyramid_stats",
        "tile_pyramid_stats_geodetic",
        "skew_census",
        "spatial_join_images",
        "knn_nearest_regions",
        "phash_dedup_images",
        "phash_near_dup_images",
        "dedup_clean_images",
        "parse_georef_sidecars",
        "kmeans_embeddings",
        "embedding_outliers",
        "zonal_image_stats",
        "image_quality_scores",
    ],
)
def test_rows_only_queries_run(registry, name):
    qs, _ = registry
    df = _to_pandas(qs[name](SF))
    assert df is not None
    # deterministic: run twice → identical
    df2 = _to_pandas(qs[name](SF))
    pd.testing.assert_frame_equal(
        _normalize(df), _normalize(df2), check_dtype=False
    )


def test_registry_consistency(registry):
    qs, oracles = registry
    assert set(oracles) <= set(qs)


def test_langid_heuristic_on_real_language():
    """The driver's synthetic documents all share one English-ish
    vocabulary with arbitrary lang labels (verified: texts identical in
    style across labels), so accuracy is asserted on real multilingual
    samples instead; the lang_id query stays rows-only."""
    from tilers_tools_ray.relational.text import LangId

    samples = {
        "en": "the cat sat on the mat and it is a fine day for a walk",
        "fr": "le chat est dans la maison et il est temps de partir pour un voyage",
        "es": "el gato es un animal y la casa es grande para una familia",
        "de": "der hund und die katze sind ein gutes team für das haus",
        "zh": "今天天气很好我们一起去公园散步吧",
    }
    lid = LangId()
    for lang, sent in samples.items():
        assert lid.predict_one(sent) == lang, f"misidentified {lang}"


def test_embedding_lsh_planted_recall(registry):
    """The LSH query plants 20 near-copies (cos ≈ 0.9998); the
    hyperplane-signature path must recover exactly those pairs —
    full recall at near-dup similarity, zero false positives at 0.95
    on otherwise-random embeddings."""
    qs, _ = registry
    df = _to_pandas(qs["embedding_lsh_dups"](SF))
    pairs = set(zip(df["vec_a"], df["vec_b"]))
    expected = {(i, i + 1_000_000) for i in range(20)}
    assert pairs == expected, (
        f"missing={expected - pairs} extra={pairs - expected}"
    )
    assert (df["score"] >= 0.95).all()


def test_hll_accuracy(registry):
    """HLL estimates vs exact COUNT(DISTINCT): ≤2% relative error at
    p=14 (theory: 1.04/√16384 ≈ 0.8%) — global and grouped paths."""
    qs, _ = registry
    est = int(
        _to_pandas(qs["distinct_parts_hll"](SF))["approx_distinct_parts"][0]
    )
    exact = _duck("SELECT count(DISTINCT l_partkey) AS n FROM lineitem")["n"][0]
    assert abs(est - exact) <= 0.02 * exact, (est, exact)

    grp = _to_pandas(qs["event_users_hll"](SF)).set_index("event_type")
    exact_g = _duck(
        "SELECT event_type, count(DISTINCT user_id) AS n FROM events"
        " GROUP BY 1 ORDER BY 1"
    ).set_index("event_type")
    assert set(grp.index) == set(exact_g.index)
    for t in exact_g.index:
        e_, x_ = int(grp.loc[t, "approx_distinct"]), int(exact_g.loc[t, "n"])
        assert abs(e_ - x_) <= max(2, 0.02 * x_), (t, e_, x_)


def test_quantile_sketch_accuracy(registry):
    """Sketch estimates land within 1% absolute RANK of the target:
    for each estimated value, the exact CDF position (fraction of rows
    ≤ value) must be within ±0.01 of the requested quantile."""
    import numpy as np

    qs, _ = registry
    est = _to_pandas(qs["order_price_quantile_sketch"](SF))
    prices = _duck("SELECT o_totalprice FROM orders")["o_totalprice"].to_numpy()
    prices = np.sort(prices)
    for q, v in zip(est["q"], est["price"]):
        rank = np.searchsorted(prices, v, side="right") / len(prices)
        assert abs(rank - q) <= 0.01, (q, v, rank)


def test_grouped_quantile_sketch_accuracy(registry):
    """Per-group sketch estimates within 1% absolute rank of the
    target inside each group's own CDF."""
    import numpy as np

    qs, _ = registry
    est = _to_pandas(qs["priority_quantiles_sketch"](SF))
    raw = _duck("SELECT o_orderpriority, o_totalprice FROM orders")
    for _, row in est.iterrows():
        grp = np.sort(
            raw.loc[
                raw["o_orderpriority"] == row["o_orderpriority"],
                "o_totalprice",
            ].to_numpy()
        )
        for q, c in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75")):
            rank = np.searchsorted(grp, row[c], side="right") / len(grp)
            assert abs(rank - q) <= 0.01, (row["o_orderpriority"], q, rank)


def test_ivf_recall_vs_brute(registry):
    qs, _ = registry
    exact = _to_pandas(qs["ann_cosine_topk"](SF))
    approx = _to_pandas(qs["ivf_ann_topk"](SF))
    e = set(zip(exact["query_id"], exact["vec_id"]))
    a = set(zip(approx["query_id"], approx["vec_id"]))
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall {recall:.2f} vs brute force too low"


def test_grouped_topk_matches_pandas(ray_session):
    """ops.grouped_topk (per-batch combiner + grouped merge) equals a
    plain pandas groupby-head on shuffled multi-block input, with
    deterministic tiebreak and correct per-group ranks."""
    import numpy as np
    import ray.data as rd

    from tilers_tools_ray.relational import ops

    rng = np.random.default_rng(21)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 40, n),
            "v": rng.integers(0, 50, n).astype("float64"),  # many ties
            "id": rng.permutation(n).astype("int64"),
        }
    )
    ds = rd.from_pandas(df).repartition(13)
    got = (
        _to_pandas(ops.grouped_topk(ds, "g", "v", 5, tie_col="id"))
        .sort_values(["g", "rk"])
        .reset_index(drop=True)[["g", "v", "id", "rk"]]
    )
    exp = (
        df.sort_values(["v", "id"], ascending=[False, True])
        .groupby("g", sort=False)
        .head(5)
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    exp["rk"] = exp.groupby("g").cumcount() + 1
    pd.testing.assert_frame_equal(
        got, exp[["g", "v", "id", "rk"]], check_dtype=False
    )


def test_bloom_bitmap_contract():
    """The join Bloom prefilter's kernel contract: NO false negatives
    (a dropped matching fact row would corrupt the join), FP rate near
    the 12-bits/key design point (~0.3%), and string keys hash
    consistently."""
    import numpy as np

    from tilers_tools_ray.relational import ops

    keys = np.arange(0, 200_000, 2).astype("int64")  # evens are members
    pow_ = ops._bloom_pow(len(keys))
    bm = np.zeros(1 << (pow_ - 6), dtype=np.uint64)
    ops._bloom_set(bm, ops._bloom_indices(keys, pow_))
    probe = np.arange(200_000).astype("int64")
    hit = ops._bloom_test(bm, ops._bloom_indices(probe, pow_))
    assert hit[::2].all(), "false negative — join correctness violated"
    assert hit[1::2].mean() < 0.01, f"FP rate {hit[1::2].mean():.4f}"

    words = np.array([f"k{i}" for i in range(0, 1000, 2)], dtype=object)
    pw = ops._bloom_pow(len(words))
    bs = np.zeros(1 << (pw - 6), dtype=np.uint64)
    ops._bloom_set(bs, ops._bloom_indices(words, pw))
    assert ops._bloom_test(bs, ops._bloom_indices(words, pw)).all()


def test_anti_join_bloom_split_identity(ray_session):
    """anti_join with the Bloom split (non-hits bypass the shuffle)
    must return exactly the rows of the plain shuffled path, including
    the all-match and empty-right edges."""
    import numpy as np
    import ray.data as rd

    from tilers_tools_ray.relational import ops

    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 1000, 8000).astype("int64"),
            "v": np.arange(8000, dtype="int64"),
        }
    )
    for right_keys in (
        np.arange(0, 500, 2, dtype="int64"),  # half the key space
        np.arange(0, 1000, dtype="int64"),  # everything matches
        np.array([], dtype="int64"),  # nothing matches
    ):
        lds = rd.from_pandas(left).repartition(7)
        rds = rd.from_pandas(pd.DataFrame({"k": right_keys}))
        got = _to_pandas(ops.anti_join(lds, rds, on="k", bloom=True))
        if got.empty:  # an all-empty Dataset has no schema (same on
            # the non-bloom path) — normalize for the frame compare
            got = pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in ("k", "v")}
            )
        got = got.sort_values("v").reset_index(drop=True)
        exp = (
            left[~left["k"].isin(right_keys)]
            .sort_values("v")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["k", "v"]], exp, check_dtype=False
        )


def test_with_row_rank_is_global_row_number(ray_session):
    """ops.with_row_rank assigns the exact global ROW_NUMBER of the
    total order across shuffled multi-block input (ranks must be a
    permutation-free 0..n-1 sequence consistent with the sort key),
    and block layout must not matter."""
    import numpy as np
    import ray.data as rd

    from tilers_tools_ray.relational import ops

    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 100, n),  # many ties
            "id": rng.permutation(n).astype("int64"),
        }
    )
    for parts in (3, 17):
        ds = rd.from_pandas(df).repartition(parts)
        got = (
            _to_pandas(ops.with_row_rank(ds, ["k", "id"], rank_col="r"))
            .sort_values("r")
            .reset_index(drop=True)
        )
        exp = df.sort_values(["k", "id"]).reset_index(drop=True)
        assert (got["r"].to_numpy() == np.arange(n)).all()
        pd.testing.assert_frame_equal(
            got[["k", "id"]], exp, check_dtype=False
        )


def test_hash_sample_block_layout_invariant(ray_session):
    """The multiplicative-hash sample is a pure row predicate: the
    same rows are kept regardless of block layout, and the rate is
    ~10%."""
    import numpy as np
    import ray.data as rd

    from tilers_tools_ray.relational.queries import (
        _SAMPLE_MULT,
        _SAMPLE_THRESHOLD,
    )

    ids = np.arange(100_000, dtype=np.uint64)
    keyed = ids * np.uint64(_SAMPLE_MULT)
    keep = keyed < np.uint64(_SAMPLE_THRESHOLD)
    rate = keep.mean()
    assert 0.095 < rate < 0.105
    # block-layout invariance: predicate result is identical per row
    # whether evaluated in 1 block or 17
    df = pd.DataFrame({"doc_id": ids.astype("int64")})
    import pyarrow as pa

    def pick(t: pa.Table) -> pa.Table:
        u = t.column("doc_id").to_numpy().astype(np.uint64)
        return t.filter(pa.array(u * np.uint64(_SAMPLE_MULT) < np.uint64(_SAMPLE_THRESHOLD)))

    one = rd.from_pandas(df).map_batches(pick, batch_format="pyarrow").to_pandas()
    many = (
        rd.from_pandas(df)
        .repartition(17)
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
    )
    assert sorted(one["doc_id"]) == sorted(many["doc_id"])
    assert len(one) == int(keep.sum())


def test_workers_need_no_import_path():
    """Driver-contract regression: the driver imports __ray_entry__ via
    a bare sys.path entry (no PYTHONPATH), so Ray workers may have NO
    importable copy of the package — everything worker-side must arrive
    via cloudpickle register_pickle_by_value. A lazy `from .. import
    raster` inside a worker-executed function broke exactly this
    (ModuleNotFoundError on 6 driver queries); keep such imports at
    module top. Runs a corpus pyramid query from /tmp in a clean env."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import ray\n"
        "ray.init(address='local', num_cpus=4, include_dashboard=False,\n"
        "         logging_level='ERROR')\n"
        "import __ray_entry__ as e\n"
        "out = e.queries()['tile_pyramid_stats']('/root/testdata/sf0.001')\n"
        "assert len(out) >= 1\n"
        "out2 = e.queries()['spatial_join_images']('/root/testdata/sf0.001')\n"
        "print('OK', len(out), len(out2))\n"
        "ray.shutdown()\n"
    )
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)
    }
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0 and "OK" in r.stdout, r.stderr[-2000:]


def test_heavy_hitters_zipf_certifies(ray_session):
    """On skewed (zipf) data the MG sketch certifies: the k-th exact
    candidate count exceeds the accumulated decrement bound, so the
    sketch path alone provably returns the exact top-k — asserted
    against a plain pandas groupby."""
    import numpy as np
    import ray.data as rd

    from tilers_tools_ray.relational import ops

    rng = np.random.default_rng(3)
    vals = rng.zipf(1.3, size=200_000)
    vals = vals[vals < 100_000].astype("int64")
    df = pd.DataFrame({"key": vals})
    ds = rd.from_pandas(df).repartition(9)
    got, cert = ops.heavy_hitters(
        ds, "key", k=10, capacity=512, return_certified=True
    )
    assert cert, "zipf data with small key space must certify"
    exp = (
        df.groupby("key", as_index=False)
        .size()
        .rename(columns={"size": "cnt"})
        .sort_values(["cnt", "key"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp[["key", "cnt"]], check_dtype=False)


def test_heavy_hitters_uniform_falls_back_exact(ray_session):
    """Uniform high-cardinality data cannot certify at a small
    capacity — the operator must detect that (certified False) and
    still return the exact answer via the full-aggregation fallback."""
    import numpy as np
    import ray.data as rd

    from tilers_tools_ray.relational import ops

    rng = np.random.default_rng(4)
    # very flat (~2 occurrences/key) across MANY batches: the k-th
    # true count (~8) is below both decrement bounds (>=1 cut per
    # batch x 15 batches, and (n - S)/(capacity+1) ~ 900)
    vals = rng.integers(0, 30_000, size=60_000).astype("int64")
    df = pd.DataFrame({"key": vals})
    ds = rd.from_pandas(df).repartition(16)
    got, cert = ops.heavy_hitters(
        ds, "key", k=10, capacity=64, batch_size=4096, return_certified=True
    )
    assert not cert, "flat multi-batch data at capacity 64 must not certify"
    exp = (
        df.groupby("key", as_index=False)
        .size()
        .rename(columns={"size": "cnt"})
        .sort_values(["cnt", "key"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp[["key", "cnt"]], check_dtype=False)


def test_inactive_anti_join_fallback(registry):
    """The distributed left-anti path (broadcast_limit=0 forces it)
    returns exactly what the broadcast path and the SQL oracle do."""
    from tilers_tools_ray.relational import queries as Q

    broadcast = _normalize(_to_pandas(Q.customers_inactive_1995(SF)))
    anti = _normalize(
        _to_pandas(Q.customers_inactive_1995(SF, broadcast_limit=0))
    )
    pd.testing.assert_frame_equal(broadcast, anti, check_dtype=False)


@pytest.mark.parametrize(
    "name",
    [
        "q3_top_revenue_orders",
        "q5_nation_revenue",
        "segment_year_revenue_pivot",
        "top_orders_per_segment",
        "brand_volume",
        "q17_small_quantity_revenue",
        "nation_year_rollup",
        "doc_salient_terms",
        "q16_brand_size_suppliers",
    ],
)
def test_dim_join_fallback(registry, name):
    """Every SF-proportional-dimension query routes through the
    size-guarded ops.dim_join/semi_join: forcing broadcast_limit=0
    exercises the distributed hash-join fallback, which must return
    exactly what the broadcast path (and hence the SQL oracle) does."""
    from tilers_tools_ray.relational import queries as Q

    fn = getattr(Q, name)
    fast = _normalize(_to_pandas(fn(SF)))
    fallback = _normalize(_to_pandas(fn(SF, broadcast_limit=0)))
    pd.testing.assert_frame_equal(fast, fallback, check_dtype=False)


def test_cli_query_runner(ray_session, tmp_path, capsys):
    """`cli query` lists the registry and runs a query to parquet —
    the standalone surface for every registered pipeline."""
    import pyarrow.parquet as pq

    from tilers_tools_ray import cli

    cli.main(["query", "--list"])
    listed = capsys.readouterr().out
    assert "q1_pricing_summary" in listed and "sql-oracled" in listed

    out = str(tmp_path / "q1.parquet")
    cli.main(["query", "q1_pricing_summary", "--sf-dir", SF, "--out", out])
    t = pq.read_table(out)
    assert t.num_rows == 6 and "sum_qty" in t.schema.names


def test_grouped_sum_cb_matches_pandas(ray_session):
    """grouped_sum_cb (coarse-bucketed grouped sum for SF-proportional
    keys) ≡ a plain pandas groupby-sum, including multi-key grouping
    and the optional count alias."""
    import numpy as np
    import ray.data as rd

    from tilers_tools_ray.relational import ops

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "k1": rng.integers(0, 50, 5000),
            "k2": rng.choice(["a", "b", "c"], 5000),
            "v": rng.integers(-100, 100, 5000).astype("int64"),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    got = (
        ops.grouped_sum_cb(ds, ["k1", "k2"], ["v"], count_alias="n")
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    exp = (
        df.groupby(["k1", "k2"], as_index=False)
        .agg(v=("v", "sum"), n=("v", "size"))
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_grouped_min_cb_matches_pandas(ray_session):
    """grouped_min_cb (coarse-bucketed grouped min — the Q2 argmin
    substrate) ≡ a plain pandas groupby-min across block splits."""
    import numpy as np
    import ray.data as rd

    from tilers_tools_ray.relational import ops

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 300, 5000),
            "v": rng.integers(-1000, 1000, 5000).astype("int64"),
            "w": rng.normal(size=5000),
        }
    )
    ds = rd.from_pandas(df).repartition(7)
    got = (
        ops.grouped_min_cb(ds, ["k"], ["v", "w"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("k", as_index=False)[["v", "w"]]
        .min()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_distinct_cb_matches_pandas(ray_session):
    """distinct_cb ≡ drop_duplicates over the same column combo."""
    import numpy as np
    import ray.data as rd

    from tilers_tools_ray.relational import ops

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 20, 4000),
            "b": rng.choice(["x", "y"], 4000),
        }
    )
    ds = rd.from_pandas(df).repartition(6)
    got = (
        ops.distinct_cb(ds, ["a", "b"])
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    exp = (
        df.drop_duplicates()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_kmeans_planted_blobs(ray_session):
    """ann.kmeans recovers well-separated planted clusters (purity ≈ 1)
    AND the distributed Lloyd pass equals a serial reference
    implementation run from the same seeded init — the partial-sum
    merge must be exactly the full-data mean."""
    import numpy as np
    import ray.data as rd

    from tilers_tools_ray.relational import ann

    rng = np.random.default_rng(3)
    k, d, per = 6, 16, 300
    centers = ann._normalize(rng.normal(size=(k, d)) * 4)
    X = np.concatenate(
        [centers[i] * 5 + rng.normal(size=(per, d)) * 0.2 for i in range(k)]
    )
    labels = np.repeat(np.arange(k), per)
    df = pd.DataFrame(
        {"vec_id": np.arange(len(X), dtype="int64"), "embedding": list(X)}
    )
    ds = rd.from_pandas(df).repartition(8)

    cent, stats = ann.kmeans(ds, k=k, iters=8, seed=5, batch_size=256)
    assert stats["n"].sum() == len(X)

    asg = ann.kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
    m = pd.DataFrame({"cluster": asg["cluster"].to_numpy(), "label": labels})
    purity = (
        m.groupby("cluster")["label"].agg(lambda s: s.value_counts().iloc[0]).sum()
        / len(m)
    )
    assert purity >= 0.99, purity

    # serial reference from the identical seeded init
    sample = ann._seeded_sample(ds.select_columns(["vec_id", "embedding"]), 8192, seed=5)
    ref = ann._kmeanspp_init(
        ann._normalize(np.stack([r["embedding"] for r in sample])), k, 5
    )
    Xn = ann._normalize(X)
    for _ in range(8):
        a = np.argmax(Xn @ ref.T, axis=1)
        new = ref.copy()
        for c in range(k):
            mem = Xn[a == c]
            if len(mem):
                new[c] = mem.mean(axis=0)
        ref = ann._normalize(new)
    assert np.allclose(cent, ref, atol=1e-9)


def test_with_running_sum_is_global_prefix_sum(ray_session):
    """with_running_sum ≡ pandas sort + shifted cumsum, across an
    arbitrary block split."""
    import numpy as np
    import ray.data as rd

    from tilers_tools_ray.relational import ops

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "k": rng.permutation(4000).astype("int64"),
            "v": rng.integers(0, 900, 4000).astype("int64"),
        }
    )
    ds = rd.from_pandas(df).repartition(9)
    got = (
        ops.with_running_sum(ds, "k", "v", out_col="rs")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = df.sort_values("k").reset_index(drop=True)
    exp["rs"] = exp["v"].cumsum().shift(fill_value=0)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _mini_docs(tmp_path, texts):
    """Write a minimal documents.parquet (schema-compatible with the
    testdata table) for planted-corpus query tests; returns sf_dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / f"sf_mini_{os.getpid()}"
    d.mkdir(exist_ok=True)
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_ngram_decontamination_token_alignment(ray_session, tmp_path):
    """Planted semantics: a doc repeating a probe 4-token window is
    flagged even under different case/whitespace/punctuation (token-
    normalized match), while a doc containing the same CHARACTERS
    without the token boundaries (fused words) is not — the contract
    that separates this from benchmark_contamination's substring scan."""
    from tilers_tools_ray.relational import queries as Q

    probe = "alpha bravo charlie delta echo foxtrot golf hotel"
    texts = [
        probe,  # doc 0: the probe (n_probes=1)
        "zz yy ALPHA   bravo,charlie\tDELTA xx ww qq rr ss tt",  # 1: hit
        "zz yy alphabravo charliedelta xx ww qq rr ss tt vv",  # 2: fused, no hit
        "completely unrelated text with many boring tokens here ok",  # 3
    ]
    sf = _mini_docs(tmp_path, texts)
    out = _to_pandas(
        Q.ngram_decontamination(sf, n_probes=1, width=4, stride=1, min_len=12)
    )
    assert out["doc_id"].tolist() == [1]
    assert int(out["n_hits"].iloc[0]) >= 1


def test_train_val_test_split_deterministic_partition(ray_session):
    """The split is a pure function of doc_id: two runs agree exactly,
    the three classes partition the corpus, and the assignment matches
    the unbounded-int definition recomputed in pure Python."""
    from tilers_tools_ray.relational import queries as Q

    a = _to_pandas(Q.train_val_test_split(SF))
    b = _to_pandas(Q.train_val_test_split(SF))
    pd.testing.assert_frame_equal(a, b)
    import pyarrow.parquet as pq

    n_total = pq.read_metadata(os.path.join(SF, "documents.parquet")).num_rows
    assert int(a["n_docs"].sum()) == n_total
    # pure-Python recount of class sizes over the same ids
    ids = pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["doc_id"]
    )["doc_id"].to_pylist()
    counts = {"train": 0, "val": 0, "test": 0}
    for i in ids:
        h = ((i % Q._SPLIT_MOD) * Q._SPLIT_K) % Q._SPLIT_MOD
        counts[
            "test" if h < Q._SPLIT_TEST else "val" if h < Q._SPLIT_VAL else "train"
        ] += 1
    got = dict(zip(a["split"], a["n_docs"].astype(int)))
    assert {k: v for k, v in counts.items() if v} == got
