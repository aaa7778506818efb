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
        "top_orders_by_price",
        "segment_stats",
        "events_hourly",
        "events_sessionize",
        "events_sliding_window",
        "events_asof_last_click",
        "brand_volume",
        "orders_price_band_join",
        "order_price_quantiles",
        "segment_distinct_customers",
        "doc_token_stats",
        "dedup_exact_docs",
        "ngram_jaccard_pairs",
        "doc_quality",
        "lang_id",
        "ann_cosine_topk",
        "embedding_dup_pairs",
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
        "tile_pyramid_stats",
        "tile_pyramid_stats_geodetic",
        "skew_census",
        "spatial_join_images",
        "knn_nearest_regions",
        "phash_dedup_images",
        "parse_georef_sidecars",
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


def test_ivf_recall_vs_brute(registry):
    qs, _ = registry
    exact = _to_pandas(qs["ann_cosine_topk"](SF))
    approx = _to_pandas(qs["ivf_ann_topk"](SF))
    e = set(zip(exact["query_id"], exact["vec_id"]))
    a = set(zip(approx["query_id"], approx["vec_id"]))
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall {recall:.2f} vs brute force too low"
