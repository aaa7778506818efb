"""Deduplication operators (graft scope — first-class at 100 TB).

  exact_dedup        — hash-partition on a 64-bit content hash, keep
                       first doc per group (cheap: the shuffle moves
                       (doc_id, hash) pairs, never the text).
  minhash_lsh_pairs  — shingle → minhash → band → bucket groupby →
                       candidate pairs → exact-Jaccard verify.
  simhash_pairs      — 64-bit simhash, banded (4×16-bit) bucketing →
                       hamming-distance verify.
  phash_dedup        — exact perceptual-hash dedup on the images
                       corpus (A4: groupby(phash), keep first
                       image_id).

All follow ray_guide.md "Aggregation at scale": per-batch partial
state, tiny grouped rows through the shuffle, payloads stay put.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import text as T


def exact_dedup(docs_ds, id_col="doc_id", text_col="text"):
    """One row per distinct text: the row with the smallest id.
    Returns columns (doc_id,) sorted — matches the SQL oracle
    ``SELECT min(doc_id) AS doc_id ... GROUP BY md5(text)``."""

    def hash_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "text_hash": batch[text_col].fillna("").map(T._md5_64),
            }
        )

    hashed = docs_ds.map_batches(hash_batch, batch_format="pandas")
    kept = hashed.groupby("text_hash").map_groups(
        lambda g: g.nsmallest(1, id_col)[[id_col]], batch_format="pandas"
    )
    return kept.sort(id_col)


def minhash_signatures(docs_ds, n_hashes=64, shingle_k=3, concurrency=(1, 8)):
    return docs_ds.map_batches(
        T.MinHasher,
        fn_constructor_kwargs={"n_hashes": n_hashes, "shingle_k": shingle_k},
        batch_format="pandas",
        batch_size=1024,
        concurrency=concurrency,
    )


def minhash_lsh_pairs(
    docs_ds,
    *,
    n_hashes=64,
    bands=16,
    shingle_k=3,
    jaccard_threshold=0.8,
    concurrency=(1, 8),
):
    """Near-duplicate pairs via MinHash+LSH.

    Pipeline: signatures (actor pool) → explode to one row per band
    (band_id, band_hash, doc_id) → groupby bucket → candidate pairs →
    exact shingle-Jaccard verify against broadcast texts (the corpus
    is small here; at scale the verify joins text back by doc_id).
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, sorted."""
    import ray

    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(docs_ds, n_hashes, shingle_k, concurrency)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        out_band, out_hash, out_doc = [], [], []
        for doc, sig in zip(batch["doc_id"], batch["minhash"]):
            s = np.asarray(sig, dtype=np.int64).reshape(bands, rows_per_band)
            for b in range(bands):
                out_band.append(b)
                out_hash.append(int(pd.util.hash_array(s[b]).sum()) & 0x7FFFFFFFFFFFFFFF)
                out_doc.append(doc)
        return pd.DataFrame(
            {"band": out_band, "band_hash": out_hash, "doc_id": out_doc}
        )

    # bucket table = one small row per (doc, band); candidate-pair
    # generation runs driver-side in vectorized pandas (per-group
    # Python map_groups costs ~1 ms/group — pathological at 80k
    # buckets). At larger-than-driver scale, swap for a groupby
    # keyed on (band, band_hash) with the same pair kernel.
    buckets = sigs.map_batches(explode, batch_format="pandas").to_pandas()
    nun = buckets.groupby(["band", "band_hash"])["doc_id"].transform("nunique")
    multi = buckets[nun > 1]
    rows = []
    for (_, _), g in multi.groupby(["band", "band_hash"]):
        docs = sorted(g["doc_id"].unique())
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                rows.append((docs[i], docs[j]))
    if not rows:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    cand_df = pd.DataFrame(rows, columns=["doc_a", "doc_b"]).drop_duplicates(
        ["doc_a", "doc_b"]
    )
    texts = {
        r["doc_id"]: r["text"]
        for r in docs_ds.select_columns(["doc_id", "text"]).take_all()
    }
    jac = [
        T.jaccard_tokens(texts[a], texts[b], k=shingle_k)
        for a, b in zip(cand_df["doc_a"], cand_df["doc_b"])
    ]
    cand_df = cand_df.assign(jaccard=np.round(jac, 6))
    out = cand_df[cand_df["jaccard"] >= jaccard_threshold]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def simhash_pairs(docs_ds, *, max_hamming=3, concurrency=(1, 8)):
    """Near-dup pairs via 64-bit SimHash with 4×16-bit band bucketing
    (any pair within hamming ≤ 16/band shares ≥1 band when distance ≤
    3 by pigeonhole over 4 bands). Returns (doc_a, doc_b, hamming)."""
    sigs = docs_ds.map_batches(
        T.SimHasher, batch_format="pandas", batch_size=1024, concurrency=concurrency
    )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy(dtype=np.int64)
        rows = []
        for band in range(4):
            chunk = (h >> (band * 16)) & 0xFFFF
            rows.append(
                pd.DataFrame(
                    {
                        "band": band,
                        "band_hash": chunk,
                        "doc_id": batch["doc_id"],
                        "simhash": h,
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)

    buckets = sigs.map_batches(explode, batch_format="pandas").to_pandas()
    a, b, d = [], [], []
    for (_, _), g in buckets.groupby(["band", "band_hash"]):
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2:
            continue
        docs = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.int64)
        for i in range(len(docs)):
            x = np.uint64(hs[i])
            for j in range(i + 1, len(docs)):
                ham = bin(int(x ^ np.uint64(hs[j]))).count("1")
                if ham <= max_hamming:
                    a.append(docs[i])
                    b.append(docs[j])
                    d.append(ham)
    df = pd.DataFrame({"doc_a": a, "doc_b": b, "hamming": d})
    if len(df) == 0:
        return df
    return (
        df.drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def phash_dedup(images_ds):
    """A4: exact perceptual-hash dedup over the images corpus — keep
    the smallest image_id per phash. Shuffles (image_id, phash) only."""
    slim = images_ds.select_columns(["image_id", "phash"])
    kept = slim.groupby("phash").map_groups(
        lambda g: g.sort_values("image_id").head(1)[["image_id", "phash"]],
        batch_format="pandas",
    )
    return kept.sort("image_id")


def ngram_jaccard_matrix(texts, k=3):
    """Exact all-pairs n-gram Jaccard for a SMALL candidate set (the
    verify kernel; driver-side only)."""
    sets = []
    mh = T.MinHasher.__new__(T.MinHasher)
    mh.k = k
    for t in texts:
        sets.append(mh.shingles(t.lower()))
    n = len(sets)
    out = np.eye(n)
    for i in range(n):
        for j in range(i + 1, n):
            u = len(sets[i] | sets[j])
            out[i, j] = out[j, i] = len(sets[i] & sets[j]) / max(u, 1)
    return out
