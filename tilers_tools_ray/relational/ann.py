"""Similarity search over embedding columns (graft scope).

  brute_topk — exact cosine top-k: numpy matmul per batch against a
               broadcast query matrix (the baseline; one pass over the
               table, per-batch partial top-k, tiny final merge).
  ivf_topk   — IVF-style scale path: seeded-centroid coarse quantizer
               (k-means-lite, built once on the driver from a sample),
               assign rows to cells per batch, probe only the
               ``nprobe`` nearest cells per query.

Both return (query_id, vec_id, rank) with deterministic tie-breaks
(score DESC, vec_id ASC). Scores are computed in float64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(m):
    m = np.asarray(m, dtype=np.float64)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1.0, n)


class BruteScorer:
    """Per-batch exact scorer vs broadcast queries (state: normalized
    query matrix, fetched once per actor)."""

    def __init__(self, queries_ref, k, exclude_self=True):
        import ray

        q = queries_ref if isinstance(queries_ref, dict) else ray.get(queries_ref)
        self.qids = np.asarray(q["qids"], dtype=np.int64)
        self.qm = _normalize(q["vecs"])
        self.k = int(k)
        self.exclude_self = exclude_self

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = _normalize(np.stack(batch["embedding"].to_numpy()))
        vids = batch["vec_id"].to_numpy(dtype=np.int64)
        scores = self.qm @ vecs.T  # (nq, nb)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            s = scores[qi]
            mask = vids != qid if self.exclude_self else np.ones(len(vids), bool)
            idx = np.flatnonzero(mask)
            if len(idx) == 0:
                continue
            take = min(self.k, len(idx))
            part = idx[np.argpartition(-s[idx], take - 1)[:take]]
            out_q.extend([qid] * len(part))
            out_v.extend(vids[part].tolist())
            out_s.extend(s[part].tolist())
        return pd.DataFrame(
            {"query_id": out_q, "vec_id": out_v, "score": out_s}
        )


def _finalize_topk(partials_ds, k):
    """Merge per-batch partials: groupby(query_id) → global top-k with
    (score DESC, vec_id ASC) tie-break → rank column."""

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["score", "vec_id"], ascending=[False, True]
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "vec_id", "rank"]]

    return partials_ds.groupby("query_id").map_groups(
        final, batch_format="pandas"
    )


def brute_topk(emb_ds, query_ids, query_vecs, k=10, concurrency=(1, 8)):
    """Exact cosine top-k for each query vector. Returns a Dataset of
    (query_id, vec_id, rank)."""
    import ray

    ref = ray.put({"qids": list(query_ids), "vecs": np.asarray(query_vecs)})
    partials = emb_ds.map_batches(
        BruteScorer,
        fn_constructor_kwargs={"queries_ref": ref, "k": k},
        batch_format="pandas",
        batch_size=4096,
        concurrency=concurrency,
    )
    return _finalize_topk(partials, k)


# ---------------------------------------------------------------------------
# IVF (scale path)
# ---------------------------------------------------------------------------


def train_centroids(sample_vecs, n_cells=16, iters=5, seed=11):
    """k-means-lite on a driver-side sample (deterministic seed)."""
    x = _normalize(sample_vecs)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


class IVFScorer:
    """Probe-limited scorer: score a batch row only for queries whose
    ``nprobe`` nearest cells include the row's cell."""

    def __init__(self, queries_ref, centroids_ref, k, nprobe=3):
        import ray

        q = queries_ref if isinstance(queries_ref, dict) else ray.get(queries_ref)
        self.qids = np.asarray(q["qids"], dtype=np.int64)
        self.qm = _normalize(q["vecs"])
        self.cent = (
            centroids_ref
            if isinstance(centroids_ref, np.ndarray)
            else ray.get(centroids_ref)
        )
        self.k = int(k)
        qc = self.qm @ self.cent.T
        self.probe = np.argsort(-qc, axis=1)[:, :nprobe]  # (nq, nprobe)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = _normalize(np.stack(batch["embedding"].to_numpy()))
        vids = batch["vec_id"].to_numpy(dtype=np.int64)
        cells = np.argmax(vecs @ self.cent.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            in_probe = np.isin(cells, self.probe[qi]) & (vids != qid)
            idx = np.flatnonzero(in_probe)
            if len(idx) == 0:
                continue
            s = vecs[idx] @ self.qm[qi]
            take = min(self.k, len(idx))
            part = np.argpartition(-s, take - 1)[:take]
            out_q.extend([qid] * take)
            out_v.extend(vids[idx[part]].tolist())
            out_s.extend(s[part].tolist())
        return pd.DataFrame({"query_id": out_q, "vec_id": out_v, "score": out_s})


def ivf_topk(
    emb_ds,
    query_ids,
    query_vecs,
    k=10,
    n_cells=16,
    nprobe=3,
    sample_fraction=0.5,
    concurrency=(1, 8),
):
    """Approximate cosine top-k via IVF cells. Trains the coarse
    quantizer on a seeded sample, broadcasts centroids + queries."""
    import ray

    sample = emb_ds.random_sample(sample_fraction, seed=11).take_all()
    cent = train_centroids(
        np.stack([r["embedding"] for r in sample]), n_cells=n_cells
    )
    qref = ray.put({"qids": list(query_ids), "vecs": np.asarray(query_vecs)})
    cref = ray.put(cent)
    partials = emb_ds.map_batches(
        IVFScorer,
        fn_constructor_kwargs={
            "queries_ref": qref,
            "centroids_ref": cref,
            "k": k,
            "nprobe": nprobe,
        },
        batch_format="pandas",
        batch_size=4096,
        concurrency=concurrency,
    )
    return _finalize_topk(partials, k)


def embedding_cosine_dup_pairs(emb_ds, threshold=0.98):
    """Embedding-cosine near-dup detection: LSH-free small-table path —
    per-batch normalized matmul against a broadcast of the (small)
    table itself; at scale swap the broadcast side for IVF buckets.
    Returns (vec_a, vec_b, score) pairs with vec_a < vec_b."""
    rows = emb_ds.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    m = _normalize(np.stack([r["embedding"] for r in rows]))
    s = m @ m.T
    iu = np.triu_indices(len(ids), k=1)
    mask = s[iu] >= threshold
    a = ids[iu[0][mask]]
    b = ids[iu[1][mask]]
    # triu is over ROW POSITIONS; normalize to id order (vec_a < vec_b)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    return pd.DataFrame(
        {"vec_a": lo, "vec_b": hi, "score": np.round(s[iu][mask], 6)}
    ).sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
