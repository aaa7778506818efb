"""Cluster-shaped dedup paths + vectorized text kernels.

Covers VERDICT r1 items: bucketed MinHash/SimHash pair generation
(planted-duplicate precision/recall), de-lambda'd exact dedup at high
group cardinality, IVF-bucketed embedding dup pairs vs brute force,
and exact-equivalence regression of the vectorized text kernels
against their scalar definitions."""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pytest

from tilers_tools_ray.relational import ann, dedup
from tilers_tools_ray.relational import text as T

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()


def _synth_docs(n=120, n_dups=15, seed=5):
    """Corpus with planted near-duplicates: dup doc = source doc with
    one word changed (high Jaccard); everything else is independent
    random text (low pairwise Jaccard)."""
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(_WORDS, size=60).tolist()) for _ in range(n)
    ]
    planted = []
    for d in range(n_dups):
        src = int(rng.integers(0, n))
        toks = texts[src].split()
        toks[int(rng.integers(0, len(toks)))] = "zulu"
        texts.append(" ".join(toks))
        planted.append((src, n + d))
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    pairs = {(min(a, b), max(a, b)) for a, b in planted}
    return df, pairs


@pytest.fixture(scope="module")
def planted(ray_session):
    import ray.data as rd

    df, pairs = _synth_docs()
    return rd.from_pandas(df), df, pairs


def test_minhash_planted_recall_precision(planted):
    ds, df, expected = planted
    out = dedup.minhash_lsh_pairs(ds, jaccard_threshold=0.8)
    got = set(zip(out["doc_a"], out["doc_b"]))
    # recall: every planted near-dup pair is found (1-word edit at 60
    # tokens ⇒ jaccard ≈ 0.9, well above threshold, and 16 bands of 4
    # rows make a miss vanishingly unlikely)
    missed = expected - got
    assert not missed, f"missed planted pairs: {missed}"
    # precision: verified exact Jaccard ≥ threshold for every reported
    # pair (recompute independently)
    for a, b in got:
        j = T.jaccard_tokens(df["text"][a], df["text"][b])
        assert j >= 0.8, (a, b, j)


def test_simhash_planted_recall_and_exact_verify(planted):
    ds, df, expected = planted
    out = dedup.simhash_pairs(ds, max_hamming=6)
    got = set(zip(out["doc_a"], out["doc_b"]))
    sh = T.SimHasher()
    sims = {int(r.doc_id): sh.simhash_one(r.text) for r in df.itertuples()}

    def ham(a, b):
        return bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1")

    # every reported pair is within the distance (exact precision)
    for a, b in got:
        assert ham(a, b) <= 6
    # pigeonhole completeness: EVERY pair within hamming<=6 is found
    n = len(df)
    all_close = {
        (i, j) for i in range(n) for j in range(i + 1, n) if ham(i, j) <= 6
    }
    assert got == all_close
    # the planted dups that are within distance are among them
    assert {p for p in expected if ham(*p) <= 6} <= got


def test_exact_dedup_high_cardinality_smoke(ray_session):
    """≥1e5 distinct groups must finish in seconds (per-batch partial
    min + vectorized grouped Min, no per-group Python lambda)."""
    import ray.data as rd

    n = 200_000
    rng = np.random.default_rng(3)
    ids = np.arange(n, dtype=np.int64)
    rng.shuffle(ids)
    # ~1e5 distinct texts, each duplicated ~2x
    texts = [f"text-{v}" for v in (ids % 100_000)]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts})).repartition(8)
    t0 = time.monotonic()
    out = dedup.exact_dedup(ds).to_pandas()
    wall = time.monotonic() - t0
    assert len(out) == 100_000
    assert wall < 60, f"high-cardinality dedup too slow: {wall:.1f}s"
    # keep-first semantics: the minimum doc_id of each text group
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    expect = df.groupby("text")["doc_id"].min().sort_values().to_numpy()
    assert np.array_equal(out["doc_id"].to_numpy(), expect)


def test_embedding_dup_pairs_matches_brute_force(ray_session):
    """IVF-cell-bucketed pair generation with the triangle-inequality
    bound is EXACT: identical to driver-side all-pairs at any
    threshold (loose → all cell pairs survive; tight → pruned)."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    base = rng.normal(size=(80, 16))
    # plant tight duplicates
    vecs = np.vstack([base, base[:10] + rng.normal(scale=0.01, size=(10, 16))])
    ids = np.arange(len(vecs), dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs.astype(np.float32))})
    ds = rd.from_pandas(df)
    m = vecs.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    s = m @ m.T
    for thr in (0.5, 0.95):
        out = ann.embedding_cosine_dup_pairs(ds, threshold=thr, n_cells=8)
        iu = np.triu_indices(len(ids), k=1)
        mask = s[iu] >= thr
        expect = sorted(zip(iu[0][mask], iu[1][mask]))
        got = sorted(zip(out["vec_a"], out["vec_b"]))
        assert got == expect, f"thr={thr}: {len(got)} vs {len(expect)} pairs"


def test_embedding_dup_pairs_sub_blocked_exact(ray_session):
    """With sub_rows far below the cell sizes, every cell splits into
    many sub-blocks — the pair set must still be exactly the all-pairs
    answer, and no packed row may exceed sub_rows vectors."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    # one dominant direction -> deliberately skewed cells
    vecs = rng.normal(size=(300, 8)) + np.array([4.0] + [0.0] * 7)
    ids = np.arange(len(vecs), dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs.astype(np.float32))})
    ds = rd.from_pandas(df)
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    s = m @ m.T
    thr = 0.98
    out = ann.embedding_cosine_dup_pairs(
        ds, threshold=thr, n_cells=4, sub_rows=16
    )
    iu = np.triu_indices(len(ids), k=1)
    mask = s[iu] >= thr
    expect = sorted(zip(iu[0][mask], iu[1][mask]))
    got = sorted(zip(out["vec_a"], out["vec_b"]))
    assert got == expect and len(expect) > 0


def test_ngram_jaccard_sub_blocked_exact(ray_session):
    """Forcing tiny sub-blocks (every block splits) must not change the
    exact pair set, and the CSR sweep must equal per-pair Jaccard."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(60)]
    # plant dups
    for i in range(5):
        texts.append(texts[i])
    ids = np.arange(len(texts), dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}))
    base = dedup.ngram_jaccard_pairs(ds, threshold=0.5, n_blocks=3, sub_rows=4096)
    split = dedup.ngram_jaccard_pairs(ds, threshold=0.5, n_blocks=3, sub_rows=7)
    assert len(base) > 0
    pd.testing.assert_frame_equal(base, split)


def test_adaptive_coarse_scales():
    assert dedup._adaptive_coarse(1_000) == 64  # floor
    assert dedup._adaptive_coarse(10_000_000) == 100
    assert dedup._adaptive_coarse(10**12) == 65_536  # cap
    a, b = dedup._adaptive_coarse(50_000_000), dedup._adaptive_coarse(500_000_000)
    assert b == 10 * a  # scales linearly in between


def test_centroid_sample_is_bounded(ray_session):
    """_seeded_sample materializes at most ~cap rows on the driver no
    matter how large the input dataset is."""
    import ray.data as rd

    n = 60_000
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(np.random.default_rng(3).normal(size=(n, 4)).astype(np.float32)),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    rows = ann._seeded_sample(ds, cap=1000)
    assert len(rows) <= 1000
    assert rows == sorted(rows, key=lambda r: r["vec_id"])
    # deterministic across calls
    rows2 = ann._seeded_sample(ds, cap=1000)
    assert [r["vec_id"] for r in rows] == [r["vec_id"] for r in rows2]
    # small inputs come back whole
    small = rd.from_pandas(df.head(50))
    assert len(ann._seeded_sample(small, cap=1000)) == 50


# ---------------------------------------------------------------------------
# vectorized text kernels ≡ scalar definitions
# ---------------------------------------------------------------------------


def _scalar_fingerprint(t, window=16, base=257, mod=(1 << 61) - 1):
    b = t.encode("utf-8")
    if len(b) < window:
        return T._md5_64(t)
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
    h, best = 0, None
    pw = pow(base, window - 1, mod)
    for i, c in enumerate(arr):
        h = (h * base + int(c)) % mod
        if i >= window - 1:
            best = h if best is None or h < best else best
            h = (h - int(arr[i - window + 1]) * pw) % mod
    return best


def test_rolling_fingerprint_matches_scalar():
    rng = np.random.default_rng(9)
    texts = [
        "",
        "short",
        "exactly sixteen!",  # == window
        "日本語テキストのウィンドウ境界テスト",
        *(
            " ".join(rng.choice(_WORDS, size=int(rng.integers(1, 200))).tolist())
            for _ in range(50)
        ),
    ]
    batch = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    got = list(T.rolling_fingerprint(batch)["fingerprint"])
    expect = [_scalar_fingerprint(t) for t in texts]
    assert got == expect


def test_simhash_matches_scalar():
    """Batch kernel (__call__, 64 reduceat passes) ≡ per-token scalar
    definition — both over the vectorized hash_tokens token hash (the
    r3 Python-md5 kernel was replaced; the definition moves with it)."""
    def scalar_simhash(t):
        votes = np.zeros(64, dtype=np.int64)
        for tok in T._TOKEN_RE.findall(t.lower()):
            h = np.uint64(T.hash_tokens(np.array([tok], dtype=object))[0])
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            votes += bits.astype(np.int64) * 2 - 1
        h = 0
        for i in np.flatnonzero(votes > 0):
            h |= 1 << int(i)
        return h - (1 << 64) if h >= 1 << 63 else h

    rng = np.random.default_rng(13)
    texts = ["", "one", *(
        " ".join(rng.choice(_WORDS, size=30).tolist()) for _ in range(30)
    )]
    sh = T.SimHasher()
    expect = [scalar_simhash(t) for t in texts]
    assert [sh.simhash_one(t) for t in texts] == expect
    batch = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    got = list(sh(batch)["simhash"])
    assert got == expect


def test_minhash_batch_matches_scalar_signature():
    """Vectorized MinHasher.__call__ (flat-array shingle combine +
    reduceat minima) ≡ the per-document signature() definition,
    including short (<k tokens) and empty documents."""
    rng = np.random.default_rng(17)
    texts = [
        "",
        "one",
        "two words",
        "three tokens here",
        *(
            " ".join(rng.choice(_WORDS, size=int(rng.integers(1, 80))).tolist())
            for _ in range(40)
        ),
    ]
    mh = T.MinHasher()
    batch = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    got = mh(batch)["minhash"].tolist()
    expect = [mh.signature(t).tolist() for t in texts]
    assert got == expect


def test_hash128_key_properties():
    """The vectorized 128-bit exact-dedup key (two seeded hash_array
    passes used jointly): deterministic across calls, equal texts →
    equal key pairs, distinct texts → distinct key pairs, and the two
    columns are genuinely different hash functions (else the joint key
    would collapse to 64 bits)."""
    texts = np.array(
        ["", "a", "b", "a", "the same text", "the same text", "Ünïcode ✓"],
        dtype=object,
    )
    h1, h2 = T.hash128(texts)
    g1, g2 = T.hash128(texts)
    assert h1.dtype == np.int64 and h2.dtype == np.int64
    assert np.array_equal(h1, g1) and np.array_equal(h2, g2)
    # equal texts agree on BOTH columns
    assert h1[1] == h1[3] and h2[1] == h2[3]
    assert h1[4] == h1[5] and h2[4] == h2[5]
    # distinct texts give distinct joint keys
    pairs = set(zip(h1.tolist(), h2.tolist()))
    assert len(pairs) == len(set(texts.tolist()))
    # the two seeded passes are different functions
    assert not np.array_equal(h1, h2)


def test_langid_batch_matches_predict_one():
    texts = [
        "the cat sat on the mat and it is a fine day",
        "le chat est dans la maison et il est temps de partir",
        "el gato es un animal y la casa es grande",
        "der hund und die katze sind ein gutes team",
        "今天天气很好",
        "",
        "12345 67890 !!!",
        "wordswithoutstopwords everywhere nothing matches",
    ]
    li = T.LangId()
    batch = pd.DataFrame(
        {"doc_id": np.arange(len(texts)), "text": texts, "lang": ["en"] * len(texts)}
    )
    out = li(batch)
    assert list(out["pred_lang"]) == [li.predict_one(t) for t in texts]


def test_bucket_join_string_keys(ray_session):
    import ray.data as rd

    from tilers_tools_ray.relational import ops

    l = rd.from_pandas(
        pd.DataFrame({"k": ["a", "b", "c", "a"], "lv": [1, 2, 3, 4]})
    )
    r = rd.from_pandas(pd.DataFrame({"k": ["a", "c"], "rv": [10, 30]}))
    out = (
        ops.bucket_join(l, r, "k", n_buckets=4)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    assert list(out["k"]) == ["a", "a", "c"]
    assert list(out["rv"]) == [10, 10, 30]


def test_clean_corpus_planted_clusters(planted):
    """Composed dedup: planted near-dups + exact dups collapse into
    clusters with the smallest doc_id as canonical; everything else is
    its own canonical."""
    import ray.data as rd

    ds, df, expected = planted
    # add two exact copies of doc 0 at high ids
    n = len(df)
    extra = pd.DataFrame(
        {"doc_id": [n + 100, n + 101], "text": [df["text"][0]] * 2}
    )
    full = pd.concat([df, extra], ignore_index=True)
    out = dedup.clean_corpus(
        rd.from_pandas(full), jaccard_threshold=0.8
    ).to_pandas()
    assert len(out) == len(full)
    lut = dict(zip(out["doc_id"], out["canonical_id"]))
    # exact copies of doc 0 collapse to 0
    assert lut[n + 100] == 0 and lut[n + 101] == 0
    # every planted near-dup pair shares a canonical
    for a, b in expected:
        assert lut[a] == lut[b], (a, b)
    # canonical = min of its cluster; canonical rows are marked
    clusters = out.groupby("canonical_id")["doc_id"].min()
    assert (clusters.index == clusters.values).all()
    marked = set(out[out["is_canonical"] == 1]["doc_id"])
    assert set(out["canonical_id"]) <= marked
    # distributed label propagation produces the IDENTICAL labeling
    out_lp = dedup.clean_corpus(
        rd.from_pandas(full), jaccard_threshold=0.8, cc_method="labelprop"
    ).to_pandas()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), out_lp.reset_index(drop=True)
    )


def test_label_propagation_chain_and_components(ray_session):
    """_cc_label_propagation on a worst-diameter graph: one 12-node
    chain (needs several rounds to drain), one triangle, one isolated
    edge — every node labels with its component minimum."""
    import ray.data as rd

    chain = [(i, i + 1) for i in range(100, 112)]
    tri = [(7, 9), (9, 5), (5, 7)]
    lone = [(300, 200)]
    edges = pd.DataFrame(
        {"a": [a for a, _ in chain + tri + lone],
         "b": [b for _, b in chain + tri + lone]}
    )
    labels = dedup._cc_label_propagation(
        rd.from_pandas(edges), num_partitions=2
    ).to_pandas()
    lut = dict(zip(labels["node"], labels["label"]))
    assert all(lut[n] == 100 for n in range(100, 113))
    assert lut[5] == lut[7] == lut[9] == 5
    assert lut[200] == lut[300] == 200
    assert len(lut) == 13 + 3 + 2


def test_minhash_join_fallback_matches_broadcast(planted):
    """Above broadcast_limit the verify path switches to the two
    hash-partitioned joins — identical pairs either way."""
    ds, df, expected = planted
    a = dedup.minhash_lsh_pairs(ds, jaccard_threshold=0.8)
    b = dedup.minhash_lsh_pairs(ds, jaccard_threshold=0.8, broadcast_limit=0)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_minhash_scale_smoke(ray_session):
    """Bucketed LSH at 8k docs (~128k band rows): finishes quickly,
    finds every planted dup, zero false positives below threshold."""
    import ray.data as rd

    rng = np.random.default_rng(21)
    n, n_dups = 8000, 40
    texts = [
        " ".join(rng.choice(_WORDS, size=40).tolist()) for _ in range(n)
    ]
    planted = set()
    for d in range(n_dups):
        src = int(rng.integers(0, n))
        toks = texts[src].split()
        toks[int(rng.integers(0, len(toks)))] = "zulu"
        texts.append(" ".join(toks))
        planted.add((src, n + d))
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    ds = rd.from_pandas(df).repartition(8)
    t0 = time.monotonic()
    out = dedup.minhash_lsh_pairs(ds, jaccard_threshold=0.85)
    wall = time.monotonic() - t0
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert planted <= got, f"missed {planted - got}"
    assert (out["jaccard"] >= 0.85).all()
    assert wall < 120, f"bucketed LSH too slow at 8k docs: {wall:.1f}s"


def test_phash_near_dup_pairs_pigeonhole(ray_session):
    """Image near-dup via banded phash hamming: string ids flow through
    the generic core, every pair within the distance is found
    (pigeonhole completeness) and none outside it (exact verify)."""
    import ray.data as rd

    rng = np.random.default_rng(17)
    n = 150
    base = rng.integers(0, 2**63, size=n, dtype=np.int64)
    # plant near copies: flip <=6 random bits of a source phash
    ids = [f"img-{i:05d}" for i in range(n)]
    phashes = base.tolist()
    for d in range(20):
        src = int(rng.integers(0, n))
        flips = rng.choice(64, size=int(rng.integers(1, 7)), replace=False)
        h = int(base[src])
        for f in flips:
            h ^= 1 << int(f)
        ids.append(f"img-{n + d:05d}")
        h64 = h & (2**64 - 1)
        phashes.append(h64 - 2**64 if h64 >= 2**63 else h64)
    df = pd.DataFrame({"image_id": ids, "phash": np.array(phashes, dtype=np.int64)})
    out = dedup.phash_near_dup_pairs(rd.from_pandas(df), max_hamming=6)
    got = set(zip(out["image_a"], out["image_b"]))

    hv = df["phash"].to_numpy().astype(np.uint64)
    def ham(i, j):
        return int(bin(int(hv[i] ^ hv[j])).count("1"))
    m = len(df)
    all_close = {
        (ids[i], ids[j]) for i in range(m) for j in range(i + 1, m)
        if ham(i, j) <= 6
    }
    assert got == all_close and len(all_close) >= 10
    # string pair ordering: a < b lexicographically
    assert all(a < b for a, b in got)
    # reported hamming matches the exact distance
    pos = {ids[i]: i for i in range(m)}
    for r in out.itertuples(index=False):
        assert r.hamming == ham(pos[r.image_a], pos[r.image_b])


def test_hamming_blocks_scheme_equals_bands(ray_session):
    """The Manku-style 2-of-(h+2) block-combination banding (the
    ≥100k-doc auto path) returns EXACTLY the pairs of the h+1
    bit-slice banding — both are complete by pigeonhole and both
    verify with exact popcount, so only bucket sizes differ."""
    import ray.data as rd

    rng = np.random.default_rng(31)
    n = 300
    base = rng.integers(0, 2**63, size=n, dtype=np.int64)
    ids = [f"d{i:05d}" for i in range(n)]
    ph = base.tolist()
    for d in range(30):
        src = int(rng.integers(0, n))
        h = int(base[src])
        for f in rng.choice(64, size=int(rng.integers(1, 7)), replace=False):
            h ^= 1 << int(f)
        h &= 2**64 - 1
        ids.append(f"d{n + d:05d}")
        ph.append(h - 2**64 if h >= 2**63 else h)
    df = pd.DataFrame({"image_id": ids, "phash": np.array(ph, dtype=np.int64)})
    kw = dict(id_col="image_id", hash_col="phash", max_hamming=6, id_dtype="object")
    a = dedup.hamming_band_pairs(
        __import__("ray").data.from_pandas(df), scheme="bands", **kw
    )
    b = dedup.hamming_band_pairs(
        __import__("ray").data.from_pandas(df), scheme="blocks", **kw
    )
    assert len(a) >= 20
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


@pytest.mark.parametrize("cc_method", ["driver", "labelprop"])
def test_clean_image_corpus_planted(ray_session, cc_method):
    """Planted phash clusters: exact copies (same phash), a 1-bit
    near copy, and far singletons — every member maps to its
    cluster-minimum image_id, singletons to themselves. Runs through
    BOTH component paths (driver union-find and distributed min-label
    propagation) — they must agree exactly."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tilers_tools_ray.relational import dedup

    h1 = 0x1234_5678_9ABC_DEF0
    h2 = h1 ^ 0x1  # 1-bit near copy of h1
    h3 = 0x0FED_CBA9_8765_4321  # far away (hamming >> 6)
    rows = pd.DataFrame(
        {
            "image_id": [
                "img-0000",  # cluster A (h1)
                "img-0001",  # exact copy of A
                "img-0002",  # near copy (h2)
                "img-0003",  # singleton (h3)
                "img-0004",  # singleton (h3 ^ many bits)
            ],
            "phash": np.array(
                [h1, h1, h2, h3, h3 ^ 0xFFFF_0000], dtype=np.int64
            ),
        }
    )
    out = (
        dedup.clean_image_corpus(
            rd.from_pandas(rows), max_hamming=6, cc_method=cc_method
        )
        .to_pandas()
        .set_index("image_id")
    )
    assert out.loc["img-0000", "canonical_id"] == "img-0000"
    assert out.loc["img-0001", "canonical_id"] == "img-0000"
    assert out.loc["img-0002", "canonical_id"] == "img-0000"
    assert out.loc["img-0003", "canonical_id"] == "img-0003"
    assert out.loc["img-0004", "canonical_id"] == "img-0004"
    assert out["is_canonical"].sum() == 3
