"""Text-analysis operators for training-data pipelines (graft scope —
language-ID, quality scoring, token counting, fingerprinting — over
the driver's ``documents`` table).

All per-batch bodies are vectorized (pandas .str / numpy); stateful
pieces (compiled regexes, stopword profiles, minhash permutation
coefficients) live in callable-class ``__init__`` so actor pools build
them once.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_TOKEN_RE = re.compile(r"\S+")
# BPE-ish subword splitter: words, numbers, or single punctuation
_BPE_RE = re.compile(r"[A-Za-zÀ-ɏ]+|\d+|[^\sA-Za-z\d]")

STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "it", "for", "on"},
    "fr": {"le", "la", "et", "de", "un", "une", "est", "pour", "dans", "que"},
    "es": {"el", "la", "y", "de", "un", "una", "es", "para", "en", "que"},
    "de": {"der", "die", "das", "und", "ein", "eine", "ist", "für", "in", "zu"},
    "zh": set(),  # identified by script, not stopwords
}


def token_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_tokens (\\S+ runs), n_subwords (BPE-ish), alpha_chars —
    all SQL-checkable via regexp_extract_all/regexp_replace."""
    text = batch["text"].fillna("")
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": text.str.count(r"\S+").astype("int64"),
            "n_subwords": text.str.count(_BPE_RE.pattern).astype("int64"),
            "alpha_chars": text.str.count(r"[A-Za-z]").astype("int64"),
        }
    )


class QualityScorer:
    """Quality signals: length, mean token length, stopword ratio,
    punct ratio, plus a composite score. Stopword sets compiled once
    per actor."""

    def __init__(self):
        self.stop_all = frozenset().union(*STOPWORDS.values())
        self.token_re = _TOKEN_RE

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        toks = text.str.findall(self.token_re)
        n_tok = toks.str.len().astype("int64")
        n_chars = text.str.len().astype("int64")
        stop = toks.map(
            lambda ws: sum(w.lower() in self.stop_all for w in ws)
        ).astype("int64")
        punct = text.str.count(r"[^\w\s]").astype("int64")
        stop_ratio = np.where(n_tok > 0, stop / n_tok.clip(lower=1), 0.0)
        punct_ratio = np.where(n_chars > 0, punct / n_chars.clip(lower=1), 0.0)
        score = (
            np.clip(n_tok / 20.0, 0, 1) * 0.4
            + np.clip(1.0 - punct_ratio * 5, 0, 1) * 0.3
            + np.clip(stop_ratio * 3, 0, 1) * 0.3
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tok,
                "stop_ratio": np.round(stop_ratio, 6),
                "punct_ratio": np.round(punct_ratio, 6),
                "quality_score": np.round(score, 6),
            }
        )


class LangId:
    """n-gram/stopword language-ID heuristic: CJK-script detection for
    zh, else argmax of per-language stopword hit rate (ties → 'en').
    Profiles built once per actor."""

    def __init__(self):
        self.profiles = {k: v for k, v in STOPWORDS.items() if v}
        self.cjk = re.compile(r"[一-鿿]")
        self.word = re.compile(r"[^\W\d_]+", re.U)

    def predict_one(self, text):
        if self.cjk.search(text):
            return "zh"
        words = [w.lower() for w in self.word.findall(text)]
        if not words:
            return "en"
        best, best_n = "en", -1
        for lang in sorted(self.profiles):
            n = sum(w in self.profiles[lang] for w in words)
            if n > best_n:
                best, best_n = lang, n
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        pred = batch["text"].fillna("").map(self.predict_one)
        out = pd.DataFrame({"doc_id": batch["doc_id"], "pred_lang": pred})
        if "lang" in batch.columns:
            out["is_correct"] = (pred == batch["lang"]).astype("int64")
        return out


# ---------------------------------------------------------------------------
# fingerprints
# ---------------------------------------------------------------------------


def _md5_64(s: str) -> int:
    d = hashlib.md5(s.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "little", signed=True)


def content_hash(batch: pd.DataFrame) -> pd.DataFrame:
    """Exact-dup key: 64-bit md5 of the raw text (D3 for documents)."""
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "text_hash": batch["text"].fillna("").map(_md5_64).astype("int64"),
        }
    )


def rolling_fingerprint(batch: pd.DataFrame, window=16, base=257, mod=(1 << 61) - 1):
    """Document fingerprinting: min rolling (Rabin-Karp) hash over
    character windows — a winnowing-style content id robust to
    concatenation order."""
    out = []
    for t in batch["text"].fillna(""):
        b = t.encode("utf-8")
        if len(b) < window:
            out.append(_md5_64(t))
            continue
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
        h = 0
        pw = pow(base, window - 1, mod)
        best = None
        for i, c in enumerate(arr):
            h = (h * base + int(c)) % mod
            if i >= window - 1:
                best = h if best is None or h < best else best
                h = (h - int(arr[i - window + 1]) * pw) % mod
        out.append(best if best is not None else 0)
    return pd.DataFrame(
        {"doc_id": batch["doc_id"], "fingerprint": pd.array(out, dtype="int64")}
    )


class MinHasher:
    """k-shingle → n-permutation MinHash signature (state: permutation
    coefficients, built once per actor)."""

    def __init__(self, n_hashes=64, shingle_k=3, seed=7):
        rng = np.random.default_rng(seed)
        self.mod = (1 << 61) - 1
        self.a = rng.integers(1, self.mod, n_hashes, dtype=np.int64)
        self.b = rng.integers(0, self.mod, n_hashes, dtype=np.int64)
        self.k = shingle_k
        self.n = n_hashes

    def shingles(self, text):
        toks = _TOKEN_RE.findall(text.lower())
        if len(toks) < self.k:
            return {" ".join(toks)} if toks else {""}
        return {" ".join(toks[i : i + self.k]) for i in range(len(toks) - self.k + 1)}

    def signature(self, text):
        sh = np.array(
            [_md5_64(s) & 0x7FFFFFFFFFFFFFFF for s in self.shingles(text)],
            dtype=np.int64,
        )
        # (a*x + b) % mod per permutation, min over shingles
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % self.mod
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in batch["text"].fillna("")]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "minhash": [s.tolist() for s in sigs],
            }
        )


class SimHasher:
    """64-bit SimHash over token unigrams (weighted bit-vote)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in batch["text"].fillna(""):
            votes = np.zeros(64, dtype=np.int64)
            for tok in _TOKEN_RE.findall(t.lower()):
                h = _md5_64(tok)
                bits = (np.int64(h) >> np.arange(64, dtype=np.int64)) & 1
                votes += bits * 2 - 1
            h = 0
            for i in np.flatnonzero(votes > 0):
                h |= 1 << int(i)
            if h >= 1 << 63:
                h -= 1 << 64
            out.append(h)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "simhash": pd.array(out, dtype="int64")}
        )


def jaccard_tokens(a: str, b: str, k=3) -> float:
    """Exact k-shingle Jaccard (the verify step after LSH candidates)."""
    mh = MinHasher.__new__(MinHasher)
    mh.k = k
    sa, sb = mh.shingles(a.lower()), mh.shingles(b.lower())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)
