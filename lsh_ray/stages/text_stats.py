"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

Large-scale training-data pipeline additions (not in the reference, which
operates on pitch sequences; the per-token statistics mirror its TF machinery
``scripts/song_tfidf_calculation.py:82-101``). All vectorized `map_batches`;
language-ID holds compiled state per actor.

Token semantics are pinned to match the DuckDB oracle SQL exactly:
``n_tokens = 0`` for empty/whitespace text, else the number of
``\\s+``-separated pieces of the trimmed text.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from lsh_ray.functions.hashing import hash_strings, rolling_hash
from lsh_ray.functions.num import round_half_away

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "was",
           "for", "on", "with", "as", "his", "they", "at", "be", "this"},
    "pt": {"de", "a", "o", "que", "e", "do", "da", "em", "um", "para",
           "com", "não", "uma", "os", "no", "se", "na", "por", "mais"},
    "de": {"der", "die", "und", "in", "den", "von", "zu", "das", "mit",
           "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein"},
}


def token_count_batch(batch: pd.DataFrame) -> pd.DataFrame:
    t = batch["text"].fillna("").str.strip()
    n = t.str.split().str.len().fillna(0).astype("int64")
    n[t == ""] = 0
    return pd.DataFrame({"doc_id": batch["doc_id"], "n_tokens": n})


def token_counts(ds):
    """documents -> (doc_id, n_tokens)."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        token_count_batch, batch_format="pandas")


# BPE-ish pre-tokenizer: letter runs, digit runs, punctuation runs —
# the RE2-compatible core of the GPT-2 split pattern (RE2 has no
# lookahead; both pyarrow and DuckDB regex on RE2, so the count is
# reproducible bit-for-bit by the SQL oracle)
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_counts(ds):
    """documents -> (doc_id, n_bpe_tokens): regex-tokenizer counts.

    One vectorized Arrow kernel (``pc.count_substring_regex``) per
    batch — no Python loop, no pandas conversion."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.coalesce(batch["text"], ""), BPE_TOKEN_PATTERN)
        return pa.table({"doc_id": batch["doc_id"],
                         "n_bpe_tokens": n.cast(pa.int64())})

    return ds.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


# explicit ASCII classes (no \s): Python re treats \s as unicode
# whitespace while RE2 (DuckDB) pins it to [\t\n\f\r ] — spelling the
# class out keeps both sides byte-identical on any input
_PUNCT_CLASS = r"[^A-Za-z0-9\t\n\f\r ]"
# stopword OCCURRENCES by word boundary on lowercased text (\b is
# ASCII-identical in Python re and RE2); see STOPWORD_PATTERN users
STOPWORD_PATTERN = r"\b(?:" + "|".join(sorted(_STOPWORDS["en"])) + r")\b"


def quality_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Quality signals: length, alpha/digit/space/punct ratios and the
    English stopword-hit ratio (per token).

    Ratios are rounded to 6 decimals so the DuckDB oracle can reproduce
    them bit-for-bit on float64.
    """
    t = batch["text"].fillna("")
    n_chars = t.str.len().astype("int64")
    n_alpha = t.str.count(r"[A-Za-z]").astype("int64")
    n_digit = t.str.count(r"[0-9]").astype("int64")
    n_space = t.str.count(r" ").astype("int64")
    n_punct = t.str.count(_PUNCT_CLASS).astype("int64")
    n_stop = t.str.lower().str.count(STOPWORD_PATTERN).astype("int64")
    stripped = t.str.strip()
    n_tokens = stripped.str.split().str.len().fillna(0).astype("int64")
    n_tokens[stripped == ""] = 0
    denom = n_chars.where(n_chars > 0, 1)
    tok_denom = n_tokens.where(n_tokens > 0, 1)
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_chars": n_chars,
        "alpha_ratio": round_half_away((n_alpha / denom).to_numpy(), 6),
        "digit_ratio": round_half_away((n_digit / denom).to_numpy(), 6),
        "space_ratio": round_half_away((n_space / denom).to_numpy(), 6),
        "punct_ratio": round_half_away((n_punct / denom).to_numpy(), 6),
        "stopword_ratio": round_half_away(
            (n_stop / tok_denom).to_numpy(), 6),
    })


def quality_scores(ds):
    """documents -> per-doc quality signal columns."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pandas")


class LangIdStage:
    """Stopword-occurrence language heuristic, fully vectorized: one RE2
    scan per language per batch (``pc.count_substring_regex``), argmax
    with first-in-sorted-order tie-break, 'unknown' on zero hits.

    Actor-pool stage: the per-language word-boundary patterns are built
    once per actor (``__init__``) — the model-load-once pattern
    (reference analog: module-level extractor state, ``loader.py:26``).
    No per-row Python: at corpus scale this stage is one C++ regex pass
    per language over the batch."""

    def __init__(self):
        self.langs = sorted(_STOPWORDS)
        self.patterns = [
            r"\b(?:" + "|".join(sorted(_STOPWORDS[l])) + r")\b"
            for l in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        low = pc.utf8_lower(pc.coalesce(batch["text"], ""))
        hits = np.stack([
            pc.count_substring_regex(low, p).to_numpy(
                zero_copy_only=False).astype(np.int64)
            for p in self.patterns])  # (n_langs, n_docs)
        best = hits.argmax(axis=0)  # first max wins = sorted-order tie
        pred = np.asarray(self.langs, dtype=object)[best]
        pred[hits.max(axis=0) == 0] = "unknown"
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(pred, type=pa.string()),
        })


def lang_id(ds):
    """documents -> (doc_id, lang_pred) via stopword heuristic actor pool."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        LangIdStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 4))


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Two fingerprints per doc: md5 hex (oracle-reproducible) and a
    rolling-hash sketch (min of 8-gram rolling hashes — order-sensitive,
    robust to tail edits). Arrow-native: md5 is per-row in Python by
    nature, but only the text column leaves Arrow (``to_pylist``); no
    whole-batch pandas conversion."""
    texts = batch["text"].to_pylist()
    md5s = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    mins = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        if len(toks) >= 8:
            rh = rolling_hash(hash_strings(np.array(toks, dtype=object)), 8)
            mins[i] = rh.min()
    return pa.table({
        "doc_id": batch["doc_id"],
        "md5_fp": pa.array(md5s, type=pa.string()),
        "rolling_fp": pa.array(mins, type=pa.uint64()),
    })


def fingerprints(ds):
    """documents -> (doc_id, md5_fp, rolling_fp)."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)
