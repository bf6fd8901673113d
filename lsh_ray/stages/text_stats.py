"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

Large-scale training-data pipeline additions (not in the reference, which
operates on pitch sequences; the per-token statistics mirror its TF machinery
``scripts/song_tfidf_calculation.py:82-101``). All vectorized `map_batches`;
language-ID holds compiled state per actor.

Token semantics are pinned to match the DuckDB oracle SQL exactly: both
sides count maximal non-whitespace runs with the SAME regex engine (RE2 —
pyarrow here, DuckDB there) and the SAME explicit ASCII class, so the
counts agree bit-for-bit on ANY input (Python ``re``'s ``\\s``/``\\b`` are
Unicode-aware while RE2's are ASCII, which silently diverges on non-ASCII
text — the engine therefore never tokenizes these stats through Python
``re`` or ``str.split``).
"""

from __future__ import annotations

import hashlib

import numpy as np
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


# one maximal non-whitespace run per token (explicit RE2 ASCII whitespace
# class — see module docstring); 0 tokens for empty/whitespace-only text
# falls out of the run count
TOKEN_RUN_PATTERN = r"[^\t\n\f\r ]+"


def token_count_batch(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    n = pc.count_substring_regex(
        pc.coalesce(batch["text"], ""), TOKEN_RUN_PATTERN)
    return pa.table({"doc_id": batch["doc_id"],
                     "n_tokens": n.cast(pa.int64())})


def token_counts(ds):
    """documents -> (doc_id, n_tokens)."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        token_count_batch, batch_format="pyarrow", zero_copy_batch=True)


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
# stopword OCCURRENCES by word boundary on lowercased text. \b is
# Unicode-aware in Python re but ASCII in RE2, so this pattern is only
# ever evaluated by RE2 (pyarrow count_substring_regex here, DuckDB
# regexp_extract_all in the oracle) — one engine on both sides
STOPWORD_PATTERN = r"\b(?:" + "|".join(sorted(_STOPWORDS["en"])) + r")\b"


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality signals: length, alpha/digit/space/punct ratios and the
    English stopword-hit ratio (per token).

    Every count is an RE2 scan (``pc.count_substring_regex``) so the
    DuckDB oracle reproduces it bit-for-bit on any input (shared regex
    engine — module docstring); ratios are rounded to 6 decimals.
    """
    import pyarrow.compute as pc

    t = pc.coalesce(batch["text"], "")

    def count(pattern: str) -> np.ndarray:
        return pc.count_substring_regex(t, pattern).to_numpy(
            zero_copy_only=False).astype(np.int64)

    n_chars = pc.utf8_length(t).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_alpha = count(r"[A-Za-z]")
    n_digit = count(r"[0-9]")
    n_space = pc.count_substring(t, " ").to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_punct = count(_PUNCT_CLASS)
    n_stop = pc.count_substring_regex(
        pc.utf8_lower(t), STOPWORD_PATTERN).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_tokens = count(TOKEN_RUN_PATTERN)
    denom = np.maximum(n_chars, 1)
    tok_denom = np.maximum(n_tokens, 1)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pa.array(n_chars),
        "alpha_ratio": pa.array(round_half_away(n_alpha / denom, 6)),
        "digit_ratio": pa.array(round_half_away(n_digit / denom, 6)),
        "space_ratio": pa.array(round_half_away(n_space / denom, 6)),
        "punct_ratio": pa.array(round_half_away(n_punct / denom, 6)),
        "stopword_ratio": pa.array(round_half_away(n_stop / tok_denom, 6)),
    })


def quality_scores(ds):
    """documents -> per-doc quality signal columns."""
    return ds.select_columns(["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pyarrow", zero_copy_batch=True)


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


# --------------------------------------------------------------- PII ----
# Dolma / CCNet-style PII scrubbing: regex redaction of emails, IPv4
# addresses and phone numbers to sentinel tokens. The patterns are
# deliberately RE2-only (no lookarounds, explicit ASCII classes) so the
# Arrow C++ kernels here and the DuckDB oracle run the IDENTICAL regex
# semantics; counts are taken BEFORE replacement on the same pattern.
# (Reference analog: the skip-on-fail structured-extract stage,
# /root/reference/loader.py:85-126 — per-doc content surgery in a bulk
# pass; redaction is the web-corpus transposition.)
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("n_emails", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("n_ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("n_phones", r"\+\d{1,2}-\d{3}-\d{4}", "<PHONE>"),
)


def pii_redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Schema-preserving: replaces ``text_col`` in place and appends the
    per-category count columns (counts taken before each replacement,
    sequentially in PII_PATTERNS order)."""
    import pyarrow.compute as pc
    txt = batch[text_col]
    counts = []
    for name, pattern, repl in PII_PATTERNS:
        counts.append((name, pc.cast(
            pc.count_substring_regex(txt, pattern=pattern), pa.int64())))
        txt = pc.replace_substring_regex(txt, pattern=pattern,
                                         replacement=repl)
    out = batch.set_column(batch.column_names.index(text_col), text_col,
                           txt.combine_chunks() if isinstance(
                               txt, pa.ChunkedArray) else txt)
    for name, arr in counts:
        out = out.append_column(name, arr)
    return out


def pii_redact(ds, text_col: str = "text", id_col: str = "doc_id"):
    """documents -> (doc_id, text-with-sentinels, n_emails, n_ips,
    n_phones). One Arrow RE2 pass per pattern, no Python per row;
    idempotent (sentinels match none of the patterns)."""
    return ds.select_columns([id_col, text_col]).map_batches(
        pii_redact_batch, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"text_col": text_col})


# ------------------------------------------------- unigram LM score ----
def unigram_logprob(ds, round_to: int = 6):
    """documents -> (doc_id, n_tokens, avg_logprob): per-doc mean token
    log-probability under the corpus's OWN unigram MLE — the CCNet /
    KenLM quality-filter signal transposed to a self-trained unigram LM
    (no external model in this container). Low scores flag boilerplate
    and token-salad docs; high scores flag repetitive common-token text.

    Float-exact oracle parity via integer micro-logprobs: each token's
    ln(c/N) is rounded half-away to int64 MICRO-units first, so the
    per-doc sums are exact integer arithmetic (order-free — immune to
    float summation-order divergence between engines); only the final
    (sum/1e6)/n_tokens division is floating point, one identically-
    parenthesized op chain on both sides.

    Scale shape (100 TB): one token co-location (corpus counts = run
    sums inside the block, no broadcast vocabulary), then one doc_id
    co-location for the per-doc sums — two exchanges total, both over
    8-byte-payload rows, hot tokens vectorized as runs (the tfidf
    scored_token_rows shape). Docs with zero tokens drop out (no
    defined mean), matching the SQL oracle's join semantics.
    """
    import pyarrow.compute as pc

    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import colocate_map
    from lsh_ray.stages.tfidf import doc_token_rows

    def count_tokens(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(pc.coalesce(t["text"], ""),
                                     TOKEN_RUN_PATTERN)
        return pa.table({"n": pa.array(
            [int(pc.sum(n).as_py() or 0)], pa.int64())})

    n_total = ds.map_batches(count_tokens, batch_format="pyarrow",
                             zero_copy_batch=True).sum("n")
    if not n_total:
        return ds.map_batches(
            lambda t: pa.table({"doc_id": pa.array([], pa.int64()),
                                "n_tokens": pa.array([], pa.int64()),
                                "avg_logprob": pa.array([], pa.float64())}),
            batch_format="pyarrow")

    rows = doc_token_rows(ds)
    nblocks = min(coalesce_blocks(), 64)

    def mlp_block(t: pa.Table) -> pa.Table:
        # one co-located block: every row of a token is here, so the
        # token's corpus count is its run sum of tf_count
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "part_mlp": pa.array([], pa.int64()),
                             "tf_count": pa.array([], pa.int64())})
        order = pc.sort_indices(t.select(["token"]),
                                sort_keys=[("token", "ascending")])
        t = t.take(order)
        tok = t["token"]
        n = t.num_rows
        neq = pc.not_equal(tok.slice(1), tok.slice(0, n - 1)).to_numpy(
            zero_copy_only=False) if n > 1 else np.empty(0, bool)
        firsts = np.flatnonzero(np.concatenate(([True], neq)))
        lens = np.diff(np.concatenate((firsts, [n])))
        tf = t["tf_count"].to_numpy(zero_copy_only=False)
        c = np.add.reduceat(tf, firsts).astype(np.float64)
        mlp = round_half_away(
            np.log(c / float(n_total)) * 1e6, 0).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "part_mlp": pa.array(tf * np.repeat(mlp, lens)),
            "tf_count": t["tf_count"],
        })

    def tok_bucket(t: pa.Table) -> pa.Table:
        hv = hash_strings(t["token"].to_numpy(zero_copy_only=False)) \
            % np.uint64(nblocks)
        return t.append_column("bucket", pa.array(hv.astype(np.int32)))

    parts = colocate_map(rows, ["token"], nblocks, mlp_block,
                         sort_bucket_expr=tok_bucket)

    def doc_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "avg_logprob": pa.array([], pa.float64())})
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids_s = ids[order]
        firsts = np.flatnonzero(
            np.concatenate(([True], ids_s[1:] != ids_s[:-1])))
        sum_mlp = np.add.reduceat(
            t["part_mlp"].to_numpy(zero_copy_only=False)[order], firsts)
        n_tok = np.add.reduceat(
            t["tf_count"].to_numpy(zero_copy_only=False)[order], firsts)
        avg = round_half_away(
            (sum_mlp.astype(np.float64) / 1e6) / n_tok.astype(np.float64),
            round_to)
        return pa.table({
            "doc_id": pa.array(ids_s[firsts]),
            "n_tokens": pa.array(n_tok.astype(np.int64)),
            "avg_logprob": pa.array(avg, type=pa.float64()),
        })

    def doc_bucket(t: pa.Table) -> pa.Table:
        hv = t["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.uint64) % np.uint64(nblocks)
        return t.append_column("bucket", pa.array(hv.astype(np.int32)))

    return colocate_map(parts, ["doc_id"], nblocks, doc_block,
                        sort_bucket_expr=doc_bucket)
