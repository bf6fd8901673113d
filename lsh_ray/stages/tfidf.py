"""TF-IDF pipeline over the documents table.

Rebuild of the reference's TF-IDF scripts (SURVEY.md §2.5 A3-A6):

- TF: per-doc token frequency / doc length
  (``scripts/song_tfidf_calculation.py:82-101``)
- IDF: ``log2(N / df)`` over per-token document frequency — a global
  grouped aggregate (``scripts/song_tfidf_calculation.py:104-130``)
- TF-IDF: the join of the two (``scripts/song_tfidf_calculation.py:161-186``)
- token filtering: keep tokens with tfidf > threshold
  (``scripts/tfidf_pitch_extraction.py:114-134``)

Scale design: the token explosion happens inside ``map_batches`` with
per-batch ``np.unique`` pre-aggregation (each (doc, token) emitted once with
its count — the partial-aggregation discipline), the df aggregate groups the
already-distinct (doc, token) rows, and TF ⋈ IDF is a bucketed hash join on
the token. The reference needed a manual tf/idf/tf_idf step split beyond
25k docs (``scripts/tfidf_exec.py:107-114``); here streaming + shuffle make
that unnecessary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Count

from lsh_ray.config import PipelineConfig
from lsh_ray.functions.num import round_half_away
from lsh_ray.stages.join import bucket_join


_WS = "\t\n\f\r "  # explicit RE2 ASCII whitespace (see stages/text_stats)


def _empty_token_rows() -> pa.Table:
    return pa.table({"doc_id": pa.array([], pa.int64()),
                     "token": pa.array([], pa.string()),
                     "tf_count": pa.array([], pa.int64()),
                     "doc_len": pa.array([], pa.int64())})


def flat_tokens(batch: pa.Table):
    """batch -> (flat token StringArray, per-doc token counts int64,
    doc_ids int64) — THE tokenizer of the text-statistics family
    (lower + maximal runs of non-ASCII-whitespace, RE2 C++ kernels,
    byte-for-byte the DuckDB oracles' regexp_extract_all pattern).
    Shared by tfidf, repetition and every oracle that interpolates
    ``TOKEN_RUN_PATTERN`` — edit here and nowhere else."""
    import pyarrow.compute as pc

    low = pc.utf8_lower(pc.coalesce(batch["text"], ""))
    trimmed = pc.utf8_trim(low, _WS)
    lists = pc.split_pattern_regex(trimmed, f"[{_WS}]+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    flat = lists.flatten()
    lens = np.diff(offs)
    # splitting an empty string yields [""]: zero those docs out
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    if empty.any():
        keep_rows = np.ones(int(offs[-1]), dtype=bool)
        keep_rows[offs[:-1][empty]] = False
        flat = flat.filter(pa.array(keep_rows))
        lens = lens.copy()
        lens[empty] = 0
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return flat, lens, doc_ids


def doc_token_rows(ds):
    """documents -> one row per DISTINCT (doc_id, token):
    (doc_id, token, tf_count, doc_len).

    Arrow-native end to end: lower/trim/split are RE2 C++ kernels (the
    same engine and the same explicit ASCII class as the DuckDB oracle —
    a token is a maximal non-whitespace run), and the per-batch distinct
    (doc, token) pre-aggregation is one C++ table sort + vectorized
    boundary arithmetic. No Python loop over docs, no pandas groupby
    over object strings (the r3 hot spot on the most expensive query).
    """
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        flat, lens, doc_ids = flat_tokens(batch)
        doc_rep = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        total = len(doc_rep)
        if total == 0:
            return _empty_token_rows()
        pairs = pa.table({"d": pa.array(doc_rep), "token": flat})
        order = pc.sort_indices(
            pairs, sort_keys=[("d", "ascending"), ("token", "ascending")])
        d_s = doc_rep[order.to_numpy(zero_copy_only=False)]
        tok_s = flat.take(order)
        if total > 1:
            neq_tok = pc.not_equal(
                tok_s.slice(1), tok_s.slice(0, total - 1)).to_numpy(
                zero_copy_only=False)
            new = np.concatenate(([True], (d_s[1:] != d_s[:-1]) | neq_tok))
        else:
            new = np.array([True])
        firsts = np.flatnonzero(new)
        counts = np.diff(np.concatenate((firsts, [total])))
        return pa.table({
            "doc_id": pa.array(doc_ids[d_s[firsts]]),
            "token": tok_s.take(pa.array(firsts, type=pa.int64())),
            "tf_count": pa.array(counts.astype(np.int64)),
            "doc_len": pa.array(lens[d_s[firsts]].astype(np.int64)),
        })
    return ds.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


def token_df(doc_token_ds):
    """distinct (doc, token) rows -> (token, df) document frequency."""
    return doc_token_ds.groupby("token").aggregate(Count(alias_name="df"))


def scored_token_rows(ds, round_to: int = 6):
    """documents -> (doc_id, token, tf_count, doc_len, tfidf): ONE token
    explosion feeding both the score and any downstream per-doc stats
    (tf_count/doc_len ride along through the df join instead of being
    recomputed and joined back)."""
    rows = doc_token_rows(ds)

    def count_tokenful(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from lsh_ray.stages.text_stats import TOKEN_RUN_PATTERN
        n_tok = pc.count_substring_regex(
            pc.coalesce(t["text"], ""), TOKEN_RUN_PATTERN).to_numpy(
            zero_copy_only=False)
        return pa.table({"n": pa.array([int((n_tok > 0).sum())])})

    # N = docs with >= 1 token (same token definition as the explosion —
    # NOT "trim(text) <> ''", which diverges on e.g. tab-only docs)
    n_docs = ds.map_batches(count_tokenful, batch_format="pyarrow").sum("n")

    # ONE co-location by token replaces the former token_df native
    # groupby + bucket_join on the same key (two all-to-all barriers):
    # rows are distinct (doc, token), so each token's df is its run
    # length inside the co-located block. Hot tokens ("the") gather
    # n_docs rows in one block — vectorized run arithmetic, no per-group
    # dispatch. (token_df stays as its own operator for q:token_df.)
    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import colocate_map
    nblocks = min(coalesce_blocks(), 64)

    def score_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "tf_count": pa.array([], pa.int64()),
                "doc_len": pa.array([], pa.int64()),
                "tfidf": pa.array([], pa.float64())})
        import pyarrow.compute as pc
        order = pc.sort_indices(t.select(["token"]),
                                sort_keys=[("token", "ascending")])
        t = t.take(order)
        tok = t["token"]
        n = t.num_rows
        neq = pc.not_equal(tok.slice(1), tok.slice(0, n - 1)).to_numpy(
            zero_copy_only=False) if n > 1 else np.empty(0, bool)
        firsts = np.flatnonzero(np.concatenate(([True], neq)))
        lens = np.diff(np.concatenate((firsts, [n])))
        df = np.repeat(lens, lens).astype(np.float64)
        tf = (t["tf_count"].to_numpy(zero_copy_only=False)
              / t["doc_len"].to_numpy(zero_copy_only=False))
        idf = np.log2(n_docs / df)
        return pa.table({
            "doc_id": t["doc_id"],
            "token": tok,
            "tf_count": t["tf_count"],
            "doc_len": t["doc_len"],
            "tfidf": pa.array(round_half_away(tf * idf, round_to),
                              type=pa.float64()),
        })

    def tok_bucket(t: pa.Table) -> pa.Table:
        from lsh_ray.functions.hashing import hash_strings
        hv = hash_strings(t["token"].to_numpy(zero_copy_only=False)) \
            % np.uint64(nblocks)
        return t.append_column("bucket",
                               pa.array(hv.astype(np.int32)))

    return colocate_map(rows, ["token"], nblocks, score_block,
                        sort_bucket_expr=tok_bucket)


def tfidf(ds, config: PipelineConfig | None = None, round_to: int = 6):
    """documents -> (doc_id, token, tfidf) with tfidf = (tf_count/doc_len) *
    log2(N/df), rounded for float-stable oracle comparison."""
    return scored_token_rows(ds, round_to).map_batches(
        lambda t: t.select(["doc_id", "token", "tfidf"]),
        batch_format="pyarrow", zero_copy_batch=True)


def filter_tokens_by_tfidf(tfidf_ds, min_tfidf: float):
    """Keep (doc_id, token) rows whose tfidf exceeds the threshold
    (reference: ``obtain_remaining_pitches``,
    ``scripts/tfidf_pitch_extraction.py:114-134``)."""
    import pyarrow.compute as pc
    return tfidf_ds.map_batches(
        lambda t: t.filter(pc.greater(t["tfidf"], min_tfidf)),
        batch_format="pyarrow", zero_copy_batch=True)


def token_max_tfidf(tfidf_ds):
    """(token, max_tfidf): per-token maximum over docs — the broadcast side
    of query-TFIDF estimation (reference ``estimate_query_tfidfs``,
    ``scripts/query_tfidf_calculation.py:82-104``: a query token's weight is
    the max TF-IDF that token attains across songs)."""
    from ray.data.aggregate import Max
    return tfidf_ds.groupby("token").aggregate(
        Max("tfidf", alias_name="max_tfidf"))


def tfidf_filter_stats(ds, min_tfidf: float, round_to: int = 6):
    """Per-doc stats of TF-IDF token filtering: occurrences kept and the
    fraction of the document retained (reference remaining-pitch
    percentages, ``scripts/tfidf_pitch_extraction.py:137-181``).

    Single plan: ``scored_token_rows`` already carries tf_count/doc_len
    next to each score, so the stats fall out of one pass — no second
    tokenization, no (doc, token)-keyed join back.
    """
    from lsh_ray.functions.num import round_half_away

    def per_batch(t: pa.Table) -> pa.Table:
        keep = (t["tfidf"].to_numpy(zero_copy_only=False)
                > min_tfidf).astype(np.int64)
        kept = t["tf_count"].to_numpy(zero_copy_only=False) * keep
        return pa.table({
            "doc_id": t["doc_id"],
            "kept": pa.array(kept),
            "doc_len": t["doc_len"],
        })

    from ray.data.aggregate import Max, Sum
    agg = (scored_token_rows(ds, round_to)
           .map_batches(per_batch, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("doc_id")
           .aggregate(Sum("kept", alias_name="n_kept"),
                      Max("doc_len", alias_name="doc_len")))

    def finish(t: pa.Table) -> pa.Table:
        kept = t["n_kept"].to_numpy(zero_copy_only=False)
        dl = t["doc_len"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_kept": pa.array(kept.astype(np.int64)),
            "pct_kept": pa.array(
                round_half_away(kept / np.maximum(dl, 1), round_to)),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


def top_bigrams(ds, k: int = 20):
    """Corpus-wide top-k adjacent token PAIRS ("w1 w2", count desc /
    bigram asc): the word-co-occurrence operator. Bigram formation is
    one boolean mask over the flat token array (drop each doc's last
    token position) + an Arrow C++ element-wise join; per-batch
    partial counts collapse before the vocabulary-sized shuffle, and
    only the bigram-vocab count table is ever sorted."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        flat, lens, _ = flat_tokens(t)
        total = int(lens.sum())
        if total < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        # position i starts a bigram unless it is its doc's last token
        starts = np.ones(total, dtype=bool)
        ends = np.cumsum(lens[lens > 0]) - 1
        starts[ends] = False
        starts[-1] = False
        idx = np.flatnonzero(starts)
        w1 = flat.take(pa.array(idx, type=pa.int64()))
        w2 = flat.take(pa.array(idx + 1, type=pa.int64()))
        big = pc.binary_join_element_wise(w1, w2, " ")
        g = pa.table({"bigram": big}).group_by(["bigram"]).aggregate(
            [([], "count_all")])
        return pa.table({"bigram": g["bigram"],
                         "cnt": g["count_all"].cast(pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("bigram").aggregate(Sum("cnt", alias_name="n")))

    def cast_n(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2
        return pa.table({"bigram": t["bigram"],
                         "n": pc2.cast(t["n"], pa.int64())})

    return (counts.map_batches(cast_n, batch_format="pyarrow",
                               zero_copy_batch=True)
            .sort(["n", "bigram"], descending=[True, False]).limit(k))


def top_tokens(ds, k: int = 20):
    """Corpus-wide heavy hitters: the k most frequent tokens with their
    total occurrence counts, tie-broken by token so the cut line is
    deterministic. Reuses the distinct (doc, token) explosion; the
    global count is a combiner-friendly Sum over vocabulary-sized data,
    and only the vocab table (never the corpus) is sorted."""
    from ray.data.aggregate import Sum
    counts = doc_token_rows(ds).groupby("token").aggregate(
        Sum("tf_count", alias_name="n"))

    def cast_n(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({"token": t["token"],
                         "n": pc.cast(t["n"], pa.int64())})

    return (counts.map_batches(cast_n, batch_format="pyarrow",
                               zero_copy_batch=True)
            .sort(["n", "token"], descending=[True, False]).limit(k))
