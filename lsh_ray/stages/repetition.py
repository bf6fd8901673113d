"""Repetition signals for web-corpus curation (Gopher/RefinedWeb-style).

Two operators over the ``documents`` table, extending the reference's
text-statistics family (SURVEY.md §2.2 M7/M16; reference analog: the
per-song token statistics in ``scripts/song_tfidf_calculation.py:82-130``)
with the quality rules a large-scale training-data pipeline applies
before/alongside near-dup removal:

- ``doc_repetition``: per-document repetition — token count, distinct
  token count, and the frequency share of the most common token (the
  "most common word fraction" rule). Embarrassingly parallel: one
  ``map_batches`` pass, no shuffle.
- ``dup_ngram_stats``: corpus-level duplicate n-gram fraction — for every
  document, how many of its token n-grams also occur in at least one
  OTHER document. This is the cross-document repetition signal behind
  "remove docs made of boilerplate" rules, and unlike ``doc_repetition``
  it is a genuinely wide operator: distinct (doc, gram) partials are
  pre-aggregated per batch, n-grams shuffle ONCE as 8-byte hashes
  (never as strings), and the dup flag joins back via the shared
  ``bucket_join``.

Tokenization is byte-for-byte the TF-IDF family's (lower + maximal
runs of non-ASCII-whitespace — ``stages/tfidf.doc_token_rows``), so the
DuckDB oracles share one token definition with the whole text family.

Scale notes (100 TB): gram identity is a 64-bit hash (the corpus-level
shuffle ships 24-byte rows); at 10^12 distinct grams widen to the
128-bit variant of ``hash_strings`` to keep collision odds negligible.
The per-gram aggregate is Min/Max (combiner-friendly — hot boilerplate
grams pre-reduce inside every block before the exchange).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsh_ray.functions.num import round_half_away
from lsh_ray.stages.join import bucket_join
# ONE tokenizer for the whole text family (oracle-shared definition)
from lsh_ray.stages.tfidf import flat_tokens as _flat_tokens


def _group_pairs(d: np.ndarray, keys):
    """Sort (doc-index, key) pairs and return (first-row indices,
    group counts, doc index per group) — the per-batch distinct
    pre-aggregation used across the token family."""
    import pyarrow.compute as pc

    total = len(d)
    pairs = pa.table({"d": pa.array(d), "k": keys})
    order = pc.sort_indices(
        pairs, sort_keys=[("d", "ascending"), ("k", "ascending")])
    idx = order.to_numpy(zero_copy_only=False)
    d_s = d[idx]
    k_s = keys.take(order)
    if total > 1:
        neq = pc.not_equal(
            k_s.slice(1), k_s.slice(0, total - 1)).to_numpy(
            zero_copy_only=False)
        new = np.concatenate(([True], (d_s[1:] != d_s[:-1]) | neq))
    else:
        new = np.array([True])
    firsts = np.flatnonzero(new)
    counts = np.diff(np.concatenate((firsts, [total])))
    return idx[firsts], counts.astype(np.int64), d_s[firsts]


def doc_repetition(ds, round_to: int = 6):
    """documents -> (doc_id, n_tokens, n_distinct_tokens, top_token_frac).

    ``top_token_frac`` = occurrences of the single most frequent token /
    total tokens (0 for token-less docs) — the per-doc repetition rule.
    One streaming pass, zero shuffles: every document's tokens live in
    its own batch row.
    """

    def f(batch: pa.Table) -> pa.Table:
        flat, lens, doc_ids = _flat_tokens(batch)
        n_docs = len(doc_ids)
        n_tokens = lens.astype(np.int64)
        n_distinct = np.zeros(n_docs, dtype=np.int64)
        max_tf = np.zeros(n_docs, dtype=np.int64)
        d_rep = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        if len(d_rep):
            _, counts, d_g = _group_pairs(d_rep, flat)
            np.add.at(n_distinct, d_g, 1)
            np.maximum.at(max_tf, d_g, counts)
        return pa.table({
            "doc_id": pa.array(doc_ids),
            "n_tokens": pa.array(n_tokens),
            "n_distinct_tokens": pa.array(n_distinct),
            "top_token_frac": pa.array(round_half_away(
                max_tf / np.maximum(n_tokens, 1), round_to)),
        })

    return ds.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


def _gram_tables(batch: pa.Table, n: int):
    """batch -> (doc_ids, lens, gram-hash uint64 flat array, parent doc
    index per gram). Grams are built with ONE vectorized element-wise
    join over n shifted slices of the flat token array; grams straddling
    a document boundary are masked out."""
    import pyarrow.compute as pc

    from lsh_ray.functions.hashing import hash_strings

    flat, lens, doc_ids = _flat_tokens(batch)
    total = len(flat)
    d_rep = np.repeat(np.arange(len(doc_ids), dtype=np.int64), lens)
    L = total - (n - 1)
    if L <= 0:
        return doc_ids, lens, np.empty(0, np.uint64), np.empty(0, np.int64)
    valid = d_rep[:L] == d_rep[n - 1:]
    slices = [flat.slice(i, L) for i in range(n)]
    grams = pc.binary_join_element_wise(*slices, " ")
    if valid.all():
        parents = d_rep[:L]
    else:
        grams = grams.filter(pa.array(valid))
        parents = d_rep[:L][valid]
    gram_h = hash_strings(grams.to_numpy(zero_copy_only=False))
    return doc_ids, lens, gram_h, parents


def doc_gram_rows(ds, n: int = 5):
    """documents -> one row per DISTINCT (doc_id, n-gram):
    (gram_h uint64, doc_id, c) — the string never leaves the batch."""

    def f(batch: pa.Table) -> pa.Table:
        doc_ids, _, gram_h, parents = _gram_tables(batch, n)
        # int64 reinterpret (bijective): Ray 2.49 groupby/aggregate turns
        # uint64 > 2^63 into pickled-object columns (see stages/cluster)
        gram_h = gram_h.view(np.int64)
        if not len(gram_h):
            return pa.table({"gram_h": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        firsts, counts, d_g = _group_pairs(
            parents, pa.array(gram_h, type=pa.int64()))
        return pa.table({
            "gram_h": pa.array(gram_h[firsts], type=pa.int64()),
            "doc_id": pa.array(doc_ids[d_g]),
            "c": pa.array(counts),
        })

    return ds.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


def ngram_counts(ds, n: int = 5):
    """documents -> (doc_id, n_grams) for EVERY doc (0 when < n tokens)."""

    def f(batch: pa.Table) -> pa.Table:
        _, lens, doc_ids = _flat_tokens(batch)
        return pa.table({
            "doc_id": pa.array(doc_ids),
            "n_grams": pa.array(np.maximum(lens - (n - 1), 0)
                                .astype(np.int64)),
        })

    return ds.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


_BROADCAST_MAX_KEYS = 4_000_000  # ~32 MB of int64 via ray.put


def _tag_rows_against_keys(rows, keys_ds,
                           broadcast_max_keys: int = _BROADCAST_MAX_KEYS):
    """Distinct (gram_h, doc_id, c) partials × a key Dataset
    (gram_h, dup) -> the contribution stream (doc_id, n_grams=0, nd=c)
    for rows whose gram is in the key set.

    Small key sets broadcast ONCE via ``ray.put`` (sorted int64 array;
    vectorized searchsorted membership per batch); above the cap the
    membership becomes a ``bucket_join`` — the 10^12-doc path. Shared
    by ``dup_ngram_stats`` (cross-doc dup keys) and ``decontaminate``
    (benchmark gram keys).
    """
    import ray

    if keys_ds.count() <= broadcast_max_keys:
        keys_sorted = np.sort(np.concatenate(
            [b["gram_h"].to_numpy(zero_copy_only=False)
             for b in keys_ds.iter_batches(batch_format="pyarrow")]
            or [np.empty(0, np.int64)]))
        keys_ref = ray.put(keys_sorted)

        def tag_broadcast(t: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            gh = t["gram_h"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ks, gh)
            pos[pos == len(ks)] = max(len(ks) - 1, 0)
            matched = (ks[pos] == gh) if len(ks) else np.zeros(
                len(gh), dtype=bool)
            # only flagged rows cross the final exchange (other rows
            # contribute nothing; coverage comes from the zeros stream)
            kept = t.filter(pa.array(matched))
            return pa.table({"doc_id": kept["doc_id"],
                             "n_grams": pa.array(
                                 np.zeros(kept.num_rows, dtype=np.int64)),
                             "nd": kept["c"]})

        return rows.map_batches(tag_broadcast, batch_format="pyarrow",
                                zero_copy_batch=True)

    tagged = bucket_join(rows, keys_ds, "gram_h", "gram_h", ["dup"],
                         suffix="_r", how="left")

    def tag_joined(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        kept = t.filter(pc.is_valid(t["dup_r"]))
        return pa.table({"doc_id": kept["doc_id"],
                         "n_grams": pa.array(
                             np.zeros(kept.num_rows, dtype=np.int64)),
                         "nd": kept["c"]})

    return tagged.map_batches(tag_joined, batch_format="pyarrow",
                              zero_copy_batch=True)


def _per_doc_gram_totals(ds, rows, contrib, count_name: str,
                         frac_name: str, round_to: int):
    """Union the per-doc gram-count stream (from the pinned partials —
    no extra corpus scan), the zero rows (gram-less docs), and the
    flagged-contribution stream, then reduce ONCE per doc via a
    tasks-mode exchange (every stream is per-batch pre-reduced, so the
    exchange ships doc-cardinality partials, not grams)."""
    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import colocate_map

    nblocks = coalesce_blocks()

    def ng_partial(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(d, return_inverse=True)
        ng = np.bincount(inv, weights=c).astype(np.int64)
        return pa.table({"doc_id": pa.array(uniq),
                         "n_grams": pa.array(ng),
                         "nd": pa.array(np.zeros(len(uniq),
                                                 dtype=np.int64))})

    def zero_rows(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(t.num_rows, dtype=np.int64))
        return pa.table({"doc_id": t["doc_id"], "n_grams": z, "nd": z})

    gram_totals = rows.map_batches(ng_partial, batch_format="pyarrow",
                                   zero_copy_batch=True)
    zeros = ds.select_columns(["doc_id"]).map_batches(
        zero_rows, batch_format="pyarrow", zero_copy_batch=True)

    def doc_sum_block(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(d, return_inverse=True)
        ng = np.bincount(
            inv, weights=t["n_grams"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        nd = np.bincount(
            inv, weights=t["nd"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table({"doc_id": pa.array(uniq),
                         "ng": pa.array(ng), "n_dup": pa.array(nd)})

    def doc_bucket(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("bucket", pa.array(
            (d % np.uint64(nblocks)).astype(np.int32)))

    per_doc = colocate_map(zeros.union(gram_totals).union(contrib),
                           ["doc_id"], nblocks, doc_sum_block,
                           sort_bucket_expr=doc_bucket)

    def finish(t: pa.Table) -> pa.Table:
        ng = t["ng"].to_numpy(zero_copy_only=False).astype(np.int64)
        ndv = t["n_dup"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_grams": pa.array(ng),
            count_name: pa.array(ndv),
            frac_name: pa.array(round_half_away(
                ndv / np.maximum(ng, 1), round_to)),
        })

    return per_doc.map_batches(finish, batch_format="pyarrow",
                               zero_copy_batch=True)


def dup_ngram_stats(ds, n: int = 5, round_to: int = 6,
                    broadcast_max_keys: int = _BROADCAST_MAX_KEYS):
    """documents -> (doc_id, n_grams, n_dup_grams, dup_gram_frac).

    ``n_dup_grams`` counts this document's n-gram occurrences whose gram
    appears in at least one OTHER document (within-doc-only repeats do
    not count — that is ``doc_repetition``'s signal). Plan: per-batch
    distinct (doc, gram) partials -> ONE groupby over the 8-byte gram
    hash with Min/Max(doc_id) (cross-doc <=> min != max; both combine
    per block, so hot boilerplate grams pre-reduce before the exchange)
    -> dup keys flag the partials (broadcast ``ray.put`` + vectorized
    searchsorted membership under ``broadcast_max_keys``; ``bucket_join``
    above it — the 10^12-doc path) -> per-doc totals in ONE groupby over
    the union of the gram-count and dup-count streams.
    """
    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import colocate_map

    # pin the partials: two consumers (the flag exchange and the dup
    # tagging) would otherwise each re-run the read + gram explosion
    # (Ray Data shares no common subexpressions across a lazy DAG)
    rows = doc_gram_rows(ds, n).materialize()
    nblocks = coalesce_blocks()

    # cross-doc flag: per-batch (gram -> min/max doc) pre-reduction,
    # ONE tasks-mode exchange on gram_h, dup filter fused into the
    # reduce block. The former groupby(gram_h).aggregate(Min, Max) +
    # filter pass computed the same thing but paid the native sort-
    # groupby's sample/sort barriers — measured 3.4 s of fixed floor on
    # a 250k-row gram table at sf0.1 (the whole query's data costs
    # ~1.5 s); the raw-task exchange does it in one wave.
    def mm_partial(t: pa.Table) -> pa.Table:
        gh = t["gram_h"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(gh, return_inverse=True)
        mn = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(len(uniq), np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(mn, inv, d)
        np.maximum.at(mx, inv, d)
        return pa.table({"gram_h": pa.array(uniq),
                         "mn": pa.array(mn), "mx": pa.array(mx)})

    def dup_block(t: pa.Table) -> pa.Table:
        gh = t["gram_h"].to_numpy(zero_copy_only=False)
        mn = t["mn"].to_numpy(zero_copy_only=False)
        mx = t["mx"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(gh, return_inverse=True)
        gmn = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        gmx = np.full(len(uniq), np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(gmn, inv, mn)
        np.maximum.at(gmx, inv, mx)
        keep = gmn != gmx
        return pa.table({
            "gram_h": pa.array(uniq[keep]),
            "dup": pa.array(np.ones(int(keep.sum()), dtype=np.int8)),
        })

    def gram_bucket(t: pa.Table) -> pa.Table:
        gh = t["gram_h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("bucket", pa.array(
            (gh % np.uint64(nblocks)).astype(np.int32)))

    mm = rows.map_batches(mm_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    dup_keys = colocate_map(mm, ["gram_h"], nblocks, dup_block,
                            sort_bucket_expr=gram_bucket).materialize()

    # dup keys flag the partials, per-doc totals reduce once — both
    # shared with ``decontaminate`` (the totals come from the PINNED
    # partials: no third read+tokenize pass over the corpus)
    contrib = _tag_rows_against_keys(rows, dup_keys, broadcast_max_keys)
    return _per_doc_gram_totals(ds, rows, contrib,
                                "n_dup_grams", "dup_gram_frac", round_to)


def decontaminate(corpus_ds, benchmark_ds, n: int = 5, round_to: int = 6,
                  broadcast_max_keys: int = _BROADCAST_MAX_KEYS):
    """corpus documents × benchmark documents ->
    (doc_id, n_grams, n_dirty_grams, dirty_gram_frac) per CORPUS doc.

    Benchmark decontamination — the training-data hygiene step that
    flags corpus documents sharing token n-grams with a held-out
    evaluation set, so they can be dropped before training (the
    n-gram-overlap rule published with GPT-3 appendix C / PaLM:
    13-grams at paper scale; ``n`` is a parameter here because the
    right n tracks document length). ``n_dirty_grams`` counts this
    document's n-gram OCCURRENCES whose gram appears anywhere in the
    benchmark — same counting semantics, tokenizer and gram hashing as
    ``dup_ngram_stats``, so the DuckDB oracle shares one token/gram
    definition with the whole text family.

    Plan: the benchmark side — small by definition (eval suites are
    10^4-10^6 grams vs 10^12 corpus docs) — reduces to a DISTINCT
    gram-key set via per-batch uniques + one tasks-mode exchange;
    corpus tagging and per-doc totals then reuse the dup_ngram
    machinery (keys broadcast ONCE via ``ray.put`` under the cap,
    ``bucket_join`` membership above it; totals from the pinned
    distinct-(doc, gram) partials, one exchange of doc-cardinality
    partial sums).
    """
    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import colocate_map

    rows = doc_gram_rows(corpus_ds, n).materialize()
    nblocks = coalesce_blocks()

    def bench_partial(t: pa.Table) -> pa.Table:
        gh = np.unique(t["gram_h"].to_numpy(zero_copy_only=False))
        return pa.table({"gram_h": pa.array(gh)})

    def bench_distinct_block(t: pa.Table) -> pa.Table:
        gh = np.unique(t["gram_h"].to_numpy(zero_copy_only=False))
        # the marker column _tag_rows_against_keys's join path selects
        return pa.table({"gram_h": pa.array(gh),
                         "dup": pa.array(np.ones(len(gh), dtype=np.int8))})

    def gram_bucket(t: pa.Table) -> pa.Table:
        gh = t["gram_h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("bucket", pa.array(
            (gh % np.uint64(nblocks)).astype(np.int32)))

    bench = doc_gram_rows(benchmark_ds, n).map_batches(
        bench_partial, batch_format="pyarrow", zero_copy_batch=True)
    bench_keys = colocate_map(bench, ["gram_h"], nblocks,
                              bench_distinct_block,
                              sort_bucket_expr=gram_bucket).materialize()

    contrib = _tag_rows_against_keys(rows, bench_keys, broadcast_max_keys)
    return _per_doc_gram_totals(corpus_ds, rows, contrib,
                                "n_dirty_grams", "dirty_gram_frac",
                                round_to)
