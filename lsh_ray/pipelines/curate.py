"""End-to-end training-data curation: the composite pipeline a user
runs over a raw crawl shard before training —

    normalize -> quality filter (Gopher-style, per-doc local)
              -> near-dup dedup (MinHash-LSH + verify + clusters)
              -> keep-list apply (cluster representative survives)
              -> optional benchmark decontamination (n-gram overlap)
              -> cleaned corpus + per-stage survivor metrics

Every stage is one of the engine's existing operators; this module only
composes them (the composition analog of the reference's create_index
command chaining its stages, ``main.py:48-182``).

Scale shape (100 TB): the quality filter is SHUFFLE-FREE — token count
and top-token fraction are per-row local, so the rule fuses into the
normalize scan; dedup is the bucketed pipeline (`run_dedup`);
the keep-list apply and the contaminated-doc drop are bucketed
(anti-)joins whose right sides are keys only; decontamination
broadcasts the benchmark gram keys once (``ray.put``) with the
bucket_join fallback above the cap. The filtered corpus is pinned ONCE
(``materialize``) because three consumers walk it (dedup, keep-join,
decontamination) — on a cluster this is the natural shard checkpoint
boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import pyarrow as pa

from lsh_ray.config import DEFAULT_CONFIG, PipelineConfig


@dataclasses.dataclass
class CurateResult:
    cleaned: Any        # Dataset: the surviving corpus rows
    dedup: Any          # the inner DedupResult (clusters, pairs, ...)
    metrics: dict


def quality_filter(ds, min_tokens: int = 10,
                   max_top_token_frac: float = 0.5):
    """Drop rows failing the per-document repetition/length rules
    (``doc_repetition``'s signals applied as a filter): fewer than
    ``min_tokens`` tokens, or a single token accounting for more than
    ``max_top_token_frac`` of them. Per-row local — no shuffle."""
    from lsh_ray.stages.repetition import _group_pairs
    from lsh_ray.stages.tfidf import flat_tokens

    def qf(batch: pa.Table) -> pa.Table:
        flat, lens, _ = flat_tokens(batch)
        n = batch.num_rows
        max_tf = np.zeros(n, dtype=np.int64)
        d_rep = np.repeat(np.arange(n, dtype=np.int64), lens)
        if len(d_rep):
            _, counts, d_g = _group_pairs(d_rep, flat)
            np.maximum.at(max_tf, d_g, counts)
        frac = max_tf / np.maximum(lens, 1)
        keep = (lens >= min_tokens) & (frac <= max_top_token_frac)
        return batch.filter(pa.array(keep))

    return ds.map_batches(qf, batch_format="pyarrow", zero_copy_batch=True)


def run_curate(docs_ds, config: PipelineConfig = DEFAULT_CONFIG,
               benchmark_ds=None, min_tokens: int = 10,
               max_top_token_frac: float = 0.5, ngram_n: int = 5,
               max_dirty_frac: float = 0.0,
               line_dedup_words: int | None = None,
               redact_pii: bool = False,
               checkpoint_dir: str | None = None) -> CurateResult:
    """Raw documents -> cleaned corpus, with per-stage survivor counts.

    ``benchmark_ds`` (same schema) enables the decontamination stage:
    survivors whose n-gram overlap fraction with the benchmark exceeds
    ``max_dirty_frac`` (default 0.0 — ANY shared n-gram) are dropped.
    ``line_dedup_words`` enables line-level exact dedup between the
    doc-level keep-list and decontamination (RefinedWeb-style): each
    survivor's text is rebuilt from the lines that first occur in it
    (``stages/dedup.py:line_dedup``; "first" = min (doc_id, idx) over
    the deterministic url-hash ids, so the winner is stable across
    runs), an ``n_lines_kept`` column is added, and docs whose every
    line first occurred elsewhere are dropped. ``redact_pii`` appends a
    final shuffle-free scrubbing scan (``stages/text_stats.pii_redact``):
    emails / IPv4s / phone numbers in the surviving text are replaced by
    sentinel tokens, per-doc count columns are added, and the corpus
    totals join the stage metrics. ``checkpoint_dir`` is forwarded to
    the inner dedup pipeline (signatures/pairs/clusters manifests —
    resume semantics unchanged).
    """
    from lsh_ray.pipelines.dedup_pipeline import run_dedup
    from lsh_ray.stages.cluster import kept_after_dedup
    from lsh_ray.stages.join import anti_join, bucket_join
    from lsh_ray.stages.normalize import normalize

    metrics: dict = {"n_input": docs_ds.count()}

    # normalize + quality rule fuse into one scan; pinned once for the
    # three downstream consumers (the count is free on the pinned set).
    # n_input - n_quality_kept folds the empty-doc drop into the rule.
    filtered = quality_filter(normalize(docs_ds, config), min_tokens,
                              max_top_token_frac).materialize()
    metrics["n_quality_kept"] = filtered.count()

    res = run_dedup(filtered, config, checkpoint_dir=checkpoint_dir)

    def mark(t: pa.Table) -> pa.Table:
        return t.append_column(
            "keep", pa.array(np.ones(t.num_rows, dtype=np.int8)))

    kept_urls = kept_after_dedup(res).map_batches(
        mark, batch_format="pyarrow", zero_copy_batch=True)
    cleaned = bucket_join(filtered, kept_urls, "url", "url", ["keep"],
                          suffix="_r", how="inner")

    def drop_marker(t: pa.Table) -> pa.Table:
        return t.drop_columns(["keep_r"])

    cleaned = cleaned.map_batches(drop_marker, batch_format="pyarrow",
                                  zero_copy_batch=True)

    if line_dedup_words:
        from lsh_ray.stages.dedup import line_dedup

        cleaned = cleaned.materialize()  # count + line view share the scan
        metrics["n_dedup_kept"] = cleaned.count()
        survivors = line_dedup(cleaned, words_per_line=line_dedup_words)

        def drop_text(t: pa.Table) -> pa.Table:
            return t.drop_columns(["text"])

        # swap in the reassembled text (inner join: fully-absorbed docs
        # drop out); bucketed on the same doc_id key family as the
        # keep-list apply above
        cleaned = bucket_join(
            cleaned.map_batches(drop_text, batch_format="pyarrow",
                                zero_copy_batch=True),
            survivors, "doc_id", "doc_id", ["text", "n_kept"],
            suffix="_ld", how="inner")

        def finish_ld(t: pa.Table) -> pa.Table:
            ren = {"text_ld": "text", "n_kept_ld": "n_lines_kept"}
            return t.rename_columns(
                [ren.get(c, c) for c in t.column_names])

        # pinned: counted here and consumed again by the decontam pass
        # or the final write
        cleaned = cleaned.map_batches(finish_ld, batch_format="pyarrow",
                                      zero_copy_batch=True).materialize()
        metrics["n_line_dedup_kept"] = cleaned.count()

    if benchmark_ds is not None:
        from lsh_ray.stages.repetition import decontaminate

        if not line_dedup_words:
            cleaned = cleaned.materialize()  # decontam + drop share it
            metrics["n_dedup_kept"] = cleaned.count()
        stats = decontaminate(cleaned, normalize(benchmark_ds, config),
                              n=ngram_n)

        def dirty_only(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.greater(
                t["dirty_gram_frac"], max_dirty_frac)).select(["doc_id"])

        dirty = stats.map_batches(dirty_only, batch_format="pyarrow",
                                  zero_copy_batch=True)
        # pinned: the count below AND the next consumer (PII stage or
        # the caller's write) both walk it — without this the whole
        # anti-join/decontaminate DAG executes twice
        cleaned = anti_join(cleaned, dirty, "doc_id", "doc_id") \
            .materialize()
        metrics["n_cleaned"] = cleaned.count()
        before_decontam = metrics.get("n_line_dedup_kept",
                                      metrics["n_dedup_kept"])
        metrics["n_contaminated_dropped"] = (
            before_decontam - metrics["n_cleaned"])
    else:
        metrics["n_cleaned"] = cleaned.count()
        metrics.setdefault("n_dedup_kept", metrics["n_cleaned"])
        metrics["n_contaminated_dropped"] = 0

    if redact_pii:
        from lsh_ray.stages.text_stats import PII_PATTERNS, pii_redact_batch

        # per-row local — no shuffle; pinned because the totals below
        # and the caller's write both walk it
        cleaned = cleaned.map_batches(
            pii_redact_batch, batch_format="pyarrow",
            zero_copy_batch=True).materialize()
        count_cols = [name for name, _, _ in PII_PATTERNS]
        totals = cleaned.sum(count_cols)
        for name in count_cols:
            metrics[f"pii_{name}"] = int(totals[f"sum({name})"])

    return CurateResult(cleaned=cleaned, dedup=res, metrics=metrics)
