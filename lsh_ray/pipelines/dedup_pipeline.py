"""End-to-end near-duplicate detection + clustering pipeline.

read_parquet(documents) -> normalize -> shingle -> signatures (MinHash-128 +
SimHash-64, actor pool) -> LSH banding -> candidate pairs (bucketed groupby
shuffle, skew-capped) -> verify (exact Jaccard / Hamming / containment) ->
suffix-array substring pass -> union-find clustering.

Rebuild of the reference's create_index + search flow (``lsh.py:415-473``,
``lsh.py:476-570``) as corpus self-join dedup: there is no separate query
path — banding collides the corpus with itself; the verification kernels
play the role of the matching algorithms; the threshold gate plays
``clip_false_candidates`` (``lsh.py:385-412``).

Checkpointing: ``signatures`` and ``verified`` are forks in the DAG (each
consumed twice). With ``checkpoint_dir`` set they are written to Parquet and
re-read (the 100 TB path — resumable, spillable, see lsh_ray.state);
without it they are pinned with ``materialize()`` (test scale).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

import ray.data

from lsh_ray.config import DEFAULT_CONFIG, PipelineConfig
from lsh_ray.stages.minhash import signatures
from lsh_ray.stages.normalize import normalize
from lsh_ray.stages.shingle import shingle
from lsh_ray.stages.substring import substring_pass
from lsh_ray.stages.verify import verify


@dataclass
class DedupResult:
    normalized: Any
    signatures: Any
    cand_pairs: Any
    verified: Any
    substring_pairs: Any
    clusters: Any

    def metrics(self) -> dict:
        """Per-stage row counts + dup statistics (the rebuild of the
        reference's printed counters, ``lsh.py:259,268,306``, as a
        structured artifact; written next to checkpoints by the CLI)."""
        ver = self.verified
        n_dup = ver.map_batches(
            lambda t: {"n": [int(t.filter(t["is_dup"]).num_rows)]},
            batch_format="pyarrow").sum("n") or 0
        return {
            "docs_normalized": self.normalized.count(),
            "docs_signed": self.signatures.count(),
            "verified_pairs": ver.count(),
            "dup_pairs": n_dup,
            "substring_pairs": self.substring_pairs.count(),
            "clustered_docs": self.clusters.count(),
        }


def _fork(ds, checkpoint_dir: str | None, name: str, config: PipelineConfig,
          empty_schema=None):
    """Materialize a DAG fork: parquet checkpoint (resumable) or object
    store. ``empty_schema``: stage schema for the zero-row case (Ray
    loses the schema of an empty dataset)."""
    if checkpoint_dir:
        from lsh_ray.state.checkpoint import checkpoint_dataset
        return checkpoint_dataset(ds, os.path.join(checkpoint_dir, name),
                                  config, empty_schema=empty_schema)
    return ds.materialize()


def _substring_schema():
    import pyarrow as pa
    return pa.schema([("doc_a", pa.uint64()), ("doc_b", pa.uint64()),
                      ("lcs_len", pa.int64()), ("is_substring", pa.bool_())])


def _verified_schema():
    from lsh_ray.stages.verify import _EMPTY_VERIFIED
    return _EMPTY_VERIFIED.schema


def _pairs_schema():
    from lsh_ray.stages.candidates import _empty_pairs_summed
    return _empty_pairs_summed().schema


def run_dedup(docs_ds, config: PipelineConfig = DEFAULT_CONFIG,
              checkpoint_dir: str | None = None,
              distributed_cc: bool | None = None) -> DedupResult:
    """Full pipeline over a documents Dataset; returns every stage output."""
    # normalized feeds the signature chain and the (tiny) substring text
    # fetch. With checkpointing it is persisted once; otherwise it stays
    # lazy — fusing read+normalize+shingle+signature into ONE streaming
    # execution (the substring pass re-runs the cheap normalize on <1% of
    # the corpus via its semi-join prefilter).
    normalized = normalize(docs_ds, config)
    if checkpoint_dir:
        normalized = _fork(normalized, checkpoint_dir, "normalized", config)
    shingled = shingle(normalized, config)
    # Pinned-block discipline: combine_chunks keeps every signature block
    # single-chunk (pa.Table.take on a 5-chunk block measures ~40x slower
    # than on the combined block — the verify gather plan does thousands
    # of them; a no-op on the already-single-chunk map outputs).
    # The coalescing repartition (a full extra copy pass of the signature
    # table) is only worth it when the block count far exceeds the
    # exchange width: the FUSED candidates path handles any block count
    # (slice metadata is M x W), and the verify gather is per-block —
    # only the generic sort-exchange fallback pays a superlinear
    # many-small-blocks merge cost, so coalesce exactly when block
    # explosion would hurt it (and bound M for the fused slice budget).
    from lsh_ray.config import coalesce_blocks
    sig_ds = signatures(shingled, config)
    W = coalesce_blocks(config)
    try:
        m = sig_ds._plan.initial_num_blocks()
    except Exception:
        m = None
    if m is None or m > 4 * W:
        sig_ds = sig_ds.repartition(W)
    sigs = _fork(sig_ds.map_batches(lambda t: t.combine_chunks(),
                                    batch_format="pyarrow",
                                    zero_copy_batch=True),
                 checkpoint_dir, "signatures", config)
    if config.exchange == "auto":
        # resolve the shuffle-exchange implementation by measured
        # crossover (see lsh_ray.stages.exchange): the raw-task
        # split/reduce exchange wins while the per-job barrier floor
        # dominates (small corpora); Ray's streaming sort shuffle wins
        # once per-byte cost does. Deterministic in the input, so
        # checkpoint lineage hashes stay stable across resumes.
        import dataclasses
        n_docs = sigs.count()
        # measured at 500k docs on this box: tasks 62.1s/115.8s vs sort
        # 86.2s/134.8s (32/8 CPUs) — the raw-task exchange wins at every
        # corpus size that fits its slice-metadata bound, so the only
        # size gate is the one exchange.py itself enforces
        # (_TASKS_MAX_SLICES fallback). Keep "sort" for oversized jobs.
        config = dataclasses.replace(
            config, exchange="tasks" if n_docs <= 20_000_000 else "sort")
    # band keys: hot groups are real dup clusters -> chain; chunk-bigram
    # keys: hot groups are boilerplate -> drop (document-frequency noise
    # filter); single shared phrases emit no key at all (bigram scheme,
    # see stages/chunking.py). Both families resolve in the FUSED
    # three-wave task pipeline (band+chunk emission inside the task that
    # holds each pinned signature block, pair-gen fused with its own
    # re-partition — see candidates.candidate_pairs_from_signatures),
    # falling back to the generic two-exchange plan under "sort"/"hash"
    # modes or above the slice-metadata bound. The sum/gate still runs
    # BEFORE verify touches signature payloads.
    from lsh_ray.stages.candidates import candidate_pairs_from_signatures
    pairs = candidate_pairs_from_signatures(sigs, config)
    if checkpoint_dir:
        pairs = _fork(pairs, checkpoint_dir, "cand_pairs", config,
                      empty_schema=_pairs_schema())
    verified = _fork(verify(pairs, sigs, config), checkpoint_dir,
                     "verified", config, empty_schema=_verified_schema())
    # substring results feed both the result surface and the edge union.
    # Without a checkpoint, `normalized` is lazy — fetching candidate
    # texts through it would re-run normalize over the WHOLE corpus; pass
    # the raw source so only candidate rows (selected by recomputed url
    # hash) pay normalization. With a checkpoint, the persisted
    # normalized parquet is the cheaper source.
    sub = _fork(substring_pass(verified, normalized, config,
                               raw_ds=None if checkpoint_dir else docs_ds),
                checkpoint_dir, "substring", config,
                empty_schema=_substring_schema())

    # verified/sub are materialized (DAG forks): edge extraction runs as
    # one raw task per pinned block instead of a dataset union job (the
    # dataset path remains the distributed / oversized fallback inside)
    from lsh_ray.stages.cluster import clusters_from_stage_outputs
    clusters = clusters_from_stage_outputs(verified, sub,
                                           distributed=distributed_cc)
    return DedupResult(
        normalized=normalized,
        signatures=sigs,
        cand_pairs=pairs,
        verified=verified,
        substring_pairs=sub,
        clusters=clusters,
    )


def dedup_documents(input_path: str | list[str],
                    config: PipelineConfig = DEFAULT_CONFIG,
                    checkpoint_dir: str | None = None) -> DedupResult:
    """Convenience entry: parquet path(s) -> DedupResult (html column
    pruned at the read when parquet statistics prove text is never null)."""
    from lsh_ray.sources.readers import read_documents_for_dedup
    ds = read_documents_for_dedup(input_path)
    return run_dedup(ds, config, checkpoint_dir=checkpoint_dir)
