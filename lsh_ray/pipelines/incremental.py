"""Incremental near-duplicate detection: dedup a NEW document shard
against an existing corpus checkpoint.

The daily-crawl workflow at 100 TB: yesterday's corpus is already
deduped and its pipeline checkpoint (signatures / normalized / verified
/ substring parquet, ``lsh_ray.state.checkpoint``) is on disk. Today's
shard must be deduped against it WITHOUT re-running yesterday's work.
``run_dedup_incremental`` does exactly that:

- the base corpus is never re-normalized, re-shingled or re-signed —
  its signatures are read back from the checkpoint (the expensive
  per-byte compute, the profiled bottleneck of the full pipeline, is
  paid once per document ever);
- base x base pairs are never re-enumerated or re-verified — the sided
  pair kernel (``candidates._pairs_for_mixed_arrays_sided``) emits only
  pairs touching >= 1 new doc, so a key group of n_old + n_new members
  costs O(n_new * (n_old + n_new)) pair work, not O((n_old+n_new)^2);
- the only O(base) costs are streaming scans: one pure-explode map over
  the base signature parquet re-derives its band/chunk rows (no
  tokenization — the keys are stored columns), one key exchange
  co-locates them with the delta's rows (cap-gated delta-key prefilter
  shrinks the shipped base rows to colliding keys only when the delta
  key set fits a broadcast), and the verify/substring gathers touch
  only pair endpoints — the verify source is an endpoint-id semi-join
  over the signature union (a streaming filter, never a full-corpus
  materialize), and substring_pass does its own candidate-id semi-join
  over the lazy normalized union. Nothing O(base) lands in the object
  store unless ``checkpoint_dir`` asks for the merged rolling corpus,
  where the O(corpus) parquet write IS the product.

Clustering merges the new edges with the base run's checkpointed
verified/substring edges, so cluster ids stay the global min-member ids
— a doc that joins an existing cluster gets that cluster's id.

With ``checkpoint_dir`` set, the run writes MERGED signatures /
normalized / verified / substring checkpoints: the output directory is
itself a valid ``base_dir`` for the next increment (the rolling-corpus
pattern). Without it, outputs stay pinned in the object store.

Reference parity note: the reference has no incremental path (its
create_index, lsh.py:415-473, always rebuilds); this operator is a
rebuild addition for the training-data use case, built from the same
candidate/verify machinery as ``run_dedup``.

Re-ingestion policy: a delta doc whose ``doc_id`` (= url hash) already
exists in the base is SKIPPED (``_existing_delta_ids``) — re-running an
increment, or re-crawling yesterday's urls, is a no-op rather than a
source of duplicate signature rows. This maintains the doc_id-unique
invariant of the rolling checkpoint that verify's endpoint resolution
relies on. Content updates under a stable url are out of scope (they
would need tombstoning of the replaced doc's edges).

Boundary semantics (documented, not hidden): hot-group policies are
heuristics in both runs — a key group that crosses ``group_size_cap``
only when delta docs join it emits star/chain edges that differ from
what a from-scratch full run would emit for that group. Small groups
(the signal mass) are exact: incremental output == full-run output
restricted to new-touching pairs (asserted by tests).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

import numpy as np
import pyarrow as pa
import ray
import ray.data

from lsh_ray.config import DEFAULT_CONFIG, PipelineConfig, coalesce_blocks

# delta key sets up to this many uint64 keys broadcast to the base-row
# emit tasks (sorted array, searchsorted membership): 32M keys = 256 MB
# object. Above it the prefilter is skipped and the key exchange ships
# every base row (it streams; correctness unchanged).
_DELTA_KEYS_MAX = 32_000_000


@dataclass
class IncrementalDedupResult:
    new_normalized: Any
    new_signatures: Any
    signatures: Any  # merged base + delta signature table
    cand_pairs: Any
    verified: Any
    substring_pairs: Any
    clusters: Any
    n_skipped_existing: int = 0  # delta docs already in the base (re-crawl)

    def metrics(self) -> dict:
        ver = self.verified
        n_dup = ver.map_batches(
            lambda t: {"n": [int(t.filter(t["is_dup"]).num_rows)]},
            batch_format="pyarrow").sum("n") or 0
        return {
            "new_docs_normalized": self.new_normalized.count(),
            "new_docs_signed": self.new_signatures.count(),
            "verified_pairs": ver.count(),
            "dup_pairs": n_dup,
            "substring_pairs": self.substring_pairs.count(),
            "clustered_docs": self.clusters.count(),
            "skipped_existing": self.n_skipped_existing,
        }


def _tagged_rows_fn(config: PipelineConfig, side: int, keys_ref=None):
    """Signature-batch -> (band_key, doc_id, family, side) rows: band
    keys recomputed from the stored minhash column, chunk rows a pure
    explode of the stored ``chunk_keys`` — no text touched. ``keys_ref``
    (base side only): broadcast sorted delta-key array; rows whose key
    collides with no delta key can never form a new-touching pair and
    are dropped before the exchange."""
    from lsh_ray.stages.banding import banding_batch
    from lsh_ray.stages.chunking import _chunk_rows_batch

    use_chunks = config.enable_chunk_keys

    def fn(t: pa.Table) -> pa.Table:
        parts = []
        br = banding_batch(t, config)
        parts.append((br, 0))
        if use_chunks and "chunk_keys" in t.schema.names:
            parts.append((_chunk_rows_batch(t), 1))
        keys = np.concatenate(
            [p["band_key"].to_numpy(zero_copy_only=False) for p, _ in parts])
        docs = np.concatenate(
            [p["doc_id"].to_numpy(zero_copy_only=False) for p, _ in parts])
        fam = np.concatenate(
            [np.full(p.num_rows, f, dtype=np.int8) for p, f in parts])
        if keys_ref is not None and len(keys):
            dk = ray.get(keys_ref)
            idx = np.minimum(np.searchsorted(dk, keys), len(dk) - 1)
            hit = dk[idx] == keys
            keys, docs, fam = keys[hit], docs[hit], fam[hit]
        return pa.table({
            "band_key": pa.array(keys, type=pa.uint64()),
            "doc_id": pa.array(docs, type=pa.uint64()),
            "family": pa.array(fam),
            "side": pa.array(np.full(len(keys), side, dtype=np.int8)),
        })

    return fn


def _delta_keys_ref(new_sigs, config: PipelineConfig):
    """Sorted unique key array of the delta, broadcast via ray.put — or
    None when it exceeds the broadcast cap."""
    emit = _tagged_rows_fn(config, side=0)
    parts = []
    total = 0
    for b in new_sigs.map_batches(
            lambda t: emit(t).select(["band_key"]),
            batch_format="pyarrow", zero_copy_batch=True).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"):
        k = b["band_key"].to_numpy(zero_copy_only=False)
        total += len(k)
        if total > _DELTA_KEYS_MAX:
            return None
        parts.append(np.unique(k))
    if not parts:
        return None
    keys = np.unique(np.concatenate(parts))
    return ray.put(keys)


def incremental_candidate_pairs(base_sigs, new_sigs,
                                config: PipelineConfig):
    """Signatures of the base corpus + the delta -> summed/gated
    candidate pairs touching >= 1 delta doc (schema identical to
    ``candidate_pairs_from_signatures``)."""
    from lsh_ray.stages.candidates import (_pairs_for_mixed_bucket_sided,
                                           sum_mixed_pairs)
    from lsh_ray.stages.exchange import colocate_map

    keys_ref = _delta_keys_ref(new_sigs, config)
    rows = new_sigs.map_batches(
        _tagged_rows_fn(config, side=0),
        batch_format="pyarrow", zero_copy_batch=True).union(
        base_sigs.map_batches(
            _tagged_rows_fn(config, side=1, keys_ref=keys_ref),
            batch_format="pyarrow", zero_copy_batch=True))
    nb = np.uint64(4096)

    def add_band_bucket(t: pa.Table) -> pa.Table:
        bk = t["band_key"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((bk % nb).astype(np.int32)))

    cap = config.group_size_cap
    partial = colocate_map(
        rows, ["band_key"], coalesce_blocks(config),
        lambda g: _pairs_for_mixed_bucket_sided(g, cap),
        sort_bucket_expr=add_band_bucket, mode=config.exchange)
    return sum_mixed_pairs(partial, config)


def _require_complete(base_dir: str, stage: str, config: PipelineConfig):
    import dataclasses

    from lsh_ray.state.checkpoint import is_complete
    path = os.path.join(base_dir, stage)
    # run_dedup resolves exchange="auto" to a concrete mode before
    # checkpointing its later stages, so the manifests under one base
    # dir legitimately carry either hash. Exchange mode is execution
    # strategy with asserted output identity (test_exchange), so any
    # mode's hash attests the same results; every OTHER config field
    # must match exactly.
    candidates = [config] + [dataclasses.replace(config, exchange=m)
                             for m in ("auto", "tasks", "sort", "hash")]
    if not any(is_complete(path, c) for c in candidates):
        raise ValueError(
            f"base checkpoint {path} is missing, incomplete, or was "
            "written under a different PipelineConfig (signature "
            "geometry must match between the base run and the "
            "increment)")
    return path


def _read_stage(base_dir: str, stage: str):
    from lsh_ray.sources.readers import strip_schema_metadata
    return strip_schema_metadata(
        ray.data.read_parquet(os.path.join(base_dir, stage)))


def _existing_delta_ids(base_dir: str, new_sigs) -> np.ndarray:
    """Delta doc_ids already present in the base checkpoint.

    A re-crawled URL or a re-delivered shard puts a doc_id the base
    already holds into the delta. Without this check the signature
    union would carry duplicate doc_id rows: every pair touching one
    hits verify's multi-row drop rule (silent under-detection) and the
    merged rolling checkpoint is poisoned for every FUTURE increment.
    Policy: the doc_id (= url hash) IS the document — a re-delivery is
    skipped, making increments idempotent (re-running one is a no-op).

    Cost: one column-pruned scan of the base signatures' ``doc_id``
    column against the broadcast (sorted) delta id set. Deltas larger
    than the broadcast cap take a bucketed anti-join instead (one
    exchange of ids only, no payloads)."""
    id_parts = [b["doc_id"].to_numpy(zero_copy_only=False)
                for b in new_sigs.iter_batches(batch_size=1 << 20,
                                               batch_format="pyarrow")]
    delta_ids = (np.unique(np.concatenate(id_parts)) if id_parts
                 else np.empty(0, dtype=np.uint64))
    if not len(delta_ids):
        return delta_ids[:0]
    base_id_ds = ray.data.read_parquet(
        os.path.join(base_dir, "signatures"), columns=["doc_id"])
    if len(delta_ids) <= _DELTA_KEYS_MAX:
        ids_ref = ray.put(delta_ids)

        def hits(t: pa.Table) -> pa.Table:
            dk = ray.get(ids_ref)
            doc = t["doc_id"].to_numpy(zero_copy_only=False)
            idx = np.minimum(np.searchsorted(dk, doc), len(dk) - 1)
            return pa.table({"doc_id": pa.array(doc[dk[idx] == doc],
                                                type=pa.uint64())})

        parts = [b["doc_id"].to_numpy(zero_copy_only=False)
                 for b in base_id_ds.map_batches(
                     hits, batch_format="pyarrow",
                     zero_copy_batch=True).iter_batches(
                     batch_size=1 << 20, batch_format="pyarrow")]
        return (np.unique(np.concatenate(parts)) if parts
                else delta_ids[:0])
    # giant-delta path: ids-only bucketed semi-join (the base side is
    # already unique by the invariant this function maintains)
    from lsh_ray.stages.join import bucket_join
    delta_id_ds = new_sigs.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow",
        zero_copy_batch=True)
    marked = base_id_ds.map_batches(
        lambda t: t.append_column(
            "present", pa.array(np.ones(t.num_rows, dtype=np.int8))),
        batch_format="pyarrow", zero_copy_batch=True)
    j = bucket_join(delta_id_ds, marked, "doc_id", "doc_id",
                    ["present"], how="inner")
    parts = [b["doc_id"].to_numpy(zero_copy_only=False)
             for b in j.iter_batches(batch_size=1 << 20,
                                     batch_format="pyarrow")]
    return (np.unique(np.concatenate(parts)) if parts else delta_ids[:0])


def run_dedup_incremental(new_docs_ds, base_dir: str,
                          config: PipelineConfig = DEFAULT_CONFIG,
                          checkpoint_dir: str | None = None,
                          distributed_cc: bool | None = None
                          ) -> IncrementalDedupResult:
    """Dedup ``new_docs_ds`` against the corpus checkpointed at
    ``base_dir`` (a prior ``run_dedup(..., checkpoint_dir=base_dir)`` or
    ``run_dedup_incremental(..., checkpoint_dir=base_dir)`` output).

    Returns the NEW-touching pair surface plus the merged clustering.
    With ``checkpoint_dir``, writes merged signatures/normalized/
    verified/substring checkpoints so the output dir is a valid base
    for the next increment."""
    import dataclasses

    from lsh_ray.pipelines.dedup_pipeline import (_fork, _substring_schema,
                                                  _verified_schema)
    from lsh_ray.stages.minhash import signatures
    from lsh_ray.stages.normalize import normalize
    from lsh_ray.stages.shingle import shingle
    from lsh_ray.stages.substring import substring_pass
    from lsh_ray.stages.verify import verify
    from lsh_ray.state.checkpoint import read_manifest

    for stage in ("signatures", "normalized", "verified", "substring"):
        _require_complete(base_dir, stage, config)
    base_sigs = _read_stage(base_dir, "signatures")
    n_base = read_manifest(
        os.path.join(base_dir, "signatures")).get("rows") or 0

    # the delta is small by definition — pin its normalized form once so
    # downstream consumers (signatures, substring union, metrics) don't
    # each re-run normalize over the delta source
    new_normalized = normalize(new_docs_ds, config).materialize()
    sig_ds = signatures(shingle(new_normalized, config), config)
    new_sigs = sig_ds.map_batches(
        lambda t: t.combine_chunks(), batch_format="pyarrow",
        zero_copy_batch=True).materialize()

    # idempotent re-ingestion: delta docs whose doc_id the base already
    # holds (re-crawled urls, re-delivered shards) are skipped — see
    # _existing_delta_ids. Keeps the merged checkpoint's doc_id-unique
    # invariant that verify's pair resolution relies on.
    existing = _existing_delta_ids(base_dir, new_sigs)
    n_skipped = int(len(existing))
    if n_skipped:
        ex_ref = ray.put(existing)

        def drop_existing(t: pa.Table) -> pa.Table:
            ex = ray.get(ex_ref)
            doc = t["doc_id"].to_numpy(zero_copy_only=False)
            idx = np.minimum(np.searchsorted(ex, doc), len(ex) - 1)
            return t.filter(pa.array(ex[idx] != doc))

        new_normalized = new_normalized.map_batches(
            drop_existing, batch_format="pyarrow",
            zero_copy_batch=True).materialize()
        new_sigs = new_sigs.map_batches(
            drop_existing, batch_format="pyarrow",
            zero_copy_batch=True).materialize()

    if config.exchange == "auto":
        # same crossover policy as run_dedup, sized on the UNION the
        # exchange actually moves; base row count is free (manifest)
        n_docs = n_base + new_sigs.count()
        config = dataclasses.replace(
            config, exchange="tasks" if n_docs <= 20_000_000 else "sort")

    if n_skipped and not new_sigs.count():
        # exact re-delivery: nothing new — skip the base scan/exchange
        # entirely instead of shipping every base row to produce 0 pairs
        from lsh_ray.stages.candidates import _empty_pairs_summed
        pairs = ray.data.from_arrow(_empty_pairs_summed())
    else:
        pairs = incremental_candidate_pairs(base_sigs, new_sigs,
                                            config).materialize()

    sig_union = base_sigs.union(new_sigs)
    norm_union = _read_stage(base_dir, "normalized").union(new_normalized)

    # verify source: ONLY the rows participating in a pair. The
    # endpoint-id set (<= 2 x pairs) broadcasts and filters the
    # signature union as a streaming scan — the base corpus's shingle
    # payloads never land in the object store. All rows of each
    # endpoint id survive the filter, so verify's multi-row-doc_id drop
    # rule sees the same multiplicity it would on the full table.
    # Above the cap, verify dispatches to its O(corpus) exchange plan
    # anyway, so the full union is the right source there.
    def _combined(ds):
        return ds.map_batches(lambda t: t.combine_chunks(),
                              batch_format="pyarrow",
                              zero_copy_batch=True)

    if pairs.count() <= config.verify_broadcast_max_pairs:
        id_parts = [np.concatenate([
            b["doc_a"].to_numpy(zero_copy_only=False),
            b["doc_b"].to_numpy(zero_copy_only=False)])
            for b in pairs.iter_batches(batch_size=65536,
                                        batch_format="pyarrow")]
        ids = (np.unique(np.concatenate(id_parts)) if id_parts
               else np.empty(0, dtype=np.uint64))
        ids_ref = ray.put(ids)

        def only_endpoints(t: pa.Table) -> pa.Table:
            ep = ray.get(ids_ref)
            if not len(ep):
                return t.slice(0, 0)
            doc = t["doc_id"].to_numpy(zero_copy_only=False)
            idx = np.minimum(np.searchsorted(ep, doc), len(ep) - 1)
            return t.filter(pa.array(ep[idx] == doc)).combine_chunks()

        ver_sigs = sig_union.map_batches(
            only_endpoints, batch_format="pyarrow",
            zero_copy_batch=True).materialize()
    else:
        ver_sigs = _combined(sig_union).materialize()
    verified = _fork(verify(pairs, ver_sigs, config), None, "", config,
                     empty_schema=_verified_schema())

    # substring_pass semi-joins candidate texts internally — the lazy
    # normalized union is scanned once, never materialized
    sub = _fork(substring_pass(verified, norm_union, config),
                None, "", config, empty_schema=_substring_schema())

    if checkpoint_dir:
        # rolling-corpus product: merged signatures / normalized written
        # so this run's output dir is the next increment's base
        sigs_all = _fork(_combined(sig_union), checkpoint_dir,
                         "signatures", config)
        _fork(norm_union, checkpoint_dir, "normalized", config)
    else:
        sigs_all = sig_union  # lazy: result-surface consumers stream it

    ver_union = _fork(_read_stage(base_dir, "verified").union(verified),
                      checkpoint_dir, "verified", config,
                      empty_schema=_verified_schema())
    sub_union = _fork(_read_stage(base_dir, "substring").union(sub),
                      checkpoint_dir, "substring", config,
                      empty_schema=_substring_schema())
    from lsh_ray.stages.cluster import clusters_from_stage_outputs
    clusters = clusters_from_stage_outputs(ver_union, sub_union,
                                           distributed=distributed_cc)
    return IncrementalDedupResult(
        new_normalized=new_normalized,
        new_signatures=new_sigs,
        signatures=sigs_all,
        cand_pairs=pairs,
        verified=verified,
        substring_pairs=sub,
        clusters=clusters,
        n_skipped_existing=n_skipped,
    )
