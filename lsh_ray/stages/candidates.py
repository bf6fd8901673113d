"""Candidate-pair generation: band rows -> (doc_a, doc_b, n_band_hits).

Rebuild of the reference's collision counting (``lsh.py:272-317``): the
reference probes the inverted index per query and increments a dense
``candidates_count`` vector per posting hit. Here candidate generation is a
self-collision of the corpus: documents sharing a ``band_key`` form a group;
every within-group pair is a candidate; the number of distinct bands in
which a pair collides is its collision count (``n_band_hits``).

Scale design (explicit, per north_rule):

- **Shuffle #1** groups band rows by a deterministic ``bucket = band_key %
  NB`` column; each ``map_groups`` call receives a whole bucket and resolves
  ALL its band groups with numpy (sort + boundary diff) — a few hundred
  Python invocations total, never one per band group.
- **Skew / hot bands** (boilerplate pages; reference analog: unbounded
  postings cells ``lsh.py:260-266``): a band group larger than
  ``group_size_cap`` does NOT emit O(n^2) pairs. It emits a sorted
  consecutive-doc chain (n-1 pairs) — preserving connectivity for
  clustering while capping output linearly. Enormous groups are by
  construction boilerplate collisions.
- **Shuffle #2** (much smaller input: pairs, not band rows) groups by a
  pair-hash bucket and sums per-band partial counts into the global
  ``n_band_hits``, deduplicating pairs — again vectorized per bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsh_ray.config import PipelineConfig, coalesce_blocks
from lsh_ray.functions.hashing import hash_pair
from lsh_ray.stages.exchange import _lazy_remote

_NUM_BUCKETS = 4096


def _sorted_unique_rows(group: pa.Table):
    """(band_key, doc_id[, family]) -> lexsorted arrays with duplicate
    (key, doc) rows removed — fully vectorized (one lexsort + one mask);
    the old per-group ``np.unique`` loop cost tens of Python-call seconds
    per bucket at millions of band groups."""
    bk = group["band_key"].to_numpy(zero_copy_only=False)
    doc = group["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((doc, bk))
    bk, doc = bk[order], doc[order]
    keep = np.concatenate(
        ([True], (bk[1:] != bk[:-1]) | (doc[1:] != doc[:-1])))
    return order, keep, bk[keep], doc[keep]


def _expand_small_groups(doc: np.ndarray, starts: np.ndarray,
                         sizes: np.ndarray, small_rows: np.ndarray,
                         gid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-group pairs for rows of small groups, no Python loop.

    For a row at within-group position p of a group of size m, its
    partners are the m-1-p FOLLOWING rows (doc sorted ascending inside a
    group, so doc_a < doc_b falls out automatically). Partner indices are
    pure cumsum/repeat arithmetic.
    """
    n = len(doc)
    pos = np.arange(n) - starts[gid]
    cnt = (sizes[gid] - 1 - pos)[small_rows]
    total = int(cnt.sum())
    if total == 0:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64))
    rows = np.repeat(small_rows, cnt)
    ends_c = np.cumsum(cnt)
    partner = (np.arange(total) - np.repeat(ends_c - cnt, cnt)
               + np.repeat(small_rows + 1, cnt))
    return doc[rows], doc[partner]


def _dedup_pairs_with_counts(a: np.ndarray, b: np.ndarray,
                             *weight_arrays: np.ndarray):
    """Sort pairs, collapse duplicates, sum each weight array per pair.
    lexsort + bincount — ``np.unique(axis=0)``'s void-view sort was the
    other hot spot of the old implementation."""
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
    grp = np.cumsum(new) - 1
    sums = [np.bincount(grp, weights=w[order]).astype(np.int32)
            for w in weight_arrays]
    return a[new], b[new], sums


def _pairs_for_band_bucket(group: pa.Table, cap: int,
                           hot_policy: str = "chain") -> pa.Table:
    """Candidate pairs within one bucket of band rows (fully vectorized).

    Emits pairs with per-bucket partial collision counts; global dedup and
    counting happen in the second pass (a pair colliding in two different
    bands has two different band_keys, which may land in different buckets).

    ``hot_policy`` for groups larger than ``cap``:
    - "chain": emit a sorted consecutive-doc chain (n-1 pairs) —
      connectivity preserved for clustering. Right for MinHash band keys,
      where a huge group IS a real duplicate cluster.
    - "drop": emit nothing. Right for content-chunk keys, where a chunk
      shared by hundreds of documents is boilerplate (no dup signal) —
      the document-frequency noise filter, reference analog:
      TF-IDF-threshold token filtering, scripts/tfidf_pitch_extraction.py:114-134.
    """
    if group.num_rows == 0:
        return _empty_pairs()
    _, _, bk, doc = _sorted_unique_rows(group)
    n = len(bk)
    starts = np.flatnonzero(np.concatenate(([True], bk[1:] != bk[:-1])))
    sizes = np.diff(np.concatenate((starts, [n])))
    gid = np.repeat(np.arange(len(starts)), sizes)
    size_of_row = sizes[gid]
    small_rows = np.flatnonzero((size_of_row >= 2) & (size_of_row <= cap))
    a0, b0 = _expand_small_groups(doc, starts, sizes, small_rows, gid)
    a_parts, b_parts = [a0], [b0]
    if hot_policy == "chain":
        for g in np.flatnonzero(sizes > cap):  # hot groups are FEW
            s, m = starts[g], sizes[g]
            d = doc[s:s + m]
            a_parts.append(d[:-1]); b_parts.append(d[1:])
    a = np.concatenate(a_parts); b = np.concatenate(b_parts)
    if len(a) == 0:
        return _empty_pairs()
    ua, ub, (counts,) = _dedup_pairs_with_counts(
        a, b, np.ones(len(a), dtype=np.int32))
    return pa.table({
        "doc_a": pa.array(ua, type=pa.uint64()),
        "doc_b": pa.array(ub, type=pa.uint64()),
        "hits": pa.array(counts, type=pa.int32()),
    })


def _empty_pairs() -> pa.Table:
    return pa.table({"doc_a": pa.array([], pa.uint64()),
                     "doc_b": pa.array([], pa.uint64()),
                     "hits": pa.array([], pa.int32())})


def _sum_pair_bucket(group: pa.Table, min_hits: int) -> pa.Table:
    a = group["doc_a"].to_numpy(zero_copy_only=False)
    b = group["doc_b"].to_numpy(zero_copy_only=False)
    h = group["hits"].to_numpy(zero_copy_only=False)
    if len(a) == 0:
        return _empty_pairs_summed()
    ua, ub, (sums,) = _dedup_pairs_with_counts(a, b, h)
    keep = sums >= min_hits
    return pa.table({
        "doc_a": pa.array(ua[keep], type=pa.uint64()),
        "doc_b": pa.array(ub[keep], type=pa.uint64()),
        "n_band_hits": pa.array(sums[keep], type=pa.int32()),
    })


def _empty_pairs_summed() -> pa.Table:
    return pa.table({"doc_a": pa.array([], pa.uint64()),
                     "doc_b": pa.array([], pa.uint64()),
                     "n_band_hits": pa.array([], pa.int32())})


def partial_pairs(band_rows_ds, config: PipelineConfig,
                  hot_policy: str = "chain",
                  num_buckets: int = _NUM_BUCKETS):
    """(band_key, doc_id) rows -> per-block partial pairs (doc_a, doc_b,
    hits). Exchange #1 of candidate generation: ONE hash exchange
    co-locating each band_key (see lsh_ray.stages.exchange)."""
    from lsh_ray.stages.exchange import colocate_map
    nb = np.uint64(num_buckets)

    def add_band_bucket(t: pa.Table) -> pa.Table:
        bk = t["band_key"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((bk % nb).astype(np.int32)))

    return colocate_map(
        band_rows_ds, ["band_key"], coalesce_blocks(config),
        lambda g: _pairs_for_band_bucket(g, config.group_size_cap,
                                         hot_policy),
        sort_bucket_expr=add_band_bucket, mode=config.exchange)


def sum_pairs(partial_ds, config: PipelineConfig,
              num_buckets: int = _NUM_BUCKETS,
              min_hits: int | None = None):
    """Partial pairs -> globally deduped (doc_a, doc_b, n_band_hits).
    Shuffle #2 (pair volume << band-row volume)."""
    from lsh_ray.stages.exchange import colocate_map
    nb = np.uint64(num_buckets)
    if min_hits is None:
        min_hits = config.min_band_hits

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        key = hash_pair(t["doc_a"].to_numpy(zero_copy_only=False),
                        t["doc_b"].to_numpy(zero_copy_only=False))
        return t.append_column("bucket", pa.array((key % nb).astype(np.int32)))

    return colocate_map(
        partial_ds, ["doc_a", "doc_b"], coalesce_blocks(config),
        lambda g: _sum_pair_bucket(g, min_hits),
        sort_bucket_expr=add_pair_bucket, mode=config.exchange)


def candidate_pairs(band_rows_ds, config: PipelineConfig,
                    num_buckets: int = _NUM_BUCKETS,
                    hot_policy: str = "chain"):
    """(band_key, doc_id) Dataset -> (doc_a, doc_b, n_band_hits) Dataset.

    ``doc_a < doc_b`` always (canonical orientation).
    """
    return sum_pairs(
        partial_pairs(band_rows_ds, config, hot_policy, num_buckets),
        config, num_buckets)


# ------------------------- unified two-family pass (bands + chunks) --------

def _salted_pairs(d: np.ndarray, salt_buckets: int
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Hot-group pair emission via SALTED band keys (north_rule mechanism):
    split the group's docs by ``salt = h(doc_id) % S``, emit all pairs
    within each salt bucket (bounded at ~ (m/S)^2 * S work) plus a chain
    across the salt buckets' minimum members so the group stays one
    connected component for clustering."""
    from lsh_ray.functions.hashing import splitmix64
    salt = (splitmix64(d) % np.uint64(salt_buckets)).astype(np.int64)
    a_parts, b_parts, reps = [], [], []
    for s in range(salt_buckets):
        sub = d[salt == s]
        if len(sub) == 0:
            continue
        reps.append(sub[0])  # d sorted => sub sorted => min member
        if len(sub) >= 2:
            iu, ju = np.triu_indices(len(sub), k=1)
            a_parts.append(sub[iu]); b_parts.append(sub[ju])
    reps = np.sort(np.array(reps, dtype=np.uint64))
    if len(reps) >= 2:
        a_parts.append(reps[:-1]); b_parts.append(reps[1:])
    if not a_parts:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64))
    a = np.concatenate(a_parts); b = np.concatenate(b_parts)
    return np.minimum(a, b), np.maximum(a, b)


def _pairs_for_mixed_bucket(group: pa.Table, cap: int,
                            salt_buckets: int = 8) -> pa.Table:
    """Like _pairs_for_band_bucket but for rows carrying a ``family``
    column (0 = MinHash band key -> hot policy salt-then-chain; 1 =
    content-chunk key -> hot policy drop). Key spaces are disjoint, so
    family is constant within each key group. Emits per-family partial hit
    counts. Small groups expand with NO per-group Python; only hot groups
    (few by construction) take the loop."""
    if group.num_rows == 0:
        return _empty_mixed_pairs()
    ua, ub, band_hits, chunk_hits = _pairs_for_mixed_arrays(
        group["band_key"].to_numpy(zero_copy_only=False),
        group["doc_id"].to_numpy(zero_copy_only=False),
        group["family"].to_numpy(zero_copy_only=False),
        cap, salt_buckets)
    return pa.table({
        "doc_a": pa.array(ua, type=pa.uint64()),
        "doc_b": pa.array(ub, type=pa.uint64()),
        "band_hits": pa.array(band_hits, type=pa.int32()),
        "chunk_hits": pa.array(chunk_hits, type=pa.int32()),
    })


def _pairs_for_mixed_arrays(bk_all: np.ndarray, doc_all: np.ndarray,
                            fam_all: np.ndarray, cap: int,
                            salt_buckets: int = 8
                            ) -> tuple[np.ndarray, ...]:
    """Array core of ``_pairs_for_mixed_bucket`` (shared with the fused
    task pipeline): (band_key, doc_id, family) rows of one co-located
    partition -> deduped (doc_a, doc_b, band_hits, chunk_hits)."""
    if len(bk_all) == 0:
        e = np.empty(0, dtype=np.uint64)
        zi = np.empty(0, dtype=np.int32)
        return e, e, zi, zi
    order = np.lexsort((doc_all, bk_all))
    bk, doc = bk_all[order], doc_all[order]
    keep = np.concatenate(
        ([True], (bk[1:] != bk[:-1]) | (doc[1:] != doc[:-1])))
    bk, doc = bk[keep], doc[keep]
    fam = fam_all[order][keep]
    n = len(bk)
    starts = np.flatnonzero(np.concatenate(([True], bk[1:] != bk[:-1])))
    sizes = np.diff(np.concatenate((starts, [n])))
    gid = np.repeat(np.arange(len(starts)), sizes)
    size_of_row = sizes[gid]
    small_rows = np.flatnonzero((size_of_row >= 2) & (size_of_row <= cap))
    a0, b0 = _expand_small_groups(doc, starts, sizes, small_rows, gid)
    # family of each emitted pair = family of its left row's group; the
    # expansion repeats rows in order, so recompute the repeat counts
    pos = np.arange(n) - starts[gid]
    cnt = (size_of_row - 1 - pos)[small_rows]
    f0 = np.repeat(fam[small_rows], cnt)
    a_parts, b_parts, f_parts = [a0], [b0], [f0]
    for g in np.flatnonzero(sizes > cap):  # hot groups are FEW
        s, m = starts[g], sizes[g]
        if fam[s] != 0:
            continue  # hot chunk group: boilerplate -> drop
        d = doc[s:s + m]  # sorted unique within group
        if m <= cap * salt_buckets:
            # hot band group: salted split (bounded pairs, connectivity)
            sa, sb = _salted_pairs(d, salt_buckets)
        else:  # extreme band group: connectivity chain only
            sa, sb = d[:-1], d[1:]
        a_parts.append(np.minimum(sa, sb))
        b_parts.append(np.maximum(sa, sb))
        f_parts.append(np.zeros(len(sa), dtype=np.int8))
    a = np.concatenate(a_parts); b = np.concatenate(b_parts)
    f = np.concatenate(f_parts)
    if len(a) == 0:
        e = np.empty(0, dtype=np.uint64)
        zi = np.empty(0, dtype=np.int32)
        return e, e, zi, zi
    ua, ub, (band_hits, chunk_hits) = _dedup_pairs_with_counts(
        a, b, (f == 0).astype(np.int32), (f == 1).astype(np.int32))
    return ua, ub, band_hits, chunk_hits


def _empty_mixed_pairs() -> pa.Table:
    return pa.table({"doc_a": pa.array([], pa.uint64()),
                     "doc_b": pa.array([], pa.uint64()),
                     "band_hits": pa.array([], pa.int32()),
                     "chunk_hits": pa.array([], pa.int32())})


def _sum_mixed_bucket(group: pa.Table, min_band: int,
                      min_chunk: int) -> pa.Table:
    return _sum_mixed_arrays(
        group["doc_a"].to_numpy(zero_copy_only=False),
        group["doc_b"].to_numpy(zero_copy_only=False),
        group["band_hits"].to_numpy(zero_copy_only=False),
        group["chunk_hits"].to_numpy(zero_copy_only=False),
        min_band, min_chunk)


def _sum_mixed_arrays(a: np.ndarray, b: np.ndarray, bh: np.ndarray,
                      ch: np.ndarray, min_band: int,
                      min_chunk: int) -> pa.Table:
    """Array core of ``_sum_mixed_bucket`` (shared with the fused task
    pipeline): co-located partial pairs -> summed/gated candidates."""
    if len(a) == 0:
        return _empty_pairs_summed()
    ua, ub, (band_sum, chunk_sum) = _dedup_pairs_with_counts(a, b, bh, ch)
    # saturate each family's sum at int16 max: the fused plan ships
    # SATURATING int16 partials, so without this clamp a pair whose
    # per-partition partial exceeds 32767 would sum differently under
    # the fused vs generic plans. With the clamp they are provably
    # identical: a partial only saturates when the true total already
    # exceeds 32767, and both plans then land exactly ON 32767. The
    # gate is unaffected (min_band/min_chunk are single digits).
    band_sum = np.minimum(band_sum, 32767)
    chunk_sum = np.minimum(chunk_sum, 32767)
    keep = (band_sum >= min_band) | (chunk_sum >= min_chunk)
    return pa.table({
        "doc_a": pa.array(ua[keep], type=pa.uint64()),
        "doc_b": pa.array(ub[keep], type=pa.uint64()),
        "n_band_hits": pa.array((band_sum + chunk_sum)[keep],
                                type=pa.int32()),
    })


def partial_mixed_pairs(band_rows_ds, chunk_rows_ds,
                        config: PipelineConfig,
                        num_buckets: int = _NUM_BUCKETS):
    """Band rows + chunk rows -> per-bucket PARTIAL pairs (doc_a, doc_b,
    band_hits, chunk_hits) in ONE shuffle — a pair may appear once per
    key bucket it collided in. Feed ``sum_mixed_pairs`` for the summed
    candidate surface, or ``verify.verify_from_partial`` to fuse the
    sum/gate into verification (two fewer barriers on the hot path)."""
    from lsh_ray.stages.exchange import colocate_map
    nb = np.uint64(num_buckets)

    def tag(family: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                "band_key": t["band_key"],
                "doc_id": t["doc_id"],
                "family": pa.array(
                    np.full(t.num_rows, family, dtype=np.int8)),
            })
        return f

    def add_band_bucket(t: pa.Table) -> pa.Table:
        bk = t["band_key"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((bk % nb).astype(np.int32)))

    rows = band_rows_ds.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True).union(
        chunk_rows_ds.map_batches(tag(1), batch_format="pyarrow",
                                  zero_copy_batch=True))
    return colocate_map(
        rows, ["band_key"], coalesce_blocks(config),
        lambda g: _pairs_for_mixed_bucket(g, config.group_size_cap,
                                          config.salt_buckets),
        sort_bucket_expr=add_band_bucket, mode=config.exchange)


def sum_mixed_pairs(partial_ds, config: PipelineConfig,
                    num_buckets: int = _NUM_BUCKETS):
    """Partial mixed pairs -> globally summed/gated candidate pairs."""
    from lsh_ray.stages.exchange import colocate_map
    nb = np.uint64(num_buckets)

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        key = hash_pair(t["doc_a"].to_numpy(zero_copy_only=False),
                        t["doc_b"].to_numpy(zero_copy_only=False))
        return t.append_column("bucket",
                               pa.array((key % nb).astype(np.int32)))

    return colocate_map(
        partial_ds, ["doc_a", "doc_b"], coalesce_blocks(config),
        lambda g: _sum_mixed_bucket(g, config.min_band_hits,
                                    config.chunk_min_hits),
        sort_bucket_expr=add_pair_bucket, mode=config.exchange)


def candidate_pairs_two_family(band_rows_ds, chunk_rows_ds,
                               config: PipelineConfig,
                               num_buckets: int = _NUM_BUCKETS):
    """Band rows + chunk rows -> candidate pairs in exactly TWO shuffles.

    Keep rule: band collisions >= min_band_hits OR chunk collisions >=
    chunk_min_hits (shared verbatim runs; one shared chunk is common-phrase
    noise). Hot groups: bands chain, chunks drop — see
    ``_pairs_for_mixed_bucket``.
    """
    return sum_mixed_pairs(
        partial_mixed_pairs(band_rows_ds, chunk_rows_ds, config,
                            num_buckets),
        config, num_buckets)


# ------------------- fused candidates pipeline (tasks-exchange mode) -------

def _sig_block_refs(sigs_mat):
    """Non-empty block refs of a materialized signatures dataset (blocks
    stay in the object store; only refs reach the driver)."""
    refs = []
    for bundle in sigs_mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            # num_rows None means UNKNOWN, not empty
            if meta.num_rows is None or meta.num_rows:
                refs.append(ref)
    return refs


def _partition_arrays(h: np.ndarray, W: int, arrays: tuple
                      ) -> list[tuple[np.ndarray, ...]]:
    """int64 partition ids in [0, W) -> W contiguous slice-tuples of the
    given arrays (one argsort; each slice is a contiguous view, which
    pickle-5 ships without copying the full base buffer)."""
    order = np.argsort(h, kind="stable")
    hs = h[order]
    bounds = np.searchsorted(hs, np.arange(W + 1, dtype=np.int64))
    moved = [a[order] for a in arrays]
    return [tuple(m[bounds[w]:bounds[w + 1]] for m in moved)
            for w in range(W)]


def candidate_pairs_from_signatures(sigs_mat, config: PipelineConfig,
                                    num_blocks: int | None = None):
    """MATERIALIZED signatures -> summed/gated candidate pairs
    (doc_a, doc_b, n_band_hits), picking the cheapest plan.

    FUSED plan (exchange mode "tasks", chunk keys on): a three-wave raw-
    task pipeline replacing the unfused ``band_rows + chunk_rows -> union
    -> exchange#1 -> exchange#2`` chain —

    - wave 1 (one task per pinned signature block, ``num_returns=W``):
      emits band keys (from the block's minhash column) AND chunk-key
      rows (pure explode of the stored ``chunk_keys``) and hash-
      partitions them by key IN THE TASK THAT ALREADY HOLDS THE BLOCK.
      The unfused plan reads every signature block twice (two map
      stages), materializes the 10x-corpus row table once, and pays a
      separate split wave with a full argsort+take copy — all three
      costs deleted (the r3 per-stage profile pinned the 8->32 scaling
      shortfall exactly here: candidates-exchange split/concat eff 0.35).
    - wave 2 (one task per key partition, ``num_returns=W``): concats
      its slices, runs the shared pair kernel
      (``_pairs_for_mixed_arrays``), and re-partitions the partial pairs
      by pair hash in the same task. Partial hit counts ship as
      SATURATING int16 (the downstream gate only needs ``>= min_hits``;
      sums resume in int32) — 24 -> 20 bytes/pair-row through the only
      remaining exchange.
    - wave 3 (one task per pair partition): concat + global dedup/sum/
      gate (``_sum_mixed_arrays``).

    Slices move as raw numpy tuples (pickle-5 zero-copy), not Arrow
    tables — no per-slice schema/metadata overhead at W x W scale.

    Output is IDENTICAL (up to row order) to
    ``candidate_pairs_two_family``: same key co-location, same kernels,
    same global pair grouping (asserted by tests).

    SCALE BOUND: (n_blocks + W) x W slice refs is the simple-shuffle
    quadratic; above ``_TASKS_MAX_SLICES`` — or under "sort"/"hash"
    exchange modes, or with chunk keys disabled — this falls back to the
    generic exchange plans, whose shuffles stream at any size.
    """
    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import _TASKS_MAX_SLICES, exchange_mode
    W = int(num_blocks or coalesce_blocks(config))
    refs = None
    if exchange_mode(config.exchange) == "tasks" and config.enable_chunk_keys:
        try:
            refs = _sig_block_refs(sigs_mat)
        except Exception:
            refs = None
        if refs is not None and (len(refs) + W) * W > _TASKS_MAX_SLICES:
            refs = None
    if refs is None:
        from lsh_ray.stages.banding import band_rows
        if config.enable_chunk_keys:
            from lsh_ray.stages.chunking import chunk_rows_from_signatures
            return candidate_pairs_two_family(
                band_rows(sigs_mat, config),
                chunk_rows_from_signatures(sigs_mat, config), config)
        return candidate_pairs(band_rows(sigs_mat, config), config,
                               hot_policy="chain")
    if not refs:
        import ray.data
        return ray.data.from_arrow([_empty_pairs_summed()])
    return _fused_mixed_pairs(refs, config, W)


@_lazy_remote
def _emit_split_task(tab: pa.Table, W: int, bands: int,
                     rows_per_band: int, num_perms: int):
    from lsh_ray.functions.hashing import splitmix64
    from lsh_ray.stages.banding import band_keys_from_minhash
    n = tab.num_rows
    doc_ids = tab["doc_id"].to_numpy(zero_copy_only=False)
    mh = (tab["minhash"].combine_chunks().values
          .to_numpy(zero_copy_only=False).reshape(n, num_perms))
    bkeys = band_keys_from_minhash(mh, bands, rows_per_band).reshape(-1)
    bdocs = np.repeat(doc_ids, bands)
    if "chunk_keys" in tab.column_names:
        ck = tab["chunk_keys"].combine_chunks()
        coffs = ck.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ckeys = ck.flatten().to_numpy(zero_copy_only=False).astype(
            np.uint64)
        cdocs = np.repeat(doc_ids, np.diff(coffs))
    else:
        ckeys = np.empty(0, dtype=np.uint64)
        cdocs = np.empty(0, dtype=doc_ids.dtype)
    keys = np.concatenate([bkeys, ckeys])
    docs = np.concatenate([bdocs, cdocs]).astype(np.uint64)
    fam = np.concatenate([np.zeros(len(bkeys), dtype=np.int8),
                          np.ones(len(ckeys), dtype=np.int8)])
    h = (splitmix64(keys) % np.uint64(W)).astype(np.int64)
    parts = _partition_arrays(h, W, (keys, docs, fam))
    return parts if W > 1 else parts[0]


@_lazy_remote
def _pairgen_split_task(W: int, cap: int, salt: int, *slices):
    keys = np.concatenate([s[0] for s in slices])
    docs = np.concatenate([s[1] for s in slices])
    fam = np.concatenate([s[2] for s in slices])
    ua, ub, bh, ch = _pairs_for_mixed_arrays(keys, docs, fam, cap, salt)
    bh16 = np.minimum(bh, 32767).astype(np.int16)
    ch16 = np.minimum(ch, 32767).astype(np.int16)
    h = (hash_pair(ua, ub) % np.uint64(W)).astype(np.int64)
    parts = _partition_arrays(h, W, (ua, ub, bh16, ch16))
    return parts if W > 1 else parts[0]


@_lazy_remote
def _sum_gate_task(min_band: int, min_chunk: int, *slices) -> pa.Table:
    a = np.concatenate([s[0] for s in slices])
    b = np.concatenate([s[1] for s in slices])
    bh = np.concatenate([s[2] for s in slices]).astype(np.int32)
    ch = np.concatenate([s[3] for s in slices]).astype(np.int32)
    return _sum_mixed_arrays(a, b, bh, ch, min_band, min_chunk)


def _fused_mixed_pairs(block_refs: list, config: PipelineConfig, W: int):
    import ray.data

    emit = _emit_split_task.options(num_returns=W)
    pairgen = _pairgen_split_task.options(num_returns=W)
    splits = [emit.remote(r, W, config.bands, config.rows_per_band,
                          config.num_perms)
              for r in block_refs]
    mb, mc = config.min_band_hits, config.chunk_min_hits
    cap, salt = config.group_size_cap, config.salt_buckets
    if W == 1:
        outs = [_sum_gate_task.remote(
            mb, mc, pairgen.remote(W, cap, salt, *splits))]
    else:
        mids = [pairgen.remote(W, cap, salt, *[s[w] for s in splits])
                for w in range(W)]
        outs = [_sum_gate_task.remote(mb, mc, *[m[w] for m in mids])
                for w in range(W)]
    return ray.data.from_arrow_refs(outs)


# ------------------------------------------------------------------ sided --
# Incremental-dedup pair kernel: candidate pairs restricted to those
# touching at least one NEW doc (side 0), against a BASE corpus (side 1)
# whose internal pairs a prior run already produced. Old x old pairs are
# never enumerated — in a key group of n_old + n_new members the kernel
# does O(n_new * (n_old + n_new)) pair work, not O((n_old + n_new)^2).


def _pairs_for_mixed_arrays_sided(bk_all: np.ndarray, doc_all: np.ndarray,
                                  fam_all: np.ndarray, side_all: np.ndarray,
                                  cap: int) -> tuple[np.ndarray, ...]:
    """Like ``_pairs_for_mixed_arrays`` but each row carries ``side``
    (0 = new doc, 1 = base doc) and only pairs with >= 1 new endpoint are
    emitted. Sorting new rows FIRST within each key group makes the
    restriction free: expanding only new left-rows with their following
    rows yields exactly new x new plus new x old (old rows only ever
    follow other old rows, so old x old never appears).

    Hot-group policy (> ``cap`` members): band groups emit a STAR from
    each new doc to the group's minimum member — bounded at n_new pairs
    and connecting new docs into the group's existing cluster (the full
    kernel's salted expansion is a connectivity heuristic too; the two
    runs' hot-group edges differ by construction and both are documented
    as such). Hot chunk groups drop, same as the full kernel.

    A doc_id present on BOTH sides (a delta re-submitting an existing
    document) would pair with itself; self-pairs are filtered.
    """
    if len(bk_all) == 0:
        e = np.empty(0, dtype=np.uint64)
        zi = np.empty(0, dtype=np.int32)
        return e, e, zi, zi
    order = np.lexsort((doc_all, side_all, bk_all))
    bk, doc = bk_all[order], doc_all[order]
    side = side_all[order]
    fam = fam_all[order]
    # duplicate (key, doc) rows are adjacent (a doc has ONE side, so the
    # side sort key cannot separate them)
    keep = np.concatenate(
        ([True], (bk[1:] != bk[:-1]) | (doc[1:] != doc[:-1])))
    bk, doc, side, fam = bk[keep], doc[keep], side[keep], fam[keep]
    n = len(bk)
    starts = np.flatnonzero(np.concatenate(([True], bk[1:] != bk[:-1])))
    sizes = np.diff(np.concatenate((starts, [n])))
    gid = np.repeat(np.arange(len(starts)), sizes)
    size_of_row = sizes[gid]
    small_rows = np.flatnonzero((size_of_row >= 2) & (size_of_row <= cap)
                                & (side == 0))
    a0, b0 = _expand_small_groups(doc, starts, sizes, small_rows, gid)
    pos = np.arange(n) - starts[gid]
    cnt = (size_of_row - 1 - pos)[small_rows]
    f0 = np.repeat(fam[small_rows], cnt)
    # docs are NOT globally ascending within a group (new-first breaks
    # it): orient explicitly
    a_parts = [np.minimum(a0, b0)]
    b_parts = [np.maximum(a0, b0)]
    f_parts = [f0]
    for g in np.flatnonzero(sizes > cap):  # hot groups are FEW
        s, m = starts[g], sizes[g]
        if fam[s] != 0:
            continue  # hot chunk group: boilerplate -> drop
        d = doc[s:s + m]
        nd = d[side[s:s + m] == 0]
        if len(nd) == 0:
            continue
        rep = d.min()
        sa = nd[nd != rep]
        if len(sa) == 0:
            continue
        a_parts.append(np.minimum(sa, rep))
        b_parts.append(np.maximum(sa, rep))
        f_parts.append(np.zeros(len(sa), dtype=np.int8))
    a = np.concatenate(a_parts)
    b = np.concatenate(b_parts)
    f = np.concatenate(f_parts)
    nz = a != b  # self-pairs from a doc_id present on both sides
    if not nz.all():
        a, b, f = a[nz], b[nz], f[nz]
    if len(a) == 0:
        e = np.empty(0, dtype=np.uint64)
        zi = np.empty(0, dtype=np.int32)
        return e, e, zi, zi
    ua, ub, (band_hits, chunk_hits) = _dedup_pairs_with_counts(
        a, b, (f == 0).astype(np.int32), (f == 1).astype(np.int32))
    return ua, ub, band_hits, chunk_hits


def _pairs_for_mixed_bucket_sided(group: pa.Table, cap: int) -> pa.Table:
    """Co-located (band_key, doc_id, family, side) rows -> partial
    new-touching pairs (same schema as ``_pairs_for_mixed_bucket``)."""
    if group.num_rows == 0:
        return _empty_mixed_pairs()
    ua, ub, band_hits, chunk_hits = _pairs_for_mixed_arrays_sided(
        group["band_key"].to_numpy(zero_copy_only=False),
        group["doc_id"].to_numpy(zero_copy_only=False),
        group["family"].to_numpy(zero_copy_only=False),
        group["side"].to_numpy(zero_copy_only=False),
        cap)
    return pa.table({
        "doc_a": pa.array(ua, type=pa.uint64()),
        "doc_b": pa.array(ub, type=pa.uint64()),
        "band_hits": pa.array(band_hits, type=pa.int32()),
        "chunk_hits": pa.array(chunk_hits, type=pa.int32()),
    })
