"""Verification stage: candidate pairs -> exact similarity measures.

Rebuild of the reference's verification kernels (``matching_algorithms.py``):

- exact Jaccard over shingle sets  (ref: ``matching_algorithms.py:55-72``,
  np.intersect1d/np.union1d; here computed on the already-materialized
  ``shingles`` column — the reference re-extracts windows on the fly,
  ``matching_algorithms.py:75-108``, which the rebuild avoids)
- SimHash Hamming distance          (popcount of XOR, vectorized)
- shingle containment |A∩B|/min     (gates the suffix-array substring pass —
  the rebuild analog of the alignment kernels RA/KTRA,
  ``matching_algorithms.py:238-316``)

The pair -> shingle-set lookup is a hash-partitioned join on ``doc_id``
(reference analog: positional candidate lookup ``lsh.py:462-463``, made
content-keyed). Threshold gating mirrors ``clip_false_candidates``
(``lsh.py:385-412``): pairs below every gate are dropped between stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsh_ray.config import PipelineConfig
from lsh_ray.stages.exchange import _lazy_remote


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                         axis=1).sum(axis=1)


def _dup_mask(sorted_keys: np.ndarray) -> np.ndarray:
    """True at positions whose key occurs more than once (input sorted)."""
    dup = np.zeros(len(sorted_keys), dtype=bool)
    if len(sorted_keys) > 1:
        eq = sorted_keys[1:] == sorted_keys[:-1]
        dup[1:] |= eq
        dup[:-1] |= eq
    return dup


def _segments_sorted(values: np.ndarray, offsets: np.ndarray) -> bool:
    """True iff every [offsets[i], offsets[i+1]) slice of ``values`` is
    strictly ascending (one vectorized pass, no per-segment loop)."""
    total = int(offsets[-1])
    if total <= 1:
        return True
    v = values[:total]
    desc = np.flatnonzero(v[1:] <= v[:-1]) + 1
    if len(desc) == 0:
        return True
    # a descent is only legal exactly at a segment start
    starts = offsets[1:-1]
    return bool(np.isin(desc, starts).all())


def jaccard_and_containment(
    values_a: np.ndarray, offsets_a: np.ndarray,
    values_b: np.ndarray, offsets_b: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-pair exact Jaccard + containment over shingle sets.

    Fast path (the pipeline case): each doc's shingle set is stored
    sorted-unique (lsh_ray.stages.shingle packs + sorts at creation) and
    values fit 32 bits, so ``(pair_idx << 32) | value`` is GLOBALLY
    ascending on each side — per-pair intersection of the whole batch is
    then ONE vectorized ``np.searchsorted`` of side A's packed keys into
    side B's plus a ``bincount`` (no sort at all; measured ~15x over the
    lexsort plan below, which was itself the fix for per-pair numpy call
    overhead). Inputs that are unsorted or wider than 32 bits (property
    tests, 64-bit shingle configs) take the general merge-sort path:
    tag values with their pair index, ``np.lexsort`` once per batch, and
    count adjacent duplicates.
    """
    n = len(offsets_a) - 1
    if n == 0:
        z = np.zeros(0, dtype=np.float32)
        return z, z
    la = np.diff(offsets_a).astype(np.int64)
    lb = np.diff(offsets_b).astype(np.int64)
    va = values_a[:offsets_a[-1]]
    vb = values_b[:offsets_b[-1]]
    pa_idx = np.repeat(np.arange(n, dtype=np.int64), la)
    pb_idx = np.repeat(np.arange(n, dtype=np.int64), lb)
    def _fits32(v: np.ndarray) -> bool:
        if v.dtype.kind != "u":
            return False
        return (v.dtype.itemsize <= 4 or v.size == 0
                or int(v.max()) < (1 << 32))

    packable = n < (1 << 31) and _fits32(va) and _fits32(vb)
    if (packable and _segments_sorted(va, offsets_a)
            and _segments_sorted(vb, offsets_b)):
        ka = pa_idx.astype(np.uint64)
        ka <<= np.uint64(32)
        ka |= va.astype(np.uint64)
        kb = pb_idx.astype(np.uint64)
        kb <<= np.uint64(32)
        kb |= vb.astype(np.uint64)
        if len(kb):
            idx = np.minimum(np.searchsorted(kb, ka), len(kb) - 1)
            hit = kb[idx] == ka
            inter = np.bincount(pa_idx[hit], minlength=n).astype(np.int64)
        else:
            inter = np.zeros(n, dtype=np.int64)
    else:
        pp = np.concatenate([pa_idx, pb_idx])
        pv = np.concatenate([va, vb])
        order = np.lexsort((pv, pp))
        pp_s = pp[order]
        pv_s = pv[order]
        dup = (pp_s[1:] == pp_s[:-1]) & (pv_s[1:] == pv_s[:-1])
        inter = np.bincount(pp_s[:-1][dup], minlength=n).astype(np.int64)
    union = la + lb - inter
    mn = np.minimum(la, lb)
    with np.errstate(divide="ignore", invalid="ignore"):
        jac = np.where(union > 0, inter / union, 0.0).astype(np.float32)
        cont = np.where(mn > 0, inter / mn, 0.0).astype(np.float32)
    return jac, cont


def _verify_batch(batch: pa.Table, config: PipelineConfig) -> pa.Table:
    n = batch.num_rows
    if n == 0:
        return batch.append_column(
            "jaccard", pa.array([], pa.float32())).append_column(
            "containment", pa.array([], pa.float32())).append_column(
            "hamming", pa.array([], pa.int32())).append_column(
            "is_dup", pa.array([], pa.bool_())).append_column(
            "is_substring_candidate", pa.array([], pa.bool_()))
    sh_a = batch["shingles_a"].combine_chunks()
    sh_b = batch["shingles_b"].combine_chunks()
    off_a = sh_a.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off_b = sh_b.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    va = sh_a.values.to_numpy(zero_copy_only=False)
    vb = sh_b.values.to_numpy(zero_copy_only=False)
    jac, cont = jaccard_and_containment(va, off_a - off_a[0],
                                        vb, off_b - off_b[0])
    ham = _popcount64(
        batch["simhash_a"].to_numpy(zero_copy_only=False)
        ^ batch["simhash_b"].to_numpy(zero_copy_only=False)).astype(np.int32)
    # gate in float64: numpy would otherwise cast the threshold DOWN to
    # float32 (0.7 -> 0.69999998...), admitting boundary pairs the
    # DuckDB oracle (REAL promoted to DOUBLE >= literal) excludes
    is_dup = jac.astype(np.float64) >= config.jaccard_threshold
    is_sub = (~is_dup) & (cont.astype(np.float64)
                          >= config.containment_threshold)
    out = pa.table({
        "doc_a": batch["doc_a"],
        "doc_b": batch["doc_b"],
        "n_band_hits": batch["n_band_hits"],
        "jaccard": pa.array(jac, type=pa.float32()),
        "containment": pa.array(cont, type=pa.float32()),
        "hamming": pa.array(ham, type=pa.int32()),
        "is_dup": pa.array(is_dup),
        "is_substring_candidate": pa.array(is_sub),
    })
    # clip_false_candidates analog: drop pairs that pass no gate
    return out.filter(pa.array(is_dup | is_sub))


_EMPTY_VERIFIED = pa.table({
    "doc_a": pa.array([], pa.uint64()),
    "doc_b": pa.array([], pa.uint64()),
    "n_band_hits": pa.array([], pa.int32()),
    "jaccard": pa.array([], pa.float32()),
    "containment": pa.array([], pa.float32()),
    "hamming": pa.array([], pa.int32()),
    "is_dup": pa.array([], pa.bool_()),
    "is_substring_candidate": pa.array([], pa.bool_()),
})


def _pair_verdicts(rows_a: pa.Table, rows_b: pa.Table,
                   cfg: PipelineConfig) -> tuple[np.ndarray, ...]:
    """Aligned rank-0/rank-1 rows (shingles, simhash) -> per-pair
    (jaccard, containment, hamming, is_dup, is_substring_candidate)."""
    sh_a = rows_a["shingles"].combine_chunks()
    sh_b = rows_b["shingles"].combine_chunks()
    off_a = sh_a.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off_b = sh_b.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    jac, cont = jaccard_and_containment(
        sh_a.values.to_numpy(zero_copy_only=False), off_a - off_a[0],
        sh_b.values.to_numpy(zero_copy_only=False), off_b - off_b[0])
    ham = _popcount64(
        rows_a["simhash"].to_numpy(zero_copy_only=False)
        ^ rows_b["simhash"].to_numpy(zero_copy_only=False)
    ).astype(np.int32)
    # float64 gate — same oracle-parity reasoning as _verify_batch
    is_dup = jac.astype(np.float64) >= cfg.jaccard_threshold
    is_sub = (~is_dup) & (cont.astype(np.float64)
                          >= cfg.containment_threshold)
    return jac, cont, ham, is_dup, is_sub


def _complete_pair_indices(pid: np.ndarray, rank: np.ndarray
                           ) -> tuple[np.ndarray, np.ndarray]:
    """Row indices (idx_a, idx_b) of pids with exactly one rank-0 and one
    rank-1 row — computed on the UNSORTED table so callers take each
    surviving row once (no intermediate whole-table sort copy; the
    shingle payload dominates bucket bytes)."""
    order = np.lexsort((rank, pid))
    pid_s = pid[order]
    starts = np.flatnonzero(np.concatenate(([True], pid_s[1:] != pid_s[:-1])))
    counts = np.diff(np.concatenate((starts, [len(pid_s)])))
    good = counts == 2
    return order[starts[good]], order[starts[good] + 1]


def _finalize_pair_bucket(g: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Shuffle-#2 reduce: regroup the two endpoint rows of each pair id
    and run the verification kernel (shared by ``verify`` and
    ``verify_from_partial``)."""
    idx_a, idx_b = _complete_pair_indices(
        g["pid"].to_numpy(zero_copy_only=False),
        g["rank"].to_numpy(zero_copy_only=False))
    if len(idx_a) == 0:
        return _EMPTY_VERIFIED
    rows_a = g.take(pa.array(idx_a, type=pa.int64()))
    rows_b = g.take(pa.array(idx_b, type=pa.int64()))
    jac, cont, ham, is_dup, is_sub = _pair_verdicts(rows_a, rows_b, cfg)
    out = pa.table({
        "doc_a": rows_a["doc_a"],
        "doc_b": rows_a["doc_b"],
        "n_band_hits": rows_a["n_band_hits"],
        "jaccard": pa.array(jac, type=pa.float32()),
        "containment": pa.array(cont, type=pa.float32()),
        "hamming": pa.array(ham, type=pa.int32()),
        "is_dup": pa.array(is_dup),
        "is_substring_candidate": pa.array(is_sub),
    })
    return out.filter(pa.array(is_dup | is_sub))


def attach_signatures(pairs_ds, signatures_ds, config: PipelineConfig,
                      columns=("shingles", "simhash")):
    """Hash-join pair endpoints to their signature rows (doc_a then doc_b).

    Uses the bucketed partitioned join (lsh_ray.stages.join) because the
    payload carries list<uint64> shingle sets, which Acero-based
    ``Dataset.join`` cannot ship as non-key columns.
    """
    from lsh_ray.stages.join import bucket_join
    cols = list(columns)
    joined = bucket_join(pairs_ds, signatures_ds, "doc_a", "doc_id",
                         cols, suffix="_a")
    return bucket_join(joined, signatures_ds, "doc_b", "doc_id",
                       cols, suffix="_b")


def verify_via_joins(pairs_ds, signatures_ds, config: PipelineConfig):
    """cand_pairs + signatures -> verified pairs (two sequential joins)."""
    joined = attach_signatures(pairs_ds, signatures_ds, config)
    return joined.map_batches(lambda t: _verify_batch(t, config),
                              batch_format="pyarrow", zero_copy_batch=True)


def verify_exchange(pairs_ds, signatures_ds, config: PipelineConfig):
    """cand_pairs + signatures -> verified pairs, in TWO shuffles total.

    The endpoint pattern: each pair emits two rows (keyed by doc_a and by
    doc_b); shuffle #1 co-locates them with the signature table by doc
    bucket and attaches that endpoint's shingles/simhash; shuffle #2
    regroups the two endpoint rows by pair id and runs the verification
    kernel in the same group function. Halves the all-to-all barrier count
    of the naive join-twice plan (each barrier costs fixed wall time on
    top of bytes moved).
    """
    from lsh_ray.config import coalesce_blocks
    from lsh_ray.functions.hashing import hash_pair
    nb = max(config.join_num_partitions, coalesce_blocks(config))
    # fine-grained group key: the sort shuffle range-partitions on sampled
    # key values, so the bucket space must be much larger than the
    # partition count or partitions collapse onto stragglers
    nbu = np.uint64(1024)
    shingle_type = pa.list_(
        pa.uint64() if config.shingle_hash_bits == 64 else pa.uint32())

    def pair_endpoints(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        h = t["n_band_hits"].to_numpy(zero_copy_only=False)
        pid = hash_pair(a, b)
        n = len(a)
        key = np.concatenate([a, b])
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "pid": pa.array(np.tile(pid, 2), type=pa.uint64()),
            "doc_a": pa.array(np.tile(a, 2), type=pa.uint64()),
            "doc_b": pa.array(np.tile(b, 2), type=pa.uint64()),
            "n_band_hits": pa.array(np.tile(h, 2).astype(np.int32)),
            "rank": pa.array(
                np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])),
            "shingles": pa.nulls(2 * n, shingle_type),
            "simhash": pa.nulls(2 * n, pa.uint64()),
            "side": pa.array(np.zeros(2 * n, dtype=np.int8)),
            "bucket": pa.array((key % nbu).astype(np.int32)),
        })

    def prep_sigs(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False)
        n = len(k)
        z = np.zeros(n, dtype=np.uint64)
        return pa.table({
            "key": pa.array(k, type=pa.uint64()),
            "pid": pa.array(z, type=pa.uint64()),
            "doc_a": pa.array(z, type=pa.uint64()),
            "doc_b": pa.array(z, type=pa.uint64()),
            "n_band_hits": pa.array(np.zeros(n, dtype=np.int32)),
            "rank": pa.array(np.full(n, -1, dtype=np.int8)),
            "shingles": t["shingles"].cast(shingle_type),
            "simhash": t["simhash"],
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "bucket": pa.array((k % nbu).astype(np.int32)),
        })

    def attach_bucket(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        eps = g.filter(pa.array(side == 0))
        sigs = g.filter(pa.array(side == 1))
        rk = sigs["key"].to_numpy(zero_copy_only=False)
        order = np.argsort(rk)
        rks = rk[order]
        lk = eps["key"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(rks, lk)
        idx[idx == len(rks)] = max(len(rks) - 1, 0)
        if len(rks):
            # a doc_id present in MULTIPLE signature rows (duplicate
            # urls hashing to one id) has no well-defined endpoint row:
            # drop its pairs instead of attaching an arbitrary row —
            # the same policy as verify_blockpairs, so the plans stay
            # output-identical
            hit = (rks[idx] == lk) & ~_dup_mask(rks)[idx]
        else:
            hit = np.zeros(len(lk), bool)
        eps_hit = eps.filter(pa.array(hit))
        taken = sigs.take(pa.array(order[idx[hit]], type=pa.int64()))
        return pa.table({
            "pid": eps_hit["pid"],
            "doc_a": eps_hit["doc_a"],
            "doc_b": eps_hit["doc_b"],
            "n_band_hits": eps_hit["n_band_hits"],
            "rank": eps_hit["rank"],
            "shingles": taken["shingles"],
            "simhash": taken["simhash"],
            "bucket": pa.array(
                (eps_hit["pid"].to_numpy(zero_copy_only=False)
                 % nbu).astype(np.int32)),
        })

    from lsh_ray.stages.exchange import colocate_map
    eps = pairs_ds.map_batches(pair_endpoints, batch_format="pyarrow",
                               zero_copy_batch=True)
    sig_side = signatures_ds.select_columns(
        ["doc_id", "shingles", "simhash"]).map_batches(
        prep_sigs, batch_format="pyarrow", zero_copy_batch=True)
    # exchange #1 co-locates by endpoint doc id, #2 by pair id; the
    # ``bucket`` column is only consumed by the sort fallback plan
    attached = colocate_map(eps.union(sig_side), ["key"], nb,
                            attach_bucket, mode=config.exchange)
    return colocate_map(attached, ["pid"], nb,
                        lambda g: _finalize_pair_bucket(g, config),
                        mode=config.exchange)


_VERIFY_COLS = ["shingles", "simhash"]


@_lazy_remote
def _locate_task(tab: pa.Table, pr: np.ndarray):
    d = tab["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    idx = np.minimum(np.searchsorted(pr, d), len(pr) - 1)
    hit = pr[idx] == d
    return idx[hit].astype(np.int64), np.flatnonzero(hit)


@_lazy_remote
def _verify_cell_task(cfg, arow_t, brow_t, bcnt, da, db, hh,
                      a_tab: pa.Table, *b_tabs: pa.Table) -> pa.Table:
    rows_a = a_tab.select(_VERIFY_COLS).take(
        pa.array(arow_t, type=pa.int64()))
    off = np.concatenate(([0], np.cumsum(bcnt)))
    parts = [b_tabs[j].select(_VERIFY_COLS).take(
                pa.array(brow_t[off[j]:off[j + 1]], type=pa.int64()))
             for j in range(len(b_tabs)) if bcnt[j]]
    rows_b = pa.concat_tables(parts).combine_chunks()
    jac, cont, ham, is_dup, is_sub = _pair_verdicts(rows_a, rows_b, cfg)
    out = pa.table({
        "doc_a": pa.array(da, type=pa.uint64()),
        "doc_b": pa.array(db, type=pa.uint64()),
        "n_band_hits": pa.array(hh, type=pa.int32()),
        "jaccard": pa.array(jac, type=pa.float32()),
        "containment": pa.array(cont, type=pa.float32()),
        "hamming": pa.array(ham, type=pa.int32()),
        "is_dup": pa.array(is_dup),
        "is_substring_candidate": pa.array(is_sub),
    })
    return out.filter(pa.array(is_dup | is_sub))


def _pairs_to_numpy(pairs_ds):
    """Pull the (tiny, fixed-width) candidate pair table to the driver as
    (doc_a, doc_b, n_band_hits) numpy arrays; None when empty. Shared by
    the driver-side verify plans (broadcast, blockpairs)."""
    pairs = pairs_ds.materialize()
    a_parts, b_parts, h_parts = [], [], []
    for b in pairs.iter_batches(batch_size=262144, batch_format="pyarrow"):
        a_parts.append(b["doc_a"].to_numpy(zero_copy_only=False))
        b_parts.append(b["doc_b"].to_numpy(zero_copy_only=False))
        h_parts.append(b["n_band_hits"].to_numpy(zero_copy_only=False))
    if not a_parts:
        return None
    return (np.concatenate(a_parts).astype(np.uint64),
            np.concatenate(b_parts).astype(np.uint64),
            np.concatenate(h_parts).astype(np.int32))


def verify_broadcast(pairs_ds, signatures_ds, config: PipelineConfig):
    """cand_pairs + signatures -> verified pairs, in ONE shuffle.

    The candidate pair table is orders of magnitude smaller than the
    signature table (three fixed-width columns vs ~1k shingles/doc — 8.7
    MB vs 2.5 GB measured at 500k docs), so instead of shuffling the
    WHOLE signature payload into doc buckets to meet the pair endpoints
    (exchange #1 of ``verify_exchange``), broadcast the pair list once
    (``ray.put``), select participating endpoint rows map-side over the
    already-materialized signature blocks (zero shuffle — and a built-in
    semi-join: the 35% of docs in no pair never leave their block), and
    pay ONE exchange keyed by pair id to co-locate the two endpoints.
    Halves the all-to-all byte volume AND removes one barrier; measured
    on the flat, bandwidth-bound verify stage this is the difference
    between the stage scaling and not.

    SCALE BOUND: driver + broadcast memory is O(n_pairs) — callers gate
    on ``config.verify_broadcast_max_pairs`` (default 4M pairs ≈ 100 MB
    broadcast) and fall back to ``verify_exchange``, whose volume is
    O(corpus) per exchange but driver-memory-free. At 10^12 docs the
    pair table exceeds any broadcast; the exchange plan is the scale
    path, this is the (very common) small-candidate-set fast path.
    """
    import ray

    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import colocate_map

    shingle_type = pa.list_(
        pa.uint64() if config.shingle_hash_bits == 64 else pa.uint32())
    nb = max(config.join_num_partitions, coalesce_blocks(config))

    pulled = _pairs_to_numpy(pairs_ds)
    if pulled is None:
        return ray.data.from_arrow([_EMPTY_VERIFIED])
    doc_a, doc_b, hits = pulled
    n = len(doc_a)
    # endpoint lookup table: sorted doc id -> (pair index, rank)
    ep_doc = np.concatenate([doc_a, doc_b])
    ep_pidx = np.tile(np.arange(n, dtype=np.int64), 2)
    ep_rank = np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
    order = np.argsort(ep_doc, kind="stable")
    lookup_ref = ray.put((ep_doc[order], ep_pidx[order], ep_rank[order]))
    pairs_ref = ray.put((doc_a, doc_b, hits))

    empty_emit = pa.table({
        "pid": pa.array([], pa.int64()),
        "rank": pa.array([], pa.int8()),
        "shingles": pa.array([], shingle_type),
        "simhash": pa.array([], pa.uint64()),
    })

    def emit_endpoints(t: pa.Table) -> pa.Table:
        sd, pidx, rnk = ray.get(lookup_ref)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(sd, d, side="left")
        hi = np.searchsorted(sd, d, side="right")
        cnt = (hi - lo).astype(np.int64)
        total = int(cnt.sum())
        if total == 0:
            return empty_emit
        rep = np.repeat(np.arange(len(d), dtype=np.int64), cnt)
        base = np.concatenate(([0], np.cumsum(cnt)))[:-1]
        pos = lo.repeat(cnt) + (np.arange(total) - base.repeat(cnt))
        take = pa.array(rep, type=pa.int64())
        import pyarrow.compute as pc
        return pa.table({
            "pid": pa.array(pidx[pos], type=pa.int64()),
            "rank": pa.array(rnk[pos], type=pa.int8()),
            "shingles": pc.take(t["shingles"].cast(shingle_type), take),
            "simhash": pc.take(t["simhash"], take),
        })

    def finalize(g: pa.Table) -> pa.Table:
        pid = g["pid"].to_numpy(zero_copy_only=False)
        idx_a, idx_b = _complete_pair_indices(
            pid, g["rank"].to_numpy(zero_copy_only=False))
        if len(idx_a) == 0:
            return _EMPTY_VERIFIED
        rows_a = g.take(pa.array(idx_a, type=pa.int64()))
        rows_b = g.take(pa.array(idx_b, type=pa.int64()))
        jac, cont, ham, is_dup, is_sub = _pair_verdicts(rows_a, rows_b,
                                                        config)
        da, db, hh = ray.get(pairs_ref)
        sel = pid[idx_a]
        out = pa.table({
            "doc_a": pa.array(da[sel], type=pa.uint64()),
            "doc_b": pa.array(db[sel], type=pa.uint64()),
            "n_band_hits": pa.array(hh[sel], type=pa.int32()),
            "jaccard": pa.array(jac, type=pa.float32()),
            "containment": pa.array(cont, type=pa.float32()),
            "hamming": pa.array(ham, type=pa.int32()),
            "is_dup": pa.array(is_dup),
            "is_substring_candidate": pa.array(is_sub),
        })
        return out.filter(pa.array(is_dup | is_sub))

    def add_bucket(t: pa.Table) -> pa.Table:
        # only for the sort-fallback plan, which groups on a coarse
        # bucket column (fine key space >> partition count, see verify)
        p = t["pid"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((p % 1024).astype(np.int32)))

    endpoints = signatures_ds.select_columns(
        ["doc_id", "shingles", "simhash"]).map_batches(
        emit_endpoints, batch_format="pyarrow", zero_copy_batch=True)
    return colocate_map(endpoints, ["pid"], nb, finalize,
                        sort_bucket_expr=add_bucket, mode=config.exchange)


def verify_blockpairs(pairs_ds, signatures_ds, config: PipelineConfig):
    """cand_pairs + materialized signatures -> verified pairs with ZERO
    shingle-payload movement.

    The signature table is already pinned in object-store blocks at the
    verify boundary (it is a DAG fork — run_dedup materializes or
    checkpoints it). Every prior plan re-ships the shingle payload at
    least once: ``verify_exchange`` exchanges the whole corpus payload
    twice, ``verify_broadcast`` scans the full table and exchanges one
    duplicated copy per pair endpoint (~2 x n_pairs x set_bytes through
    split + reduce). But co-location is already solved: each doc's row
    sits in a known block. So:

    wave 1 (locate): one task per signature block reads ONLY its
      ``doc_id`` column (zero-copy plasma view; shingle pages untouched)
      and reports which participating docs it holds at which row.
    wave 2 (verify): pairs are grouped by the a-side block; one task per
      (block, chunk) gathers its endpoint rows with two column-pruned
      ``take``s — b-side rows pre-sorted by source block so the per-block
      gathers concat already aligned — and runs the verification kernel.

    No exchange, no payload duplication in the object store, no reduce
    concat: the only shingle bytes copied are the 2 x n_pairs gathered
    rows the kernel itself needs. Docs in no pair are never touched
    (built-in semi-join, like the broadcast plan).

    SCALE BOUND: driver memory is O(n_pairs + n_participating_docs) and,
    multi-node, a signature block is fetched by every node that verifies
    one of its docs' pairs — worst case full-table replication per node
    (vs the exchange plan's once-per-byte movement). Callers gate on
    ``config.verify_broadcast_max_pairs`` exactly like the broadcast
    plan; above it ``verify_exchange`` is the 10^12-doc path.
    """
    import ray

    pulled = _pairs_to_numpy(pairs_ds)
    if pulled is None:
        return ray.data.from_arrow([_EMPTY_VERIFIED])
    doc_a, doc_b, hits = pulled

    mat = signatures_ds.materialize()
    block_refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            # num_rows None means UNKNOWN, not empty — dropping such a
            # block would silently lose every pair touching its docs
            if meta.num_rows is None or meta.num_rows:
                block_refs.append(ref)
    if not block_refs:
        return ray.data.from_arrow([_EMPTY_VERIFIED])

    part = np.unique(np.concatenate([doc_a, doc_b]))
    part_ref = ray.put(part)

    locs = ray.get([_locate_task.remote(r, part_ref) for r in block_refs])
    part_blk = np.full(len(part), -1, dtype=np.int64)
    part_row = np.full(len(part), -1, dtype=np.int64)
    part_cnt = np.zeros(len(part), dtype=np.int64)
    for bi, (pidx, rows) in enumerate(locs):
        part_blk[pidx] = bi
        part_row[pidx] = rows
        np.add.at(part_cnt, pidx, 1)

    ia = np.searchsorted(part, doc_a)
    ib = np.searchsorted(part, doc_b)
    # endpoints resolving to MULTIPLE signature rows (a doc_id appearing
    # twice — e.g. duplicate urls hashing to one id) are dropped, matching
    # verify_exchange's complete-pair regroup (which keeps only pids with
    # exactly one rank-0 and one rank-1 row) — the plans stay identical
    # by construction instead of blockpairs verifying an arbitrary row
    ok = ((part_blk[ia] >= 0) & (part_blk[ib] >= 0)
          & (part_cnt[ia] == 1) & (part_cnt[ib] == 1))
    if not ok.all():
        ia, ib = ia[ok], ib[ok]
        doc_a, doc_b, hits = doc_a[ok], doc_b[ok], hits[ok]
    if len(doc_a) == 0:
        return ray.data.from_arrow([_EMPTY_VERIFIED])
    ablk, arow = part_blk[ia], part_row[ia]
    bblk, brow = part_blk[ib], part_row[ib]

    # group pairs by (a-block, then b-block): one take per source block
    # per task, pre-aligned so the b-side concat needs no reorder; chunk
    # large groups for load balance
    order = np.lexsort((bblk, ablk))
    n = len(order)
    from lsh_ray.stages.exchange import _cluster_cpus
    chunk = max(4096, -(-n // max(4 * _cluster_cpus(), len(block_refs))))
    outs = []
    a_sorted = ablk[order]
    starts = np.flatnonzero(
        np.concatenate(([True], a_sorted[1:] != a_sorted[:-1])))
    bounds = np.concatenate((starts, [n]))
    for gi in range(len(starts)):
        blk_a = int(a_sorted[starts[gi]])
        for lo in range(bounds[gi], bounds[gi + 1], chunk):
            sel = order[lo:min(lo + chunk, bounds[gi + 1])]
            need = np.unique(bblk[sel])
            local = np.searchsorted(need, bblk[sel])
            bcnt = np.bincount(local, minlength=len(need)).astype(np.int64)
            outs.append(_verify_cell_task.remote(
                config, arow[sel], brow[sel], bcnt, doc_a[sel],
                doc_b[sel], hits[sel], block_refs[blk_a],
                *[block_refs[int(j)] for j in need]))
    return ray.data.from_arrow_refs(outs)


def verify(pairs_ds, signatures_ds, config: PipelineConfig):
    """Plan dispatcher: block-pair gather (zero payload shuffle — the
    signature table is already materialized in blocks at this boundary)
    while the pair table fits the driver, else the two-exchange endpoint
    plan whose volume is O(corpus) but driver-memory-free. Identical
    output by construction — every plan runs the same ``_pair_verdicts``
    kernel on the same complete-pair groups (asserted by tests across
    all plans), and every plan DROPS pairs whose endpoint doc_id resolves
    to multiple signature rows (duplicate urls hashing to one id have no
    well-defined endpoint row)."""
    pairs = pairs_ds.materialize()
    if pairs.count() <= config.verify_broadcast_max_pairs:
        return verify_blockpairs(pairs, signatures_ds, config)
    return verify_exchange(pairs, signatures_ds, config)


def verify_from_partial(partial_pairs_ds, signatures_ds,
                        config: PipelineConfig):
    """UNSUMMED candidate pairs + signatures -> verified pairs, fusing the
    candidate pair-sum INTO verification — two shuffles for both jobs.

    ``partial_pairs_ds`` is the first candidate shuffle's output
    (doc_a, doc_b, band_hits, chunk_hits) with a pair possibly appearing
    once per band/chunk bucket it collided in. The unfused plan pays a
    dedicated repartition+sort to dedup/sum/gate those pairs
    (``sum_pairs``) BEFORE verify's own two shuffles; here every copy of
    a pair's rank-r endpoint row lands in the same doc bucket of verify's
    shuffle #1 anyway (it is keyed by that endpoint's doc_id), so the
    attach step dedups, sums the per-family hits, and applies the
    min-hits gate in place — identical output (verified at 200k docs),
    two fewer all-to-all barriers.

    WHEN TO USE: only when the candidate gates are UNSELECTIVE. With the
    bigram chunk keys (single shared phrases emit no candidate at all)
    and the band/chunk min-hits gates, the unfused plan's small dedicated
    sum shuffle prunes pre-gate pairs BEFORE any signature payload moves
    and wins (measured ~2x at 200k docs under the old single-chunk
    scheme, where the gate carried the whole noise mass). run_dedup
    therefore uses the unfused plan; this path exists for gate-light
    configs.
    """
    from lsh_ray.config import coalesce_blocks
    from lsh_ray.functions.hashing import hash_pair
    nb = max(config.join_num_partitions, coalesce_blocks(config))
    nbu = np.uint64(1024)
    shingle_type = pa.list_(
        pa.uint64() if config.shingle_hash_bits == 64 else pa.uint32())
    min_band = config.min_band_hits
    min_chunk = config.chunk_min_hits

    def pair_endpoints(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        bh = t["band_hits"].to_numpy(zero_copy_only=False)
        ch = t["chunk_hits"].to_numpy(zero_copy_only=False)
        pid = hash_pair(a, b)
        n = len(a)
        key = np.concatenate([a, b])
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "pid": pa.array(np.tile(pid, 2), type=pa.uint64()),
            "doc_a": pa.array(np.tile(a, 2), type=pa.uint64()),
            "doc_b": pa.array(np.tile(b, 2), type=pa.uint64()),
            "band_hits": pa.array(np.tile(bh, 2).astype(np.int32)),
            "chunk_hits": pa.array(np.tile(ch, 2).astype(np.int32)),
            "rank": pa.array(
                np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])),
            "shingles": pa.nulls(2 * n, shingle_type),
            "simhash": pa.nulls(2 * n, pa.uint64()),
            "side": pa.array(np.zeros(2 * n, dtype=np.int8)),
            "bucket": pa.array((key % nbu).astype(np.int32)),
        })

    def prep_sigs(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False)
        n = len(k)
        z = np.zeros(n, dtype=np.uint64)
        zi = np.zeros(n, dtype=np.int32)
        return pa.table({
            "key": pa.array(k, type=pa.uint64()),
            "pid": pa.array(z, type=pa.uint64()),
            "doc_a": pa.array(z, type=pa.uint64()),
            "doc_b": pa.array(z, type=pa.uint64()),
            "band_hits": pa.array(zi),
            "chunk_hits": pa.array(zi),
            "rank": pa.array(np.full(n, -1, dtype=np.int8)),
            "shingles": t["shingles"].cast(shingle_type),
            "simhash": t["simhash"],
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "bucket": pa.array((k % nbu).astype(np.int32)),
        })

    def attach_bucket(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        eps = g.filter(pa.array(side == 0))
        sigs = g.filter(pa.array(side == 1))
        if eps.num_rows == 0:  # sigs-only bucket: nothing to attach
            return pa.table({
                "pid": pa.array([], pa.uint64()),
                "doc_a": pa.array([], pa.uint64()),
                "doc_b": pa.array([], pa.uint64()),
                "n_band_hits": pa.array([], pa.int32()),
                "rank": pa.array([], pa.int8()),
                "shingles": pa.array([], shingle_type),
                "simhash": pa.array([], pa.uint64()),
                "bucket": pa.array([], pa.int32()),
            })
        # dedup duplicated (pid, rank) endpoint rows; sum per-family hits;
        # apply the candidate gate — this replaces the whole sum_pairs
        # shuffle of the unfused plan
        pid = eps["pid"].to_numpy(zero_copy_only=False)
        rank = eps["rank"].to_numpy(zero_copy_only=False)
        order = np.lexsort((rank, pid))
        pid_s, rank_s = pid[order], rank[order]
        new = np.concatenate(
            ([True], (pid_s[1:] != pid_s[:-1]) | (rank_s[1:] != rank_s[:-1])))
        grp = np.cumsum(new) - 1
        bh = np.bincount(
            grp, weights=eps["band_hits"].to_numpy(
                zero_copy_only=False)[order]).astype(np.int32)
        ch = np.bincount(
            grp, weights=eps["chunk_hits"].to_numpy(
                zero_copy_only=False)[order]).astype(np.int32)
        # same int16-max saturation as _sum_mixed_arrays so every sum
        # site surfaces identical n_band_hits regardless of plan
        bh = np.minimum(bh, 32767)
        ch = np.minimum(ch, 32767)
        keep_grp = (bh >= min_band) | (ch >= min_chunk)
        first = np.flatnonzero(new)
        sel = first[keep_grp]
        eps_u = eps.take(pa.array(order[sel], type=pa.int64()))
        hits_u = (bh + ch)[keep_grp]
        rk = sigs["key"].to_numpy(zero_copy_only=False)
        s_order = np.argsort(rk)
        rks = rk[s_order]
        lk = eps_u["key"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(rks, lk)
        idx[idx == len(rks)] = max(len(rks) - 1, 0)
        if len(rks):
            # multi-row doc_ids have no well-defined endpoint row: drop
            # (same policy as every other verify plan)
            hit = (rks[idx] == lk) & ~_dup_mask(rks)[idx]
        else:
            hit = np.zeros(len(lk), bool)
        eps_hit = eps_u.filter(pa.array(hit))
        taken = sigs.take(pa.array(s_order[idx[hit]], type=pa.int64()))
        return pa.table({
            "pid": eps_hit["pid"],
            "doc_a": eps_hit["doc_a"],
            "doc_b": eps_hit["doc_b"],
            "n_band_hits": pa.array(hits_u[hit], type=pa.int32()),
            "rank": eps_hit["rank"],
            "shingles": taken["shingles"],
            "simhash": taken["simhash"],
            "bucket": pa.array(
                (eps_hit["pid"].to_numpy(zero_copy_only=False)
                 % nbu).astype(np.int32)),
        })

    from lsh_ray.stages.exchange import colocate_map
    eps = partial_pairs_ds.map_batches(pair_endpoints,
                                       batch_format="pyarrow",
                                       zero_copy_batch=True)
    sig_side = signatures_ds.select_columns(
        ["doc_id", "shingles", "simhash"]).map_batches(
        prep_sigs, batch_format="pyarrow", zero_copy_batch=True)
    attached = colocate_map(eps.union(sig_side), ["key"], nb,
                            attach_bucket, mode=config.exchange)
    return colocate_map(attached, ["pid"], nb,
                        lambda g: _finalize_pair_bucket(g, config),
                        mode=config.exchange)
