"""Deterministic hash-based sampling and split assignment.

Corpus-curation operators a training-data pipeline needs at 100 TB:
reproducible train/val/test splits and fixed-rate subsamples that are
pure functions of a stable key — no RNG state, no coordination, no
shuffle. Every worker computes the same answer for the same row, so the
operator is embarrassingly parallel (one `map_batches` pass over a
single projected column) and re-runs / resumed runs assign identically.

The hash is md5 of the DECIMAL STRING of the key (not the raw int64
bytes) so a DuckDB oracle can recompute it exactly:
``md5(CAST(doc_id AS VARCHAR))``. Bucketing compares the first two hex
chars lexicographically — 256 equal buckets, exact in both engines with
no hex→int conversion (reference analog: the seeded permutation
reproducibility contract, ``lsh.py`` signature seeds).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# first-two-hex-chars thresholds: 256 buckets, lexicographic compare.
# 'cc' = 204/256 = 79.7% train; 'e6' = 230/256 → 10.2% val; rest test.
SPLIT_THRESHOLDS = (("train", "cc"), ("val", "e6"), ("test", None))


def _key_buckets(keys) -> np.ndarray:
    """int64 keys -> first-two-hex-chars of md5(str(key)), as '<U2'."""
    # md5 is per-row in Python by nature; everything around it stays
    # vectorized and the per-batch cost is bounded by batch size
    return np.array([hashlib.md5(str(k).encode()).hexdigest()[:2]
                     for k in keys], dtype="<U2")


def assign_split_batch(batch: pa.Table,
                       key_col: str = "doc_id") -> pa.Table:
    """(key) -> (key, split) with deterministic md5-bucket assignment."""
    b = _key_buckets(batch[key_col].to_pylist())
    split = np.where(b < SPLIT_THRESHOLDS[0][1], SPLIT_THRESHOLDS[0][0],
                     np.where(b < SPLIT_THRESHOLDS[1][1],
                              SPLIT_THRESHOLDS[1][0],
                              SPLIT_THRESHOLDS[2][0]))
    return pa.table({key_col: batch[key_col],
                     "split": pa.array(split.tolist(), type=pa.string())})


def assign_split(ds, key_col: str = "doc_id"):
    """Dataset -> (key, split): reproducible train/val/test assignment."""
    return ds.select_columns([key_col]).map_batches(
        assign_split_batch, batch_format="pyarrow",
        fn_kwargs={"key_col": key_col})


def hash_sample(ds, rate_bucket_hex: str, key_col: str = "doc_id",
                complement: bool = False):
    """Keep rows whose md5 bucket < ``rate_bucket_hex`` (two hex chars).

    A deterministic subsample: '0d' keeps 13/256 ≈ 5.1%, '80' keeps
    exactly 50%. Same key ⇒ same decision on every run and every node.
    ``complement=True`` keeps the OTHER side (bucket >= hex) — the two
    calls partition the input exactly (held-out benchmark vs corpus).
    """
    if len(rate_bucket_hex) != 2:
        raise ValueError("rate_bucket_hex must be two hex chars "
                         "(e.g. '0d' ~ 5%)")

    def _filter(batch: pa.Table) -> pa.Table:
        b = _key_buckets(batch[key_col].to_pylist())
        keep = b >= rate_bucket_hex if complement else b < rate_bucket_hex
        return batch.filter(pa.array(keep))

    return ds.map_batches(_filter, batch_format="pyarrow")


def stratified_sample(ds, stratum_col: str = "lang", k: int = 5,
                      key_col: str = "doc_id"):
    """Deterministic per-stratum quota sample: the ``k`` rows with the
    smallest (md5(key), key) within each stratum — the training-data
    mixing primitive (fixed per-language/per-domain quotas) in a form
    every node reproduces bit-identically.

    Two-phase plan: each batch keeps at most k rows per stratum (local
    hash-order top-k, vectorized run arithmetic after one sort), so at
    most k x strata x blocks rows reach the final per-stratum
    co-location — never the corpus. Output: (stratum, key,
    sample_rank) with rank 0..k-1 in hash order.
    """
    import pyarrow.compute as pc

    def _topk(t: pa.Table, ranked: bool) -> pa.Table:
        if t.num_rows == 0:
            if ranked:
                return pa.table({stratum_col: t[stratum_col],
                                 key_col: t[key_col],
                                 "sample_rank": pa.array([], pa.int64())})
            # match the non-empty path's column order exactly
            # ((key, stratum) select order + appended 'h') — mixed
            # block schemas break the sort-mode exchange's concat
            return pa.table({key_col: t[key_col],
                             stratum_col: t[stratum_col],
                             "h": pa.array([], pa.string())})
        if "h" not in t.column_names:
            h = [hashlib.md5(str(x).encode()).hexdigest()
                 for x in t[key_col].to_pylist()]
            t = t.append_column("h", pa.array(h, type=pa.string()))
        order = pc.sort_indices(
            t, sort_keys=[(stratum_col, "ascending"), ("h", "ascending"),
                          (key_col, "ascending")])
        t = t.take(order)
        s = t.column(stratum_col).combine_chunks()
        n = t.num_rows
        neq = (pc.not_equal(s.slice(1), s.slice(0, n - 1))
               .to_numpy(zero_copy_only=False)
               if n > 1 else np.empty(0, bool))
        starts = np.flatnonzero(np.concatenate(([True], neq)))
        lens = np.diff(np.concatenate((starts, [n])))
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        t = t.filter(pa.array(rank < k))
        if not ranked:
            return t
        return pa.table({stratum_col: t[stratum_col],
                         key_col: t[key_col],
                         "sample_rank": pa.array(rank[rank < k])})

    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import _key_hash_u64, colocate_map

    part = ds.select_columns([key_col, stratum_col]).map_batches(
        lambda t: _topk(t, ranked=False), batch_format="pyarrow",
        zero_copy_batch=True)
    nb = min(coalesce_blocks(), 16)  # strata are few; partials tiny

    def bucket(t: pa.Table) -> pa.Table:
        hb = _key_hash_u64(t, [stratum_col]) % np.uint64(nb)
        return t.append_column("bucket", pa.array(hb.astype(np.int32)))

    return colocate_map(part, [stratum_col], nb,
                        lambda t: _topk(t, ranked=True),
                        sort_bucket_expr=bucket)


def exact_quantiles(ds, col: str, permille=(250, 500, 750, 900, 990),
                    max_cardinality: int = 1_000_000):
    """Exact discrete quantiles of an integer column via a distributed
    value histogram: per-batch ``np.unique`` partials -> one tiny
    groupby over DISTINCT VALUES (not rows) -> driver-side rank pick.

    No global sort: the shuffle/driver volume is the value cardinality,
    not the row count — the right exact-quantile plan whenever the
    domain is bounded (lengths, counts, scores). Ranks use integer
    permille ceil-division (``(q_pm * n + 999) // 1000``) so a DuckDB
    ``row_number`` oracle reproduces the pick with no float rounding.
    Returns a pyarrow Table (q double, <col>_q int64).

    CARDINALITY GUARD: the driver pull scales with distinct-value
    count, so a column whose histogram exceeds ``max_cardinality``
    distinct values (checked on the aggregated histogram's metadata —
    no extra pass over rows) automatically falls back to the
    ``dd_quantiles`` sketch (alpha-relative-error, fixed driver
    volume), with the sketch's midpoint representatives rounded into
    this function's (q double, <col>_q int64) schema.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(v, return_counts=True)
        return pa.table({"value": pa.array(vals),
                         "cnt": pa.array(cnts.astype(np.int64))})

    hist_ds = (ds.select_columns([col])
               .map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
               .groupby("value").aggregate(Sum("cnt", alias_name="n"))
               .materialize())
    if hist_ds.count() > max_cardinality:
        from lsh_ray.functions.num import round_half_away
        from lsh_ray.stages.agg import dd_quantiles
        dd = dd_quantiles(ds, col,
                          qs=tuple(p / 1000.0 for p in permille))
        vals = dd[f"{col}_q"].to_numpy(zero_copy_only=False)
        # repo rounding convention (half away from zero, not rint's
        # half-to-even) when folding sketch midpoints into the int64
        # schema
        return pa.table({
            "q": dd["q"],
            f"{col}_q": pa.array(
                round_half_away(vals, 0).astype(np.int64))})
    hist = hist_ds.to_pandas().sort_values("value")
    cum = hist["n"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    values = hist["value"].to_numpy()
    out_q, out_v = [], []
    for q_pm in permille:
        r = (q_pm * n + 999) // 1000
        i = int(np.searchsorted(cum, r))
        out_q.append(q_pm / 1000.0)
        out_v.append(int(values[min(i, len(values) - 1)]) if n else 0)
    return pa.table({"q": pa.array(out_q, type=pa.float64()),
                     f"{col}_q": pa.array(out_v, type=pa.int64())})


def exact_quantiles_by(ds, col: str, group_col: str,
                       permille=(250, 500, 750, 900, 990)):
    """Per-group exact discrete quantiles via the same distributed
    value-histogram plan as ``exact_quantiles``: per-batch distinct
    (group, value) counts (Arrow C++ group_by), ONE grouped Sum over
    (group, value) — volume = value cardinality per group, never
    rows — then a driver-side rank pick per group with the integer
    permille rule, so a DuckDB ``row_number`` oracle reproduces every
    pick bit-for-bit (the picked value IS an element of the column, so
    float columns compare exactly).

    Returns a pyarrow Table (group, q double, <col>_q in the column's
    own type), ordered by (group, q).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([group_col, col]).group_by(
            [group_col, col]).aggregate([([], "count_all")])
        return pa.table({group_col: g[group_col], "value": g[col],
                         "cnt": g["count_all"].cast(pa.int64())})

    hist = (ds.select_columns([group_col, col])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby([group_col, "value"])
            .aggregate(Sum("cnt", alias_name="n"))
            .to_pandas().sort_values([group_col, "value"]))

    out_g, out_q, out_v = [], [], []
    for gval, sub in hist.groupby(group_col, sort=True):
        cum = sub["n"].to_numpy().cumsum()
        n = int(cum[-1])
        values = sub["value"].to_numpy()
        for q_pm in permille:
            r = (q_pm * n + 999) // 1000
            i = int(np.searchsorted(cum, r))
            out_g.append(gval)
            out_q.append(q_pm / 1000.0)
            out_v.append(values[min(i, len(values) - 1)])
    vtype = dict(zip(ds.schema().names, ds.schema().types))[col]
    return pa.table({group_col: pa.array(out_g),
                     "q": pa.array(out_q, type=pa.float64()),
                     f"{col}_q": pa.array(out_v, type=vtype)})


def grouped_top_k(ds, group_col: str, order_col: str, id_col: str,
                  k: int = 3):
    """Per-group top-k rows by (order_col DESC, id_col ASC) — SQL's
    QUALIFY row_number() <= k — with combiner pruning: every batch first
    reduces to ITS local per-group top-k (so at most k rows per group
    per block cross the shuffle), then one grouped pass finishes. The
    exchange volume is bounded by groups x k x blocks, never by rows."""

    def local_topk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        order = pc.sort_indices(
            t, sort_keys=[(group_col, "ascending"),
                          (order_col, "descending"),
                          (id_col, "ascending")])
        s = t.take(order)
        g = s[group_col].to_numpy(zero_copy_only=False)
        new = np.concatenate(([True], g[1:] != g[:-1]))
        starts = np.flatnonzero(new)
        rank = np.arange(len(g), dtype=np.int64) - np.repeat(
            starts, np.diff(np.concatenate((starts, [len(g)]))))
        return s.filter(pa.array(rank < k))

    pruned = ds.select_columns([group_col, order_col, id_col]) \
        .map_batches(local_topk, batch_format="pyarrow",
                     zero_copy_batch=True)
    return pruned.groupby(group_col).map_groups(
        local_topk, batch_format="pyarrow")
