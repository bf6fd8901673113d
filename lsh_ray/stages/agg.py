"""Distributed aggregation operators beyond plain grouped sums:
exact grouped COUNT(DISTINCT), hierarchical rollups derived from one
finest-level pass, and a mergeable HyperLogLog sketch for approximate
distinct counts at cardinalities where the exact plan's shuffle volume
(one row per distinct pair) stops being free.

All exact plans follow the repo's partial/combine discipline: every
batch first collapses to its local distinct pairs / finest groups (an
Arrow C++ ``Table.group_by`` or one lexsort), so the shuffle moves
pre-deduplicated partials, never raw rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def grouped_distinct_count(ds, group_col: str, value_col: str,
                           alias: str | None = None):
    """``SELECT group, COUNT(DISTINCT value) GROUP BY group`` exactly:

    1. per-batch distinct (group, value) pairs (Arrow C++ group_by —
       no Python over rows);
    2. ONE shuffle deduplicates pairs globally (``groupby`` on both
       columns with a throwaway count);
    3. per-batch partial counts per group + a tiny grouped Sum.

    Shuffle volume = distinct pairs, not rows. For cardinalities where
    even that is too wide, use ``hll_distinct_count`` (approximate,
    one fixed-size sketch per group per block).
    """
    from ray.data.aggregate import Count, Sum
    alias = alias or f"n_{value_col}"

    def local_pairs(t: pa.Table) -> pa.Table:
        # SQL COUNT(DISTINCT) excludes NULLs — drop them before the
        # pair dedup (Arrow group_by would keep a null key group)
        t = t.select([group_col, value_col])
        t = t.filter(pc.is_valid(t[value_col]))
        g = t.group_by([group_col, value_col]).aggregate(
            [([], "count_all")])
        return g.select([group_col, value_col])

    pairs = (ds.map_batches(local_pairs, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby([group_col, value_col])
             .aggregate(Count())
             .select_columns([group_col, value_col]))

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by([group_col]).aggregate([([], "count_all")])
        return pa.table({group_col: g[group_col],
                         "cnt": g["count_all"].cast(pa.int64())})

    return (pairs.map_batches(count_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby(group_col).aggregate(Sum("cnt", alias_name=alias)))


def rollup_agg(ds, keys: list[str], sum_cols: list[str],
               all_label: str = "ALL", ndigits: int = 2):
    """GROUP BY ROLLUP(keys): sums + row counts at every prefix level
    of the key hierarchy, rolled-up key columns labeled ``all_label``.

    One distributed pass computes the FINEST level (per-batch Arrow
    group_by partials, one grouped Sum); every coarser level is derived
    from that group-cardinality table on the driver — rollup levels
    are sums of finest partials, so no second scan of the data. Sum
    columns round per DuckDB ROUND (exact when inputs are integral in
    float64, as TPC-H quantities are).

    Output: ``keys...`` (strings, ``all_label`` where rolled),
    ``sum_<col>`` per sum column, ``n_rows``.
    """
    from ray.data.aggregate import Sum
    from lsh_ray.functions.num import round_half_away

    aggs = [(c, "sum") for c in sum_cols] + [([], "count_all")]

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([*keys, *sum_cols]).group_by(keys).aggregate(aggs)
        cols = {k: g[k] for k in keys}
        for c in sum_cols:
            cols[f"s_{c}"] = g[f"{c}_sum"]
        cols["n"] = g["count_all"].cast(pa.int64())
        return pa.table(cols)

    finest = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(keys)
              .aggregate(*[Sum(f"s_{c}", alias_name=f"s_{c}")
                           for c in sum_cols],
                         Sum("n", alias_name="n")))
    # group-cardinality table: driver-side level derivation is the
    # partial/combine pattern, not a driver-side scan of the data
    base = pa.Table.from_pandas(finest.to_pandas(),
                                preserve_index=False)

    levels = []
    for depth in range(len(keys), -1, -1):
        kept = keys[:depth]
        if kept:
            g = base.group_by(kept).aggregate(
                [(f"s_{c}", "sum") for c in sum_cols] + [("n", "sum")])
            cols = {k: g[k].cast(pa.string()) for k in kept}
            src = {c: g[f"s_{c}_sum"] for c in sum_cols}
            nrows = g["n_sum"]
        else:
            cols = {}
            src = {c: pa.array([pc.sum(base[f"s_{c}"]).as_py() or 0.0])
                   for c in sum_cols}
            nrows = pa.array([pc.sum(base["n"]).as_py() or 0],
                             type=pa.int64())
        n = len(nrows)
        for k in keys[depth:]:
            cols[k] = pa.array([all_label] * n, type=pa.string())
        for c in sum_cols:
            v = np.asarray(src[c], dtype=np.float64)
            cols[f"sum_{c}"] = pa.array(round_half_away(v, ndigits))
        cols["n_rows"] = nrows.cast(pa.int64())
        levels.append(pa.table(
            {k: cols[k] for k in
             [*keys, *[f"sum_{c}" for c in sum_cols], "n_rows"]}))
    return pa.concat_tables(levels)


def distinct_values(ds, col: str):
    """DISTINCT over one column: per-batch unique partials, one
    dedup shuffle — volume = distinct values per block, not rows.
    NULL is kept as a value (SQL SELECT DISTINCT semantics — unlike
    COUNT(DISTINCT), which excludes it)."""
    from ray.data.aggregate import Count

    def local(t: pa.Table) -> pa.Table:
        g = t.select([col]).group_by([col]).aggregate([([], "count_all")])
        return g.select([col])

    return (ds.map_batches(local, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(col).aggregate(Count())
            .select_columns([col]))


# -------------------------------------------------- quantile sketch ----

def dd_quantiles(ds, col: str, qs=(0.5, 0.9, 0.99),
                 alpha: float = 0.01):
    """Approximate quantiles with a RELATIVE-error guarantee (DDSketch,
    Masson et al. 2019): values map to log-scale buckets
    ``ceil(log_gamma(v))`` with ``gamma = (1+alpha)/(1-alpha)``, so any
    returned quantile is within ``alpha`` relative error of the true
    one. Deterministic and mergeable (bucket counts add): per-block
    partials are tiny (bucket, count) tables — bucket cardinality is
    logarithmic in the value range, NOT the cardinality-bounded volume
    of ``exact_quantiles`` and never the row count. Use when the value
    domain is unbounded (latencies, scores).

    Non-negative values only (the standard single-store form); zeros
    get a dedicated bucket. Returns a pyarrow Table (q, <col>_q).
    """
    from ray.data.aggregate import Sum

    gamma = (1 + alpha) / (1 - alpha)
    lg = float(np.log(gamma))
    ZERO = np.int64(np.iinfo(np.int32).min)

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        if not np.isfinite(v).all():
            raise ValueError("dd_quantiles requires finite values "
                             "(found inf/NaN)")
        if (v < 0).any():
            raise ValueError("dd_quantiles supports non-negative "
                             "values only")
        pos = v > 0
        idx = np.ceil(np.log(v[pos]) / lg).astype(np.int64)
        buckets, counts = np.unique(idx, return_counts=True)
        nz = int((~pos).sum())
        if nz:
            buckets = np.concatenate(([ZERO], buckets))
            counts = np.concatenate(([nz], counts))
        return pa.table({"bucket": pa.array(buckets),
                         "cnt": pa.array(counts.astype(np.int64))})

    hist = (ds.select_columns([col])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("bucket").aggregate(Sum("cnt", alias_name="n"))
            .to_pandas().sort_values("bucket"))
    buckets = hist["bucket"].to_numpy()
    cum = hist["n"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        out_q.append(float(q))
        if n == 0:
            out_v.append(0.0)
            continue
        r = max(1, int(np.ceil(q * n)))
        i = int(np.searchsorted(cum, r))
        b = buckets[min(i, len(buckets) - 1)]
        # bucket midpoint representative: 2*gamma^b/(gamma+1)
        out_v.append(0.0 if b == ZERO
                     else float(2 * gamma ** b / (gamma + 1)))
    return pa.table({"q": pa.array(out_q, type=pa.float64()),
                     f"{col}_q": pa.array(out_v, type=pa.float64())})


# ------------------------------------------------------------- HLL ----

_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_alpha(m: int) -> float:
    return _HLL_ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def hll_registers(values: np.ndarray, p: int = 12) -> np.ndarray:
    """uint64 hashes -> HLL register array (2^p uint8): index = top p
    bits, rank = leading-zero count of the remaining 64-p bits + 1.
    Vectorized: the (64-p)-bit remainder fits float64's 52-bit mantissa
    exactly for p >= 12, so ``floor(log2)`` is exact and clz is pure
    numpy."""
    if p < 12 or p > 18:
        raise ValueError("p must be in [12, 18] (float64-exact clz)")
    m = 1 << p
    h = values.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    # rank = (64-p) - floor(log2(w)) for w>0; w==0 -> max rank 64-p+1
    wl = w.astype(np.float64)
    with np.errstate(divide="ignore"):
        fl = np.floor(np.log2(np.maximum(wl, 1.0))).astype(np.int64)
    rank = np.where(w == 0, 64 - p + 1, (64 - p) - fl).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with linear-counting small-range
    correction (Flajolet et al. 2007)."""
    m = len(regs)
    r = regs.astype(np.float64)
    e = _hll_alpha(m) * m * m / np.sum(np.exp2(-r))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    return float(e)


def hll_distinct_count(ds, value_col: str, p: int = 12) -> float:
    """Approximate corpus-wide COUNT(DISTINCT value): each block
    reduces to ONE fixed 2^p-byte register row (mergeable by
    element-wise max — the sketch property that makes this a one-round
    tree reduction on any cluster), the driver folds block sketches.
    Standard error ~ 1.04/sqrt(2^p) (~1.6% at p=12). String values
    hash with the repo's vectorized siphash; integers with the
    splitmix-style mixer."""
    from lsh_ray.stages.join import key_u64
    m = 1 << p

    def block_sketch(t: pa.Table) -> pa.Table:
        h = key_u64(t[value_col])
        if not _looks_hashed(t[value_col]):
            h = _mix64(h)
        regs = hll_registers(h, p)
        return pa.table({"regs": pa.array([regs],
                                          type=pa.list_(pa.uint8(), m))})

    rows = ds.select_columns([value_col]).map_batches(
        block_sketch, batch_format="pyarrow",
        zero_copy_batch=True).take_all()
    merged = np.zeros(m, dtype=np.uint8)
    for r in rows:
        merged = np.maximum(merged, np.asarray(r["regs"], dtype=np.uint8))
    return hll_estimate(merged)


def _looks_hashed(col) -> bool:
    """String keys come back from key_u64 already uniformly hashed;
    raw integer keys do not."""
    t = col.type if hasattr(col, "type") else None
    return t is not None and (pa.types.is_string(t)
                              or pa.types.is_large_string(t))


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: integer keys -> uniform uint64 hashes."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))
