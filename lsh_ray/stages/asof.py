"""Time-ordered joins Ray Data lacks: as-of join and range (interval) join.

Both follow the repo's portable two-sided exchange pattern
(``stages/join.py``): tag each side, union under one unified schema,
co-locate by ``hash(key) % num_buckets`` with ``colocate_map`` (one
shuffle), and resolve each bucket with a fully vectorized numpy kernel
— no per-row or per-key Python inside the bucket.

Partitioning assumption (documented per the scale contract): both
operators co-locate ONLY by key, so one bucket holds every row of its
keys from both sides. Work per bucket is O(n log n) in the bucket's row
count, which is safe whenever no single key carries a corpus-scale share
of rows (the events/sessions shape: many users, bounded rows per user).
A pathologically hot key concentrates its rows in one task — the same
boundary as ``groupby(user)`` anywhere — and should be pre-split
upstream (e.g. sessionize's two-phase plan) before joining.

Kernel shapes:

- ``asof_join``: merged lexsort of both sides by (key, ts, tie) then one
  ``np.maximum.accumulate`` forward-fill of "latest right row seen" —
  the classic sort-merge as-of, O((L+R) log (L+R)) per bucket.
- ``range_join``: probes (interval starts / ends) are merged into the
  ts-sorted left side by the same lexsort; each probe's insertion
  position is its merged index minus the probes before it, giving every
  interval a contiguous [lo, hi) span of matching left rows with zero
  per-interval work; pairs expand with the cumsum/repeat arithmetic of
  ``join._join_bucket_many``.

Semantics match DuckDB (the oracle): ``ASOF JOIN ... ON l.key = r.key
AND l.ts >= r.ts`` is ``asof_join(direction="backward",
allow_exact=True)``; an inequality join ``l.ts >= r.start AND l.ts <
r.end`` is ``range_join`` with the default closed="left". When several
right rows share one (key, ts), the as-of winner is arbitrary (exactly
DuckDB's behavior) — feed a right side unique per (key, ts) for
deterministic output.

Reference parity note: the reference has no time-ordered joins (its
joins are candidate-resolve lookups, ``lsh.py:415-473``); these are
rebuild additions for the event/training-data use case.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsh_ray.stages.join import _null_array, key_u64

_SIDE = "__side"
_KEY = "__akey"
_BUCKET = "__abucket"
_TS = "__ts"
_TS_END = "__ts_end"

_NUM_BUCKETS = 1024


def _ts_i64(col) -> np.ndarray:
    """Timestamp/int column -> int64 numpy (timestamps normalized to us).

    Keys and timestamps must be non-null (nulls would sort as INT64_MIN
    and silently match everything-before; both query surfaces here feed
    non-null event times)."""
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype.kind == "M":
        return arr.astype("datetime64[us]").view("int64")
    return arr.astype(np.int64)


def _split_sides(group: pa.Table):
    side = group[_SIDE].to_numpy(zero_copy_only=False)
    left = group.filter(pa.array(side == 0))
    right = group.filter(pa.array(side == 1))
    return left, right


def _asof_bucket(group: pa.Table, left_cols: list[str],
                 right_cols: list[str], allow_exact: bool,
                 negate_ts: bool, how: str) -> pa.Table:
    left, right = _split_sides(group)
    nl, nr = left.num_rows, right.num_rows
    if nl == 0:
        return pa.table({c: group[c].slice(0, 0)
                         for c in (*left_cols, *right_cols)})
    lk = left[_KEY].to_numpy(zero_copy_only=False)
    rk = right[_KEY].to_numpy(zero_copy_only=False)
    lts = left[_TS].to_numpy(zero_copy_only=False)
    rts = right[_TS].to_numpy(zero_copy_only=False)
    if negate_ts:  # forward as-of = backward as-of on negated time
        lts, rts = -lts, -rts

    # merged order by (key, ts, tie): with allow_exact a right row at the
    # same (key, ts) must precede the left row (so the fill sees it);
    # strict mode reverses the tie so equal-ts right rows are NOT taken
    keys = np.concatenate([rk, lk])
    ts = np.concatenate([rts, lts])
    r_tie, l_tie = (0, 1) if allow_exact else (1, 0)
    tie = np.concatenate([np.full(nr, r_tie, np.int8),
                          np.full(nl, l_tie, np.int8)])
    order = np.lexsort((tie, ts, keys))
    is_right = order < nr
    n = nl + nr
    # forward-fill the merged position of the latest right row
    rpos = np.where(is_right, np.arange(n), -1)
    last = np.maximum.accumulate(rpos)
    keys_sorted = keys[order]
    left_merged = np.flatnonzero(~is_right)           # merged pos of left rows
    lmatch_pos = last[left_merged]                     # merged pos of winner
    hit = lmatch_pos >= 0
    hit[hit] &= keys_sorted[lmatch_pos[hit]] == keys_sorted[left_merged[hit]]
    left_orig = order[left_merged] - nr                # original left row
    right_orig = np.where(hit, order[np.where(hit, lmatch_pos, 0)], 0)

    keep = np.ones(nl, dtype=bool) if how == "left" else hit
    lt = left.take(pa.array(left_orig[keep], type=pa.int64()))
    cols: dict = {c: lt[c] for c in left_cols}
    if how == "left":
        # masked take null-fills unmatched rows in C++ for any type
        idx = pa.array(right_orig[keep], mask=~hit[keep], type=pa.int64())
    else:
        idx = pa.array(right_orig[keep], type=pa.int64())
    if nr:
        rt = right.take(idx)
        for c in right_cols:
            cols[c] = rt[c]
    else:
        for c in right_cols:
            cols[c] = pa.nulls(int(keep.sum()), group.schema.field(c).type)
    return pa.table(cols)


def _range_bucket(group: pa.Table, left_cols: list[str],
                  right_cols: list[str], closed: str) -> pa.Table:
    left, right = _split_sides(group)
    nl, nr = left.num_rows, right.num_rows
    empty = pa.table({c: group[c].slice(0, 0)
                      for c in (*left_cols, *right_cols)})
    if nl == 0 or nr == 0:
        return empty
    lk = left[_KEY].to_numpy(zero_copy_only=False)
    rk = right[_KEY].to_numpy(zero_copy_only=False)
    lts = left[_TS].to_numpy(zero_copy_only=False)
    rs = right[_TS].to_numpy(zero_copy_only=False)
    re = right[_TS_END].to_numpy(zero_copy_only=False)

    left_order = np.lexsort((lts, lk))
    lk_s, lts_s = lk[left_order], lts[left_order]

    # probe position = count of sorted left rows lexically before
    # (key, bound): merge probes into the sorted data once, fully
    # vectorized. tie=0 puts a probe BEFORE equal data rows (inclusive
    # bound), tie=1 after (exclusive bound).
    def positions(bound: np.ndarray, tie_val: int) -> np.ndarray:
        keys = np.concatenate([lk_s, rk])
        vals = np.concatenate([lts_s, bound])
        tie = np.concatenate([np.full(nl, 1 - tie_val, np.int8),
                              np.full(nr, tie_val, np.int8)])
        order = np.lexsort((tie, vals, keys))
        is_data = order < nl
        before = np.concatenate([[0], np.cumsum(is_data)])[:-1]
        pos = np.empty(nr, dtype=np.int64)
        probe_merged = np.flatnonzero(~is_data)
        pos[order[probe_merged] - nl] = before[probe_merged]
        return pos

    lo = positions(rs, 0 if closed in ("left", "both") else 1)
    hi = positions(re, 1 if closed in ("right", "both") else 0)
    # a start past its end (or a key absent from the left span) yields an
    # empty [lo, hi) naturally: both bounds land at the same position
    cnt = np.maximum(hi - lo, 0)
    rows_r = np.repeat(np.arange(nr), cnt)
    ends = np.cumsum(cnt)
    total = int(ends[-1]) if nr else 0
    if total == 0:
        return empty
    flat = (np.arange(total) - np.repeat(ends - cnt, cnt)
            + np.repeat(lo, cnt))
    rows_l = left_order[flat]
    lt = left.take(pa.array(rows_l, type=pa.int64()))
    rt = right.take(pa.array(rows_r, type=pa.int64()))
    cols: dict = {c: lt[c] for c in left_cols}
    for c in right_cols:
        cols[c] = rt[c]
    return pa.table(cols)


def _two_sided_exchange(left_ds, right_ds, left_key: str, right_key: str,
                        right_columns: list[str], suffix: str,
                        extra_right: dict[str, str],
                        left_ts: str, num_buckets: int,
                        num_blocks: int | None, bucket_fn):
    """Shared tag/union/colocate scaffolding: unified schema with the
    other side's columns null-filled, internal u64 key + int64 ts
    columns, one key exchange, ``bucket_fn`` per bucket.
    ``extra_right`` maps internal ts columns to right source columns."""
    left_schema = left_ds.schema()
    right_sel = right_ds.select_columns(
        list(dict.fromkeys([right_key, *extra_right.values(),
                            *right_columns])))
    right_schema = right_sel.schema()
    left_cols = list(left_schema.names)
    rename = {c: c + suffix for c in right_columns}
    out_right_cols = [rename[c] for c in right_columns]
    clash = set(out_right_cols) & set(left_cols)
    if clash:
        raise ValueError(f"suffixed right columns clash with left: {clash}")
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_types = dict(zip(right_schema.names, right_schema.types))
    nb = np.uint64(num_buckets)

    def prep_left(t: pa.Table) -> pa.Table:
        k = key_u64(t[left_key])
        cols = {c: t[c] for c in left_cols}
        for c in right_columns:
            cols[rename[c]] = _null_array(right_types[c], t.num_rows)
        cols[_TS] = pa.array(_ts_i64(t[left_ts]), type=pa.int64())
        if _TS_END in set(extra_right):
            cols[_TS_END] = pa.nulls(t.num_rows, pa.int64())
        cols[_KEY] = pa.array(k, type=pa.uint64())
        cols[_BUCKET] = pa.array((k % nb).astype(np.int32))
        cols[_SIDE] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    def prep_right(t: pa.Table) -> pa.Table:
        k = key_u64(t[right_key])
        cols = {c: _null_array(left_types[c], t.num_rows) for c in left_cols}
        for c in right_columns:
            cols[rename[c]] = t[c]
        for internal, src in extra_right.items():
            cols[internal] = pa.array(_ts_i64(t[src]), type=pa.int64())
        cols[_KEY] = pa.array(k, type=pa.uint64())
        cols[_BUCKET] = pa.array((k % nb).astype(np.int32))
        cols[_SIDE] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    tagged = left_ds.map_batches(
        prep_left, batch_format="pyarrow", zero_copy_batch=True).union(
        right_sel.map_batches(prep_right, batch_format="pyarrow",
                              zero_copy_batch=True))
    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import colocate_map
    nblocks = num_blocks if num_blocks else coalesce_blocks()
    return colocate_map(
        tagged, [_KEY], nblocks,
        lambda g: bucket_fn(g, left_cols, out_right_cols),
        bucket_col=_BUCKET)


def asof_join(left_ds, right_ds, left_key: str, right_key: str,
              left_ts: str, right_ts: str, right_columns: list[str],
              suffix: str = "", direction: str = "backward",
              allow_exact: bool = True, how: str = "inner",
              num_buckets: int = _NUM_BUCKETS,
              num_blocks: int | None = None):
    """For each left row, attach the single right row with the same key
    whose time is the latest <= left time (``direction="backward"``,
    DuckDB ``ASOF JOIN ... l.ts >= r.ts``) or the earliest >= it
    (``"forward"``). ``allow_exact=False`` makes the comparison strict.
    ``how``: "inner" drops unmatched left rows, "left" null-fills.

    Output = all left columns + ``right_columns`` renamed with
    ``suffix``. Timestamps may be Arrow timestamps (normalized to us) or
    integers, non-null on both sides; keys are ints or strings."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"unknown how {how!r}")
    negate = direction == "forward"

    def bucket(g, lc, rc):
        return _asof_bucket(g, lc, rc, allow_exact, negate, how)

    return _two_sided_exchange(
        left_ds, right_ds, left_key, right_key, right_columns, suffix,
        {_TS: right_ts}, left_ts, num_buckets, num_blocks, bucket)


def range_join(left_ds, right_ds, left_key: str, right_key: str,
               left_ts: str, right_start: str, right_end: str,
               right_columns: list[str], suffix: str = "",
               closed: str = "left", num_buckets: int = _NUM_BUCKETS,
               num_blocks: int | None = None):
    """Interval join: emit one row per (left row, right interval) pair
    with matching keys and left time inside [start, end) (``closed=
    "left"``; also "right", "both", "neither"). Inner semantics — left
    rows in no interval and empty intervals vanish.

    Output = all left columns + ``right_columns`` renamed with
    ``suffix``. Skew note: output volume is the true pair count; a key
    whose intervals blanket its whole timeline degenerates toward the
    cartesian product, which no join algorithm avoids — bound interval
    width upstream."""
    if closed not in ("left", "right", "both", "neither"):
        raise ValueError(f"unknown closed {closed!r}")

    def bucket(g, lc, rc):
        return _range_bucket(g, lc, rc, closed)

    return _two_sided_exchange(
        left_ds, right_ds, left_key, right_key, right_columns, suffix,
        {_TS: right_start, _TS_END: right_end}, left_ts,
        num_buckets, num_blocks, bucket)
