"""Windowed aggregates over the events stream table.

Ray Data is a (streaming-executed) batch engine with no event-time
watermarks (SURVEY.md §2.9: the reference is strictly batch too); windows
are computed as grouped aggregates over a derived window-bucket column.
Tumbling windows = ``groupby(key, floor(epoch/size))``; per-batch partial
pre-aggregation keeps the shuffle small.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Max, Sum


# shared (key, time-bucket) pack for the window-function family:
# ck = key * 2^32 + (epoch-bucket + 2^31). Injective while key < 2^31
# and |epoch bucket| < 2^31 (the offset admits pre-1970 timestamps).
_CK_SHIFT = np.int64(2**32)
_CK_BOFF = np.int64(1 << 31)


def _ts_us(col) -> np.ndarray:
    """Timestamp column (any unit) -> int64 epoch-microseconds."""
    return (col.cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False))


def _add_ck_us(t: pa.Table, key_col: str, ts_col: str,
               bucket_s: int) -> pa.Table:
    """Append the packed ``ck`` column (one definition for the whole
    lag/lead/frame family — edit here and nowhere else).

    The pack's injectivity domain is RUNTIME-CHECKED per batch: a key
    outside [0, 2^31) (e.g. a uint64 hash used as the key column) would
    silently alias distinct (key, bucket) groups, corrupting every
    window result downstream. Key dtypes that provably cannot leave the
    domain skip the scans (small unsigned: both; int32: the upper
    bound; unsigned: the negative bound); int64/uint64 keys pay the two
    vectorized compares — cheap next to the timestamp cast above."""
    ts_us = _ts_us(t[ts_col])
    bucket = (ts_us // 1_000_000) // bucket_s + _CK_BOFF
    raw = t[key_col].to_numpy(zero_copy_only=False)
    dt = raw.dtype
    fits_high = (dt in (np.uint8, np.uint16, np.int8, np.int16)
                 or dt == np.int32)
    unsigned = dt.kind == "u"
    if raw.size and not (fits_high and unsigned) and (
            (not unsigned and raw.min() < 0)
            or (not fits_high and raw.max() >= (1 << 31))):
        raise ValueError(
            f"window key column {key_col!r} has values outside "
            f"[0, 2^31) (min={raw.min()}, max={raw.max()}); the "
            "(key, bucket) int64 pack would alias groups. Remap the "
            "key to a dense/31-bit id first (e.g. hash % 2**31 with a "
            "collision-checked dictionary, or a dense-rank pass).")
    if bucket.size and (bucket.min() < 0 or bucket.max() >= (1 << 32)):
        raise ValueError(
            f"window time bucket for {ts_col!r} overflows the 32-bit "
            "pack slot (timestamps beyond +/-2^31 buckets of epoch); "
            "use a coarser bucket_s.")
    key = raw.astype(np.int64)
    return t.append_column("ck", pa.array(key * _CK_SHIFT + bucket))


def _seg_starts(keys_sorted: np.ndarray) -> np.ndarray:
    """First index of every run in a sorted key array."""
    new = np.concatenate(([True], keys_sorted[1:] != keys_sorted[:-1]))
    return np.flatnonzero(new)


def _seg_from_end(keys_sorted: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(distance from each row to its run's END, run starts)."""
    starts = _seg_starts(keys_sorted)
    n = len(keys_sorted)
    lens = np.diff(np.concatenate((starts, [n])))
    seg_end = np.repeat(np.concatenate((starts[1:], [n])), lens)
    return seg_end - np.arange(n) - 1, starts


def _colocate_by_key(tbl_ds, kernel):
    """Co-locate a small boundary table by its ``k`` (user key) column
    and run ``kernel`` per block, vectorized across ALL keys in the
    block. The window family's boundary passes are per-key logic over
    key-cardinality tables; ``groupby(k).map_groups`` pays per-group
    dispatch (~ms per group — measured 3.6 -> 11 s on a 100k-event
    query), while one co-location exchange + segment arithmetic is
    group-count-free."""
    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import colocate_map
    nblocks = min(coalesce_blocks(), 64)
    nbu = np.uint64(nblocks)

    def add_bucket(t: pa.Table) -> pa.Table:
        kv = t["k"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "bucket", pa.array((kv % nbu).astype(np.int32)))

    return colocate_map(tbl_ds, ["k"], nblocks, kernel,
                        sort_bucket_expr=add_bucket)


def add_window_bucket(ds, window_s: int = 3600, ts_col: str = "ts"):
    """Append ``window_start`` (epoch seconds, floored to the window)."""
    def f(t: pa.Table) -> pa.Table:
        ts_us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = (ts_us // 1_000_000) // window_s * window_s
        return t.append_column("window_start",
                               pa.array(bucket, type=pa.int64()))
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _merge_uw_partials(partials):
    """(user_id, window_start, n, vmax) per-batch partials -> final
    (user_id, window_start, n_events, max_value) via ONE tasks-mode
    co-location (Sum/Max finish vectorized inside the block — the
    former native groupby over the partials paid the sort-groupby's
    sample/sort barrier; same fusion as the boundary passes)."""
    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import _key_hash_u64, colocate_map
    nblocks = min(coalesce_blocks(), 64)

    def merge_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"user_id": z, "window_start": z,
                             "n_events": z,
                             "max_value": pa.array([], pa.float64())})
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["window_start"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["vmax"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u, w, n, v = u[order], w[order], n[order], v[order]
        new = np.concatenate(([True],
                              (u[1:] != u[:-1]) | (w[1:] != w[:-1])))
        firsts = np.flatnonzero(new)
        return pa.table({
            "user_id": pa.array(u[firsts]),
            "window_start": pa.array(w[firsts]),
            "n_events": pa.array(np.add.reduceat(n, firsts)),
            "max_value": pa.array(np.maximum.reduceat(v, firsts)),
        })

    def uw_bucket(t: pa.Table) -> pa.Table:
        h = _key_hash_u64(t, ["user_id", "window_start"]) \
            % np.uint64(nblocks)
        return t.append_column("bucket",
                               pa.array(h.astype(np.int32)))

    return colocate_map(partials, ["user_id", "window_start"], nblocks,
                        merge_block, sort_bucket_expr=uw_bucket)


def tumbling_window_counts(events_ds, window_s: int = 3600):
    """events -> (user_id, window_start, n_events, max_value).

    Map-side pre-aggregation (Arrow C++ ``Table.group_by`` per batch)
    collapses each block to one row per (user, window) BEFORE the
    shuffle — the exchange then moves partials, not events (the same
    partial/combine discipline as the hopping variant below)."""
    with_bucket = add_window_bucket(events_ds, window_s)

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["user_id", "window_start", "value"]).group_by(
            ["user_id", "window_start"]).aggregate(
            [("value", "max"), ([], "count_all")])
        return pa.table({
            "user_id": g["user_id"],
            "window_start": g["window_start"],
            "n": g["count_all"].cast(pa.int64()),
            "vmax": g["value_max"],
        })

    return _merge_uw_partials(
        with_bucket.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True))


def hopping_window_counts(events_ds, window_s: int = 3600,
                          hop_s: int = 1800):
    """events -> (user_id, window_start, n_events, max_value) for HOPPING
    (sliding) windows: length ``window_s``, advancing every ``hop_s``.
    An event belongs to ``window_s / hop_s`` overlapping windows.

    Plan: each batch expands events to their window replicas with pure
    repeat/tile arithmetic, then PRE-AGGREGATES (user, window) partials
    locally, so the shuffle carries one row per (user, window,
    batch) — not ``window_s/hop_s`` copies of every event — and a final
    small groupby merges partials (Sum of counts, Max of maxes).
    """
    if window_s % hop_s:
        raise ValueError("window_s must be a multiple of hop_s")
    n_copies = window_s // hop_s

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"user_id": z, "window_start": z, "n": z,
                             "vmax": pa.array([], pa.float64())})
        ts_us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        hop_us = hop_s * 1_000_000
        # last window containing the event starts at floor(ts/hop)*hop;
        # the n_copies windows step back by hop from there
        last = ts_us // hop_us
        j = (last[:, None] - np.arange(n_copies)[None, :]).ravel()
        w = j * hop_s
        uu = np.repeat(u, n_copies)
        vv = np.repeat(val, n_copies)
        # local combine: one lexsort + reduceat per batch
        order = np.lexsort((w, uu))
        uu, w, vv = uu[order], w[order], vv[order]
        new = np.concatenate(([True],
                              (uu[1:] != uu[:-1]) | (w[1:] != w[:-1])))
        firsts = np.flatnonzero(new)
        return pa.table({
            "user_id": pa.array(uu[firsts]),
            "window_start": pa.array(w[firsts]),
            "n": pa.array(np.diff(np.concatenate(
                (firsts, [len(uu)]))).astype(np.int64)),
            "vmax": pa.array(np.maximum.reduceat(vv, firsts)),
        })

    return _merge_uw_partials(
        events_ds.select_columns(["user_id", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True))


def _sessions_in_partition(u: np.ndarray, tb: np.ndarray, ts: np.ndarray,
                           gap_us: int) -> tuple[np.ndarray, ...]:
    """Events of one hash partition -> per-(user, time-bucket) sessions.

    One lexsort + segment arithmetic for EVERY (user, bucket) group in the
    partition — no per-group Python. Returns (user, start, end, n_events,
    is_boundary): a session is *boundary* when it is the first or last
    session of its (user, time-bucket) group and may therefore merge with
    a neighbor-bucket session in phase B; interior sessions are final.
    """
    if len(u) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, z, np.empty(0, dtype=bool)
    order = np.lexsort((ts, u))  # tb is a function of ts: sorted within user
    u, tb, ts = u[order], tb[order], ts[order]
    new = np.concatenate(([True],
                          (u[1:] != u[:-1]) | (tb[1:] != tb[:-1])
                          | (ts[1:] - ts[:-1] > gap_us)))
    starts_idx = np.flatnonzero(new)
    ends_idx = np.concatenate((starts_idx[1:], [len(u)])) - 1
    s_user = u[starts_idx]
    s_tb = tb[starts_idx]
    s_start = ts[starts_idx]
    s_end = ts[ends_idx]
    s_n = (ends_idx - starts_idx + 1).astype(np.int64)
    grp_new = np.concatenate(
        ([True], (s_user[1:] != s_user[:-1]) | (s_tb[1:] != s_tb[:-1])))
    is_first = grp_new
    is_last = np.concatenate((grp_new[1:], [True]))
    return s_user, s_start, s_end, s_n, is_first | is_last


def _merge_session_chain(u: np.ndarray, start: np.ndarray, end: np.ndarray,
                         n: np.ndarray, gap_us: int
                         ) -> tuple[np.ndarray, ...]:
    """Per-user chain merge of (disjoint, orderable) sessions with the
    same gap rule — phase B of the two-phase sessionization."""
    if len(u) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, z
    order = np.lexsort((start, u))
    u, start, end, n = u[order], start[order], end[order], n[order]
    new = np.concatenate(
        ([True], (u[1:] != u[:-1]) | (start[1:] - end[:-1] > gap_us)))
    firsts = np.flatnonzero(new)
    out_u = u[firsts]
    out_start = start[firsts]
    out_end = np.maximum.reduceat(end, firsts)
    out_n = np.add.reduceat(n, firsts)
    return out_u, out_start, out_end, out_n


# above this many events the two-phase plan (bounded per-partition rows
# even for a single bot user) takes over; below it the single-phase plan
# (one shuffle, no materialize barrier) is exact and ~2x cheaper — the
# worst case it admits is one user owning every event of a small stream,
# ~10M rows * 16B on one worker (~160 MB, fine)
_SINGLE_PHASE_MAX_EVENTS = 10_000_000


def sessionize(events_ds, gap_s: int = 1800,
               bucket_span_s: int | None = None,
               num_buckets: int = 1024, plan: str = "auto"):
    """events -> (user_id, session_id, session_start, session_end, n_events).

    PLAN DISPATCHER (same pattern as ``verify``): scale-safety must not
    tax the common case. ``plan="auto"`` counts the stream (metadata-cheap
    for fresh reads) and picks:

    - **single** (<= ``_SINGLE_PHASE_MAX_EVENTS``): ONE hash(user)
      exchange; each partition resolves all its users' sessions with one
      lexsort + segment arithmetic. Exact; per-partition rows bounded by
      the event count itself.
    - **two_phase** (above the bound, or unknown count): hash(user,
      time-bucket) partitioning bounds any ONE user's rows per partition
      (a bot user with 10^8 events cannot land on one worker), at the
      cost of a second (boundary-only) shuffle.

    TWO-PHASE gap sessionization with NO per-user group and NO unbounded
    partition (the one-user-one-group formulation puts a single bot user
    with 10^8 events on one worker):

    - **Phase A** partitions by hash(user, time-bucket) — time-buckets of
      ``bucket_span_s`` (default 16x the gap) bound any one user's rows
      per partition by their event rate x span. Each partition resolves
      ALL its (user, bucket) groups with one lexsort + segment
      arithmetic; sessions not touching a bucket edge are final.
    - **Phase B** re-shuffles only the BOUNDARY sessions (<= 2 per (user,
      bucket) — orders of magnitude fewer rows than events) keyed by
      user, and chain-merges consecutive sessions whose gap <= gap_s.
      A session spanning many buckets is a chain of boundary sessions
      and merges correctly; an interior session is separated from every
      other bucket's sessions by its own bucket's first/last sessions,
      so skipping phase B for it is exact.
    """
    if bucket_span_s is None:
        bucket_span_s = gap_s * 16
    ts_type = dict(zip(events_ds.schema().names,
                       events_ds.schema().types))["ts"]
    unit = getattr(ts_type, "unit", "us")
    per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
    gap_u = gap_s * per_s
    span_u = bucket_span_s * per_s
    nbu = np.uint64(num_buckets)

    if plan == "auto":
        # plan choice needs a row count. ds.count() on a DERIVED dataset
        # executes the whole upstream pipeline, which the chosen plan
        # would then re-execute — so answer from metadata when possible
        # (fresh parquet reads / materialized inputs), and otherwise pin
        # the events ONCE with materialize() so the counting pass IS the
        # execution the plan consumes. Callers at a scale where pinning
        # the event table is unacceptable pass plan="two_phase"
        # explicitly (the scale-safe plan never needs the count).
        try:
            n_events = events_ds._meta_count()
        except Exception:
            n_events = None
        if n_events is None:
            events_ds = events_ds.materialize()
            n_events = events_ds.count()
        plan = ("single" if n_events <= _SINGLE_PHASE_MAX_EVENTS
                else "two_phase")

    def project_cols(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        s = t["start"].to_numpy(zero_copy_only=False)
        sid = pa.array([f"{a}_{b}" for a, b in zip(u.tolist(), s.tolist())],
                       type=pa.string())
        return pa.table({
            "user_id": t["u"],
            "session_id": sid,
            "session_start": t["start"].cast(ts_type),
            "session_end": t["end"].cast(ts_type),
            "n_events": t["n"],
        })

    if plan == "single":
        def single_prep(t: pa.Table) -> pa.Table:
            ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            u = t["user_id"].cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            return pa.table({
                "u": pa.array(u), "tsv": pa.array(ts),
                "bucket": pa.array(
                    (u.astype(np.uint64) % nbu).astype(np.int32)),
            })

        def single_resolve(g: pa.Table) -> pa.Table:
            u = g["u"].to_numpy(zero_copy_only=False)
            ts = g["tsv"].to_numpy(zero_copy_only=False)
            # tb == 0 degenerates the phase-A kernel to pure (user, gap)
            # boundaries — the exact single-partition semantics
            su, ss, se, sn, _ = _sessions_in_partition(
                u, np.zeros_like(u), ts, gap_u)
            return pa.table({"u": pa.array(su), "start": pa.array(ss),
                             "end": pa.array(se), "n": pa.array(sn)})

        return (events_ds.select_columns(["user_id", "ts"])
                .map_batches(single_prep, batch_format="pyarrow",
                             zero_copy_batch=True)
                .groupby("bucket")
                .map_groups(single_resolve, batch_format="pyarrow")
                .map_batches(project_cols, batch_format="pyarrow",
                             zero_copy_batch=True))

    def phase_a_prep(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = t["user_id"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tb = ts // span_u
        from lsh_ray.functions.hashing import combine_columns
        bucket = (combine_columns([u.astype(np.uint64),
                                   tb.astype(np.uint64)]) % nbu)
        return pa.table({
            "u": pa.array(u), "tb": pa.array(tb), "tsv": pa.array(ts),
            "bucket": pa.array(bucket.astype(np.int32)),
        })

    def phase_a(g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy(zero_copy_only=False)
        tb = g["tb"].to_numpy(zero_copy_only=False)
        ts = g["tsv"].to_numpy(zero_copy_only=False)
        su, ss, se, sn, boundary = _sessions_in_partition(u, tb, ts, gap_u)
        return pa.table({
            "u": pa.array(su), "start": pa.array(ss), "end": pa.array(se),
            "n": pa.array(sn), "boundary": pa.array(boundary),
        })

    sessions_a = (events_ds.select_columns(["user_id", "ts"])
                  .map_batches(phase_a_prep, batch_format="pyarrow",
                               zero_copy_batch=True)
                  .groupby("bucket")
                  .map_groups(phase_a, batch_format="pyarrow"))
    sessions_a = sessions_a.materialize()

    interior = sessions_a.map_batches(
        lambda t: t.filter(pc.invert(t["boundary"]))
                   .select(["u", "start", "end", "n"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def phase_b_prep(t: pa.Table) -> pa.Table:
        t = t.filter(t["boundary"]).select(["u", "start", "end", "n"])
        u = t["u"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(
            (u.astype(np.uint64) % nbu).astype(np.int32)))

    def phase_b(g: pa.Table) -> pa.Table:
        mu, ms, me, mn = _merge_session_chain(
            g["u"].to_numpy(zero_copy_only=False),
            g["start"].to_numpy(zero_copy_only=False),
            g["end"].to_numpy(zero_copy_only=False),
            g["n"].to_numpy(zero_copy_only=False), gap_u)
        return pa.table({"u": pa.array(mu), "start": pa.array(ms),
                         "end": pa.array(me), "n": pa.array(mn)})

    merged = (sessions_a.map_batches(phase_b_prep, batch_format="pyarrow",
                                     zero_copy_batch=True)
              .groupby("bucket")
              .map_groups(phase_b, batch_format="pyarrow"))

    return interior.union(merged).map_batches(
        project_cols, batch_format="pyarrow", zero_copy_batch=True)


def event_seq(events_ds, bucket_s: int = 3600, key_col: str = "user_id",
              id_col: str = "event_id", ts_col: str = "ts",
              carry_cols: tuple[str, ...] = ()):
    """Per-key running sequence number ordered by (ts, id) — SQL's
    ``row_number() OVER (PARTITION BY key ORDER BY ts, id)`` as a
    two-phase distributed prefix scan with NO per-key group:

    - **Phase 1** aggregates per-(key, time-bucket) COUNTS (volume =
      keys x buckets touched, bounded by time range — never by event
      rate) and turns them into per-key exclusive prefix offsets with a
      ``map_groups`` over that tiny count table (a group = one key's
      buckets, so a bot key with 10^8 events still yields a small group).
    - **Phase 2** co-locates events by (key, bucket) via the pluggable
      exchange; each block lexsorts once and emits local ranks + the
      joined bucket offset. Buckets are a monotone function of ts, so
      bucket-then-(ts, id) order equals global (ts, id) order per key.

    Composite key packs (key, bucket) into one int64 (injective while
    key < 2^31 and epoch-bucket < 2^32 — document wider corpora onto a
    128-bit pack).

    ``carry_cols`` ride along unchanged (value columns a frame
    aggregate downstream needs next to the rank).
    """
    from lsh_ray.stages.join import bucket_join

    _SHIFT = np.int64(2**32)
    # +2^31: pre-1970 timestamps floor to negative buckets; the offset
    # keeps the pack injective across the full epoch range
    _BOFF = np.int64(1 << 31)

    def add_ck(t: pa.Table) -> pa.Table:
        ts_us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = (ts_us // 1_000_000) // bucket_s + _BOFF
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("ck", pa.array(key * _SHIFT + bucket))

    ev = (events_ds.select_columns([id_col, key_col, ts_col,
                                    *carry_cols])
          .map_batches(add_ck, batch_format="pyarrow",
                       zero_copy_batch=True))

    def count_partial(t: pa.Table) -> pa.Table:
        ck, cnt = np.unique(t["ck"].to_numpy(zero_copy_only=False),
                            return_counts=True)
        return pa.table({"ck": pa.array(ck),
                         "cnt": pa.array(cnt.astype(np.int64)),
                         "k": pa.array(ck // _SHIFT)})

    # per-batch partial counts go straight to the co-located boundary
    # block: the cross-block Sum finishes there (the former standalone
    # groupby("ck").aggregate(Sum) paid the native sort-groupby's
    # sample/sort barrier; same fusion as event_lag's boundary pass)
    counts = ev.map_batches(count_partial, batch_format="pyarrow",
                            zero_copy_batch=True)

    def offsets_block(g: pa.Table) -> pa.Table:
        # all keys of one co-located block at once: sorting by ck is
        # key-contiguous with buckets ascending inside each key, so
        # per-key exclusive prefix sums are one cumsum minus each
        # key's base. Duplicate cks (one partial per source batch)
        # Sum-collapse via a segment reduce first.
        if g.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"ck": z, "offset": z})
        ck = g["ck"].to_numpy(zero_copy_only=False)
        n = g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ck)
        ck_s, n_s = ck[order], n[order]
        firsts = _seg_starts(ck_s)
        n_s = np.add.reduceat(n_s, firsts)
        ck_s = ck_s[firsts]
        starts = _seg_starts(ck_s // _SHIFT)
        cum = np.cumsum(n_s) - n_s
        lens = np.diff(np.concatenate((starts, [len(ck_s)])))
        off = cum - np.repeat(cum[starts], lens)
        return pa.table({"ck": pa.array(ck_s), "offset": pa.array(off)})

    offsets = _colocate_by_key(counts, offsets_block)

    def rank_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {c: pa.array([], t.schema.field(c).type)
                    for c in (id_col, key_col, ts_col)}
            cols["seq_no"] = pa.array([], pa.int64())
            for c in carry_cols:
                cols[c] = pa.array([], t.schema.field(c).type)
            return pa.table(cols)
        ck = t["ck"].to_numpy(zero_copy_only=False)
        ts_us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts_us, ck))
        ck_s = ck[order]
        new = np.concatenate(([True], ck_s[1:] != ck_s[:-1]))
        starts = np.flatnonzero(new)
        local = np.arange(len(ck_s), dtype=np.int64)
        local -= np.repeat(starts, np.diff(
            np.concatenate((starts, [len(ck_s)]))))
        off_s = t["offset_r"].to_numpy(zero_copy_only=False)[order]
        idx = pa.array(order, type=pa.int64())
        out = {
            id_col: t[id_col].take(idx),
            key_col: t[key_col].take(idx),
            ts_col: t[ts_col].take(idx),
            "seq_no": pa.array(off_s + local + 1),
        }
        for c in carry_cols:
            out[c] = t[c].take(idx)
        return pa.table(out)

    # the join already co-locates every ck in one bucket, so the rank
    # kernel fuses into it (post_fn) instead of paying a second
    # full-table exchange on the same key
    return bucket_join(ev, offsets, "ck", "ck", ["offset"],
                       suffix="_r", post_fn=rank_block)


def event_lead(events_ds, bucket_s: int = 3600,
               key_col: str = "user_id", id_col: str = "event_id",
               ts_col: str = "ts"):
    """Per-key LEAD(ts) ordered by (ts, id): the mirror of
    ``event_lag`` — boundary table carries each (key, bucket)'s FIRST
    timestamp (grouped Min), shifted one bucket backwards, so the last
    event of a bucket learns its successor in the next nonempty
    bucket. Output: (id, key, ts, next_ts, gap_us) with
    gap = next - ts (NULL on each key's last event)."""
    return event_lag(events_ds, bucket_s, key_col, id_col, ts_col,
                     direction="lead")


def event_lag(events_ds, bucket_s: int = 3600, key_col: str = "user_id",
              id_col: str = "event_id", ts_col: str = "ts",
              direction: str = "lag"):
    """Per-key LAG(ts) ordered by (ts, id) — SQL's
    ``lag(ts) OVER (PARTITION BY key ORDER BY ts, id)`` — plus the gap
    in microseconds, with NO per-key group (hot-key safe):

    - **Boundary table**: one grouped Max over per-batch partials gives
      the LAST event timestamp of every (key, time-bucket) — volume =
      keys x buckets touched, never event rate. A ``map_groups`` over
      that tiny table (a group = one key's buckets) shifts it by one
      bucket: each bucket learns the last timestamp of its key's
      PREVIOUS nonempty bucket (the predecessor of its first event,
      because ts dominates the (ts, id) order).
    - **One (key, bucket) exchange** co-locates events (the lag kernel
      runs fused inside the boundary join's bucket); each block
      lexsorts once and takes within-bucket lags by a vectorized shift,
      first-of-bucket rows from the joined boundary value. First event
      of a key has no predecessor -> NULL (explicit validity flag, so
      pre-1970 timestamps are legitimate values).

    ``direction="lead"`` mirrors everything (Min boundary, backward
    shift, successor instead of predecessor) — see ``event_lead``.
    Same int64 (key, bucket) pack as ``event_seq``. Output:
    (id, key, ts, prev_ts|next_ts, gap_us).
    """
    from lsh_ray.stages.join import bucket_join

    if direction not in ("lag", "lead"):
        raise ValueError("direction must be 'lag' or 'lead'")
    lead = direction == "lead"
    out_col = "next_ts" if lead else "prev_ts"
    ts_type = dict(zip(events_ds.schema().names,
                       events_ds.schema().types))[ts_col]

    ev = (events_ds.select_columns([id_col, key_col, ts_col])
          .map_batches(_add_ck_us, batch_format="pyarrow",
                       zero_copy_batch=True,
                       fn_kwargs={"key_col": key_col, "ts_col": ts_col,
                                  "bucket_s": bucket_s}))

    def last_partial(t: pa.Table) -> pa.Table:
        # lag keeps each ck's LAST ts per batch (Max-combine), lead its
        # FIRST (Min-combine)
        ck = t["ck"].to_numpy(zero_copy_only=False)
        ts_us = _ts_us(t[ts_col])
        order = np.lexsort((ts_us, ck))
        ck_s, ts_s = ck[order], ts_us[order]
        if lead:
            keep = np.concatenate(([True], ck_s[1:] != ck_s[:-1]))
        else:
            keep = np.concatenate((ck_s[1:] != ck_s[:-1], [True]))
        ck_k = ck_s[keep]
        return pa.table({"ck": pa.array(ck_k),
                         "last_us": pa.array(ts_s[keep]),
                         "k": pa.array(ck_k // _CK_SHIFT)})

    # the cross-block Min/Max over per-batch partials finishes INSIDE
    # the co-located boundary block below — the former standalone
    # groupby("ck").aggregate(Min/Max) computed the same thing but paid
    # the native sort-groupby's sample/sort barrier (the dup_ngram
    # lesson: ~1-3 s of fixed floor per native groupby at sf0.1).
    # Hot-key safety is unchanged: the colocated block receives
    # per-(batch, bucket) partials — at most blocks x buckets rows per
    # key, never O(events) — and reduces them vectorized.
    lasts = ev.map_batches(last_partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def prev_block(g: pa.Table) -> pa.Table:
        # all keys of one co-located block at once: ck-sorted rows are
        # key-contiguous with buckets ascending, so the one-bucket
        # shift is a vectorized shift masked at key-segment edges.
        # Explicit validity flag, NOT a timestamp sentinel: negative
        # (pre-1970) ts are legitimate.
        if g.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"ck": z, "prev_us": z,
                             "has_prev": pa.array([], pa.bool_())})
        ck_c = g["ck"].to_numpy(zero_copy_only=False)
        last_c = g["last_us"].to_numpy(zero_copy_only=False)
        o = np.lexsort((last_c, ck_c))
        ck = ck_c[o]
        last = last_c[o]
        # finish the cross-block reduction: duplicate cks (one partial
        # per source batch) collapse to their Min (lead) / Max (lag) —
        # the first / last element of each ck run after the lexsort
        if len(ck):
            if lead:
                keep = np.concatenate(([True], ck[1:] != ck[:-1]))
            else:
                keep = np.concatenate((ck[1:] != ck[:-1], [True]))
            ck = ck[keep]
            last = last[keep]
        starts = _seg_starts(ck // _CK_SHIFT)
        is_first = np.zeros(len(ck), dtype=bool)
        is_first[starts] = True
        prev = np.zeros(len(ck), dtype=np.int64)
        has = np.zeros(len(ck), dtype=bool)
        if lead:
            prev[:-1] = last[1:]
            is_last = np.concatenate((is_first[1:], [True]))
            has = ~is_last
        else:
            prev[1:] = last[:-1]
            has = ~is_first
        return pa.table({"ck": pa.array(ck), "prev_us": pa.array(prev),
                         "has_prev": pa.array(has)})

    prevs = _colocate_by_key(lasts, prev_block)

    def lag_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], t.schema.field(id_col).type),
                key_col: pa.array([], t.schema.field(key_col).type),
                ts_col: pa.array([], ts_type),
                out_col: pa.array([], ts_type),
                "gap_us": pa.array([], pa.int64())})
        ck = t["ck"].to_numpy(zero_copy_only=False)
        ts_us = _ts_us(t[ts_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts_us, ck))
        ck_s, ts_s = ck[order], ts_us[order]
        bnd = t["prev_us_r"].to_numpy(zero_copy_only=False)[order]
        has = t["has_prev_r"].to_numpy(zero_copy_only=False)[order] \
            .astype(bool)
        prev = np.empty(len(ts_s), dtype=np.int64)
        if lead:
            prev[:-1] = ts_s[1:]
            edge = np.concatenate((ck_s[1:] != ck_s[:-1], [True]))
        else:
            prev[1:] = ts_s[:-1]
            edge = np.concatenate(([True], ck_s[1:] != ck_s[:-1]))
        prev[edge] = bnd[edge]
        miss = edge & ~has
        idx = pa.array(order, type=pa.int64())
        prev_arr = pa.array(prev, mask=miss).cast(
            pa.timestamp("us")).cast(ts_type)
        gap = pa.array(prev - ts_s if lead else ts_s - prev, mask=miss)
        return pa.table({
            id_col: t[id_col].take(idx),
            key_col: t[key_col].take(idx),
            ts_col: t[ts_col].take(idx),
            out_col: prev_arr,
            "gap_us": gap,
        })

    # fuse the lag kernel into the boundary join's bucket (one
    # full-table exchange instead of join + re-colocation)
    return bucket_join(ev, prevs, "ck", "ck",
                       ["prev_us", "has_prev"], suffix="_r",
                       post_fn=lag_block)


def moving_frame_avg(events_ds, k: int = 3, key_col: str = "user_id",
                     id_col: str = "event_id", ts_col: str = "ts",
                     value_col: str = "value", ndigits: int = 6,
                     plan: str = "boundary"):
    """Per-key moving average over the last ``k`` rows ordered by
    (ts, id) — SQL's ``AVG(value) OVER (PARTITION BY key ORDER BY ts,
    id ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW)``.

    ``plan="boundary"`` (default — each event crosses ONE exchange):
    the ``event_lag`` boundary-table idea generalized to carry the
    last k-1 (value, validity) slots of every (key, time-bucket) into
    the NEXT bucket. Per-batch tail candidates reduce to exact
    per-bucket tails in a tiny grouped pass; a per-key ``map_groups``
    over that bucket-cardinality table chains tails across buckets
    (a bucket with fewer than k-1 rows borrows the remainder from
    earlier buckets); one co-location exchange then resolves every
    frame locally — predecessors inside the bucket by vectorized
    shifts, the first k-1 rows of each bucket from the carried slots.

    ``plan="join"`` (parity reference): ``event_seq`` rank + k-1
    bucketed LEFT self-joins on the injective (key, seq-j) pack —
    ships every event k times; kept for cross-plan equivalence tests.

    Both plans are hot-key-safe: no per-key group of events ever
    materializes.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if plan not in ("boundary", "join"):
        raise ValueError("plan must be 'boundary' or 'join'")
    from lsh_ray.functions.num import round_half_away
    from lsh_ray.stages.join import bucket_join

    _SHIFT = np.int64(2**32)

    if plan == "boundary":
        return _moving_avg_boundary(events_ds, k, key_col, id_col,
                                    ts_col, value_col, ndigits)

    seq = event_seq(events_ds, key_col=key_col, id_col=id_col,
                    ts_col=ts_col, carry_cols=(value_col,))

    def add_packs(t: pa.Table) -> pa.Table:
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["seq_no"].to_numpy(zero_copy_only=False)
        t = t.append_column("pk", pa.array(key * _SHIFT + s))
        for j in range(1, k):
            # seq-j < 1 means "before the partition": a negative
            # sentinel distinct per j that can never equal a real pack
            lk = np.where(s - j >= 1, key * _SHIFT + (s - j),
                          np.int64(-j))
            t = t.append_column(f"jk{j}", pa.array(lk))
        return t

    cur = seq.map_batches(add_packs, batch_format="pyarrow",
                          zero_copy_batch=True)
    right = cur.select_columns(["pk", value_col])
    for j in range(1, k):
        cur = bucket_join(cur, right, f"jk{j}", "pk", [value_col],
                          suffix=f"_m{j}", how="left")

    def finish(t: pa.Table) -> pa.Table:
        n = t.num_rows
        s = t["seq_no"].to_numpy(zero_copy_only=False)
        width = np.minimum(s, k).astype(np.float64)
        total = np.zeros(n, dtype=np.float64)
        # ascending seq order: v[p-k+1] + ... + v[p]
        for j in range(k - 1, 0, -1):
            col = t[f"{value_col}_m{j}"]
            v = col.to_numpy(zero_copy_only=False)
            total += np.where(np.isnan(v.astype(np.float64)), 0.0, v)
        total += t[value_col].to_numpy(zero_copy_only=False)
        avg = round_half_away(total / width, ndigits)
        return pa.table({
            id_col: t[id_col], key_col: t[key_col], ts_col: t[ts_col],
            f"avg{k}": pa.array(avg),
        })

    return cur.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


def _moving_avg_boundary(events_ds, k: int, key_col: str, id_col: str,
                         ts_col: str, value_col: str, ndigits: int,
                         bucket_s: int = 3600):
    """Boundary-scan frame-average plan (see ``moving_frame_avg``):
    each event crosses exactly one exchange; cross-bucket frame slots
    travel in a bucket-cardinality carry table."""
    from lsh_ray.functions.num import round_half_away
    from lsh_ray.stages.join import bucket_join

    km1 = k - 1

    ev = (events_ds.select_columns([id_col, key_col, ts_col, value_col])
          .map_batches(_add_ck_us, batch_format="pyarrow",
                       zero_copy_batch=True,
                       fn_kwargs={"key_col": key_col, "ts_col": ts_col,
                                  "bucket_s": bucket_s}))

    if km1 == 0:
        def avg1(t: pa.Table) -> pa.Table:
            v = t[value_col].to_numpy(zero_copy_only=False)
            return pa.table({
                id_col: t[id_col], key_col: t[key_col],
                ts_col: t[ts_col],
                f"avg{k}": pa.array(round_half_away(
                    v.astype(np.float64), ndigits))})
        return ev.map_batches(avg1, batch_format="pyarrow",
                              zero_copy_batch=True)

    def tail_partial(t: pa.Table) -> pa.Table:
        # a ck's true global last k-1 rows are among each batch's last
        # k-1 rows of that ck, so per-batch tails are a safe candidate
        # superset (volume <= batches x buckets x (k-1), never rate)
        ck = t["ck"].to_numpy(zero_copy_only=False)
        ts_us = _ts_us(t[ts_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts_us, ck))
        from_end, _ = _seg_from_end(ck[order])
        keep_idx = order[from_end < km1]
        kt = t.take(pa.array(keep_idx, type=pa.int64()))
        return pa.table({"ck": kt["ck"],
                         "tsv": pa.array(_ts_us(kt[ts_col])),
                         "idv": kt[id_col],
                         "val": kt[value_col]})

    def trim_block(t: pa.Table) -> pa.Table:
        # one co-located block (complete cks): trim EVERY ck segment to
        # its true last k-1 rows in one vectorized pass — per-ck
        # exactness without per-group dispatch (a map_groups over the
        # ~users x buckets ck groups pays per-group Python overhead;
        # measured 3.6 -> 11 s at 100k events). Running this per-CK
        # before any per-key group forms keeps the key chain at bucket
        # cardinality even for a hot key spread over many blocks.
        if t.num_rows == 0:
            return t.append_column("k", pa.array([], pa.int64()))
        ck = t["ck"].to_numpy(zero_copy_only=False)
        ts_us = t["tsv"].to_numpy(zero_copy_only=False)
        ids = t["idv"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts_us, ck))
        from_end, _ = _seg_from_end(ck[order])
        keep = order[from_end < km1]
        kt = t.take(pa.array(np.sort(keep), type=pa.int64()))
        return kt.append_column(
            "k", pa.array(kt["ck"].to_numpy(zero_copy_only=False)
                          // _CK_SHIFT))

    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import colocate_map
    nblocks = coalesce_blocks()
    nbu = np.uint64(nblocks)

    def add_bucket(t: pa.Table) -> pa.Table:
        ckv = t["ck"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "bucket", pa.array((ckv % nbu).astype(np.int32)))

    cands = ev.map_batches(tail_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    tails = colocate_map(cands, ["ck"], nblocks, trim_block,
                         sort_bucket_expr=add_bucket)

    def carry_block(g: pa.Table) -> pa.Table:
        # all keys of one co-located block at once: exact per-bucket
        # tails (<= (k-1) rows per ck after the trim stage), ck-sorted
        # so buckets are ascending inside each key-contiguous run.
        # Every bucket's carry slots are the k-1 rows immediately
        # before its segment in the concatenated tail list — valid only
        # while they stay inside the SAME key's run (earlier buckets
        # contribute their true last rows in order, so the suffix IS
        # the true cross-bucket tail chain).
        if g.num_rows == 0:
            cols = {"ck": pa.array([], pa.int64())}
            for j in range(1, k):
                cols[f"cv{j}"] = pa.array([], pa.float64())
                cols[f"ch{j}"] = pa.array([], pa.bool_())
            return pa.table(cols)
        ck = g["ck"].to_numpy(zero_copy_only=False)
        ts_us = g["tsv"].to_numpy(zero_copy_only=False)
        ids = g["idv"].to_numpy(zero_copy_only=False)
        val = g["val"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts_us, ck))
        ck_e, val_e = ck[order], val[order]
        firsts = _seg_starts(ck_e)
        key_starts = _seg_starts(ck_e // _CK_SHIFT)
        lens = np.diff(np.concatenate((key_starts, [len(ck_e)])))
        key_first_per_row = np.repeat(key_starts, lens)
        key_first = key_first_per_row[firsts]
        out = {"ck": pa.array(ck_e[firsts])}
        for j in range(1, k):
            pos = firsts - j
            ok = pos >= key_first
            v = np.zeros(len(firsts), dtype=np.float64)
            v[ok] = val_e[pos[ok]]
            out[f"cv{j}"] = pa.array(v)
            out[f"ch{j}"] = pa.array(ok)
        return pa.table(out)

    carry = _colocate_by_key(tails, carry_block)
    carry_cols = [f"cv{j}" for j in range(1, k)] \
        + [f"ch{j}" for j in range(1, k)]

    ts_type = dict(zip(events_ds.schema().names,
                       events_ds.schema().types))[ts_col]

    def frame_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], t.schema.field(id_col).type),
                key_col: pa.array([], t.schema.field(key_col).type),
                ts_col: pa.array([], ts_type),
                f"avg{k}": pa.array([], pa.float64())})
        ck = t["ck"].to_numpy(zero_copy_only=False)
        ts_us = _ts_us(t[ts_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts_us, ck))
        ck_s = ck[order]
        val_s = t[value_col].to_numpy(zero_copy_only=False)[order] \
            .astype(np.float64)
        cv = [t[f"cv{j}_r"].to_numpy(zero_copy_only=False)[order]
              for j in range(1, k)]
        ch = [t[f"ch{j}_r"].to_numpy(zero_copy_only=False)[order]
              .astype(bool) for j in range(1, k)]
        starts = _seg_starts(ck_s)
        p = np.arange(len(ck_s), dtype=np.int64) - np.repeat(
            starts, np.diff(np.concatenate((starts, [len(ck_s)]))))
        cnt_prev = np.zeros(len(ck_s), dtype=np.int64)
        for h in ch:
            cnt_prev += h
        navail = np.minimum(p + cnt_prev, km1)
        total = val_s.copy()
        idxs = np.arange(len(ck_s))
        cv_stack = None
        for j in range(1, k):
            include = j <= navail
            pred = np.zeros(len(ck_s), dtype=np.float64)
            local = include & (p >= j)
            pred[local] = val_s[idxs[local] - j]
            borrow = include & (p < j)
            if borrow.any():
                slot = (j - p)[borrow]          # 1..k-1 by construction
                bidx = np.flatnonzero(borrow)
                # one stacked gather instead of (k-1) masked re-slices
                if cv_stack is None:
                    cv_stack = np.stack(cv)
                pred[borrow] = cv_stack[slot - 1, bidx]
            total += np.where(include, pred, 0.0)
        width = (navail + 1).astype(np.float64)
        idx = pa.array(order, type=pa.int64())
        return pa.table({
            id_col: t[id_col].take(idx),
            key_col: t[key_col].take(idx),
            ts_col: t[ts_col].take(idx),
            f"avg{k}": pa.array(round_half_away(total / width,
                                                ndigits)),
        })

    # frame kernel fused into the carry join (one full-table exchange)
    return bucket_join(ev, carry, "ck", "ck", carry_cols,
                       suffix="_r", post_fn=frame_block)
