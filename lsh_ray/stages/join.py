"""Partitioned hash join supporting arbitrary Arrow column types.

``ray.data.Dataset.join`` delegates to Acero, which rejects nested
(``list<...>``) non-key columns — exactly what the verify stage must carry
(per-doc shingle sets). This module implements the portable explicit
pattern instead: add ``bucket = hash(key) % NB`` to both sides, union them,
``groupby(bucket)``, and join matching buckets vectorized inside
``map_groups`` (searchsorted on the unique-key side). One shuffle, any
column types, deterministic partitioning; NB bounds per-task memory.

Semantics: inner / left / full-outer. With ``unique_right=True`` (the
default; every signature/dimension use here) the right key must be
unique and matches resolve with one searchsorted; ``unique_right=False``
enables general MANY-TO-MANY matching (cartesian per key) with
vectorized expansion.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_NUM_BUCKETS = 1024
_SIDE_COL = "__side"
_KEY_COL = "__jkey"
_BUCKET_COL = "__bucket"


def _null_array(dtype: pa.DataType, n: int) -> pa.Array:
    return pa.nulls(n, type=dtype)


def key_u64(col) -> np.ndarray:
    """Join-key column -> uint64 numpy array (strings hashed)."""
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        from lsh_ray.functions.hashing import hash_strings
        return hash_strings(arr)
    return arr.astype(np.uint64)


def _join_bucket(group: pa.Table, left_cols: list[str],
                 right_cols: list[str], how: str = "inner") -> pa.Table:
    """``right_cols`` here are the ALREADY-SUFFIXED output names (renamed
    before the union so a right payload column may share its original name
    with a left column without clobbering it)."""
    side = group[_SIDE_COL].to_numpy(zero_copy_only=False)
    left = group.filter(pa.array(side == 0))
    right = group.filter(pa.array(side == 1))
    lk = left[_KEY_COL].to_numpy(zero_copy_only=False)
    rk = right[_KEY_COL].to_numpy(zero_copy_only=False)
    order = np.argsort(rk)
    rk_sorted = rk[order]
    idx = np.searchsorted(rk_sorted, lk)
    idx[idx == len(rk_sorted)] = max(len(rk_sorted) - 1, 0)
    if len(rk_sorted) == 0:
        hit = np.zeros(len(lk), dtype=bool)
    else:
        hit = rk_sorted[idx] == lk
    keep = np.ones(len(lk), dtype=bool) if how == "left" else hit
    left_kept = left.filter(pa.array(keep))
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for c in left_cols:
        cols[c] = left_kept[c]
    if how == "left":
        # matched rows take the right payload; unmatched get nulls.
        # Arrow `take` propagates NULL indices as null output rows, so a
        # masked index array null-fills in C++ for every column type
        # (including list<> payloads) — no Python round-trip.
        if len(rk_sorted):
            take_pos = np.where(hit, order[np.where(hit, idx, 0)], 0)
            indices = pa.array(take_pos, mask=~hit, type=pa.int64())
            right_taken = right.take(indices)
        for c in right_cols:
            if len(rk_sorted):
                cols[c] = right_taken[c]
            else:
                cols[c] = pa.nulls(left_kept.num_rows,
                                   group.schema.field(c).type)
    else:
        take_idx = order[idx[hit]]
        right_taken = right.take(pa.array(take_idx, type=pa.int64()))
        for c in right_cols:
            cols[c] = right_taken[c]
    return pa.table(cols)


def _join_bucket_many(group: pa.Table, left_cols: list[str],
                      right_cols: list[str], how: str) -> pa.Table:
    """Many-to-many bucket join: every (left row, right row) key match is
    emitted (cartesian per key, expanded with cumsum/repeat arithmetic —
    no per-row Python). ``how``: inner | left | outer."""
    side = group[_SIDE_COL].to_numpy(zero_copy_only=False)
    left = group.filter(pa.array(side == 0))
    right = group.filter(pa.array(side == 1))
    lk = left[_KEY_COL].to_numpy(zero_copy_only=False)
    rk = right[_KEY_COL].to_numpy(zero_copy_only=False)
    order = np.argsort(rk, kind="stable")
    rks = rk[order]
    lo = np.searchsorted(rks, lk, side="left")
    hi = np.searchsorted(rks, lk, side="right")
    cnt = hi - lo
    rows_l = np.repeat(np.arange(len(lk)), cnt)
    ends = np.cumsum(cnt)
    total = int(ends[-1]) if len(ends) else 0
    flat = (np.arange(total) - np.repeat(ends - cnt, cnt)
            + np.repeat(lo, cnt))
    rows_r = order[flat]
    lt = left.take(pa.array(rows_l, type=pa.int64()))
    rt = right.take(pa.array(rows_r, type=pa.int64()))
    cols: dict = {c: lt[c] for c in left_cols}
    for c in right_cols:
        cols[c] = rt[c]
    out = pa.table(cols)
    parts = [out]
    if how in ("left", "outer"):
        miss_l = left.filter(pa.array(cnt == 0))
        if miss_l.num_rows:
            cols = {c: miss_l[c] for c in left_cols}
            for c in right_cols:
                cols[c] = pa.nulls(miss_l.num_rows,
                                   group.schema.field(c).type)
            parts.append(pa.table(cols))
    if how == "outer":
        matched_r = np.zeros(len(rk), dtype=bool)
        matched_r[rows_r] = True
        miss_r = right.filter(pa.array(~matched_r))
        if miss_r.num_rows:
            cols = {c: pa.nulls(miss_r.num_rows, group.schema.field(c).type)
                    for c in left_cols}
            for c in right_cols:
                cols[c] = miss_r[c]
            parts.append(pa.table(cols))
    return pa.concat_tables(parts) if len(parts) > 1 else out


def bucket_join(left_ds, right_ds, left_key: str, right_key: str,
                right_columns: list[str], suffix: str = "",
                num_buckets: int = _NUM_BUCKETS, how: str = "inner",
                unique_right: bool = True,
                num_blocks: int | None = None,
                post_fn=None):
    """Join ``left_ds`` with unique-keyed ``right_ds`` (inner or left outer).

    Output = all left columns + ``right_columns`` (each renamed with
    ``suffix``; null-filled for unmatched left rows when ``how="left"``).
    Keys are uint64-compatible integers or strings (hashed).

    ``num_blocks`` overrides the pre-shuffle coalesce width (the default
    derives from cluster CPUs) — pass a small value for tiny tables so
    they don't pay wide-exchange overhead.

    ``post_fn`` runs on each joined bucket BEFORE it is emitted. The
    join co-locates every left key in one bucket, so a kernel needing
    all rows of a key together (rank, lag, frame resolve) can fuse here
    instead of paying a second full-table co-location exchange on the
    same key — the output schema becomes whatever ``post_fn`` returns.

    The pre-shuffle union is coalesced to ``num_buckets`` blocks: the
    sort shuffle's merge cost grows superlinearly with input block COUNT
    (7x observed with hundreds of tiny blocks), and the bucketed shuffle
    cannot use more than ``num_buckets`` reducers anyway. At cluster
    scale, ``num_buckets`` is the shuffle-parallelism knob — size it to
    ~ total_bytes / 100 MB.
    """
    if how == "outer" and unique_right:
        # _join_bucket only implements inner/left; silently degrading
        # a full-outer request to inner would drop right-only rows
        raise ValueError("how='outer' requires unique_right=False")
    left_schema = left_ds.schema()
    # the key may also ride as a payload column (outer joins need it on
    # both sides to coalesce) — dedupe the projection
    right_sel = right_ds.select_columns(
        list(dict.fromkeys([right_key, *right_columns])))
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

    _key_u64 = key_u64

    def prep_left(t: pa.Table) -> pa.Table:
        k = _key_u64(t[left_key])
        cols = {c: t[c] for c in left_cols}
        for c in right_columns:
            cols[rename[c]] = _null_array(right_types[c], t.num_rows)
        cols[_KEY_COL] = pa.array(k, type=pa.uint64())
        cols[_BUCKET_COL] = pa.array((k % nb).astype(np.int32))
        cols[_SIDE_COL] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    def prep_right(t: pa.Table) -> pa.Table:
        k = _key_u64(t[right_key])
        cols = {c: _null_array(left_types[c], t.num_rows) for c in left_cols}
        for c in right_columns:
            cols[rename[c]] = t[c]
        cols[_KEY_COL] = pa.array(k, type=pa.uint64())
        cols[_BUCKET_COL] = pa.array((k % nb).astype(np.int32))
        cols[_SIDE_COL] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    tagged_left = left_ds.map_batches(prep_left, batch_format="pyarrow",
                                      zero_copy_batch=True)
    tagged_right = right_sel.map_batches(prep_right, batch_format="pyarrow",
                                         zero_copy_batch=True)
    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import colocate_map
    nblocks = num_blocks if num_blocks else coalesce_blocks()
    both = tagged_left.union(tagged_right)

    def join_block(g: pa.Table) -> pa.Table:
        out = (_join_bucket(g, left_cols, out_right_cols, how)
               if unique_right else
               _join_bucket_many(g, left_cols, out_right_cols, how))
        return post_fn(out) if post_fn is not None else out

    # hash mode co-locates on the u64 key itself (one exchange); the
    # sort fallback groups on the precomputed coarse bucket column
    return colocate_map(both, [_KEY_COL], nblocks, join_block,
                        bucket_col=_BUCKET_COL)


_ANTI_TAG = "__present"


def _mix_u64(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer over salted keys -> uniform uint64."""
    z = x.astype(np.uint64) ^ np.uint64(salt)
    z = (z + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def bloom_build(keys: np.ndarray, m_bits: int, k: int = 4) -> np.ndarray:
    """uint64 keys -> Bloom bitmap as a uint64 word array (m_bits/64
    words). Double hashing (h1 + i*h2) gives k probe positions from two
    splitmix mixes — the standard Kirsch-Mitzenmacher construction."""
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    h1 = _mix_u64(keys, 0x243F6A8885A308D3)
    h2 = _mix_u64(keys, 0x13198A2E03707344) | np.uint64(1)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        np.bitwise_or.at(words, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))
    return words


def bloom_maybe_contains(words: np.ndarray, keys: np.ndarray,
                         k: int = 4) -> np.ndarray:
    """Bool mask: True = possibly present, False = DEFINITELY absent."""
    m_bits = len(words) * 64
    h1 = _mix_u64(keys, 0x243F6A8885A308D3)
    h2 = _mix_u64(keys, 0x13198A2E03707344) | np.uint64(1)
    out = np.ones(len(keys), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        bit = (words[(idx >> np.uint64(6)).astype(np.int64)]
               >> (idx & np.uint64(63))) & np.uint64(1)
        out &= bit.astype(bool)
    return out


def _bloom_from_ds(ds, key_col: str, m_bits: int, k: int = 4
                   ) -> np.ndarray:
    """Distributed Bloom build: one fixed-size partial bitmap per
    block (mergeable by bitwise OR — the same one-round tree-reduction
    shape as the HLL sketch), folded on the driver."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        w = bloom_build(key_u64(t[key_col]), m_bits, k)
        return pa.table({"w": pa.array([w], type=pa.list_(
            pa.uint64(), len(w)))})

    rows = ds.select_columns([key_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in rows:
        words |= np.asarray(r["w"], dtype=np.uint64)
    return words


def anti_join(left_ds, right_ds, left_key: str, right_key: str,
              num_blocks: int | None = None,
              bloom_bits: int | None = None):
    """Left rows with NO key match on the right (SQL ``NOT EXISTS`` /
    ``ANTI JOIN``): the right side ships only (key, int8 tag) through
    the bucketed left join, survivors are the null-tag rows. Right
    keys need not be unique (duplicates collapse per bucket via the
    unique-right searchsorted resolving to SOME tagged row — presence
    is all that matters).

    ``bloom_bits`` (power of two, e.g. ``1 << 23``) enables the
    Bloom-prefilter plan for a LARGE right side: a distributed Bloom of
    right keys is OR-folded once and broadcast via ``ray.put``; left
    rows the filter proves ABSENT are emitted as survivors without
    touching any exchange, and only maybe-present rows (right-side
    cardinality x false-positive rate) pay the exact bucketed join.
    Exchange volume drops from |left| to ~|matches|. The left side is
    pinned once (``materialize``) so the two output streams share one
    scan. False positives only ever route a row through the EXACT
    join — the result is identical by construction."""
    if bloom_bits is not None:
        import ray

        if bloom_bits & (bloom_bits - 1) or bloom_bits < 64:
            raise ValueError("bloom_bits must be a power of two >= 64")
        words_ref = ray.put(_bloom_from_ds(right_ds, right_key,
                                           bloom_bits))

        def mark(t: pa.Table, ref=None) -> pa.Table:
            w = ray.get(ref)
            maybe = bloom_maybe_contains(w, key_u64(t[left_key]))
            return t.append_column("__maybe", pa.array(maybe))

        marked = left_ds.map_batches(
            mark, batch_format="pyarrow", zero_copy_batch=True,
            fn_kwargs={"ref": words_ref}).materialize()
        def keep_sure(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.invert(t["__maybe"])).drop(["__maybe"])

        def keep_maybe(t: pa.Table) -> pa.Table:
            return t.filter(t["__maybe"]).drop(["__maybe"])

        sure = marked.map_batches(keep_sure, batch_format="pyarrow",
                                  zero_copy_batch=True)
        cand = marked.map_batches(keep_maybe, batch_format="pyarrow",
                                  zero_copy_batch=True)
        exact = anti_join(cand, right_ds, left_key, right_key,
                          num_blocks=num_blocks)
        return sure.union(exact)
    def tag(t: pa.Table) -> pa.Table:
        # per-bucket presence probe: one tagged row per distinct key
        keys = t[right_key].unique() if isinstance(
            t[right_key], pa.ChunkedArray) else pa.chunked_array(
            [t[right_key]]).unique()
        return pa.table({right_key: keys,
                         _ANTI_TAG: pa.array(
                             np.ones(len(keys), dtype=np.int8))})

    probe = right_ds.select_columns([right_key]).map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True)
    # per-batch dedupe above shrinks probe volume but is NOT globally
    # unique (the same key appears once per batch that holds it), so
    # route through the duplicate-tolerant join kernel: a matched left
    # row emits one row per surviving probe duplicate — all dropped by
    # keep_missing below — while each unmatched row emits exactly one
    # null-tag row. Relying on unique_right=True here would lean on an
    # undocumented resolve-to-some-row behavior of the unique kernel.
    j = bucket_join(left_ds, probe, left_key, right_key, [_ANTI_TAG],
                    how="left", num_blocks=num_blocks,
                    unique_right=False)

    def keep_missing(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.is_null(t[_ANTI_TAG])).drop([_ANTI_TAG])

    return j.map_batches(keep_missing, batch_format="pyarrow",
                         zero_copy_batch=True)
