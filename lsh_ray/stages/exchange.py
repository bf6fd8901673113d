"""Hash-partition exchange: the single-all-to-all replacement for the
``repartition(n) -> groupby(bucket) -> map_groups(fn)`` pattern.

The sort-based groupby plan costs, per wide stage: a coalesce exchange, a
key-sampling barrier (which must see every upstream block before the sort
can range-partition), the sort exchange itself, and the reduce. All the
bucket group-functions in this package only need CO-LOCATION — every row
of a key in one task's input, order irrelevant (they lexsort internally)
— so the sample + sort work is pure overhead. Ray Data's hash-shuffle
strategy (``Dataset.repartition(num_blocks, keys=[...], sort=False)``)
provides exactly co-location in ONE exchange with no sampling barrier:
map tasks append to per-partition streams consumed by aggregator actors,
so the exchange also pipelines with upstream stages instead of draining
them first. Measured on this box (10M rows, 1M keys): 24.5s -> 8.1s at 8
CPUs, 14.7s -> 4.9s at 32 vs the sort plan.

This was the round-2 scaling bottleneck: each sort-groupby pair added a
fixed ~1-3s barrier floor per job regardless of data size, which at 8->32
CPUs dominated the wall (efficiency 0.41). Fewer + cheaper barriers move
that floor, not just the per-byte cost.

Sizing notes (why the context knobs below):

- Aggregator actors reserve ``0.0625 CPU x num_partitions`` per exchange
  by default (4 CPUs at the default 64 partitions). A streaming pipeline
  with several concurrent exchanges can reserve ALL logical CPUs at
  ``num_cpus=8``, starving the map side — the probable cause of the
  round-1 "hash shuffle hangs" observation. We cap each exchange's pool
  at ~1/4 of the cluster.
- The strategy flag lives on the per-dataset ``DataContext`` (each
  Dataset deep-copies the ambient context at creation and shares it down
  its chain), so flipping it here affects only pipelines that route
  through this module — never the driver's global context.

Three modes, selectable via ``LSH_RAY_EXCHANGE`` (A/B lever):

- ``tasks`` (default): a minimal two-wave MapReduce exchange with raw
  Ray tasks — per input block, ONE split task partitions rows by key
  hash into W slices (``num_returns=W``); W reduce tasks concat their
  slices and run the block function. No sampling wave, no per-slice
  sort-merge, no actor pool. Measured (3.5M pair rows, 64 blocks,
  this box): 0.5s vs 1.1s sort-groupby vs 4.9s Ray hash-shuffle at 32
  CPUs — and flat across 8 vs 32 CPUs, so it cuts exactly the
  fixed-floor component that capped 8->32 job scaling.
  SCALE BOUND: the M x W slice-object metadata is the classic simple-
  shuffle quadratic; above ``_TASKS_MAX_SLICES`` total slices the call
  silently falls back to "sort" (Ray Data's sort shuffle with
  push-based large-cluster paths) — so 100-TB-wide exchanges stay on
  the native operator and small/medium exchanges skip its barriers.
- ``sort``: the round-2 plan — coalesce ``repartition`` + sort-based
  ``groupby(bucket).map_groups``. Native, streaming, battle-tested.
- ``hash``: Ray Data's HASH_SHUFFLE strategy via ``repartition(keys=)``.
  Measured SLOWER than both here (aggregator-actor floor ~3-5s per
  exchange; catastrophic when several exchanges fuse into one
  streaming execution with ``op_resource_reservation`` disabled: 272s
  vs 21s on the 50k-doc bench). Kept as the A/B lever because the
  actor pool is the architecture whose cost profile changes most on a
  real multi-node cluster.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

_DEFAULT_MODE = os.environ.get("LSH_RAY_EXCHANGE", "tasks")

# above this many split-slice objects (M input blocks x W partitions) the
# tasks mode falls back to the native sort shuffle: slice metadata is the
# simple-shuffle quadratic, and the fixed barrier cost it avoids is
# negligible for jobs that big anyway
_TASKS_MAX_SLICES = 262_144


def _lazy_remote(fn):
    """Decorate ``fn`` into a lazily-registered Ray remote function.

    MODULE-LEVEL remote functions are pickled + exported to workers once
    per process; a ``@ray.remote`` defined inside a pipeline function is
    re-exported on EVERY call (cloudpickle + GCS push + per-worker
    import) — a fixed per-job cost the repeated-bench and scaling runs
    pay on each invocation. Lazy so importing this module never touches
    Ray."""
    import functools
    holder: dict = {}

    def _rf():
        if "rf" not in holder:
            import ray as _ray
            holder["rf"] = _ray.remote(fn)
        return holder["rf"]

    class _Handle:
        def remote(self, *a, **k):
            return _rf().remote(*a, **k)

        def options(self, **opt):
            return _rf().options(**opt)
    h = _Handle()
    functools.update_wrapper(h, fn, updated=())
    return h


def exchange_mode(explicit: str | None = None) -> str:
    """Resolve the exchange mode: an explicit caller choice (e.g. from
    ``PipelineConfig.exchange``, scale-resolved by run_dedup) wins, then
    the ``LSH_RAY_EXCHANGE`` env override, then the default. "auto" and
    None defer to the next level."""
    for mode in (explicit, os.environ.get("LSH_RAY_EXCHANGE"),
                 _DEFAULT_MODE):
        if mode in ("tasks", "sort", "hash"):
            return mode
    return "tasks"


def _cluster_cpus() -> int:
    try:
        import ray
        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 0)) or 8
    except Exception:
        pass
    return 8


def colocate(ds, keys: list[str], num_blocks: int):
    """Hash-partition ``ds`` into ``num_blocks`` blocks such that every
    row of a given ``keys`` tuple lands in exactly one block.

    Follow with ``map_batches(whole_block_fn, batch_format="pyarrow")``:
    the default ``batch_size=None`` feeds one block per call, so the
    block function sees complete key groups (multiple keys per block —
    the same contract the bucketed ``map_groups`` functions already
    have).
    """
    from ray.data.context import ShuffleStrategy

    cpus = _cluster_cpus()
    ctx = ds.context  # per-chain copy, NOT the process-global context
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.max_hash_shuffle_aggregators = max(2, min(num_blocks, cpus))
    # keep each exchange's aggregator-pool CPU reservation to ~1/16 of
    # the cluster (min 1 CPU): a fused dedup plan runs FOUR exchanges
    # concurrently, and pools that together reserve every logical CPU
    # leave no room for the map tasks that feed them -> deadlock at
    # num_cpus=8 (observed). Aggregators are I/O-bound accumulators;
    # measured cost of the smaller pool at 32 CPUs is ~15% on the
    # exchange itself, invisible end-to-end.
    per_part = min(0.0625, max(cpus / 16.0, 1.0) / num_blocks)
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = per_part
    return ds.repartition(num_blocks=num_blocks, keys=list(keys),
                          sort=False)


def _key_hash_u64(t: pa.Table, keys: list[str]) -> np.ndarray:
    """Multi-column row hash -> uint64 (splitmix-mixed per column)."""
    from lsh_ray.functions.hashing import hash_strings, splitmix64
    acc = np.zeros(t.num_rows, dtype=np.uint64)
    for c in keys:
        arr = t[c].to_numpy(zero_copy_only=False)
        if arr.dtype == object or arr.dtype.kind in ("U", "S"):
            v = hash_strings(arr)
        else:
            v = arr.astype(np.uint64)
        acc = splitmix64(acc ^ v)
    return acc


def _empty_like(schema) -> pa.Table:
    return pa.table({name: pa.array([], type=typ)
                     for name, typ in zip(schema.names, schema.types)})


def _tasks_exchange(ds, keys: list[str], num_blocks: int, fn):
    """The two-wave raw-task exchange (mode "tasks"); see module doc.

    The input is materialized first — an exchange is a barrier in any
    plan (Ray's native all-to-all operators also pin their input), and
    blocks live in the object store (spillable), never on the driver.
    Output is a new Dataset over the W reduce outputs; lineage-based
    reconstruction still works because split/reduce are deterministic
    pure tasks over owned refs.
    """
    import ray

    W = int(num_blocks)

    @ray.remote(num_returns=W)
    def split(tab: pa.Table):
        missing = [c for c in keys if c not in tab.column_names]
        if missing:
            raise KeyError(
                f"exchange keys {missing} absent from block schema "
                f"{tab.column_names}")
        h = (_key_hash_u64(tab, keys) % np.uint64(W)).astype(np.int64)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        bounds = np.searchsorted(hs, np.arange(W + 1))
        taken = tab.take(pa.array(order, type=pa.int64()))
        out = tuple(taken.slice(bounds[i], bounds[i + 1] - bounds[i])
                    for i in range(W))
        return out if W > 1 else out[0]

    @ray.remote
    def reduce_(*slices: pa.Table) -> pa.Table:
        live = [s for s in slices if s.num_rows]
        t = (pa.concat_tables(live).combine_chunks() if live
             else slices[0])
        return fn(t)

    mat = ds.materialize()
    block_refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            # drop empty blocks here: unions emit columnless empty
            # blocks whose schema would poison the reduce concat
            if meta.num_rows:
                block_refs.append(ref)
    if not block_refs:
        schema = mat.schema()
        base = getattr(schema, "base_schema", None)
        empty = (_empty_like(schema) if base is None
                 else base.empty_table())
        return ray.data.from_arrow([fn(empty)])
    splits = [split.remote(r) for r in block_refs]
    if W == 1:
        outs = [reduce_.remote(*splits)]
    else:
        outs = [reduce_.remote(*[s[w] for s in splits])
                for w in range(W)]
    return ray.data.from_arrow_refs(outs)


def colocate_map(ds, keys: list[str], num_blocks: int, fn,
                 sort_bucket_expr=None, bucket_col: str = "bucket",
                 mode: str | None = None, **map_kwargs):
    """One exchange co-locating ``keys`` + whole-block ``fn``: the raw-
    task split/reduce under "tasks", Ray's keyed repartition under
    "hash", the legacy coalesce + ``groupby(bucket).map_groups`` under
    "sort" (see module doc for the measured trade-offs).

    ``sort_bucket_expr``: only for the sort fallback — a callable
    ``pa.Table -> pa.Table`` appending the coarse ``bucket_col`` column
    the sort plan groups on, when the input doesn't already carry it
    (tasks/hash modes partition on ``keys`` directly and never
    materialize a bucket column).
    """
    mode = exchange_mode(mode)
    if mode == "tasks":
        # fall back to the native sort shuffle when slice metadata
        # (M blocks x W partitions) would outgrow the simple shuffle
        try:
            m = ds._plan.initial_num_blocks()  # cheap upper-bound hint
        except Exception:
            m = num_blocks
        if m * num_blocks <= _TASKS_MAX_SLICES:
            return _tasks_exchange(ds, keys, num_blocks, fn)
        mode = "sort"
    if mode == "hash":
        return colocate(ds, keys, num_blocks).map_batches(
            fn, batch_format="pyarrow", zero_copy_batch=True, **map_kwargs)
    if sort_bucket_expr is not None:
        ds = ds.map_batches(sort_bucket_expr, batch_format="pyarrow",
                            zero_copy_batch=True)

    # tasks/hash modes never materialize the bucket column, so fn never
    # sees it; strip it here too so all three modes present identical
    # schemas — a pass-through fn (e.g. a trim kernel returning a take of
    # its input) must not leak the sort-plan bucket into downstream
    # exchanges that append their own.
    def _fn_sans_bucket(t: pa.Table) -> pa.Table:
        if bucket_col in t.column_names:
            t = t.drop_columns([bucket_col])
        return fn(t)

    return (ds.repartition(num_blocks)
              .groupby(bucket_col)
              .map_groups(_fn_sans_bucket, batch_format="pyarrow"))
