"""Exchange-mode tests: the raw-task split/reduce exchange must give the
same co-location contract as the sort-groupby plan it replaces."""

import numpy as np
import pyarrow as pa

import ray

from lsh_ray.stages.exchange import (_tasks_exchange, colocate_map,
                                     exchange_mode)


def _table(n, seed=0, keyspace=50):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": rng.integers(0, keyspace, size=n, dtype=np.uint64),
        "v": rng.integers(0, 1000, size=n, dtype=np.int64),
    })


def _collect(ds):
    return pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])


def test_tasks_exchange_colocates_keys(ray_session):
    ds = ray.data.from_arrow([_table(5000, seed=i) for i in range(6)])

    def per_block(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        u = np.unique(k)
        return pa.table({"k": u, "n": np.bincount(
            np.searchsorted(u, k)).astype(np.int64)})

    out = _collect(_tasks_exchange(ds, ["k"], 8, per_block))
    # every key appears in exactly one block -> exactly one output row
    ks = out["k"].to_numpy(zero_copy_only=False)
    assert len(ks) == len(np.unique(ks))
    assert out["n"].to_numpy(zero_copy_only=False).sum() == 30000


def test_tasks_exchange_matches_sort_mode(ray_session, monkeypatch):
    ds_tables = [_table(2000, seed=i) for i in range(4)]

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((k % np.uint64(64)).astype(np.int32)))

    def per_block(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        u = np.unique(k)
        s = np.bincount(np.searchsorted(u, k), weights=v).astype(np.int64)
        return pa.table({"k": u, "s": s})

    results = {}
    for mode in ("tasks", "sort"):
        monkeypatch.setenv("LSH_RAY_EXCHANGE", mode)
        assert exchange_mode() == mode
        out = _collect(colocate_map(
            ray.data.from_arrow(ds_tables), ["k"], 8, per_block,
            sort_bucket_expr=add_bucket))
        df = out.to_pandas().sort_values("k").reset_index(drop=True)
        results[mode] = df
    assert results["tasks"].equals(results["sort"])


def test_tasks_exchange_string_keys(ray_session):
    t = pa.table({"name": pa.array(["a", "b", "a", "c", "b", "a"]),
                  "v": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64())})

    def per_block(tb: pa.Table) -> pa.Table:
        import collections
        acc = collections.Counter()
        for name, v in zip(tb["name"].to_pylist(), tb["v"].to_pylist()):
            acc[name] += v
        names = sorted(acc)
        return pa.table({"name": pa.array(names),
                         "s": pa.array([acc[n] for n in names],
                                       type=pa.int64())})

    out = _collect(_tasks_exchange(
        ray.data.from_arrow([t]), ["name"], 4, per_block)).to_pandas()
    assert dict(zip(out["name"], out["s"])) == {"a": 10, "b": 7, "c": 4}


def test_tasks_exchange_empty_input(ray_session):
    t = pa.table({"k": pa.array([], pa.uint64()),
                  "v": pa.array([], pa.int64())})
    out = _tasks_exchange(ray.data.from_arrow([t]), ["k"], 4, lambda x: x)
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "v"}


def test_tasks_exchange_skips_columnless_empty_blocks(ray_session):
    """Unions can emit empty blocks with EMPTY schemas; the exchange must
    drop them instead of hashing nonexistent key columns."""
    a = ray.data.from_arrow([_table(100)])
    b = a.filter(lambda row: False)  # empty derived dataset
    u = a.union(b)
    out = _tasks_exchange(u, ["k"], 4, lambda t: t)
    assert out.count() == 100


def test_oversized_exchange_falls_back_to_sort(ray_session, monkeypatch):
    monkeypatch.setenv("LSH_RAY_EXCHANGE", "tasks")
    ds = ray.data.from_arrow([_table(100, seed=i) for i in range(4)])

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((k % np.uint64(16)).astype(np.int32)))

    # shrink the slice cap so M x W exceeds it -> sort plan must be taken
    import lsh_ray.stages.exchange as ex
    monkeypatch.setattr(ex, "_TASKS_MAX_SLICES", 8)
    out = colocate_map(ds, ["k"], 8, lambda t: t,
                       sort_bucket_expr=add_bucket)
    tab = _collect(out)
    assert tab.num_rows == 400
    # the sort plan's transient bucket column is stripped before the
    # group fn, so ALL exchange modes present (and a pass-through fn
    # returns) the same schema — a leak here would poison downstream
    # exchanges that append their own bucket (round-5 ADVICE fix)
    assert "bucket" not in tab.column_names
