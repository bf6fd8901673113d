"""As-of and range (interval) joins: vectorized bucket kernels vs brute
force, and the distributed exchange end-to-end (partitioning-invariance,
timestamp columns, string keys)."""

import numpy as np
import pyarrow as pa
import pytest

from lsh_ray.stages.asof import (_KEY, _SIDE, _TS, _TS_END, _asof_bucket,
                                 _range_bucket, asof_join, range_join)


def _group(lk, lts, rk, rts, rend=None):
    nl, nr = len(lk), len(rk)
    cols = {
        "lid": pa.array(list(range(nl)) + [0] * nr, pa.int64()),
        "rid": pa.array([0] * nl + list(range(100, 100 + nr)), pa.int64()),
        _KEY: pa.array(np.concatenate([lk, rk]).astype(np.uint64)),
        _TS: pa.array(np.concatenate([lts, rts]).astype(np.int64)),
        _SIDE: pa.array(np.array([0] * nl + [1] * nr, np.int8)),
    }
    if rend is not None:
        cols[_TS_END] = pa.array(
            np.concatenate([np.zeros(nl), rend]).astype(np.int64))
    return pa.table(cols)


def _brute_asof(lk, lts, rk, rts, allow, fwd, how):
    out = []
    for i in range(len(lk)):
        cand = [j for j in range(len(rk)) if rk[j] == lk[i] and
                ((rts[j] >= lts[i] if allow else rts[j] > lts[i]) if fwd
                 else (rts[j] <= lts[i] if allow else rts[j] < lts[i]))]
        if cand:
            out.append((i, int((min if fwd else max)(rts[j] for j in cand))))
        elif how == "left":
            out.append((i, None))
    return sorted(out, key=lambda x: (x[0], x[1] is None, x[1] or 0))


def _brute_range(lk, lts, rk, rts, rend, closed):
    out = []
    for j in range(len(rk)):
        for i in range(len(lk)):
            if lk[i] != rk[j]:
                continue
            s = lts[i] >= rts[j] if closed in ("left", "both") \
                else lts[i] > rts[j]
            e = lts[i] <= rend[j] if closed in ("right", "both") \
                else lts[i] < rend[j]
            if s and e:
                out.append((i, 100 + j))
    return sorted(out)


@pytest.mark.parametrize("allow", [True, False])
@pytest.mark.parametrize("fwd", [False, True])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_asof_kernel_matches_brute_force(allow, fwd, how):
    rng = np.random.default_rng(13)
    for _ in range(60):
        nl, nr = rng.integers(0, 12), rng.integers(0, 12)
        lk, rk = rng.integers(0, 4, nl), rng.integers(0, 4, nr)
        lts, rts = rng.integers(0, 30, nl), rng.integers(0, 30, nr)
        res = _asof_bucket(_group(lk, lts, rk, rts), ["lid"], [_TS],
                           allow, fwd, how)
        got = sorted(zip(res["lid"].to_pylist(), res[_TS].to_pylist()),
                     key=lambda x: (x[0], x[1] is None, x[1] or 0))
        assert got == _brute_asof(lk, lts, rk, rts, allow, fwd, how)


@pytest.mark.parametrize("closed", ["left", "right", "both", "neither"])
def test_range_kernel_matches_brute_force(closed):
    rng = np.random.default_rng(29)
    for _ in range(60):
        nl, nr = rng.integers(0, 15), rng.integers(0, 8)
        lk, rk = rng.integers(0, 4, nl), rng.integers(0, 4, nr)
        lts, rts = rng.integers(0, 30, nl), rng.integers(0, 30, nr)
        rend = rts + rng.integers(0, 8, nr)
        res = _range_bucket(_group(lk, lts, rk, rts, rend),
                            ["lid"], ["rid"], closed)
        got = sorted(zip(res["lid"].to_pylist(), res["rid"].to_pylist()))
        assert got == _brute_range(lk, lts, rk, rts, rend, closed)


def test_asof_kernel_empty_sides():
    g = _group(np.array([1]), np.array([5]), np.array([], int),
               np.array([], int))
    assert _asof_bucket(g, ["lid"], [_TS], True, False, "inner").num_rows == 0
    out = _asof_bucket(g, ["lid"], [_TS], True, False, "left")
    assert out.num_rows == 1 and out[_TS][0].as_py() is None


@pytest.fixture(scope="module")
def event_tables(ray_session):
    """Synthetic two-sided event data with Arrow timestamps."""
    import ray.data
    rng = np.random.default_rng(3)
    base = np.datetime64("2024-01-01", "us")
    nl, nr = 400, 300
    left = pa.table({
        "event_id": pa.array(np.arange(nl)),
        "user": pa.array([f"u{int(x)}" for x in rng.integers(0, 20, nl)]),
        "ts": pa.array(base + rng.integers(0, 10**9, nl).astype(
            "timedelta64[us]")),
    })
    rts = base + rng.integers(0, 10**9, nr).astype("timedelta64[us]")
    right = pa.table({
        "user": pa.array([f"u{int(x)}" for x in rng.integers(0, 20, nr)]),
        "rts": pa.array(rts),
        "payload": pa.array(rng.normal(size=nr)),
    })
    return left, right


def _brute_asof_tables(left, right):
    lut: dict[str, list[tuple[int, float]]] = {}
    rts = right["rts"].to_numpy().astype("datetime64[us]").view("int64")
    for u, t, p in zip(right["user"].to_pylist(), rts,
                       right["payload"].to_pylist()):
        lut.setdefault(u, []).append((int(t), p))
    out = {}
    lts = left["ts"].to_numpy().astype("datetime64[us]").view("int64")
    for eid, u, t in zip(left["event_id"].to_pylist(),
                         left["user"].to_pylist(), lts):
        cand = [(rt, p) for rt, p in lut.get(u, []) if rt <= t]
        if cand:
            out[eid] = max(cand)[1]
    return out


@pytest.mark.parametrize("num_blocks", [1, 7])
def test_asof_join_distributed(ray_session, event_tables, num_blocks):
    import ray.data
    left, right = event_tables
    out = asof_join(
        ray.data.from_arrow(left).repartition(num_blocks),
        ray.data.from_arrow(right).repartition(max(1, num_blocks - 2)),
        "user", "user", "ts", "rts", ["rts", "payload"], suffix="_m",
        num_buckets=8).to_arrow_refs()
    got_t = pa.concat_tables([ray.get(r) for r in out])
    got = dict(zip(got_t["event_id"].to_pylist(),
                   got_t["payload_m"].to_pylist()))
    assert got == _brute_asof_tables(left, right)
    # matched timestamp column survives as a real Arrow timestamp
    assert pa.types.is_timestamp(got_t.schema.field("rts_m").type)


def test_asof_join_left_nullfills(ray_session, event_tables):
    import ray.data
    left, right = event_tables
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    "user", "user", "ts", "rts", ["payload"], suffix="_m",
                    how="left", num_buckets=8).to_pandas()
    assert len(out) == left.num_rows
    exp = _brute_asof_tables(left, right)
    nulls = out[out.payload_m.isna()]
    assert set(nulls.event_id) == set(left["event_id"].to_pylist()) - set(exp)


def test_range_join_distributed(ray_session, event_tables):
    import ray.data
    import pyarrow.compute as pc
    left, right = event_tables
    width = pa.scalar(10**7, type=pa.duration("us"))
    intervals = right.append_column("rend", pc.add(right["rts"], width))
    out = range_join(
        ray.data.from_arrow(left).repartition(5),
        ray.data.from_arrow(intervals),
        "user", "user", "ts", "rts", "rend", ["payload"], suffix="_w",
        num_buckets=8).to_pandas()
    lts = left["ts"].to_numpy().astype("datetime64[us]").view("int64")
    rts = right["rts"].to_numpy().astype("datetime64[us]").view("int64")
    exp = sorted(
        (int(e), p)
        for e, u, t in zip(left["event_id"].to_pylist(),
                           left["user"].to_pylist(), lts)
        for ru, rt, p in zip(right["user"].to_pylist(), rts,
                             right["payload"].to_pylist())
        if u == ru and rt <= t < rt + 10**7)
    got = sorted(zip(out.event_id.astype(int), out.payload_w))
    assert got == exp
