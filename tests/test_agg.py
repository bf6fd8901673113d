"""Aggregation-family operators: grouped COUNT(DISTINCT), rollup,
anti-join, distinct, per-group exact quantiles, HLL sketch."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data
    return ray.data


def _rand_events(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "g": pa.array(rng.choice(["a", "b", "c"], n).tolist()),
        "u": pa.array(rng.integers(0, 200, n), type=pa.int64()),
        "v": pa.array(np.round(rng.uniform(0, 100, n), 2)),
    })


def test_grouped_distinct_count_matches_pandas(rd):
    from lsh_ray.stages.agg import grouped_distinct_count
    tbl = _rand_events()
    out = grouped_distinct_count(rd.from_arrow(tbl), "g", "u",
                                 alias="n_u").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    exp = (tbl.to_pandas().groupby("g")["u"].nunique()
           .reset_index(name="n_u"))
    assert out.g.tolist() == exp.g.tolist()
    assert out.n_u.tolist() == exp.n_u.tolist()


def test_rollup_levels_sum_consistently(rd):
    from lsh_ray.stages.agg import rollup_agg
    tbl = _rand_events()
    out = rollup_agg(rd.from_arrow(tbl), ["g"], ["v"]).to_pandas()
    df = tbl.to_pandas()
    fine = out[out.g != "ALL"].sort_values("g")
    total = out[out.g == "ALL"]
    assert len(total) == 1
    assert fine.n_rows.sum() == len(df) == total.n_rows.iloc[0]
    exp = df.groupby("g")["v"].sum().round(2)
    assert np.allclose(fine.set_index("g")["sum_v"], exp, atol=0.02)
    assert abs(total.sum_v.iloc[0] - round(df.v.sum(), 2)) < 0.02


def test_rollup_two_keys_has_all_levels(rd):
    from lsh_ray.stages.agg import rollup_agg
    tbl = pa.table({
        "a": pa.array(["x", "x", "y"]), "b": pa.array(["p", "q", "p"]),
        "v": pa.array([1.0, 2.0, 4.0]),
    })
    out = rollup_agg(rd.from_arrow(tbl), ["a", "b"], ["v"]).to_pandas()
    # 3 finest + 2 per-a + 1 grand total
    assert len(out) == 6
    grand = out[(out.a == "ALL") & (out.b == "ALL")]
    assert grand.sum_v.iloc[0] == 7.0 and grand.n_rows.iloc[0] == 3
    xa = out[(out.a == "x") & (out.b == "ALL")]
    assert xa.sum_v.iloc[0] == 3.0 and xa.n_rows.iloc[0] == 2


def test_anti_join_drops_matches_keeps_rest(rd):
    from lsh_ray.stages.join import anti_join
    left = rd.from_arrow(pa.table(
        {"k": pa.array(np.arange(100, dtype=np.int64))}))
    # duplicate right keys: presence is what matters
    right = rd.from_arrow(pa.table(
        {"rk": pa.array([2, 2, 5, 5, 99], type=pa.int64())}))
    out = anti_join(left, right, "k", "rk").to_pandas()
    assert sorted(out.k.tolist()) == [
        i for i in range(100) if i not in (2, 5, 99)]


def test_grouped_distinct_excludes_nulls(rd):
    from lsh_ray.stages.agg import grouped_distinct_count
    tbl = pa.table({
        "g": pa.array(["a", "a", "a", "b", "b"]),
        "u": pa.array([1, 1, None, 2, None], type=pa.int64()),
    })
    out = grouped_distinct_count(rd.from_arrow(tbl), "g", "u",
                                 alias="n_u").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    # SQL COUNT(DISTINCT u): nulls excluded -> a:1, b:1
    assert out.g.tolist() == ["a", "b"]
    assert out.n_u.tolist() == [1, 1]


def test_bucket_join_outer_requires_many_mode(rd):
    from lsh_ray.stages.join import bucket_join
    ds = rd.from_arrow(pa.table({"k": pa.array([1], type=pa.int64())}))
    with pytest.raises(ValueError, match="unique_right"):
        bucket_join(ds, ds, "k", "k", [], how="outer")


def test_event_lag_pre_1970_timestamps(rd):
    # negative epoch-us values are legitimate, not the missing marker
    from lsh_ray.stages.windows import event_lag
    ts = pa.array(np.array([-7_200_000_000, -3_600_000_000, 0,
                            3_600_000_000], dtype=np.int64),
                  type=pa.timestamp("us"))
    tbl = pa.table({
        "event_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "user_id": pa.array([1, 1, 1, 1], type=pa.int64()),
        "ts": ts,
    })
    out = event_lag(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert out.prev_ts.isna().tolist() == [True, False, False, False]
    assert out.gap_us[1:].tolist() == [3_600_000_000] * 3


def test_bloom_anti_join_identical_and_filters(rd):
    from lsh_ray.stages.join import (anti_join, bloom_build,
                                     bloom_maybe_contains)
    rng = np.random.default_rng(7)
    left_keys = np.arange(20_000, dtype=np.int64)
    right_keys = rng.choice(20_000, 500, replace=False).astype(np.int64)
    left = rd.from_arrow(pa.table({"k": pa.array(left_keys)}))
    right = rd.from_arrow(pa.table({"rk": pa.array(right_keys)}))
    plain = sorted(anti_join(left, right, "k", "rk")
                   .to_pandas().k.tolist())
    bloom = sorted(anti_join(left, right, "k", "rk",
                             bloom_bits=1 << 16)
                   .to_pandas().k.tolist())
    assert plain == bloom
    assert len(plain) == 20_000 - 500
    # the prefilter is effective: false-positive rate well under 5%
    # at 500 keys in 2^16 bits (k=4)
    words = bloom_build(right_keys.astype(np.uint64), 1 << 16)
    maybe = bloom_maybe_contains(
        words, left_keys.astype(np.uint64))
    assert maybe.sum() < 500 + 0.05 * 20_000
    assert maybe[right_keys].all()  # no false negatives, ever


def test_distinct_values(rd):
    from lsh_ray.stages.agg import distinct_values
    tbl = _rand_events(n=2000)
    out = distinct_values(rd.from_arrow(tbl), "u").to_pandas()
    assert sorted(out.u.tolist()) == sorted(
        tbl.to_pandas().u.unique().tolist())


def test_exact_quantiles_by_picks_real_rows(rd):
    from lsh_ray.stages.sampling import exact_quantiles_by
    tbl = _rand_events(n=3000, seed=9)
    out = exact_quantiles_by(rd.from_arrow(tbl), "v", "g").to_pandas()
    df = tbl.to_pandas()
    assert len(out) == 3 * 5
    for gval, sub in df.groupby("g"):
        vals = np.sort(sub.v.to_numpy())
        n = len(vals)
        for q_pm in (250, 500, 750, 900, 990):
            r = (q_pm * n + 999) // 1000
            exp = vals[r - 1]
            got = out[(out.g == gval)
                      & (out.q == q_pm / 1000.0)].v_q.iloc[0]
            assert got == exp, (gval, q_pm)


def test_dd_quantiles_relative_error_guarantee(rd):
    from lsh_ray.stages.agg import dd_quantiles
    rng = np.random.default_rng(6)
    # heavy-tailed domain incl. zeros — the case exact_quantiles'
    # cardinality-bounded histogram does not cover
    v = np.concatenate([np.exp(rng.normal(2, 1.5, 30_000)),
                        np.zeros(100)])
    ds = rd.from_arrow(pa.table({"v": pa.array(v)}))
    alpha = 0.01
    out = dd_quantiles(ds, "v", qs=(0.1, 0.5, 0.9, 0.99),
                       alpha=alpha).to_pandas()
    for q, est in zip(out.q, out.v_q):
        true = np.quantile(v, q, method="inverted_cdf")
        assert abs(est - true) <= 2 * alpha * true + 1e-9, (q, est, true)
    # the ValueError surfaces wrapped in Ray's task-error envelope
    with pytest.raises(Exception, match="non-negative"):
        neg = rd.from_arrow(pa.table({"v": pa.array([-1.0])}))
        dd_quantiles(neg, "v")


def test_hll_registers_merge_and_estimate():
    from lsh_ray.stages.agg import (_mix64, hll_estimate, hll_registers)
    rng = np.random.default_rng(1)
    true_n = 50_000
    vals = _mix64(rng.choice(10**9, true_n, replace=False)
                  .astype(np.uint64))
    # split into 8 "blocks": register merge must equal one-shot
    parts = np.array_split(np.repeat(vals, 3), 8)  # 3x duplicated rows
    merged = np.zeros(4096, dtype=np.uint8)
    for p in parts:
        merged = np.maximum(merged, hll_registers(p))
    assert (merged == hll_registers(np.repeat(vals, 3))).all()
    est = hll_estimate(merged)
    assert abs(est - true_n) / true_n < 0.05  # ~3 sigma at p=12


def test_hll_distinct_count_dataset(rd):
    from lsh_ray.stages.agg import hll_distinct_count
    rng = np.random.default_rng(2)
    u = rng.integers(0, 1000, 20_000)
    ds = rd.from_arrow(pa.table({"u": pa.array(u, type=pa.int64())}))
    est = hll_distinct_count(ds, "u")
    true_n = len(np.unique(u))
    assert abs(est - true_n) / true_n < 0.06
