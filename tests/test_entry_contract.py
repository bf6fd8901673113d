"""Driver-contract smoke tests for __ray_entry__ (Ray pre-initialised by
the session fixture, as the driver does)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")


def test_entry_runs(ray_session, sf_dir):
    import __ray_entry__ as entry_mod
    result = entry_mod.entry()
    df = result.to_pandas() if hasattr(result, "to_pandas") else result
    assert len(df) >= 0
    assert {"url", "simhash", "minhash_0", "n_shingles"} <= set(df.columns)


def test_every_query_has_callable(ray_session):
    import __ray_entry__ as entry_mod
    qs = entry_mod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracle_sql_keys_subset_of_queries(ray_session):
    import __ray_entry__ as entry_mod
    qs = set(entry_mod.queries())
    sql = entry_mod.oracle_sql()
    assert set(sql) <= qs
    assert len(sql) >= 15
    for name, stmt in sql.items():
        assert isinstance(stmt, str) and "SELECT" in stmt.upper(), name


def test_sampled_queries_execute(ray_session, sf_dir):
    import __ray_entry__ as entry_mod
    qs = entry_mod.queries()
    for name in ["token_counts", "lineitem_agg", "knn_topk"]:
        out = qs[name](sf_dir)
        df = out.to_pandas() if hasattr(out, "to_pandas") else out
        assert len(df) > 0, name
