"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() twin on the same sf dir, compare row count,
column names, and order-insensitive values.

Usage: python scripts/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    import ray.data
    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return obj
    raise TypeError(type(obj))


def canon(df):
    import numpy as np
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("uint", "int")):
            df[c] = df[c].astype("int64", errors="ignore") \
                if df[c].max() < 2**63 else df[c].astype("uint64")
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == np.float32:
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import duckdb
    import pandas as pd

    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from lsh_ray.pipelines.queries import ORACLE_SQL, QUERIES
    names = sys.argv[2:] or list(QUERIES)

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name in names:
        t0 = time.time()
        try:
            ray_df = to_pandas(QUERIES[name](sf_dir))
        except Exception as e:
            failures.append(name)
            print(f"{name}: RAY ERROR {type(e).__name__}: {e}")
            continue
        if name not in ORACLE_SQL:
            print(f"{name}: rows-only, {len(ray_df)} rows, "
                  f"{round(time.time() - t0, 1)}s  cols={list(ray_df.columns)}")
            continue
        try:
            ora_df = con.sql(ORACLE_SQL[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"{name}: SQL ERROR {e}")
            continue
        a, b = canon(ray_df), canon(ora_df)
        status = "OK"
        if len(a) != len(b):
            status = f"ROWCOUNT {len(a)} vs {len(b)}"
        elif list(a.columns) != list(b.columns):
            status = f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=False, rtol=1e-9,
                                              atol=1e-9)
            except AssertionError as e:
                status = "VALUES differ: " + str(e).split("\n")[0]
                for c in a.columns:
                    try:
                        pd.testing.assert_series_equal(
                            a[c], b[c], check_dtype=False,
                            check_exact=False, rtol=1e-9, atol=1e-9)
                    except AssertionError:
                        status += f" [col {c}]"
        if status != "OK":
            failures.append(name)
        print(f"{name}: {status}  ({len(a)} rows, "
              f"{round(time.time() - t0, 1)}s)")
    print("\nFAILURES:", failures if failures else "none")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
