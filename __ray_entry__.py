"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module: nothing
here (or in ``lsh_ray``) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship dedup pipeline on /root/testdata/sf0.001.
- ``queries()``: every implemented operator/pipeline (SURVEY.md §2), one
  callable per name taking ``sf_dir``.
- ``oracle_sql()``: DuckDB-equivalent SQL for the SQL-expressible subset;
  the rest get rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship near-duplicate pipeline on sf0.001: returns the per-doc
    signature table (url, simhash, minhash_0, n_shingles) — the rebuild's
    'index' artifact (reference analog: create_index, lsh.py:415-444)."""
    from lsh_ray.pipelines.queries import signature_table
    return signature_table("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from lsh_ray.pipelines.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from lsh_ray.pipelines.queries import ORACLE_SQL
    return dict(ORACLE_SQL)
