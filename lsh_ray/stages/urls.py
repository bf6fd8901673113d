"""URL canonicalization + URL-level dedup over crawled pages.

The classic first dedup tier of a web crawl (before any content
hashing): the same page is fetched under many URL spellings — scheme
variants, a ``www.`` prefix, tracking parameters, fragments, trailing
slashes — and the corpus keeps ONE capture per canonical URL (the
earliest ``warc_ts``, the convention Common-Crawl-style pipelines use
so re-crawls don't displace the original).

Rebuild addition (the reference keys documents by filename only —
``/root/reference/lsh.py:107-120`` builds its corpus dict straight from
file paths); URL identity is the web-corpus analog of that key, so the
canonicalizer is the stage that makes it well-defined.

Design notes for 100 TB:
- Canonicalization is a fixed chain of RE2 ``replace_substring_regex``
  kernels over zero-copy Arrow batches — no per-row Python. The SAME
  step list generates the DuckDB oracle expression
  (:func:`canonical_sql_expr`), so Ray and SQL can never drift.
- Dedup is one tasks-mode co-location keyed by the canonical URL
  (the :func:`lsh_ray.stages.exchange.colocate_map` exchange), with a
  vectorized per-block run reduce — canonical URLs are mostly unique,
  so, as with ``exact_dup_groups``, a combiner pre-pass would not
  shrink the exchange and a native sort-groupby would only add its
  sample/sort barrier.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Applied in order. Each entry is (RE2 pattern, rewrite). Mirrored
# verbatim into DuckDB regexp_replace(..., 'g') by canonical_sql_expr —
# both engines run RE2, so the outputs are byte-identical by
# construction. Keep patterns free of lookarounds (RE2 has none).
CANONICAL_STEPS: list[tuple[str, str]] = [
    (r"^http://", "https://"),                      # scheme upgrade
    (r"^https://www\.", "https://"),                # bare-host form
    (r"#.*$", ""),                                  # fragment never reaches the server
    (r"&(?:utm_[a-z_]+|fbclid|gclid)=[^&#]*", ""),  # tracking params, non-leading
    (r"\?(?:utm_[a-z_]+|fbclid|gclid)=[^&#]*&", "?"),  # leading, with a successor
    (r"\?(?:utm_[a-z_]+|fbclid|gclid)=[^&#]*$", ""),   # leading, alone
    (r"\?$", ""),                                   # dangling separator
    # slash(es) before the FIRST '?' (the path/query boundary): the
    # lazy [^?]*? group pins the match to the path part, so '/'-runs
    # inside query-string VALUES are never rewritten (a '?next=/foo/'
    # param must not collapse with '?next=/foo')
    (r"^([^?]*?)/+\?", r"\1?"),
    # trailing slash(es), only when the URL carries no query at all —
    # a trailing '/' at the end of a query value is part of the value
    (r"^([^?]*?)/+$", r"\1"),
]


def canonicalize_expr(urls: pa.ChunkedArray | pa.Array):
    """Apply the canonical step chain to an Arrow string array."""
    s = urls
    for pat, repl in CANONICAL_STEPS:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
    return s


def canonical_sql_expr(col: str) -> str:
    """The DuckDB twin: nested regexp_replace over the same step list."""
    expr = col
    for pat, repl in CANONICAL_STEPS:
        p = pat.replace("'", "''")
        r = repl.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return expr


def canonicalize_urls(ds, url_col: str = "url",
                      out_col: str = "canonical_url"):
    """Append the canonical form of ``url_col`` (zero-copy Arrow)."""
    def f(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, canonicalize_expr(t[url_col]))
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def url_dedup(ds, url_col: str = "url", ts_col: str = "warc_ts",
              id_col: str = "doc_id"):
    """pages -> (canonical_url, doc_id, warc_ts, n_variants).

    One surviving capture per canonical URL: the earliest ``ts_col``,
    ties broken by ``id_col`` (deterministic under re-runs and
    re-delivered shards). ``n_variants`` counts the spellings folded in.
    """
    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import _key_hash_u64, colocate_map

    canon = canonicalize_urls(ds, url_col).select_columns(
        ["canonical_url", id_col, ts_col])
    nblocks = min(coalesce_blocks(), 64)

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "canonical_url": pa.array([], pa.string()),
                id_col: pa.array([], t.schema.field(id_col).type),
                ts_col: pa.array([], t.schema.field(ts_col).type),
                "n_variants": pa.array([], pa.int64())})
        order = pc.sort_indices(
            t, sort_keys=[("canonical_url", "ascending"),
                          (ts_col, "ascending"), (id_col, "ascending")])
        t = t.take(order)
        cu = t.column("canonical_url").combine_chunks()
        n = t.num_rows
        neq = (pc.not_equal(cu.slice(1), cu.slice(0, n - 1))
               .to_numpy(zero_copy_only=False)
               if n > 1 else np.empty(0, bool))
        firsts = np.flatnonzero(np.concatenate(([True], neq)))
        lens = np.diff(np.concatenate((firsts, [n])))
        idx = pa.array(firsts, type=pa.int64())
        return pa.table({
            "canonical_url": cu.take(idx),
            id_col: t[id_col].take(idx),   # min (ts, id) = first after sort
            ts_col: t[ts_col].take(idx),
            "n_variants": pa.array(lens.astype(np.int64))})

    def bucket(t: pa.Table) -> pa.Table:
        h = _key_hash_u64(t, ["canonical_url"]) % np.uint64(nblocks)
        return t.append_column("bucket", pa.array(h.astype(np.int32)))

    return colocate_map(canon, ["canonical_url"], nblocks, block,
                        sort_bucket_expr=bucket)


def host_stats(ds, url_col: str = "url", chars_col: str = "n_chars"):
    """pages -> (host, n_captures, n_pages, n_chars) per registered host.

    ``n_pages`` is the distinct canonical-URL count, so pages must
    co-locate once — the same canonical-URL exchange url_dedup pays,
    here reduced straight to per-page rows (capture count + char sum)
    with the host attached. The per-host finish is then a per-batch
    Arrow combiner over the page rows followed by one tiny native
    groupby over ≤ hosts×blocks partials; no second wide exchange.
    """
    from ray.data.aggregate import Sum

    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.exchange import _key_hash_u64, colocate_map

    canon = canonicalize_urls(ds, url_col).select_columns(
        ["canonical_url", chars_col])
    nblocks = min(coalesce_blocks(), 64)

    def page_block(t: pa.Table) -> pa.Table:
        g = t.group_by("canonical_url").aggregate(
            [([], "count_all"), (chars_col, "sum")])
        # host stops at '/' OR '?': canonicalization produces path-less
        # query URLs ('https://h?q=1'), whose query must not leak into
        # the host
        host = pc.replace_substring_regex(
            g["canonical_url"], pattern=r"^https://([^/?]+).*$",
            replacement=r"\1")
        return pa.table({"host": host,
                         "n_captures": g["count_all"],
                         "n_chars": g[f"{chars_col}_sum"]})

    def bucket(t: pa.Table) -> pa.Table:
        h = _key_hash_u64(t, ["canonical_url"]) % np.uint64(nblocks)
        return t.append_column("bucket", pa.array(h.astype(np.int32)))

    pages = colocate_map(canon, ["canonical_url"], nblocks, page_block,
                         sort_bucket_expr=bucket)

    def host_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("host").aggregate(
            [("n_captures", "sum"), ("n_chars", "sum"), ([], "count_all")])
        return pa.table({"host": g["host"],
                         "n_captures": g["n_captures_sum"],
                         "n_pages": g["count_all"],
                         "n_chars": g["n_chars_sum"]})

    return pages.map_batches(
        host_partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("host").aggregate(
        Sum("n_captures", alias_name="n_captures"),
        Sum("n_pages", alias_name="n_pages"),
        Sum("n_chars", alias_name="n_chars"))
