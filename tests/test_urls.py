"""URL canonicalization + URL-level dedup (stages/urls.py): rewrite
rules, RE2 parity with DuckDB, keep-earliest semantics, host rollup."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from lsh_ray.stages.urls import (CANONICAL_STEPS, canonical_sql_expr,
                                 canonicalize_expr)

CASES = [
    # each rule alone
    ("http://a.com/x", "https://a.com/x"),
    ("https://www.a.com/x", "https://a.com/x"),
    ("https://a.com/x#sec-2", "https://a.com/x"),
    ("https://a.com/x?utm_source=f", "https://a.com/x"),
    ("https://a.com/x?utm_source=f&utm_medium=m", "https://a.com/x"),
    ("https://a.com/x/", "https://a.com/x"),
    ("https://a.com///", "https://a.com"),
    # tracking param first, real param survives
    ("https://a.com/x?utm_source=f&id=2", "https://a.com/x?id=2"),
    # real param first, tracking removed mid/end
    ("https://a.com/x?id=2&gclid=g9&page=3", "https://a.com/x?id=2&page=3"),
    ("https://a.com/x?id=2&fbclid=z", "https://a.com/x?id=2"),
    # dangling separator after stripping the only param
    ("https://a.com/x?gclid=abc#frag", "https://a.com/x"),
    # everything at once
    ("http://www.a.com/x/?utm_campaign=c&id=7#top",
     "https://a.com/x?id=7"),
    # untouched: https, no www, clean query
    ("https://a.com/path?x=1&y=2", "https://a.com/path?x=1&y=2"),
    # utm-lookalike inside the path is not a query param
    ("https://a.com/utm_source=decoy/page", "https://a.com/utm_source=decoy/page"),
    # slash runs INSIDE query values are content, not path separators:
    # '?next=/foo/?bar=1' must NOT collapse with '?next=/foo?bar=1'
    ("https://a.com/p?next=/foo/?bar=1", "https://a.com/p?next=/foo/?bar=1"),
    ("https://a.com/p?next=/foo?bar=1", "https://a.com/p?next=/foo?bar=1"),
    ("https://a.com/p?path=/x/", "https://a.com/p?path=/x/"),
    ("https://a.com/p?path=/x", "https://a.com/p?path=/x"),
    # path-side slash runs still fold, query untouched
    ("https://a.com/x//?q=1", "https://a.com/x?q=1"),
    ("https://a.com/?q=1", "https://a.com?q=1"),
]


def test_distinct_query_urls_stay_distinct():
    """Regression: the un-anchored '/+\\?' / '/+$' steps rewrote slash
    runs inside query-string VALUES, silently collapsing distinct pages
    in url_dedup (and the shared-step oracle agreed on the wrong
    answer). The path-anchored steps must keep them apart."""
    pairs = [("https://a.com/p?next=/foo/?bar=1",
              "https://a.com/p?next=/foo?bar=1"),
             ("https://a.com/p?path=/x/", "https://a.com/p?path=/x")]
    for u1, u2 in pairs:
        c1, c2 = canonicalize_expr(pa.array([u1, u2])).to_pylist()
        assert c1 != c2


def test_host_extraction_stops_at_query():
    """Regression: canonicalization produces path-less query URLs
    ('https://h?q=1'); the host must not swallow the query string."""
    import pyarrow.compute as pc
    canon = canonicalize_expr(pa.array(["https://site.com/?q=1"]))
    assert canon.to_pylist() == ["https://site.com?q=1"]
    host = pc.replace_substring_regex(
        canon, pattern=r"^https://([^/?]+).*$", replacement=r"\1")
    assert host.to_pylist() == ["site.com"]


def test_canonical_rules():
    raw = pa.array([r for r, _ in CASES])
    got = canonicalize_expr(raw).to_pylist()
    assert got == [want for _, want in CASES]


def test_canonicalization_idempotent():
    raw = pa.array([r for r, _ in CASES])
    once = canonicalize_expr(raw)
    twice = canonicalize_expr(once)
    assert once.to_pylist() == twice.to_pylist()


def test_sql_parity_with_arrow_kernel():
    """The generated DuckDB expression and the Arrow kernel chain are
    the same RE2 programs — outputs must be byte-identical, including
    on adversarial inputs neither side was tuned for."""
    extra = ["http://www.b.org/?utm_a=1&utm_b=2&utm_c=3",
             "https://b.org/a/b/c/?q=r#x?utm_source=nested",
             "https://b.org/?fbclid=only",
             "HTTPS://CASE.com/Kept",  # scheme rule is case-sensitive: kept
             "https://c.net/x?gclid=1&gclid=2"]
    urls = [r for r, _ in CASES] + extra
    con = duckdb.connect()
    df = con.execute(
        f"SELECT {canonical_sql_expr('u')} AS c FROM "
        "(SELECT unnest(?) AS u)", [urls]).df()
    got = canonicalize_expr(pa.array(urls)).to_pylist()
    assert got == df["c"].tolist()


@pytest.fixture(scope="module")
def pages(ray_session):
    """120 captures over 24 logical pages (5 spellings each), with a
    pseudo-shuffled capture timestamp so the winner is not min doc_id."""
    import ray.data
    did = np.arange(120, dtype=np.int64)
    base = did // 5
    v = did % 5
    canonical = ["https://h%d.example/p/%d" % (b % 3, b) for b in base]
    url = []
    for i, c in enumerate(canonical):
        rest = c[len("https://"):]
        url.append({0: c,
                    1: "http://" + rest,
                    2: "https://www." + rest,
                    3: c + "?utm_source=s&gclid=g%d" % i,
                    4: c + "/#f%d" % i}[v[i]])
    ts = (did * 48271) % 997
    t = pa.table({"doc_id": did, "url": pa.array(url),
                  "warc_ts": pa.array(ts, type=pa.int64()),
                  "n_chars": pa.array(100 + did % 37, type=pa.int64())})
    return ray.data.from_arrow(t), t


def test_url_dedup_keep_earliest(pages):
    from lsh_ray.stages.urls import url_dedup
    ds, t = pages
    out = url_dedup(ds).to_pandas().sort_values("canonical_url")
    assert len(out) == 24
    assert out["n_variants"].sum() == 120
    # reference winner: min (warc_ts, doc_id) within each base group
    did = t["doc_id"].to_numpy()
    ts = t["warc_ts"].to_numpy()
    for b in range(24):
        grp = did[did // 5 == b]
        gts = ts[grp]
        want = grp[np.lexsort((grp, gts))][0]
        row = out[out["canonical_url"] == "https://h%d.example/p/%d" % (b % 3, b)]
        assert row["doc_id"].item() == want
        assert row["warc_ts"].item() == gts.min()
        assert row["n_variants"].item() == 5


def test_host_stats_rollup(pages):
    from lsh_ray.stages.urls import host_stats
    ds, t = pages
    out = host_stats(ds).to_pandas().sort_values("host").reset_index(drop=True)
    assert list(out["host"]) == ["h0.example", "h1.example", "h2.example"]
    assert out["n_captures"].sum() == 120
    assert out["n_pages"].sum() == 24
    assert out["n_chars"].sum() == t["n_chars"].to_numpy().sum()
    assert set(out["n_pages"]) == {8}  # 24 pages round-robin over 3 hosts
