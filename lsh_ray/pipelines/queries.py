"""Named query registry: every operator as a (Ray pipeline, oracle SQL) pair.

Each entry is a callable ``f(sf_dir) -> Dataset | DataFrame | Table`` over
the driver-provided Parquet tables, with (where SQL-expressible) an ANSI-SQL
oracle that DuckDB runs on the same tables. Column names match EXACTLY
between the two — the driver's compare hashes values after sorting columns
by name.

Ray must already be initialised by the caller (driver contract): nothing
here calls ``ray.init``.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from lsh_ray.functions.num import round_half_away

import ray.data

from lsh_ray.config import DEFAULT_CONFIG, PipelineConfig

CFG = DEFAULT_CONFIG


def _read(path: str, columns: list[str] | None = None):
    from lsh_ray.sources.readers import strip_schema_metadata
    kwargs = {"columns": columns} if columns else {}
    return strip_schema_metadata(ray.data.read_parquet(path, **kwargs))


def _docs(sf_dir: str):
    return _read(f"{sf_dir}/documents.parquet")


def _docs_text(sf_dir: str):
    # prune at the read: only the columns the operator touches
    return _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


# --------------------------------------------------------------- dedup ----

def q_exact_dup_groups(sf_dir: str):
    from lsh_ray.stages.dedup import exact_dup_groups
    return exact_dup_groups(_docs_text(sf_dir))


def q_exact_dedup(sf_dir: str):
    from lsh_ray.stages.dedup import exact_dedup
    return exact_dedup(_docs_text(sf_dir))


_DEDUP_CACHE: dict[str, object] = {}


def _dedup_result(sf_dir: str):
    """Memoize the (deterministic) dedup pipeline per sf_dir so the
    driver's sequential query sweep doesn't rebuild it for each of the
    pair/cluster views (the materialized stages stay in the object
    store for the session)."""
    res = _DEDUP_CACHE.get(sf_dir)
    if res is None:
        from lsh_ray.pipelines.dedup_pipeline import run_dedup
        res = _DEDUP_CACHE[sf_dir] = run_dedup(_docs(sf_dir), CFG)
    return res


def q_dedup_pairs(sf_dir: str):
    """Full MinHash/LSH pipeline; verified duplicate pairs (rows-only)."""
    return _dedup_result(sf_dir).verified.map_batches(
        lambda t: t.filter(t["is_dup"]).select(
            ["doc_a", "doc_b", "n_band_hits"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_dedup_clusters(sf_dir: str):
    return _dedup_result(sf_dir).clusters


def q_minhash_signatures(sf_dir: str):
    """(url, simhash, minhash_0, n_shingles) per doc (rows-only)."""
    import pyarrow as pa

    from lsh_ray.stages.minhash import signatures
    from lsh_ray.stages.normalize import normalize
    from lsh_ray.stages.shingle import shingle
    sigs = signatures(shingle(normalize(_docs(sf_dir), CFG), CFG), CFG)

    def proj(t: pa.Table) -> pa.Table:
        mh = t["minhash"].combine_chunks()
        first = mh.values.to_numpy(zero_copy_only=False).reshape(
            t.num_rows, CFG.num_perms)[:, 0] if t.num_rows else \
            np.empty(0, dtype=np.uint64)
        return pa.table({
            "url": t["url"],
            "simhash": t["simhash"],
            "minhash_0": pa.array(first, type=pa.uint64()),
            "n_shingles": t["n_shingles"],
        })
    return sigs.map_batches(proj, batch_format="pyarrow",
                            zero_copy_batch=True)


def q_simhash_near_dups(sf_dir: str):
    from lsh_ray.stages.dedup import simhash_near_dup_pairs
    from lsh_ray.stages.minhash import signatures
    from lsh_ray.stages.normalize import normalize
    from lsh_ray.stages.shingle import shingle
    sigs = signatures(shingle(normalize(_docs(sf_dir), CFG), CFG), CFG)
    return simhash_near_dup_pairs(sigs.materialize(), CFG)


def q_embedding_near_dups(sf_dir: str):
    """SRP-banded near-dup pairs over the embeddings table AUGMENTED with
    deterministic planted duplicates (vec_id+1e6, embedding*2 for
    vec_id<50 — scaling preserves direction exactly, so cosine == 1 and
    the SRP signatures are bit-identical). Oracle-checked: the planted
    pairs make the query provably non-vacuous (the raw table's max
    pairwise cosine is ~0.5, below any near-dup gate)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from lsh_ray.stages.dedup import embedding_near_dup_pairs
    emb = _read(f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"])

    def planted(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.less(t["vec_id"], 50))
        le = sub["embedding"].combine_chunks()
        scaled = pa.ListArray.from_arrays(
            le.offsets,
            pc.multiply(le.values, pa.scalar(2.0, pa.float32())))
        return pa.table({"vec_id": pc.add(sub["vec_id"], 1_000_000),
                         "embedding": scaled})

    aug = emb.union(emb.map_batches(planted, batch_format="pyarrow",
                                    zero_copy_batch=True))
    import dataclasses

    # the embeddings table is tiny at test SFs; a narrow shuffle width
    # avoids paying 64-block exchange overhead on ~550 rows
    small = dataclasses.replace(CFG, shuffle_coalesce_blocks=8)
    return embedding_near_dup_pairs(aug, dim=64, config=small,
                                    cosine_threshold=0.9)


# ---------------------------------------------------------- text stats ----

def q_token_counts(sf_dir: str):
    from lsh_ray.stages.text_stats import token_counts
    return token_counts(_docs_text(sf_dir))


def q_lang_distribution(sf_dir: str):
    from ray.data.aggregate import Count
    ds = _read(f"{sf_dir}/documents.parquet", columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))


def q_doc_quality(sf_dir: str):
    from lsh_ray.stages.text_stats import quality_scores
    return quality_scores(_docs_text(sf_dir))


def q_doc_fingerprints(sf_dir: str):
    from lsh_ray.stages.text_stats import fingerprints
    return fingerprints(_docs_text(sf_dir)).select_columns(
        ["doc_id", "md5_fp"])


def q_lang_id_pred(sf_dir: str):
    from lsh_ray.stages.text_stats import lang_id
    return lang_id(_docs_text(sf_dir))


# --------------------------------------------------------------- tfidf ----

def q_doc_token_stats(sf_dir: str):
    from lsh_ray.stages.tfidf import doc_token_rows
    return doc_token_rows(_docs_text(sf_dir))


def q_token_df(sf_dir: str):
    from lsh_ray.stages.tfidf import doc_token_rows, token_df
    return token_df(doc_token_rows(_docs_text(sf_dir)))


def q_tfidf(sf_dir: str):
    from lsh_ray.stages.tfidf import tfidf
    return tfidf(_docs_text(sf_dir))


def q_token_max_tfidf(sf_dir: str):
    from lsh_ray.stages.tfidf import tfidf, token_max_tfidf
    return token_max_tfidf(tfidf(_docs_text(sf_dir)))


def q_tfidf_filter_stats(sf_dir: str):
    from lsh_ray.stages.tfidf import tfidf_filter_stats
    return tfidf_filter_stats(_docs_text(sf_dir), min_tfidf=0.01)


# -------------------------------------------------------------- events ----

def q_events_hourly(sf_dir: str):
    from lsh_ray.stages.windows import tumbling_window_counts
    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    return tumbling_window_counts(ev, 3600)


def q_event_type_counts(sf_dir: str):
    from ray.data.aggregate import Count
    ev = _read(f"{sf_dir}/events.parquet", columns=["event_type"])
    return ev.groupby("event_type").aggregate(Count(alias_name="n_events"))


def q_sessions(sf_dir: str):
    from lsh_ray.stages.windows import sessionize
    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return sessionize(ev, gap_s=1800).select_columns(
        ["user_id", "session_start", "session_end", "n_events"])


# ---------------------------------------------------------------- tpch ----

def q_lineitem_agg(sf_dir: str):
    import pyarrow as pa

    from ray.data.aggregate import Count, Sum
    li = _read(f"{sf_dir}/lineitem.parquet",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice"])
    out = (li.groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                      Sum("l_extendedprice", alias_name="sum_price"),
                      Count(alias_name="n_rows")))

    def round_batch(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": pa.array(round_half_away(
                t["sum_qty"].to_numpy(zero_copy_only=False), 2)),
            "sum_price": pa.array(round_half_away(
                t["sum_price"].to_numpy(zero_copy_only=False), 2)),
            "n_rows": t["n_rows"],
        })
    return out.map_batches(round_batch, batch_format="pyarrow")


def q_customer_order_counts(sf_dir: str):
    from ray.data.aggregate import Count
    from lsh_ray.stages.join import bucket_join
    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    cust = _read(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    joined = bucket_join(orders, cust, "o_custkey", "c_custkey",
                         ["c_mktsegment"], num_buckets=16)
    return (joined.groupby(["o_custkey", "c_mktsegment"])
            .aggregate(Count(alias_name="n_orders")))


def q_top_orders(sf_dir: str):
    orders = _read(f"{sf_dir}/orders.parquet",
                   columns=["o_orderkey", "o_totalprice"])
    return orders.sort(["o_totalprice", "o_orderkey"],
                       descending=[True, False]).limit(10)


def q_nation_suppliers(sf_dir: str):
    from ray.data.aggregate import Count
    from lsh_ray.stages.join import bucket_join
    sup = _read(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = _read(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    joined = bucket_join(sup, nat, "s_nationkey", "n_nationkey",
                         ["n_name"], num_buckets=4)
    return joined.groupby("n_name").aggregate(
        Count(alias_name="n_suppliers"))


# ----------------------------------------------------------------- ann ----

def _query_vectors(sf_dir: str, n: int = 5):
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    mask = np.asarray(tbl["vec_id"]) < n
    sub = tbl.filter(mask)
    ids = np.asarray(sub["vec_id"])
    vecs = np.stack([np.asarray(v) for v in sub["embedding"].to_pylist()])
    return vecs, ids


def q_knn_topk(sf_dir: str):
    from lsh_ray.stages.similarity import knn_brute_force
    vecs, ids = _query_vectors(sf_dir)
    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_brute_force(emb, vecs, ids, k=10)


def q_knn_lsh(sf_dir: str):
    from lsh_ray.stages.similarity import knn_lsh
    vecs, ids = _query_vectors(sf_dir)
    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_lsh(emb, vecs, ids, dim=64, k=10, seed=CFG.seed)


def q_text_search(sf_dir: str):
    """Retrieval flow (reference search, rows-only): first 5 docs are
    queries against the remaining corpus."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from lsh_ray.pipelines.search import search
    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    queries = docs.map_batches(
        lambda t: pa.table({
            # distinct query identity so the tagged self-join can orient
            "doc_id": pc.add(t.filter(pc.less(t["doc_id"], 5))["doc_id"],
                             10_000_000),
            "text": t.filter(pc.less(t["doc_id"], 5))["text"],
            "lang": t.filter(pc.less(t["doc_id"], 5))["lang"],
        }),
        batch_format="pyarrow", zero_copy_batch=True)
    return search(docs, queries, CFG, top_k=5)


QUERIES = {
    "text_search": q_text_search,
    "exact_dup_groups": q_exact_dup_groups,
    "exact_dedup": q_exact_dedup,
    "dedup_pairs": q_dedup_pairs,
    "dedup_clusters": q_dedup_clusters,
    "minhash_signatures": q_minhash_signatures,
    "simhash_near_dups": q_simhash_near_dups,
    "embedding_near_dups": q_embedding_near_dups,
    "token_counts": q_token_counts,
    "lang_distribution": q_lang_distribution,
    "doc_quality": q_doc_quality,
    "doc_fingerprints": q_doc_fingerprints,
    "lang_id_pred": q_lang_id_pred,
    "doc_token_stats": q_doc_token_stats,
    "token_df": q_token_df,
    "tfidf": q_tfidf,
    "token_max_tfidf": q_token_max_tfidf,
    "tfidf_filter_stats": q_tfidf_filter_stats,
    "events_hourly": q_events_hourly,
    "event_type_counts": q_event_type_counts,
    "sessions": q_sessions,
    "lineitem_agg": q_lineitem_agg,
    "customer_order_counts": q_customer_order_counts,
    "top_orders": q_top_orders,
    "nation_suppliers": q_nation_suppliers,
    "knn_topk": q_knn_topk,
    "knn_lsh": q_knn_lsh,
}

_TOKS = ("(SELECT doc_id, unnest(string_split_regex(lower(trim(text)), "
         "'\\s+')) AS token FROM documents WHERE trim(text) <> '')")

ORACLE_SQL = {
    "exact_dup_groups": (
        "SELECT md5(text) AS text_hash, COUNT(*) AS n_docs, "
        "MIN(doc_id) AS rep_doc_id FROM documents GROUP BY md5(text)"),
    "exact_dedup": (
        "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)"),
    "token_counts": (
        "SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE "
        "array_length(string_split_regex(trim(text), '\\s+')) END "
        "AS n_tokens FROM documents"),
    "lang_distribution": (
        "SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang"),
    "doc_quality": (
        "SELECT doc_id, length(text) AS n_chars, "
        "ROUND(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / "
        "GREATEST(length(text), 1), 6) AS alpha_ratio, "
        "ROUND(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / "
        "GREATEST(length(text), 1), 6) AS digit_ratio, "
        "ROUND((length(text) - length(replace(text, ' ', ''))) * 1.0 / "
        "GREATEST(length(text), 1), 6) AS space_ratio FROM documents"),
    "doc_fingerprints": (
        "SELECT doc_id, md5(text) AS md5_fp FROM documents"),
    "doc_token_stats": (
        "SELECT doc_id, token, COUNT(*) AS tf_count, "
        "CAST(SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS BIGINT) "
        "AS doc_len "
        f"FROM {_TOKS} GROUP BY doc_id, token"),
    "token_df": (
        f"SELECT token, COUNT(DISTINCT doc_id) AS df FROM {_TOKS} "
        "GROUP BY token"),
    "tfidf": (
        "WITH toks AS " + _TOKS + ", "
        "tf AS (SELECT doc_id, token, COUNT(*) AS tf_count, "
        "SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS doc_len "
        "FROM toks GROUP BY doc_id, token), "
        "df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks "
        "GROUP BY token), "
        "n AS (SELECT COUNT(*) AS n_docs FROM documents "
        "WHERE trim(text) <> '') "
        "SELECT tf.doc_id, tf.token, "
        "ROUND((tf.tf_count * 1.0 / tf.doc_len) * "
        "log2(n.n_docs * 1.0 / df.df), 6) AS tfidf "
        "FROM tf JOIN df USING (token) CROSS JOIN n"),
    "events_hourly": (
        "SELECT user_id, "
        "CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start, "
        "COUNT(*) AS n_events, MAX(value) AS max_value "
        "FROM events GROUP BY 1, 2"),
    "event_type_counts": (
        "SELECT event_type, COUNT(*) AS n_events FROM events "
        "GROUP BY event_type"),
    "sessions": (
        "WITH e AS (SELECT user_id, ts, epoch(ts) AS s FROM events), "
        "d AS (SELECT *, CASE WHEN s - lag(s) OVER "
        "(PARTITION BY user_id ORDER BY ts, s) > 1800 OR lag(s) OVER "
        "(PARTITION BY user_id ORDER BY ts, s) IS NULL THEN 1 ELSE 0 END "
        "AS new_s FROM e), "
        "g AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY "
        "ts, s ROWS UNBOUNDED PRECEDING) AS sid FROM d) "
        "SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end, "
        "COUNT(*) AS n_events FROM g GROUP BY user_id, sid"),
    "lineitem_agg": (
        "SELECT l_returnflag, l_linestatus, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_price, "
        "COUNT(*) AS n_rows FROM lineitem GROUP BY 1, 2"),
    "customer_order_counts": (
        "SELECT o.o_custkey, c.c_mktsegment, COUNT(*) AS n_orders "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "GROUP BY 1, 2"),
    "top_orders": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"),
    "nation_suppliers": (
        "SELECT n.n_name, COUNT(*) AS n_suppliers FROM supplier s "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey GROUP BY n.n_name"),
    "knn_topk": (
        "SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
        "ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
        "CAST(e.embedding AS DOUBLE[])), 6) AS cosine "
        "FROM embeddings q CROSS JOIN embeddings e "
        "WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id "
        "QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY "
        "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
        "CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id ASC) <= 10"),
    "token_max_tfidf": (
        "WITH toks AS " + _TOKS + ", "
        "tf AS (SELECT doc_id, token, COUNT(*) AS tf_count, "
        "SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS doc_len "
        "FROM toks GROUP BY doc_id, token), "
        "df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks "
        "GROUP BY token), "
        "n AS (SELECT COUNT(*) AS n_docs FROM documents "
        "WHERE trim(text) <> '') "
        "SELECT token, MAX(ROUND((tf.tf_count * 1.0 / tf.doc_len) * "
        "log2(n.n_docs * 1.0 / df.df), 6)) AS max_tfidf "
        "FROM tf JOIN df USING (token) CROSS JOIN n GROUP BY token"),
    "tfidf_filter_stats": (
        "WITH toks AS " + _TOKS + ", "
        "tf AS (SELECT doc_id, token, COUNT(*) AS tf_count, "
        "SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS doc_len "
        "FROM toks GROUP BY doc_id, token), "
        "df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks "
        "GROUP BY token), "
        "n AS (SELECT COUNT(*) AS n_docs FROM documents "
        "WHERE trim(text) <> '') "
        ", scored AS (SELECT tf.doc_id, tf.token, tf.tf_count, tf.doc_len, "
        "ROUND((tf.tf_count * 1.0 / tf.doc_len) * "
        "log2(n.n_docs * 1.0 / df.df), 6) AS tfidf "
        "FROM tf JOIN df USING (token) CROSS JOIN n) "
        "SELECT doc_id, CAST(SUM(CASE WHEN tfidf > 0.01 THEN tf_count "
        "ELSE 0 END) AS BIGINT) AS n_kept, "
        "ROUND(SUM(CASE WHEN tfidf > 0.01 THEN tf_count ELSE 0 "
        "END) * 1.0 / GREATEST(MAX(doc_len), 1), 6) AS pct_kept "
        "FROM scored GROUP BY doc_id"),
    "embedding_near_dups": (
        "WITH aug AS ("
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings "
        "UNION ALL "
        "SELECT vec_id + 1000000 AS vec_id, "
        "list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2) AS e "
        "FROM embeddings WHERE vec_id < 50) "
        "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
        "ROUND(list_cosine_similarity(a.e, b.e), 6) AS cosine "
        "FROM aug a JOIN aug b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(a.e, b.e) >= 0.9"),
    # rows-only (non-SQL-expressible): dedup_pairs, dedup_clusters,
    # minhash_signatures, simhash_near_dups, lang_id_pred, knn_lsh
}
