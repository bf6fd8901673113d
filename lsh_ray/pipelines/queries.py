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


def _attach_pair_urls(pairs_ds, sigs_ds, carry_cols: list[str],
                      num_blocks: int | None = None):
    """(doc_a, doc_b, *carry) pairs + signatures (doc_id, url) ->
    (url_a, url_b, *carry) CANONICALIZED by url string order.

    Hashed doc ids (siphash64(url)) are not oracle-reproducible; urls
    are, and LEAST/GREATEST string ordering is the same in DuckDB."""
    import pyarrow as pa

    from lsh_ray.stages.join import bucket_join
    urls = sigs_ds.select_columns(["doc_id", "url"])
    j = bucket_join(pairs_ds, urls, "doc_a", "doc_id", ["url"],
                    suffix="_a", num_blocks=num_blocks)
    j = bucket_join(j, urls, "doc_b", "doc_id", ["url"], suffix="_b",
                    num_blocks=num_blocks)

    def proj(t: pa.Table) -> pa.Table:
        from lsh_ray.functions.num import string_pair_min_max
        lo, hi = string_pair_min_max(t["url_a"], t["url_b"])
        out = {"url_a": lo, "url_b": hi}
        for c in carry_cols:
            out[c] = t[c]
        return pa.table(out)
    return j.map_batches(proj, batch_format="pyarrow",
                         zero_copy_batch=True)


def q_dedup_pairs(sf_dir: str):
    """Full MinHash/LSH pipeline; verified duplicate pairs keyed by url
    with the exact shingle-set Jaccard.

    Oracle-checked ORGANICALLY: the DuckDB oracle brute-forces shingle-set
    Jaccard over ALL document pairs and applies the same float32 gate.
    The banded pipeline equals brute force exactly because candidate
    recall is 1.0 at oracle scale (measured: sf0.001 28/28, sf0.01 25/25,
    sf0.1 255/255 pairs identical)."""
    res = _dedup_result(sf_dir)
    dup = res.verified.map_batches(
        lambda t: t.filter(t["is_dup"]).select(
            ["doc_a", "doc_b", "jaccard"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return _attach_pair_urls(dup, res.signatures, ["jaccard"])


_INC_CACHE: dict[str, object] = {}


def q_dedup_pairs_incremental(sf_dir: str):
    """Incremental dedup surface: the corpus is split by the
    deterministic md5-bucket rule (stages/sampling.py — bucket >= 'cc'
    of the PARQUET doc_id is the ~20% delta), the base is deduped and
    checkpointed, and the delta is deduped AGAINST that checkpoint with
    ``run_dedup_incremental`` — base work never redone, base x base
    pairs never re-enumerated. Output: verified dup pairs touching >= 1
    delta doc, keyed by url with exact Jaccard.

    Oracle: the same brute-force pair SQL as ``dedup_pairs`` restricted
    to pairs with >= 1 endpoint in the md5-defined delta — DuckDB
    recomputes the split exactly (``substr(md5(CAST(doc_id AS
    VARCHAR)),1,2) >= 'cc'``)."""
    import pyarrow as pa

    res = _INC_CACHE.get(sf_dir)
    if res is None:
        import tempfile

        from lsh_ray.pipelines.dedup_pipeline import run_dedup
        from lsh_ray.pipelines.incremental import run_dedup_incremental
        from lsh_ray.stages.sampling import _key_buckets

        def side_filter(want_delta: bool):
            def f(t: pa.Table) -> pa.Table:
                b = _key_buckets(t["doc_id"].to_pylist())
                mask = (b >= "cc") if want_delta else (b < "cc")
                return t.filter(pa.array(mask))
            return f

        docs = _docs(sf_dir)
        base = docs.map_batches(side_filter(False),
                                batch_format="pyarrow",
                                zero_copy_batch=True)
        delta = docs.map_batches(side_filter(True),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)
        ckpt = tempfile.mkdtemp(prefix="lshray_incbase_")
        run_dedup(base, CFG, checkpoint_dir=ckpt)
        res = _INC_CACHE[sf_dir] = run_dedup_incremental(delta, ckpt, CFG)
    dup = res.verified.map_batches(
        lambda t: t.filter(t["is_dup"]).select(
            ["doc_a", "doc_b", "jaccard"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return _attach_pair_urls(dup, res.signatures, ["jaccard"])


def q_dedup_clusters(sf_dir: str):
    """Union-find clusters over verified dup + substring edges, relabeled
    by url: (url, cluster_url = MIN url of the component) — the
    content-derived cluster id re-expressed in the oracle-computable key
    space. Oracle: recursive-CTE connected components over the DuckDB
    brute-force edge set (exact equality relies on the measured
    recall-1.0 property, see q_dedup_pairs)."""
    from lsh_ray.stages.cluster import relabel_clusters_by_min_url
    res = _dedup_result(sf_dir)
    return relabel_clusters_by_min_url(res.clusters, res.signatures)


def signature_table(sf_dir: str):
    """Full per-doc signature artifact (url, simhash, minhash_0,
    n_shingles) — the rebuild's 'index' (reference create_index,
    lsh.py:415-444). Used by ``__ray_entry__.entry()``; the oracle-checked
    query surface is the SQL-computable projection (q_minhash_signatures)."""
    import pyarrow as pa

    from lsh_ray.stages.minhash import signatures
    from lsh_ray.stages.normalize import normalize
    from lsh_ray.stages.shingle import shingle
    sigs = signatures(shingle(normalize(_docs(sf_dir), CFG), CFG), CFG)

    def proj(t: pa.Table) -> pa.Table:
        mh = t["minhash"].combine_chunks()
        first = mh.values.to_numpy(zero_copy_only=False).reshape(
            t.num_rows, CFG.num_perms)[:, 0] if t.num_rows else \
            np.empty(0, dtype=np.uint32)
        return pa.table({
            "url": t["url"],
            "simhash": t["simhash"],
            "minhash_0": pa.array(first.astype(np.uint64),
                                  type=pa.uint64()),
            "n_shingles": t["n_shingles"],
        })
    return sigs.map_batches(proj, batch_format="pyarrow",
                            zero_copy_batch=True)


def q_minhash_signatures(sf_dir: str):
    """Signature stage surface: (url, n_shingles) per doc.

    The full MinHash-128/SimHash-64 signature stage runs (the projection
    is applied downstream of it); the oracle checks the SQL-computable
    columns — n_shingles is the per-doc count of DISTINCT k-token
    shingles, which DuckDB recomputes from the raw text with the same
    tokenizer semantics. The signature VALUES are custom 64-bit hashes
    (not SQL-expressible); their determinism/shape is pytest-checked
    (tests/test_minhash.py seed-determinism + known-value tests). Stored
    minhash lanes are uint32 (top halves of the 64-bit lane mix; see
    lsh_ray/stages/minhash.py)."""
    from lsh_ray.stages.minhash import signatures
    from lsh_ray.stages.normalize import normalize
    from lsh_ray.stages.shingle import shingle
    sigs = signatures(shingle(normalize(_docs(sf_dir), CFG), CFG), CFG)
    return sigs.select_columns(["url", "n_shingles"])


def q_simhash_near_dups(sf_dir: str):
    """SimHash banding over documents AUGMENTED with planted exact copies
    (doc_id+1e7, same text): identical text => identical 64-bit SimHash
    => Hamming 0, and every planted pair shares all 4 pieces so candidate
    generation finds it deterministically. The output keeps ONLY the
    Hamming-0 pairs between md5-IDENTICAL texts — exactly the planted
    pairs, a SQL-expressible surface ("SimHash banding recovers every
    exact-duplicate pair at Hamming 0"). The md5-equality filter excludes
    organic Hamming-0 collisions between near-identical-but-distinct
    texts (one exists at sf0.01); organic Hamming 1..3 pairs remain
    covered by pytest (pigeonhole piece tests)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from lsh_ray.stages.dedup import add_text_md5, simhash_near_dup_pairs
    from lsh_ray.stages.join import bucket_join
    from lsh_ray.stages.minhash import signatures
    from lsh_ray.stages.normalize import normalize
    from lsh_ray.stages.shingle import shingle

    docs = _read(f"{sf_dir}/documents.parquet",
                 columns=["doc_id", "text", "lang"])

    def planted(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.add(t["doc_id"], 10_000_000),
            "text": t["text"],
            "lang": t["lang"],
        })

    import dataclasses

    # the augmented corpus is tiny at test SFs: a narrow shuffle width
    # avoids paying wide-exchange overhead in each of the joins below
    small = dataclasses.replace(CFG, shuffle_coalesce_blocks=8)
    from lsh_ray.config import coalesce_blocks
    nb = coalesce_blocks(small)
    aug = docs.union(docs.map_batches(planted, batch_format="pyarrow",
                                      zero_copy_batch=True))
    norm = normalize(aug, small).materialize()
    sigs = signatures(shingle(norm, small), small).materialize()
    pairs = simhash_near_dup_pairs(sigs, small)
    zero = pairs.map_batches(
        lambda t: t.filter(pc.equal(t["hamming"], 0)),
        batch_format="pyarrow", zero_copy_batch=True)
    # ONE metadata join per pair side: (url, text_hash) together
    meta = add_text_md5(norm.select_columns(["doc_id", "url", "text"])) \
        .select_columns(["doc_id", "url", "text_hash"])
    j = bucket_join(zero, meta, "doc_a", "doc_id", ["url", "text_hash"],
                    suffix="_a", num_blocks=nb)
    j = bucket_join(j, meta, "doc_b", "doc_id", ["url", "text_hash"],
                    suffix="_b", num_blocks=nb)

    def finish(t: pa.Table) -> pa.Table:
        from lsh_ray.functions.num import string_pair_min_max
        t = t.filter(pc.equal(t["text_hash_a"], t["text_hash_b"]))
        lo, hi = string_pair_min_max(t["url_a"], t["url_b"])
        return pa.table({
            "url_a": lo,
            "url_b": hi,
            "hamming": t["hamming"],
        })
    return j.map_batches(finish, batch_format="pyarrow",
                         zero_copy_batch=True)


def q_ngram_jaccard_dups(sf_dir: str):
    """Sketch-free near-dup: exact word-3-gram Jaccard >= 0.7 via
    prefix-filter inverted index (PPJoin) + exact set verification.
    Oracle-checked ORGANICALLY (no planting): DuckDB brute-forces
    3-gram Jaccard over all pairs; the prefix filter guarantees the
    pipeline's candidate recall is 1.0 by construction (not just
    measured), so the outputs must be identical."""
    import dataclasses

    from lsh_ray.stages.dedup import ngram_jaccard_pairs
    small = dataclasses.replace(CFG, shuffle_coalesce_blocks=8)
    return ngram_jaccard_pairs(
        _read(f"{sf_dir}/documents.parquet",
              columns=["doc_id", "text", "lang"]),
        small, n=3, threshold=0.7, exact=True)


def q_line_dedup(sf_dir: str):
    """Global first-occurrence line-level exact dedup (the RefinedWeb /
    MassiveText tier between exact-document and n-gram), reassembling
    each doc from its surviving lines. The synthetic corpus has no
    newline structure, so the "line" view is the deterministic
    12-word segmentation of the whitespace stream — the oracle applies
    the identical derivation (same documented-augmentation precedent as
    q_embedding_near_dups). Non-vacuous: ~30% of lines dedup away and
    some docs are absorbed entirely at every checked SF."""
    from lsh_ray.stages.dedup import line_dedup
    return line_dedup(_docs_text(sf_dir), words_per_line=12)


def q_pii_redact(sf_dir: str):
    """Dolma/CCNet-style PII scrubbing: redact emails / IPv4s / phone
    numbers to sentinel tokens, counting matches per category. The
    synthetic corpus carries no organic PII, so the docs are AUGMENTED
    with deterministic doc_id-derived PII suffixes (same
    documented-augmentation precedent as q_embedding_near_dups); the
    oracle applies the identical suffix derivation, then both engines
    run the IDENTICAL RE2 patterns independently (Arrow C++ kernels vs
    DuckDB regexp_replace/extract_all). Non-vacuous: 1 in 5 docs gains
    an email, 1 in 7 an IP, 1 in 11 a phone at every SF."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from lsh_ray.stages.text_stats import pii_redact

    def augment(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        email = np.where(did % 5 == 0,
                         np.char.add(np.char.add(
                             " contact user", did.astype("U20")),
                             "@example.com soon"), "")
        ip = np.where(did % 7 == 0,
                      np.char.add(np.char.add(np.char.add(np.char.add(
                          np.char.add(np.char.add(np.char.add(np.char.add(
                              " from ", (did % 256).astype("U3")), "."),
                              (did * 7 % 256).astype("U3")), "."),
                              (did * 13 % 256).astype("U3")), "."),
                              (did % 100).astype("U3")), " today"), "")
        phone = np.where(did % 11 == 0,
                         np.char.add(np.char.add(
                             " call +1-555-",
                             np.char.zfill((did % 10000).astype("U4"), 4)),
                             " now"), "")
        sfx = np.char.add(np.char.add(email, ip), phone)
        txt = pc.binary_join_element_wise(
            t["text"], pa.array(sfx.tolist(), type=pa.string()), "")
        return pa.table({"doc_id": t["doc_id"], "text": txt})

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pii_redact(ds.map_batches(augment, batch_format="pyarrow",
                                     zero_copy_batch=True))


def q_unigram_logprob(sf_dir: str):
    """CCNet/KenLM-style LM quality signal: per-doc mean token
    log-probability under the corpus's own unigram MLE. Byte-exact
    float parity via integer micro-logprobs (see
    ``stages/text_stats.unigram_logprob``)."""
    from lsh_ray.stages.text_stats import unigram_logprob
    return unigram_logprob(_docs_text(sf_dir))


def _aug_embeddings(sf_dir: str):
    """Embeddings table AUGMENTED with deterministic planted duplicates
    (vec_id+1e6, embedding*2 for vec_id<50 — scaling by a power of two
    preserves direction bit-exactly, so cosine == 1 and SRP signatures
    are identical). Shared by the embedding-dedup queries; the oracles
    reproduce the augmentation in SQL."""
    import pyarrow as pa
    import pyarrow.compute as pc

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

    return emb.union(emb.map_batches(planted, batch_format="pyarrow",
                                     zero_copy_batch=True))


def q_embedding_near_dups(sf_dir: str):
    """SRP-banded near-dup pairs over the planted-duplicate embeddings
    view (_aug_embeddings). Oracle-checked: the planted pairs make the
    query provably non-vacuous (the raw table's max pairwise cosine is
    ~0.5, below any near-dup gate)."""
    from lsh_ray.stages.dedup import embedding_near_dup_pairs
    aug = _aug_embeddings(sf_dir)
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


def q_token_counts_bpe(sf_dir: str):
    from lsh_ray.stages.text_stats import bpe_token_counts
    return bpe_token_counts(_docs_text(sf_dir))


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
    """Stopword-overlap language heuristic (actor-pool stage). The
    heuristic is deliberately a pure function of the token set, so the
    DuckDB oracle mirrors it exactly: distinct tokens of the first 500,
    intersected with each language's stopword list, argmax with
    first-in-sorted-order tie-break (de < en < pt), 'unknown' on zero."""
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


def q_events_hopping(sf_dir: str):
    """Hopping (sliding) windows: 1h length advancing every 30min — each
    event lands in 2 overlapping windows. Per-batch replica expansion +
    local combine keeps the shuffle at one partial row per (user,
    window, batch)."""
    from lsh_ray.stages.windows import hopping_window_counts
    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    return hopping_window_counts(ev, window_s=3600, hop_s=1800)


def q_event_type_counts(sf_dir: str):
    from ray.data.aggregate import Count
    ev = _read(f"{sf_dir}/events.parquet", columns=["event_type"])
    return ev.groupby("event_type").aggregate(Count(alias_name="n_events"))


def q_sessions(sf_dir: str):
    from lsh_ray.stages.windows import sessionize
    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return sessionize(ev, gap_s=1800).select_columns(
        ["user_id", "session_start", "session_end", "n_events"])


def _events_typed(sf_dir: str, event_type: str, columns: list[str]):
    import pyarrow.compute as pc
    ev = _read(f"{sf_dir}/events.parquet",
               columns=[*columns, "event_type"])
    return ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], event_type))
                   .select(columns),
        batch_format="pyarrow", zero_copy_batch=True)


def q_events_asof(sf_dir: str):
    """Per click, the latest view at-or-before it by the same user —
    the distributed as-of join (``stages/asof.py``), DuckDB's native
    ASOF JOIN as the oracle. The view side is aggregated to one row per
    (user, ts) so the as-of winner is deterministic on both engines."""
    import pyarrow as pa

    from lsh_ray.config import coalesce_blocks
    from lsh_ray.stages.asof import asof_join
    from lsh_ray.stages.exchange import colocate_map

    clicks = _events_typed(sf_dir, "click", ["event_id", "user_id", "ts"])

    # (user, ts) -> Max(value) as per-batch partials + one user-keyed
    # co-location (the former native groupby paid the sort-groupby
    # barrier; the run reduce finishes vectorized in the block)
    nblocks = min(coalesce_blocks(), 64)

    def _vreduce(t: pa.Table, val_col: str, out_ts: bool) -> pa.Table:
        ts_t = pa.timestamp("us")
        if t.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], ts_t if out_ts else pa.int64()),
                "view_value": pa.array([], pa.float64())})
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = (t["ts"].cast(ts_t).cast(pa.int64())
              .to_numpy(zero_copy_only=False)
              if t.schema.field("ts").type != pa.int64()
              else t["ts"].to_numpy(zero_copy_only=False))
        v = t[val_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts, v = u[order], ts[order], v[order]
        new = np.concatenate(([True],
                              (u[1:] != u[:-1]) | (ts[1:] != ts[:-1])))
        firsts = np.flatnonzero(new)
        ts_out = pa.array(ts[firsts])
        if out_ts:
            ts_out = ts_out.cast(ts_t)
        return pa.table({"user_id": pa.array(u[firsts]),
                         "ts": ts_out,
                         "view_value": pa.array(
                             np.maximum.reduceat(v, firsts))})

    def u_bucket(t: pa.Table) -> pa.Table:
        h = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("bucket", pa.array(
            (h % np.uint64(nblocks)).astype(np.int32)))

    vparts = _events_typed(sf_dir, "view", ["user_id", "ts", "value"]) \
        .map_batches(lambda t: _vreduce(t, "value", False),
                     batch_format="pyarrow", zero_copy_batch=True)
    views = colocate_map(vparts, ["user_id"], nblocks,
                         lambda t: _vreduce(t, "view_value", True),
                         sort_bucket_expr=u_bucket)
    out = asof_join(clicks, views, "user_id", "user_id", "ts", "ts",
                    ["ts", "view_value"], suffix="_r", num_buckets=64,
                    num_blocks=8)
    return out.rename_columns({"ts_r": "view_ts",
                               "view_value_r": "view_value"})


def q_error_click_window(sf_dir: str):
    """Clicks within one day after each error by the same user — the
    distributed range (interval) join (``stages/asof.py``); the oracle
    is the equivalent inequality join."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from lsh_ray.stages.asof import range_join
    clicks = _events_typed(sf_dir, "click", ["event_id", "user_id", "ts"])
    day = pa.scalar(86_400_000_000, type=pa.duration("us"))
    errors = _events_typed(sf_dir, "error", ["event_id", "ts",
                                             "user_id"]).map_batches(
        lambda t: t.append_column("win_end", pc.add(t["ts"], day)),
        batch_format="pyarrow", zero_copy_batch=True)
    out = range_join(clicks, errors, "user_id", "user_id", "ts",
                     "ts", "win_end", ["event_id"], suffix="_err",
                     num_buckets=64, num_blocks=8)
    return out.map_batches(
        lambda t: pa.table({"error_id": t["event_id_err"],
                            "click_id": t["event_id"],
                            "user_id": t["user_id"]}),
        batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------- tpch ----

def q_lineitem_agg(sf_dir: str):
    import pyarrow as pa

    from ray.data.aggregate import Sum
    li = _read(f"{sf_dir}/lineitem.parquet",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice"])

    # map-side pre-aggregation (Arrow C++ group_by per batch): the
    # (returnflag, linestatus) key space has 6 combinations, so each
    # block collapses to <= 6 partial rows before the shuffle
    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ([], "count_all")])
        return pa.table({
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "q": g["l_quantity_sum"],
            "p": g["l_extendedprice_sum"],
            "n": g["count_all"].cast(pa.int64()),
        })

    # BOUNDED driver reduce: the key space is 6 combinations, so the
    # partial stream is <= 6 rows per block — a native groupby here
    # paid a full sort-shuffle barrier to merge a few hundred rows
    parts = li.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    g = parts.groupby(["l_returnflag", "l_linestatus"],
                      as_index=False).agg(
        sum_qty=("q", "sum"), sum_price=("p", "sum"),
        n_rows=("n", "sum"))
    return pa.table({
        "l_returnflag": pa.array(g["l_returnflag"], type=pa.string()),
        "l_linestatus": pa.array(g["l_linestatus"], type=pa.string()),
        "sum_qty": pa.array(round_half_away(
            g["sum_qty"].to_numpy(), 2)),
        "sum_price": pa.array(round_half_away(
            g["sum_price"].to_numpy(), 2)),
        "n_rows": pa.array(g["n_rows"].to_numpy(), type=pa.int64()),
    })


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


def q_region_supplier_counts(sf_dir: str):
    """3-table join: region |><| nation |><| supplier -> suppliers per
    region (multi-way bucket_join chain over the TPC-H dimension tables)."""
    from ray.data.aggregate import Count
    from lsh_ray.stages.join import bucket_join
    sup = _read(f"{sf_dir}/supplier.parquet",
                columns=["s_suppkey", "s_nationkey"])
    nat = _read(f"{sf_dir}/nation.parquet",
                columns=["n_nationkey", "n_regionkey"])
    reg = _read(f"{sf_dir}/region.parquet",
                columns=["r_regionkey", "r_name"])
    j = bucket_join(sup, nat, "s_nationkey", "n_nationkey",
                    ["n_regionkey"], num_buckets=4, num_blocks=8)
    j = bucket_join(j, reg, "n_regionkey", "r_regionkey", ["r_name"],
                    num_buckets=4, num_blocks=8)
    return j.groupby("r_name").aggregate(Count(alias_name="n_suppliers"))


def q_part_volume_left(sf_dir: str):
    """LEFT join with real null back-fill: per-part volume restricted to
    HIGH-QUANTITY lineitems (l_quantity > 30) — parts with no such
    lineitems keep a 0 row instead of disappearing (exercises the
    mask-take null path of bucket_join)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum
    from lsh_ray.stages.join import bucket_join
    part = _read(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    li = _read(f"{sf_dir}/lineitem.parquet",
               columns=["l_partkey", "l_quantity"])
    hi = li.map_batches(
        lambda t: t.filter(pc.greater(t["l_quantity"], 30.0)),
        batch_format="pyarrow", zero_copy_batch=True)
    agg = hi.groupby("l_partkey").aggregate(
        Sum("l_quantity", alias_name="hi_qty"),
        Count(alias_name="n_hi"))
    j = bucket_join(part, agg, "p_partkey", "l_partkey",
                    ["hi_qty", "n_hi"], how="left", num_buckets=16)

    def fill(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": t["p_partkey"],
            "p_brand": t["p_brand"],
            "hi_qty": pa.array(round_half_away(
                pc.fill_null(t["hi_qty"], 0.0).to_numpy(
                    zero_copy_only=False), 2)),
            "n_hi": pc.fill_null(t["n_hi"], 0).combine_chunks()
            .cast(pa.int64()),
        })
    return j.map_batches(fill, batch_format="pyarrow",
                         zero_copy_batch=True)


def q_html_extract(sf_dir: str):
    """HTML -> text extraction round-trip over pages SYNTHESIZED
    deterministically from the documents table (testdata carries no html
    column; the production schema does): text is entity-escaped, wrapped
    in a page with script/style/comment noise, and fed through the
    html-only normalize path. The extractor must recover the
    whitespace-collapsed text byte-for-byte — BASELINE.json's per-row
    invariant as a driver-checked oracle row."""
    import pyarrow as pa

    from lsh_ray.stages.normalize import normalize

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def build(t: pa.Table) -> pa.Table:
        htmls = []
        for txt in t["text"].to_pylist():
            esc = ((txt or "").replace("&", "&amp;")
                   .replace("<", "&lt;").replace(">", "&gt;"))
            htmls.append((
                "<html><head><title></title>"
                "<script>var x = '<tag> && more';</script>"
                "<style>p { color: red; }</style></head>"
                "<body><!-- stripped --><h1>" + esc +
                "</h1><br/></body></html>").encode())
        return pa.table({"doc_id": t["doc_id"],
                         "html": pa.array(htmls, type=pa.binary())})

    pages = docs.map_batches(build, batch_format="pyarrow",
                             zero_copy_batch=True)
    return normalize(pages, CFG).select_columns(["url", "text"])


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
    """LSH-bucketed approximate top-k with BIT-SAMPLING hyperplanes
    (signature bit i = sign of raw component i): the same piece-bucket
    candidate machinery as the SRP path, but the bucket structure is a
    pure function of the raw vectors, so the DuckDB oracle reproduces the
    exact candidate set (4 x 16-dim sign-pattern pieces) and therefore
    the exact result. The random-projection variant stays pytest-covered
    (recall vs knn_brute_force, tests/test_ops.py)."""
    from lsh_ray.stages.similarity import knn_lsh
    vecs, ids = _query_vectors(sf_dir)
    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    # 8 pieces x 8 bits: at 16-bit pieces no non-self pair of the test
    # embeddings shares a sign pattern (vacuous result); 8-bit pieces
    # give a meaningful candidate set (~78 pairs at sf0.01)
    return knn_lsh(emb, vecs, ids, dim=64, k=10, seed=CFG.seed,
                   n_pieces=8, projection="identity", round_to=6)


def q_knn_ivf(sf_dir: str):
    """IVF coarse-quantized top-k at the EXHAUSTIVE-PROBE configuration
    (nprobe == n_cells): the probe set covers every cell, so the result
    equals exact search and the brute-force SQL is the oracle — while
    still exercising the full IVF machinery (sample pull, k-means
    training, centroid broadcast, per-batch cell assignment, probe-LUT
    masking, rerank, top-k merge). Partial-probe recall (the production
    configuration) is measured in tests/test_ops.py against
    knn_brute_force."""
    from lsh_ray.stages.similarity import knn_ivf
    vecs, ids = _query_vectors(sf_dir)
    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_ivf(emb, vecs, ids, k=10, n_cells=16, nprobe=16,
                   seed=CFG.seed, round_to=6)


def q_text_search(sf_dir: str):
    """Retrieval flow (reference search semantics): the first 5 docs are
    planted as queries (distinct identity) against the corpus; the
    GOLDEN-TOP-1 surface is returned — each query's rank-1 result, which
    must be its source document at exact Jaccard 1.0. This is the
    planted-golden oracle (reference expected_results.list analog,
    loader.py:55-66): SQL-predictable because an identical shingle set
    always outranks every organic candidate (no exact-duplicate texts
    exist in the corpus). The full ranked/confidence surface stays
    pytest-covered (tests/test_search.py MRR/cascade)."""
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
    res = search(docs, queries, CFG, top_k=5)
    top1 = res[res["rank"] == 1]
    return top1[["query_url", "doc_url", "jaccard", "rank"]].reset_index(
        drop=True)


def q_text_search_ls(sf_dir: str):
    """Kernel-dispatch retrieval (reference -ma flag): same planted-query
    flow as q_text_search but ranked by the LINEAR-SCALING kernel over
    token sequences inside the distributed per-query map_groups. The
    golden top-1 surface is SQL-predictable: a query's source document
    has the identical token sequence, so its LS distance is exactly 0.0
    and it outranks every organic candidate (distances ascending)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from lsh_ray.pipelines.search import search
    docs = _read(f"{sf_dir}/documents.parquet",
                 columns=["doc_id", "text", "lang"])
    queries = docs.map_batches(
        lambda t: pa.table({
            "doc_id": pc.add(t.filter(pc.less(t["doc_id"], 5))["doc_id"],
                             10_000_000),
            "text": t.filter(pc.less(t["doc_id"], 5))["text"],
            "lang": t.filter(pc.less(t["doc_id"], 5))["lang"],
        }),
        batch_format="pyarrow", zero_copy_batch=True)
    res = search(docs, queries, CFG, top_k=5, kernel="ls")
    top1 = res[res["rank"] == 1]
    return top1[["query_url", "doc_url", "score", "rank"]].reset_index(
        drop=True)


def q_doc_split_assign(sf_dir: str):
    """Reproducible train/val/test assignment: a pure function of
    md5(str(doc_id)), so every node, every re-run and the DuckDB oracle
    agree row-for-row with no RNG state or coordination."""
    from lsh_ray.stages.sampling import assign_split
    return assign_split(_read(f"{sf_dir}/documents.parquet",
                              columns=["doc_id"]))


def q_doc_hash_sample(sf_dir: str):
    """Deterministic ~5% subsample ('0d' = 13/256 md5 buckets): the
    fixed-rate eval-subset operator, shuffle-free and resumable."""
    from lsh_ray.stages.sampling import hash_sample
    return hash_sample(_read(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "n_chars"]), "0d")


def q_cluster_keep_longest(sf_dir: str):
    """Quality-aware dedup keep policy: per near-dup cluster the member
    with the MOST shingles (richest capture), ties -> MIN url — the
    alternative to keep-min-key when near-dup groups mix truncated and
    full captures. Bucketed join (clusters ≪ corpus) + combiner-pruned
    grouped argmax; oracle: row_number() over the recursive-CTE
    component set joined to the shingle-count CTE."""
    from lsh_ray.stages.cluster import cluster_representatives
    return cluster_representatives(_dedup_result(sf_dir))


def q_near_dedup_keep(sf_dir: str):
    """The dedup 'apply' surface: the cleaned corpus after near-dup
    removal — every signed doc EXCEPT cluster members that are not
    their cluster's representative (MIN url). A distributed anti-join:
    the dropped-url set rides the bucketed left join as the (much
    smaller) right side and survivors are the null-marker rows."""
    from lsh_ray.stages.cluster import kept_after_dedup
    return kept_after_dedup(_dedup_result(sf_dir))


def q_lang_top_docs(sf_dir: str):
    """Per-group top-k (top-3 longest docs per language): combiner
    pruning caps shuffle volume at groups x k x blocks."""
    from lsh_ray.stages.sampling import grouped_top_k
    return grouped_top_k(
        _read(f"{sf_dir}/documents.parquet",
              columns=["lang", "n_chars", "doc_id"]),
        "lang", "n_chars", "doc_id", k=3)


def q_event_seq(sf_dir: str):
    """Distributed row_number() OVER (PARTITION BY user ORDER BY ts,
    id): the window-function family as a two-phase prefix scan —
    per-(user, hour-bucket) counts become per-user offsets, then one
    (user, bucket) exchange ranks locally. No per-user group ever
    materializes (hot-user safe)."""
    from lsh_ray.stages.windows import event_seq
    return event_seq(_read(f"{sf_dir}/events.parquet",
                           columns=["event_id", "user_id", "ts"]))


def q_event_gaps(sf_dir: str):
    """Distributed LAG: per-user previous-event timestamp + gap, with
    the boundary-table plan (one grouped Max over (user, hour-bucket)
    partials + one co-location exchange) — no per-user group ever
    materializes."""
    from lsh_ray.stages.windows import event_lag
    return event_lag(_read(f"{sf_dir}/events.parquet",
                           columns=["event_id", "user_id", "ts"]))


def q_event_moving_avg(sf_dir: str):
    """Moving frame aggregate (AVG over ROWS 2 PRECEDING): the
    boundary-scan plan — per-(user, hour-bucket) tail slots carried
    into the next bucket, frame resolved fused inside ONE co-locating
    exchange (events ship once, not k times; the frame-by-join plan
    remains available as ``moving_frame_avg(plan='join')``)."""
    from lsh_ray.stages.windows import moving_frame_avg
    return moving_frame_avg(
        _read(f"{sf_dir}/events.parquet",
              columns=["event_id", "user_id", "ts", "value"]), k=3)


def q_event_leads(sf_dir: str):
    """Distributed LEAD: per-user next-event timestamp + gap — the
    mirrored boundary-table plan (grouped Min, backward shift)."""
    from lsh_ray.stages.windows import event_lead
    return event_lead(_read(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts"]))


def q_clicks_errors_hourly(sf_dir: str):
    """FULL OUTER JOIN through the bucketed exchange: hourly click
    counts vs hourly error counts — hours with only one side survive
    with a null other side, keys coalesced across sides. ONE corpus
    scan feeds both sides (a shared per-(hour, both-types) partial +
    one tiny pinned groupby); the outer join runs over hour-cardinality
    aggregates, not events."""
    import pyarrow as pa
    import pyarrow.compute as _pc

    from ray.data.aggregate import Sum

    from lsh_ray.stages.join import bucket_join
    ev = _read(f"{sf_dir}/events.parquet",
               columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ws = (ts_us // 1_000_000) // 3600 * 3600
        et = t["event_type"].to_numpy(zero_copy_only=False)
        cols = {}
        for tp, name in (("click", "nc"), ("error", "ne")):
            m = et == tp
            vals, cnts = np.unique(ws[m], return_counts=True)
            cols[name] = (vals, cnts)
        allv = np.union1d(cols["nc"][0], cols["ne"][0])
        nc = np.zeros(len(allv), dtype=np.int64)
        ne = np.zeros(len(allv), dtype=np.int64)
        nc[np.searchsorted(allv, cols["nc"][0])] = cols["nc"][1]
        ne[np.searchsorted(allv, cols["ne"][0])] = cols["ne"][1]
        return pa.table({"ws": pa.array(allv), "nc": pa.array(nc),
                         "ne": pa.array(ne)})

    # tiny hour-cardinality aggregate, pinned so the two join sides
    # share the single corpus scan
    agg = (ev.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("ws")
           .aggregate(Sum("nc", alias_name="n_clicks"),
                      Sum("ne", alias_name="n_errors"))
           .materialize())

    def side(count_col: str):
        def f(t: pa.Table) -> pa.Table:
            keep = t.filter(_pc.greater(t[count_col], 0))
            return keep.select(["ws", count_col])
        return agg.map_batches(f, batch_format="pyarrow",
                               zero_copy_batch=True)

    j = bucket_join(side("n_clicks"), side("n_errors"), "ws", "ws",
                    ["ws", "n_errors"], suffix="_e", how="outer",
                    unique_right=False)

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": _pc.coalesce(t["ws"], t["ws_e"]),
            "n_clicks": t["n_clicks"],
            "n_errors": t["n_errors_e"],
        })

    return j.map_batches(proj, batch_format="pyarrow",
                         zero_copy_batch=True)


def q_top_revenue_orders(sf_dir: str):
    """TPC-H Q3-shaped end-to-end relational pipeline: segment-filtered
    customers semi-join orders, lineitem revenue pre-aggregates per
    order BEFORE its join (partial/combine over the biggest table),
    grouped sum, global top-10 by revenue. Only the order-cardinality
    aggregate is ever sorted."""
    import pyarrow as pa
    import pyarrow.compute as _pc

    from lsh_ray.stages.join import bucket_join

    cutoff = np.datetime64("1998-06-01T00:00:00").astype(
        "datetime64[us]").astype(np.int64)

    cust = _read(f"{sf_dir}/customer.parquet",
                 columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(_pc.equal(t["c_mktsegment"], "BUILDING"))
                   .select(["c_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def ord_filter(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].cast(pa.int64())
        t = t.filter(_pc.less(od, cutoff))
        # int64 epoch-us, NOT a timestamp column: Ray's sort/groupby
        # round-trips timestamp keys through numpy datetime64 and
        # downcasts to second precision
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "od": t["o_orderdate"].cast(pa.int64())})

    orders = _read(f"{sf_dir}/orders.parquet",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ord_filter, batch_format="pyarrow",
                     zero_copy_batch=True)
    qual = bucket_join(orders, cust, "o_custkey", "c_custkey",
                       ["c_custkey"], suffix="_c").select_columns(
        ["o_orderkey", "od"])

    def li_partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].cast(pa.int64())
        t = t.filter(_pc.greater(sd, cutoff))
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        rev = (t["l_extendedprice"].to_numpy(zero_copy_only=False)
               * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)))
        uniq, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(uniq),
            "rev": pa.array(np.bincount(inv, weights=rev)),
        })

    li = _read(f"{sf_dir}/lineitem.parquet",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"]) \
        .map_batches(li_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
    # the join co-locates every l_orderkey in one bucket, so the grouped
    # Sum AND the per-bucket top-10 finish inside post_fn — the former
    # groupby + sort + limit chain paid two native all-to-all barriers
    # on an order-cardinality table. o_orderdate is functionally
    # dependent on the order key (first occurrence per key).
    def post(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "od_o": pa.array([], pa.int64()),
                             "revenue": pa.array([], pa.float64())})
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        od = t["od_o"].to_numpy(zero_copy_only=False)
        rev = t["rev"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ok, return_inverse=True)
        revs = np.bincount(inv, weights=rev)
        first = np.empty(len(uniq), dtype=np.int64)
        first[inv[::-1]] = np.arange(len(ok) - 1, -1, -1)
        order = np.lexsort((uniq, -revs))[:10]
        return pa.table({"l_orderkey": pa.array(uniq[order]),
                         "od_o": pa.array(od[first][order]),
                         "revenue": pa.array(revs[order])})

    j = bucket_join(li, qual, "l_orderkey", "o_orderkey",
                    ["od"], suffix="_o", post_fn=post)

    # BOUNDED driver merge: <= 10 candidate rows per bucket survive
    # post_fn, so the global top-10 is a tiny in-driver sort (the
    # documented bounded-reducer pattern), not a distributed sort
    from lsh_ray.functions.num import round_half_away
    df = j.to_pandas()
    df = df.sort_values(["revenue", "l_orderkey"],
                        ascending=[False, True]).head(10)
    return pa.table({
        "o_orderkey": pa.array(df["l_orderkey"].to_numpy(),
                               type=pa.int64()),
        "o_orderdate": pa.array(df["od_o"].to_numpy(),
                                type=pa.int64()).cast(pa.timestamp("us")),
        "revenue": pa.array(round_half_away(
            df["revenue"].to_numpy(), 2)),
    })


def q_user_event_pivot(sf_dir: str):
    """Grouped PIVOT: one row per user with per-event-type counts as
    columns — per-batch Arrow group_by partials pivot locally, one
    grouped Sum combines. Shuffle volume = users x batches, never
    events. The pivot column domain is DERIVED from a distinct
    event_type pass (domain cardinality, tiny) rather than hardcoded —
    a guessed domain the oracle shares can't be caught by the oracle
    (this exact failure happened in round 4 with a phantom "search"
    type); deriving it makes the oracle a real constraint."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    from lsh_ray.stages.agg import distinct_values

    types = sorted(
        v for v in distinct_values(
            _read(f"{sf_dir}/events.parquet", columns=["event_type"]),
            "event_type").to_pandas()["event_type"].tolist()
        if v is not None)

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["user_id", "event_type"]).group_by(
            ["user_id", "event_type"]).aggregate([([], "count_all")])
        u = g["user_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        c = g["count_all"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(u, return_inverse=True)
        cols = {"user_id": pa.array(uniq)}
        for tp in types:
            v = np.zeros(len(uniq), dtype=np.int64)
            m = et == tp
            np.add.at(v, inv[m], c[m])
            cols[f"n_{tp}"] = pa.array(v)
        return pa.table(cols)

    return (_read(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("user_id")
            .aggregate(*[Sum(f"n_{tp}", alias_name=f"n_{tp}")
                         for tp in types]))


def q_event_type_users(sf_dir: str):
    """Exact grouped COUNT(DISTINCT): per-batch distinct pairs, one
    pair-dedup shuffle, grouped sum of partial counts — exchange
    volume is distinct pairs, not events."""
    from lsh_ray.stages.agg import grouped_distinct_count
    return grouped_distinct_count(
        _read(f"{sf_dir}/events.parquet",
              columns=["event_type", "user_id"]),
        "event_type", "user_id", alias="n_users")


def q_users_no_big_purchase(sf_dir: str):
    """Distributed anti-join (NOT EXISTS): users with no purchase
    event above 150 — the right side ships only (key, tag) presence
    probes through the bucketed left join, survivors are the null-tag
    rows. (The synthetic TPC-H side tables are referentially dense —
    every customer has orders — so the anti-join anchors on the events
    stream where both sides are non-empty at every SF.)"""
    import pyarrow.compute as _pc

    from lsh_ray.stages.agg import distinct_values
    from lsh_ray.stages.join import anti_join
    ev = _read(f"{sf_dir}/events.parquet",
               columns=["user_id", "event_type", "value"])
    big = ev.map_batches(
        lambda t: t.filter(_pc.and_(
            _pc.equal(t["event_type"], "purchase"),
            _pc.greater(t["value"], 150.0))).select(["user_id"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return anti_join(distinct_values(ev, "user_id"), big,
                     "user_id", "user_id")


def q_lineitem_rollup(sf_dir: str):
    """GROUP BY ROLLUP: one finest-level distributed pass, coarser
    levels derived from the group-cardinality partials."""
    from lsh_ray.stages.agg import rollup_agg
    return rollup_agg(
        _read(f"{sf_dir}/lineitem.parquet",
              columns=["l_returnflag", "l_linestatus", "l_quantity"]),
        ["l_returnflag", "l_linestatus"], ["l_quantity"])


def q_value_quantiles_by_type(sf_dir: str):
    """Per-group exact quantiles via the distributed (group, value)
    histogram; the pick is an element of the column, so doubles
    compare bit-for-bit against the row_number oracle."""
    from lsh_ray.stages.sampling import exact_quantiles_by
    return exact_quantiles_by(
        _read(f"{sf_dir}/events.parquet",
              columns=["event_type", "value"]),
        "value", "event_type")


def q_top_bigrams(sf_dir: str):
    """Corpus-wide top-20 adjacent token pairs — word co-occurrence
    with per-batch partial counts; only the bigram vocabulary is
    sorted."""
    from lsh_ray.stages.tfidf import top_bigrams
    return top_bigrams(_docs_text(sf_dir), k=20)


def q_top_tokens(sf_dir: str):
    """Corpus-wide top-20 heavy-hitter tokens (count desc, token asc):
    the vocabulary-sized sort-limit path."""
    from lsh_ray.stages.tfidf import top_tokens
    return top_tokens(_docs_text(sf_dir), k=20)


def q_doc_length_quantiles(sf_dir: str):
    """Exact n_chars quantiles via the distributed value histogram —
    shuffle volume is value cardinality, not corpus rows."""
    from lsh_ray.stages.sampling import exact_quantiles
    return exact_quantiles(
        _read(f"{sf_dir}/documents.parquet", columns=["n_chars"]),
        "n_chars")


def q_doc_repetition(sf_dir: str):
    """Per-doc repetition signals (most-common-token share, distinct
    ratio inputs): the Gopher-style within-document quality rule —
    one map_batches pass, zero shuffles."""
    from lsh_ray.stages.repetition import doc_repetition
    return doc_repetition(_docs_text(sf_dir))


def q_dup_ngram_stats(sf_dir: str):
    """Corpus-level duplicate 5-gram fraction per doc (RefinedWeb-style
    cross-document repetition): grams shuffle once as 8-byte hashes,
    dup flags join back via the shared bucket_join."""
    from lsh_ray.stages.repetition import dup_ngram_stats
    return dup_ngram_stats(_docs_text(sf_dir), n=5)


def q_decontamination(sf_dir: str):
    """Benchmark decontamination (GPT-3 appendix-C-style n-gram
    overlap): a deterministic md5-bucket 7.8% of the documents stands
    in for a held-out eval set; every remaining corpus doc reports how
    many of its 5-gram occurrences appear anywhere in that benchmark.
    Benchmark grams reduce to a distinct key set (one tasks-mode
    exchange) and broadcast ONCE via ray.put (bucket_join above the
    cap); the oracle recomputes the split exactly from
    md5(CAST(doc_id AS VARCHAR))."""
    from lsh_ray.stages.repetition import decontaminate
    from lsh_ray.stages.sampling import hash_sample
    docs = _docs_text(sf_dir)
    return decontaminate(hash_sample(docs, "14", complement=True),
                         hash_sample(docs, "14"), n=5)


def _synth_pages(sf_dir: str):
    """Deterministic crawl-page view of the documents table: groups of
    five doc_ids share one logical page, each spelled differently
    (scheme variant, www. prefix, tracking params, fragment + trailing
    slash) with a pseudo-shuffled capture timestamp — the input_hint's
    (url, warc_ts) columns synthesized from doc_id exactly as the
    q_html_extract/q_pii_redact precedent, mirrored 1:1 in SQL by
    _PAGES_CTES."""
    import numpy as np
    import pyarrow as pa

    _TS0_US = 1767225600000000  # 2026-01-01T00:00:00Z in microseconds

    def build(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = did // 5
        v = did % 5
        rest = np.char.add(np.char.add(np.char.add(np.char.add(
            "example", (base % 13).astype("U3")), ".com/page/"),
            base.astype("U20")), "/item")
        prefix = np.where(v == 1, "http://",
                          np.where(v == 2, "https://www.", "https://"))
        tail = np.where(
            v == 3, np.char.add("?utm_source=feed&utm_medium=rss&gclid=g",
                                did.astype("U20")),
            np.where(v == 4, np.char.add("/#frag-", did.astype("U20")), ""))
        url = np.char.add(np.char.add(prefix.astype("U12"), rest), tail)
        ts_us = _TS0_US + ((did * 2654435761) % 86400) * 1_000_000
        return pa.table({
            "doc_id": t["doc_id"],
            "url": pa.array(url.tolist(), type=pa.string()),
            "warc_ts": pa.array(ts_us, type=pa.timestamp("us")),
            "n_chars": t["n_chars"]})

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    return ds.map_batches(build, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic dedup over the planted-duplicate
    embeddings view: seed-centroid cosine clustering, then the
    order-free within-cluster keep-first rule (dropped iff a lower-id
    cluster-mate has cosine >= 0.9). The 50 planted copies are the
    provable drops (cosine exactly 1 to their originals); organic max
    pairwise cosine is ~0.5, far from the gate, so no float boundary
    risk. See stages/dedup.semantic_dedup."""
    import dataclasses

    from lsh_ray.stages.dedup import semantic_dedup
    small = dataclasses.replace(CFG, shuffle_coalesce_blocks=8)
    return semantic_dedup(_aug_embeddings(sf_dir), dim=64, config=small,
                          n_centroids=8, tau=0.9)


def q_stratified_sample(sf_dir: str):
    """Per-language quota sample (training-data mixing primitive):
    the 10 docs with the smallest (md5(doc_id), doc_id) per lang.
    Two-phase: per-batch local top-k partials, per-stratum finish —
    the corpus never reaches the exchange."""
    from lsh_ray.stages.sampling import stratified_sample
    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return stratified_sample(ds, stratum_col="lang", k=10)


def q_url_dedup(sf_dir: str):
    """URL-level crawl dedup: canonicalize each capture's URL (fixed
    RE2 rewrite chain, shared step list with the oracle —
    ``stages/urls.CANONICAL_STEPS``) and keep the EARLIEST capture per
    canonical URL (warc_ts, doc_id order). The keep-first exchange is
    the exact_dup_groups plan keyed by canonical_url."""
    from lsh_ray.stages.urls import url_dedup
    return url_dedup(_synth_pages(sf_dir))


def q_host_stats(sf_dir: str):
    """Per-host crawl inventory over canonical URLs: captures, distinct
    pages, total chars. One canonical-URL co-location reduces to page
    rows; hosts finish with per-batch Arrow partials + a tiny native
    groupby (hosts ≪ pages)."""
    from lsh_ray.stages.urls import host_stats
    return host_stats(_synth_pages(sf_dir))


QUERIES = {
    "text_search": q_text_search,
    "text_search_ls": q_text_search_ls,
    "exact_dup_groups": q_exact_dup_groups,
    "exact_dedup": q_exact_dedup,
    "dedup_pairs": q_dedup_pairs,
    "dedup_pairs_incremental": q_dedup_pairs_incremental,
    "dedup_clusters": q_dedup_clusters,
    "minhash_signatures": q_minhash_signatures,
    "simhash_near_dups": q_simhash_near_dups,
    "ngram_jaccard_dups": q_ngram_jaccard_dups,
    "line_dedup": q_line_dedup,
    "pii_redact": q_pii_redact,
    "unigram_logprob": q_unigram_logprob,
    "embedding_near_dups": q_embedding_near_dups,
    "token_counts": q_token_counts,
    "token_counts_bpe": q_token_counts_bpe,
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
    "events_hopping": q_events_hopping,
    "event_type_counts": q_event_type_counts,
    "sessions": q_sessions,
    "events_asof": q_events_asof,
    "error_click_window": q_error_click_window,
    "lineitem_agg": q_lineitem_agg,
    "customer_order_counts": q_customer_order_counts,
    "top_orders": q_top_orders,
    "nation_suppliers": q_nation_suppliers,
    "region_supplier_counts": q_region_supplier_counts,
    "part_volume_left": q_part_volume_left,
    "html_extract": q_html_extract,
    "knn_topk": q_knn_topk,
    "knn_lsh": q_knn_lsh,
    "knn_ivf": q_knn_ivf,
    "doc_split_assign": q_doc_split_assign,
    "doc_hash_sample": q_doc_hash_sample,
    "doc_repetition": q_doc_repetition,
    "dup_ngram_stats": q_dup_ngram_stats,
    "decontamination": q_decontamination,
    "url_dedup": q_url_dedup,
    "host_stats": q_host_stats,
    "semantic_dedup": q_semantic_dedup,
    "stratified_sample": q_stratified_sample,
    "near_dedup_keep": q_near_dedup_keep,
    "cluster_keep_longest": q_cluster_keep_longest,
    "top_tokens": q_top_tokens,
    "doc_length_quantiles": q_doc_length_quantiles,
    "event_seq": q_event_seq,
    "lang_top_docs": q_lang_top_docs,
    "event_gaps": q_event_gaps,
    "event_moving_avg": q_event_moving_avg,
    "event_type_users": q_event_type_users,
    "users_no_big_purchase": q_users_no_big_purchase,
    "lineitem_rollup": q_lineitem_rollup,
    "value_quantiles_by_type": q_value_quantiles_by_type,
    "top_bigrams": q_top_bigrams,
    "event_leads": q_event_leads,
    "clicks_errors_hourly": q_clicks_errors_hourly,
    "top_revenue_orders": q_top_revenue_orders,
    "user_event_pivot": q_user_event_pivot,
}

# tfidf-family token definition: maximal non-whitespace runs of the
# lowercased text — the ONE shared pattern (stages/text_stats.
# TOKEN_RUN_PATTERN), interpolated so an edit there cannot silently
# leave these oracles behind. Empty docs produce no rows (unnest of an
# empty list). The shingle CTEs keep their own split (pinned to the
# dedup tokenizer's hash semantics).
from lsh_ray.stages.text_stats import TOKEN_RUN_PATTERN as _TOKPAT

_TOKS = ("(SELECT doc_id, unnest(regexp_extract_all("
         f"lower(COALESCE(text, '')), '{_TOKPAT}')) AS token "
         "FROM documents)")
_N_TOKENFUL = ("(SELECT COUNT(*) AS n_docs FROM documents WHERE "
               f"len(regexp_extract_all(COALESCE(text, ''), "
               f"'{_TOKPAT}')) > 0)")

# per-doc DISTINCT k-token shingles, exactly the engine's tokenizer
# semantics (lower + \s+ split); the ' ' join is unambiguous because
# tokens cannot contain whitespace
def _shingle_ctes(k: int) -> str:
    return (
        "dsh AS (SELECT DISTINCT d.doc_id, "
        f"array_to_string(list_slice(d.toks, g.i, g.i + {k - 1}), ' ') "
        "AS sh FROM (SELECT doc_id, "
        "string_split_regex(lower(trim(text)), '\\s+') AS toks "
        "FROM documents WHERE trim(text) <> '') d, "
        "LATERAL (SELECT unnest(generate_series(1, len(d.toks) - "
        f"{k - 1})) AS i) g), "
        "sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM dsh "
        "GROUP BY doc_id), "
        "pinter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, "
        "COUNT(*) AS n_inter FROM dsh a JOIN dsh b USING (sh) "
        "WHERE a.doc_id < b.doc_id GROUP BY 1, 2), "
        # float32 (REAL) casts mirror the engine's float32
        # jaccard/containment columns so threshold comparisons agree
        # bit-for-bit
        "pairs AS (SELECT 'doc://' || CAST(i.ida AS VARCHAR) AS ua, "
        "'doc://' || CAST(i.idb AS VARCHAR) AS ub, i.ida, i.idb, "
        "CAST(i.n_inter * 1.0 / (sa.n_sh + sb.n_sh - i.n_inter) AS REAL) "
        "AS jac, "
        "CAST(i.n_inter * 1.0 / LEAST(sa.n_sh, sb.n_sh) AS REAL) AS cont "
        "FROM pinter i JOIN sizes sa ON sa.doc_id = i.ida "
        "JOIN sizes sb ON sb.doc_id = i.idb)")


_SHINGLE_CTES = _shingle_ctes(5)  # k = PipelineConfig.shingle_k default

# connected components over the brute-force dup + substring edge set
# (shared by the dedup_clusters and near_dedup_keep oracles)
_CC_CTES = (
    _SHINGLE_CTES + ", "
    "edges0 AS ("
    "SELECT ua, ub FROM pairs WHERE jac >= 0.8 "
    "UNION ALL "
    "SELECT p.ua, p.ub FROM pairs p "
    "JOIN documents da ON da.doc_id = p.ida "
    "JOIN documents db ON db.doc_id = p.idb "
    "WHERE p.jac < 0.8 AND p.cont >= 0.9 AND "
    "CASE WHEN length(da.text) <= length(db.text) "
    "THEN contains(db.text, da.text) "
    "ELSE contains(da.text, db.text) END), "
    "edges AS (SELECT ua AS u, ub AS v FROM edges0 "
    "UNION SELECT ub, ua FROM edges0), "
    "reach AS (SELECT u, v FROM edges "
    "UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), "
    "allr AS (SELECT u, v FROM reach "
    "UNION SELECT DISTINCT u, u FROM edges)")


def _en_stopword_pattern() -> str:
    # one definition shared with the engine; DuckDB single-quoted
    # strings pass backslashes through to RE2 unmodified, so the Python
    # regex embeds verbatim
    from lsh_ray.stages.text_stats import STOPWORD_PATTERN
    return STOPWORD_PATTERN


_EN_STOPWORD_PATTERN = _en_stopword_pattern()


def _token_run_pattern() -> str:
    # shared token definition (maximal non-whitespace runs, explicit RE2
    # ASCII class): engine counts with pyarrow count_substring_regex,
    # oracle with regexp_extract_all — same engine, same pattern
    from lsh_ray.stages.text_stats import TOKEN_RUN_PATTERN
    return TOKEN_RUN_PATTERN


_TOKEN_RUN = _token_run_pattern()


def _lang_id_sql() -> str:
    """Mirror of LangIdStage (lsh_ray/stages/text_stats.py): per-language
    stopword-occurrence counts via ONE word-boundary RE2 scan each (both
    Arrow and DuckDB regex on RE2, so counts agree exactly), argmax with
    first-in-sorted-order tie-break, 'unknown' on zero."""
    from lsh_ray.stages.text_stats import _STOPWORDS
    langs = sorted(_STOPWORDS)  # ['de', 'en', 'pt'] — argmax priority order
    pat = {l: r"\b(?:" + "|".join(sorted(_STOPWORDS[l])) + r")\b"
           for l in langs}
    return (
        "WITH t AS (SELECT doc_id, lower(COALESCE(text, '')) AS low "
        "FROM documents), "
        "s AS (SELECT doc_id, "
        f"len(regexp_extract_all(low, '{pat['de']}')) AS h_de, "
        f"len(regexp_extract_all(low, '{pat['en']}')) AS h_en, "
        f"len(regexp_extract_all(low, '{pat['pt']}')) AS h_pt FROM t) "
        "SELECT doc_id, CASE "
        "WHEN GREATEST(h_de, h_en, h_pt) = 0 THEN 'unknown' "
        "WHEN h_de >= h_en AND h_de >= h_pt THEN 'de' "
        "WHEN h_en >= h_pt THEN 'en' ELSE 'pt' END AS lang_pred FROM s")

def _pii_oracle() -> str:
    """DuckDB twin of q_pii_redact: identical doc_id-derived augmentation,
    then the SAME RE2 patterns (shared spec constants; independent
    engines) applied in the same sequential order, counts before each
    replacement."""
    from lsh_ray.stages.text_stats import PII_PATTERNS
    (_, e, _), (_, i, _), (_, p, _) = PII_PATTERNS
    return (
        "WITH aug AS (SELECT doc_id, text"
        " || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || "
        "CAST(doc_id AS VARCHAR) || '@example.com soon' ELSE '' END"
        " || CASE WHEN doc_id % 7 = 0 THEN ' from ' || "
        "CAST(doc_id % 256 AS VARCHAR) || '.' || "
        "CAST((doc_id * 7) % 256 AS VARCHAR) || '.' || "
        "CAST((doc_id * 13) % 256 AS VARCHAR) || '.' || "
        "CAST(doc_id % 100 AS VARCHAR) || ' today' ELSE '' END"
        " || CASE WHEN doc_id % 11 = 0 THEN ' call +1-555-' || "
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' "
        "ELSE '' END AS text FROM documents), "
        f"s1 AS (SELECT doc_id, len(regexp_extract_all(text, '{e}')) "
        f"AS n_emails, regexp_replace(text, '{e}', '<EMAIL>', 'g') "
        "AS text FROM aug), "
        f"s2 AS (SELECT doc_id, n_emails, "
        f"len(regexp_extract_all(text, '{i}')) AS n_ips, "
        f"regexp_replace(text, '{i}', '<IP>', 'g') AS text FROM s1) "
        f"SELECT doc_id, regexp_replace(text, '{p}', '<PHONE>', 'g') "
        f"AS text, n_emails, n_ips, "
        f"len(regexp_extract_all(text, '{p}')) AS n_phones FROM s2")


ORACLE_SQL = {
    "exact_dup_groups": (
        "SELECT md5(text) AS text_hash, COUNT(*) AS n_docs, "
        "MIN(doc_id) AS rep_doc_id FROM documents GROUP BY md5(text)"),
    "exact_dedup": (
        "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)"),
    "token_counts": (
        "SELECT doc_id, len(regexp_extract_all(COALESCE(text, ''), "
        f"'{_TOKEN_RUN}')) AS n_tokens FROM documents"),
    "lang_distribution": (
        "SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang"),
    "token_counts_bpe": (
        "SELECT doc_id, len(regexp_extract_all(COALESCE(text, ''), "
        "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS n_bpe_tokens "
        "FROM documents"),
    "doc_quality": (
        "SELECT doc_id, length(text) AS n_chars, "
        "ROUND(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / "
        "GREATEST(length(text), 1), 6) AS alpha_ratio, "
        "ROUND(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / "
        "GREATEST(length(text), 1), 6) AS digit_ratio, "
        "ROUND((length(text) - length(replace(text, ' ', ''))) * 1.0 / "
        "GREATEST(length(text), 1), 6) AS space_ratio, "
        # punct = chars outside [alnum + ASCII whitespace]; the class is
        # spelled out (no \s) to match the engine exactly (RE2 vs re)
        "ROUND(length(regexp_replace(text, "
        "'[A-Za-z0-9\\t\\n\\f\\r ]', '', 'g')) * 1.0 / "
        "GREATEST(length(text), 1), 6) AS punct_ratio, "
        "ROUND(len(regexp_extract_all(lower(text), "
        f"'{_EN_STOPWORD_PATTERN}')) * 1.0 / GREATEST("
        f"len(regexp_extract_all(text, '{_TOKEN_RUN}')), 1), 6) "
        "AS stopword_ratio FROM documents"),
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
        "n AS " + _N_TOKENFUL + " "
        "SELECT tf.doc_id, tf.token, "
        "ROUND((tf.tf_count * 1.0 / tf.doc_len) * "
        "log2(n.n_docs * 1.0 / df.df), 6) AS tfidf "
        "FROM tf JOIN df USING (token) CROSS JOIN n"),
    "events_hourly": (
        "SELECT user_id, "
        "CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start, "
        "COUNT(*) AS n_events, MAX(value) AS max_value "
        "FROM events GROUP BY 1, 2"),
    # hopping 1h/30min: an event's 2 windows start at floor(tu/hop)*hop
    # and that minus hop (tu = epoch microseconds, hop = 1800s)
    "events_hopping": (
        "WITH e AS (SELECT user_id, epoch_us(ts) // 1800000000 AS last_j, "
        "value FROM events) "
        "SELECT user_id, CAST((last_j - g.k) * 1800 AS BIGINT) "
        "AS window_start, COUNT(*) AS n_events, MAX(value) AS max_value "
        "FROM e, generate_series(0, 1) g(k) GROUP BY 1, 2"),
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
    "events_asof": (
        "SELECT c.event_id, c.user_id, c.ts, v.ts AS view_ts, "
        "v.view_value FROM "
        "(SELECT event_id, user_id, ts FROM events "
        " WHERE event_type = 'click') c "
        "ASOF JOIN "
        "(SELECT user_id, ts, max(value) AS view_value FROM events "
        " WHERE event_type = 'view' GROUP BY user_id, ts) v "
        "ON c.user_id = v.user_id AND c.ts >= v.ts"),
    "error_click_window": (
        "SELECT e.event_id AS error_id, c.event_id AS click_id, "
        "c.user_id FROM "
        "(SELECT event_id, user_id, ts FROM events "
        " WHERE event_type = 'error') e "
        "JOIN "
        "(SELECT event_id, user_id, ts FROM events "
        " WHERE event_type = 'click') c "
        "ON c.user_id = e.user_id AND c.ts >= e.ts "
        "AND c.ts < e.ts + INTERVAL 1 DAY"),
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
    # exhaustive probe (nprobe == n_cells) makes IVF exact, so the
    # brute-force SQL is the oracle for the whole IVF machinery
    "knn_ivf": (
        "SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
        "ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
        "CAST(e.embedding AS DOUBLE[])), 6) AS cosine "
        "FROM embeddings q CROSS JOIN embeddings e "
        "WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id "
        "QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY "
        "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
        "CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id ASC) <= 10"),
    "doc_split_assign": (
        "SELECT doc_id, CASE "
        "WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' "
        "THEN 'train' "
        "WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' "
        "THEN 'val' ELSE 'test' END AS split FROM documents"),
    "doc_hash_sample": (
        "SELECT doc_id, n_chars FROM documents "
        "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d'"),
    "token_max_tfidf": (
        "WITH toks AS " + _TOKS + ", "
        "tf AS (SELECT doc_id, token, COUNT(*) AS tf_count, "
        "SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS doc_len "
        "FROM toks GROUP BY doc_id, token), "
        "df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks "
        "GROUP BY token), "
        "n AS " + _N_TOKENFUL + " "
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
        "n AS " + _N_TOKENFUL + " "
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
    "dedup_pairs": (
        "WITH " + _SHINGLE_CTES + " "
        "SELECT LEAST(ua, ub) AS url_a, GREATEST(ua, ub) AS url_b, "
        "jac AS jaccard FROM pairs WHERE jac >= 0.8"),
    "dedup_pairs_incremental": (
        # same brute-force pair surface restricted to pairs touching the
        # md5-defined ~20% delta (the engine's base/delta split rule,
        # recomputed exactly by DuckDB)
        "WITH " + _SHINGLE_CTES + " "
        "SELECT LEAST(ua, ub) AS url_a, GREATEST(ua, ub) AS url_b, "
        "jac AS jaccard FROM pairs WHERE jac >= 0.8 AND "
        "(substr(md5(CAST(ida AS VARCHAR)), 1, 2) >= 'cc' OR "
        "substr(md5(CAST(idb AS VARCHAR)), 1, 2) >= 'cc')"),
    "ngram_jaccard_dups": (
        "WITH " + _shingle_ctes(3) + " "
        "SELECT LEAST(ua, ub) AS url_a, GREATEST(ua, ub) AS url_b, "
        "jac AS jaccard FROM pairs WHERE jac >= 0.7"),
    "line_dedup": (
        # the identical deterministic 12-word line view (zipped unnests
        # give the word ordinal), keep-first by (doc_id, idx), docs
        # reassembled from surviving lines
        "WITH words AS ("
        "  SELECT doc_id, unnest(string_split(text, ' ')) AS w, "
        "         unnest(generate_series(1, len(string_split(text, ' ')))) AS wi"
        "  FROM documents"
        "), lines AS ("
        "  SELECT doc_id, (wi - 1) // 12 AS idx, "
        "         string_agg(w, ' ' ORDER BY wi) AS line"
        "  FROM words GROUP BY doc_id, (wi - 1) // 12"
        "), kept AS ("
        "  SELECT doc_id, idx, line FROM lines "
        "  QUALIFY row_number() OVER (PARTITION BY line "
        "                             ORDER BY doc_id, idx) = 1"
        ") "
        "SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS text, "
        "       CAST(count(*) AS BIGINT) AS n_kept "
        "FROM kept GROUP BY doc_id"),
    "pii_redact": _pii_oracle(),
    # integer micro-logprob design: per-token ln(c/N) is rounded to
    # int64 micro-units BEFORE the per-doc sum, so the sums are exact
    # integer arithmetic on both engines (no float summation-order
    # divergence); one identically-parenthesized float division chain
    # at the end. Tokenless docs drop out (join semantics both sides).
    "unigram_logprob": (
        "WITH toks AS " + _TOKS + ", "
        "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_tok FROM toks), "
        "c AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token), "
        "mlp AS (SELECT token, CAST(ROUND(ln(CAST(c AS DOUBLE) / "
        "n.n_tok) * 1000000, 0) AS BIGINT) AS mlp "
        "FROM c CROSS JOIN n) "
        "SELECT toks.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
        "ROUND((CAST(SUM(mlp.mlp) AS DOUBLE) / 1000000.0) / COUNT(*), 6) "
        "AS avg_logprob FROM toks JOIN mlp USING (token) "
        "GROUP BY toks.doc_id"),
    "dedup_clusters": (
        "WITH RECURSIVE " + _CC_CTES + " "
        "SELECT u AS url, MIN(v) AS cluster_url FROM allr GROUP BY u"),
    # the dedup 'apply': signed docs minus non-representative members
    "near_dedup_keep": (
        "WITH RECURSIVE " + _CC_CTES + ", "
        "cl AS (SELECT u AS url, MIN(v) AS cluster_url FROM allr "
        "GROUP BY u) "
        "SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url FROM sizes "
        "EXCEPT SELECT url FROM cl WHERE url <> cluster_url"),
    # quality-aware keep: per cluster the member with max n_sh, tie ->
    # min url (mirrors cluster_representatives' grouped argmax)
    "cluster_keep_longest": (
        "WITH RECURSIVE " + _CC_CTES + ", "
        "cl AS (SELECT u AS url, MIN(v) AS cluster_url FROM allr "
        "GROUP BY u), "
        "m AS (SELECT cl.cluster_url, cl.url, s.n_sh, "
        "ROW_NUMBER() OVER (PARTITION BY cl.cluster_url "
        "ORDER BY s.n_sh DESC, cl.url ASC) AS rn FROM cl JOIN sizes s "
        "ON s.doc_id = CAST(replace(cl.url, 'doc://', '') AS BIGINT)) "
        "SELECT cluster_url, CAST(n_sh AS INTEGER) AS n_shingles, url "
        "FROM m WHERE rn = 1"),
    "minhash_signatures": (
        "WITH " + _SHINGLE_CTES + " "
        "SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url, "
        "CAST(n_sh AS INTEGER) AS n_shingles FROM sizes"),
    "simhash_near_dups": (
        # ALL md5-equal pairs of the augmented corpus: the planted copy
        # pairs plus any ORGANIC exact-dup groups (8 exist at sf0.1) and
        # their cross products with the copies
        "WITH d AS (SELECT doc_id, md5(text) AS h FROM documents "
        "WHERE trim(text) <> '' AND "
        "len(string_split_regex(lower(trim(text)), '\\s+')) >= 5), "
        "aug AS (SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url, h "
        "FROM d UNION ALL "
        "SELECT 'doc://' || CAST(doc_id + 10000000 AS VARCHAR), h FROM d) "
        "SELECT a.url AS url_a, b.url AS url_b, CAST(0 AS INTEGER) "
        "AS hamming FROM aug a JOIN aug b ON a.h = b.h AND a.url < b.url"),
    "region_supplier_counts": (
        "SELECT r.r_name, COUNT(*) AS n_suppliers FROM supplier s "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "GROUP BY r.r_name"),
    "part_volume_left": (
        "SELECT p.p_partkey, p.p_brand, "
        "ROUND(COALESCE(a.hi_qty, 0), 2) AS hi_qty, "
        "COALESCE(a.n_hi, 0) AS n_hi FROM part p LEFT JOIN ("
        "SELECT l_partkey, SUM(l_quantity) AS hi_qty, COUNT(*) AS n_hi "
        "FROM lineitem WHERE l_quantity > 30 GROUP BY l_partkey) a "
        "ON p.p_partkey = a.l_partkey"),
    "html_extract": (
        "SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url, "
        "regexp_replace(trim(text), '\\s+', ' ', 'g') AS text "
        "FROM documents WHERE trim(text) <> ''"),
    "lang_id_pred": _lang_id_sql(),
    "knn_lsh": (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, "
        "list_transform(CAST(embedding AS DOUBLE[]), x -> x > 0) AS sg "
        "FROM embeddings), "
        "q AS (SELECT * FROM e WHERE vec_id < 5), "
        "cand AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
        "list_cosine_similarity(q.emb, e.emb) AS cos "
        "FROM q CROSS JOIN e WHERE e.vec_id <> q.vec_id AND ("
        + " OR ".join(
            f"list_slice(q.sg, {p * 8 + 1}, {(p + 1) * 8}) = "
            f"list_slice(e.sg, {p * 8 + 1}, {(p + 1) * 8})"
            for p in range(8)) + ")) "
        "SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine FROM cand "
        "QUALIFY row_number() OVER (PARTITION BY query_id "
        "ORDER BY cos DESC, neighbor_id ASC) <= 10"),
    "text_search": (
        "SELECT 'doc://' || CAST(doc_id + 10000000 AS VARCHAR) "
        "AS query_url, 'doc://' || CAST(doc_id AS VARCHAR) AS doc_url, "
        "CAST(1.0 AS DOUBLE) AS jaccard, CAST(1 AS BIGINT) AS rank "
        "FROM documents WHERE doc_id < 5 AND trim(text) <> '' AND "
        "len(string_split_regex(lower(trim(text)), '\\s+')) >= 5"),
    "text_search_ls": (
        "SELECT 'doc://' || CAST(doc_id + 10000000 AS VARCHAR) "
        "AS query_url, 'doc://' || CAST(doc_id AS VARCHAR) AS doc_url, "
        "CAST(0.0 AS DOUBLE) AS score, CAST(1 AS BIGINT) AS rank "
        "FROM documents WHERE doc_id < 5 AND trim(text) <> '' AND "
        "len(string_split_regex(lower(trim(text)), '\\s+')) >= 5"),
    "top_tokens": (
        f"SELECT token, COUNT(*) AS n FROM {_TOKS} GROUP BY token "
        "ORDER BY n DESC, token LIMIT 20"),
    "event_seq": (
        "SELECT event_id, user_id, ts, "
        "CAST(row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS BIGINT) AS seq_no FROM events"),
    "event_gaps": (
        "SELECT event_id, user_id, ts, lag(ts) OVER w AS prev_ts, "
        "epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"),
    # 2-decimal values / frame width in {1,2,3}: the quotient's distance
    # from any 6-dp rounding boundary is >= 1/6e-6 >> float64 error, so
    # ROUND agrees bit-for-bit regardless of summation association
    "event_moving_avg": (
        "SELECT event_id, user_id, ts, ROUND(AVG(value) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS avg3 "
        "FROM events"),
    "event_leads": (
        "SELECT event_id, user_id, ts, lead(ts) OVER w AS next_ts, "
        "epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"),
    "clicks_errors_hourly": (
        "WITH c AS (SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS "
        "BIGINT) AS ws, COUNT(*) AS n_clicks FROM events "
        "WHERE event_type = 'click' GROUP BY 1), "
        "e AS (SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) "
        "AS ws, COUNT(*) AS n_errors FROM events "
        "WHERE event_type = 'error' GROUP BY 1) "
        "SELECT COALESCE(c.ws, e.ws) AS window_start, c.n_clicks, "
        "e.n_errors FROM c FULL OUTER JOIN e ON c.ws = e.ws"),
    "event_type_users": (
        "SELECT event_type, COUNT(DISTINCT user_id) AS n_users "
        "FROM events GROUP BY event_type"),
    "user_event_pivot": (
        "SELECT user_id, "
        "COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click, "
        "COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error, "
        "COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) "
        "AS n_purchase, "
        "COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup, "
        "COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view "
        "FROM events GROUP BY user_id"),
    # both engines select the top 10 by the UNROUNDED float sum (gaps
    # between order revenues dwarf association error), round on output
    "top_revenue_orders": (
        "SELECT o.o_orderkey, o.o_orderdate, "
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) "
        "AS revenue "
        "FROM customer c "
        "JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE c.c_mktsegment = 'BUILDING' "
        "AND o.o_orderdate < TIMESTAMP '1998-06-01' "
        "AND l.l_shipdate > TIMESTAMP '1998-06-01' "
        "GROUP BY 1, 2 "
        "ORDER BY SUM(l.l_extendedprice * (1 - l.l_discount)) DESC, "
        "o.o_orderkey LIMIT 10"),
    "users_no_big_purchase": (
        "SELECT DISTINCT user_id FROM events e WHERE NOT EXISTS "
        "(SELECT 1 FROM events x WHERE x.user_id = e.user_id "
        "AND x.event_type = 'purchase' AND x.value > 150)"),
    # integral TPC-H quantities: partial-sum association is exact in
    # float64, so the rollup levels derived from finest partials agree
    "lineitem_rollup": (
        "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
        "COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
        "ROUND(SUM(l_quantity), 2) AS sum_l_quantity, "
        "COUNT(*) AS n_rows FROM lineitem "
        "GROUP BY ROLLUP(l_returnflag, l_linestatus)"),
    # integer-permille rank rule shared with doc_length_quantiles; the
    # pick is a row of the table, so the double compares exactly
    "value_quantiles_by_type": (
        "WITH r AS (SELECT event_type, value, "
        "row_number() OVER (PARTITION BY event_type ORDER BY value) "
        "AS rn, COUNT(*) OVER (PARTITION BY event_type) AS n "
        "FROM events), "
        "qs AS (SELECT unnest([250, 500, 750, 900, 990]) AS q_pm) "
        "SELECT r.event_type, qs.q_pm / 1000.0 AS q, "
        "r.value AS value_q FROM r JOIN qs "
        "ON r.rn = (qs.q_pm * r.n + 999) // 1000"),
    "top_bigrams": (
        "WITH t AS (SELECT regexp_extract_all("
        f"lower(COALESCE(text, '')), '{_TOKPAT}') AS toks "
        "FROM documents), "
        "b AS (SELECT toks[g.i] || ' ' || toks[g.i + 1] AS bigram "
        "FROM t, LATERAL (SELECT unnest(generate_series(1, "
        "len(toks) - 1)) AS i) g) "
        "SELECT bigram, COUNT(*) AS n FROM b GROUP BY bigram "
        "ORDER BY n DESC, bigram ASC LIMIT 20"),
    "lang_top_docs": (
        "SELECT lang, n_chars, doc_id FROM documents "
        "QUALIFY row_number() OVER (PARTITION BY lang "
        "ORDER BY n_chars DESC, doc_id) <= 3"),
    # rank = integer-permille ceil division — float-rounding-free, the
    # exact rule the engine's histogram pick uses
    "doc_length_quantiles": (
        "WITH s AS (SELECT n_chars, "
        "row_number() OVER (ORDER BY n_chars) AS r, "
        "COUNT(*) OVER () AS n FROM documents), "
        "qs AS (SELECT unnest([250, 500, 750, 900, 990]) AS qpm) "
        "SELECT qs.qpm / 1000.0 AS q, s.n_chars AS n_chars_q "
        "FROM qs JOIN s ON s.r = (qs.qpm * s.n + 999) // 1000"),
    # per-doc repetition: every doc present (LEFT JOIN), token-less docs
    # get zeros; the grouped CTE shares _TOKS's token definition
    "doc_repetition": (
        "WITH pg AS (SELECT doc_id, token, COUNT(*) AS c "
        f"FROM {_TOKS} GROUP BY doc_id, token), "
        "st AS (SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct, "
        "MAX(c) AS max_tf FROM pg GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(COALESCE(st.n_tokens, 0) AS BIGINT) "
        "AS n_tokens, CAST(COALESCE(st.n_distinct, 0) AS BIGINT) "
        "AS n_distinct_tokens, "
        "ROUND(COALESCE(st.max_tf, 0) * 1.0 / "
        "GREATEST(COALESCE(st.n_tokens, 0), 1), 6) AS top_token_frac "
        "FROM documents d LEFT JOIN st USING (doc_id)"),
    # corpus-level duplicate 5-gram fraction: a gram occurrence is 'dup'
    # iff its gram appears in at least one OTHER doc (min != max doc)
    "dup_ngram_stats": (
        "WITH raw AS (SELECT doc_id, regexp_extract_all("
        f"lower(COALESCE(text, '')), '{_TOKEN_RUN}') AS ts "
        "FROM documents), "
        "grams AS (SELECT doc_id, unnest([array_to_string("
        "list_slice(ts, i, i + 4), ' ') "
        "FOR i IN generate_series(1, len(ts) - 4)]) AS gram "
        "FROM raw WHERE len(ts) >= 5), "
        "pg AS (SELECT doc_id, gram, COUNT(*) AS c FROM grams "
        "GROUP BY doc_id, gram), "
        "fl AS (SELECT gram FROM pg GROUP BY gram "
        "HAVING MIN(doc_id) <> MAX(doc_id)), "
        "nd AS (SELECT doc_id, SUM(c) AS n_dup FROM pg "
        "JOIN fl USING (gram) GROUP BY doc_id), "
        "ng AS (SELECT doc_id, GREATEST(len(ts) - 4, 0) AS n_grams "
        "FROM raw) "
        "SELECT ng.doc_id, CAST(ng.n_grams AS BIGINT) AS n_grams, "
        "CAST(COALESCE(nd.n_dup, 0) AS BIGINT) AS n_dup_grams, "
        "ROUND(COALESCE(nd.n_dup, 0) * 1.0 / GREATEST(ng.n_grams, 1), 6) "
        "AS dup_gram_frac FROM ng LEFT JOIN nd USING (doc_id)"),
    # benchmark decontamination: the md5-bucket < '14' docs are the
    # held-out eval set; a corpus gram occurrence is 'dirty' iff its
    # gram appears anywhere in the benchmark (same tokenizer + gram
    # definition as dup_ngram_stats)
    "decontamination": (
        "WITH raw AS (SELECT doc_id, "
        "substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '14' AS is_bench, "
        "regexp_extract_all("
        f"lower(COALESCE(text, '')), '{_TOKEN_RUN}') AS ts "
        "FROM documents), "
        "grams AS (SELECT doc_id, is_bench, unnest([array_to_string("
        "list_slice(ts, i, i + 4), ' ') "
        "FOR i IN generate_series(1, len(ts) - 4)]) AS gram "
        "FROM raw WHERE len(ts) >= 5), "
        "pg AS (SELECT doc_id, gram, COUNT(*) AS c FROM grams "
        "WHERE NOT is_bench GROUP BY doc_id, gram), "
        "bg AS (SELECT DISTINCT gram FROM grams WHERE is_bench), "
        "nd AS (SELECT doc_id, SUM(c) AS n_dirty FROM pg "
        "JOIN bg USING (gram) GROUP BY doc_id), "
        "ng AS (SELECT doc_id, GREATEST(len(ts) - 4, 0) AS n_grams "
        "FROM raw WHERE NOT is_bench) "
        "SELECT ng.doc_id, CAST(ng.n_grams AS BIGINT) AS n_grams, "
        "CAST(COALESCE(nd.n_dirty, 0) AS BIGINT) AS n_dirty_grams, "
        "ROUND(COALESCE(nd.n_dirty, 0) * 1.0 / GREATEST(ng.n_grams, 1), "
        "6) AS dirty_gram_frac FROM ng LEFT JOIN nd USING (doc_id)"),
}


def _pages_ctes() -> str:
    """SQL twin of _synth_pages + canonicalization: the same doc_id ->
    (url, warc_ts) derivation, then the regexp_replace chain generated
    from the SAME step list the Ray kernel runs
    (stages/urls.canonical_sql_expr) — byte-identical by construction."""
    from lsh_ray.stages.urls import canonical_sql_expr
    return (
        "pages AS (SELECT doc_id, n_chars, "
        "TIMESTAMP '2026-01-01' + ((doc_id * 2654435761) % 86400) "
        "* INTERVAL 1 SECOND AS warc_ts, "
        "'example' || CAST((doc_id // 5) % 13 AS VARCHAR) || "
        "'.com/page/' || CAST(doc_id // 5 AS VARCHAR) || '/item' AS rest, "
        "doc_id % 5 AS v FROM documents), "
        "raw AS (SELECT doc_id, n_chars, warc_ts, "
        "CASE v WHEN 1 THEN 'http://' WHEN 2 THEN 'https://www.' "
        "ELSE 'https://' END || rest || "
        "CASE v WHEN 3 THEN '?utm_source=feed&utm_medium=rss&gclid=g' "
        "|| CAST(doc_id AS VARCHAR) "
        "WHEN 4 THEN '/#frag-' || CAST(doc_id AS VARCHAR) "
        "ELSE '' END AS url FROM pages), "
        "canon AS (SELECT doc_id, n_chars, warc_ts, "
        f"{canonical_sql_expr('url')} AS canonical_url FROM raw)")


ORACLE_SQL["stratified_sample"] = (
    "SELECT lang, doc_id, CAST(rn - 1 AS BIGINT) AS sample_rank FROM ("
    "SELECT lang, doc_id, row_number() OVER (PARTITION BY lang "
    "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn "
    "FROM documents) WHERE rn <= 10")

# SemDeDup twin: the same planted augmentation, seed centroids =
# vec_id < 8, assignment by (cosine DESC, k ASC) row_number (= numpy
# argmax-first-max), then the order-free keep rule. keep uses the
# UNROUNDED max (as the Ray kernel does); only the reported
# max_lower_cos is rounded. All cosines in float64 on both engines.
ORACLE_SQL["semantic_dedup"] = (
    "WITH aug AS ("
    "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings "
    "UNION ALL "
    "SELECT vec_id + 1000000 AS vec_id, "
    "list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2) AS e "
    "FROM embeddings WHERE vec_id < 50), "
    "cent AS (SELECT vec_id AS k, e AS c FROM aug WHERE vec_id < 8), "
    "assign AS (SELECT vec_id, e, k AS cluster FROM ("
    "SELECT a.vec_id, a.e, cent.k, row_number() OVER ("
    "PARTITION BY a.vec_id ORDER BY "
    "list_cosine_similarity(a.e, cent.c) DESC, cent.k) AS rn "
    "FROM aug a CROSS JOIN cent) WHERE rn = 1), "
    "lm AS (SELECT a.vec_id, "
    "MAX(list_cosine_similarity(a.e, b.e)) AS mc "
    "FROM assign a JOIN assign b "
    "ON a.cluster = b.cluster AND b.vec_id < a.vec_id "
    "GROUP BY a.vec_id) "
    "SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster, "
    "CAST(CASE WHEN COALESCE(lm.mc, -1) >= 0.9 THEN 0 ELSE 1 END "
    "AS BIGINT) AS keep, "
    "ROUND(COALESCE(lm.mc, -1), 6) AS max_lower_cos "
    "FROM assign a LEFT JOIN lm USING (vec_id)")

ORACLE_SQL["url_dedup"] = (
    "WITH " + _pages_ctes() + " "
    "SELECT canonical_url, doc_id, warc_ts, n_variants FROM ("
    "SELECT canonical_url, doc_id, warc_ts, "
    "row_number() OVER (PARTITION BY canonical_url "
    "ORDER BY warc_ts, doc_id) AS rn, "
    "COUNT(*) OVER (PARTITION BY canonical_url) AS n_variants "
    "FROM canon) WHERE rn = 1")

ORACLE_SQL["host_stats"] = (
    "WITH " + _pages_ctes() + ", "
    "pagerows AS (SELECT "
    "regexp_replace(canonical_url, '^https://([^/?]+).*$', '\\1', 'g') "
    "AS host, canonical_url, COUNT(*) AS n_captures, "
    "SUM(n_chars) AS n_chars FROM canon GROUP BY 1, 2) "
    "SELECT host, CAST(SUM(n_captures) AS BIGINT) AS n_captures, "
    "CAST(COUNT(*) AS BIGINT) AS n_pages, "
    "CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM pagerows GROUP BY host")
