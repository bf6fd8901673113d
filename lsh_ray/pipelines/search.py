"""Query-retrieval pipeline — the reference's search flow, Ray-Data-first.

The reference builds an inverted index over songs and probes it per query
(``lsh.py:442-473``, ``lsh.py:476-570``). The rebuild expresses retrieval
as a TAGGED self-join: queries are appended to the corpus as extra rows,
the standard banding + chunk-key candidate machinery collides everything,
and only (query, corpus) pairs are kept — no separate index structure, no
separate probe path, identical sketch semantics for both sides (the
reference's frozen-vocabulary guarantee, ``lsh.py:139-142``, is automatic
because hashing is stateless).

Stages map 1:1 to the reference:
- collision counting  -> ``n_band_hits``        (lsh.py:272-317)
- candidate resolve   -> signature bucket join  (lsh.py:462-463)
- verification kernel -> exact Jaccard          (matching_algorithms.py:65-72)
- ranking             -> per-query map_groups   (matching_algorithms.py:375-384)
- confidence + clip   -> relative-margin gate   (lsh.py:353-412)
- cascade             -> staged index sweep     (lsh.py:498-570)
- evaluation          -> MRR                    (lsh.py:320-350)

Ranking and url resolution are DISTRIBUTED (``groupby(query_id)`` +
bucketed url joins); the driver holds only the final top-k rows per query.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from lsh_ray.config import DEFAULT_CONFIG, PipelineConfig
from lsh_ray.functions.hashing import hash_pair, hash_strings
from lsh_ray.functions.metrics import mean_reciprocal_rank
from lsh_ray.stages.candidates import candidate_pairs_from_signatures
from lsh_ray.stages.join import bucket_join
from lsh_ray.stages.minhash import signatures
from lsh_ray.stages.normalize import normalize
from lsh_ray.stages.shingle import shingle
from lsh_ray.stages.verify import verify

_OUT_COLS = ["query_url", "doc_url", "n_band_hits", "jaccard", "rank",
             "confidence"]


def _empty_results(kernel: str = "jaccard") -> pd.DataFrame:
    cols = _OUT_COLS if kernel == "jaccard" else _OUT_COLS + ["score"]
    return pd.DataFrame(columns=cols)


def _rank_group(g: pa.Table, top_k: int) -> pa.Table:
    """Per-query ranking + confidence (vectorized inside one group).

    Rank by exact Jaccard descending (ties: target_id ascending); the
    confidence of the candidate at rank i among the query's top-k
    distances is (k-1)*d_i / sum_{j != i} d_j (reference
    ``calculate_confidence_measurement``, lsh.py:353-382).
    """
    jac = g["jaccard"].to_numpy(zero_copy_only=False)
    tid = g["target_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((tid, -jac))[:top_k]
    g = g.take(pa.array(order, type=pa.int64()))
    dists = np.clip(1.0 - g["jaccard"].to_numpy(zero_copy_only=False),
                    1e-9, None)
    k = len(dists)
    if k < 2:
        conf = np.ones(k)
    else:
        others = dists.sum() - dists
        conf = np.where(others > 0, (k - 1) * dists / others, 1.0)
    return (g.append_column("rank", pa.array(
                np.arange(1, k + 1, dtype=np.int64)))
             .append_column("confidence", pa.array(conf,
                                                   type=pa.float64())))


def token_sequence(text: str) -> np.ndarray:
    """Ordered numeric sequence for the alignment kernels: token hashes
    folded into a bounded value range — the text analog of the
    reference's MIDI pitch vectors (its kernels consume bounded ordered
    numeric sequences, ``matching_algorithms.py:111-316``). Shared by the
    distributed kernel-ranking path and driver-side ``rank_candidates``
    so both rank identically."""
    toks = (text or "").lower().split()
    if not toks:
        return np.zeros(0, dtype=np.float64)
    h = hash_strings(np.array(toks, dtype=object))
    return (h % np.uint64(128)).astype(np.float64)


def _rank_group_kernel(g: pa.Table, top_k: int, kernel: str) -> pa.Table:
    """Per-query ranking through the KERNELS registry (reference ``-ma``
    dispatch, main.py:48-182 -> matching_algorithms.py:319-386):
    distances ascending, similarities descending (``reverse_order``),
    ties broken by target_id ascending. Candidate sets per query are
    LSH-pruned and small, so the per-pair kernel call is the same
    per-candidate work the reference does — inside one distributed
    group, not on the driver."""
    from lsh_ray.functions.kernels import KERNELS, SIMILARITY_KERNELS
    fn = KERNELS[kernel]
    sq = g["seq_q"].combine_chunks()
    st = g["seq_t"].combine_chunks()
    n = g.num_rows
    scores = np.empty(n, dtype=np.float64)
    for i in range(n):
        scores[i] = float(fn(np.asarray(sq[i].as_py(), dtype=np.float64),
                             np.asarray(st[i].as_py(), dtype=np.float64)))
    reverse = kernel in SIMILARITY_KERNELS
    tid = g["target_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((tid, -scores if reverse else scores))[:top_k]
    g = g.take(pa.array(order, type=pa.int64()))
    kept = scores[order]
    # confidence over kernel distances (similarities -> distances first),
    # same relative-margin formula as the jaccard path
    dists = np.clip(1.0 - kept, 1e-9, None) if reverse \
        else np.clip(kept, 1e-9, None)
    k = len(dists)
    if k < 2:
        conf = np.ones(k)
    else:
        others = dists.sum() - dists
        conf = np.where(others > 0, (k - 1) * dists / others, 1.0)
    return (g.drop_columns(["seq_q", "seq_t"])
             .append_column("score", pa.array(kept, type=pa.float64()))
             .append_column("rank", pa.array(
                 np.arange(1, k + 1, dtype=np.int64)))
             .append_column("confidence", pa.array(conf,
                                                   type=pa.float64())))


def _kernel_rank(oriented_ds, norm_ds, top_k: int, kernel: str):
    """(query_id, target_id, n_band_hits, jaccard) candidates -> kernel-
    ranked rows. Token sequences are fetched with a broadcast semi-join:
    only the LSH-candidate doc ids (queries + their hits, a bounded set)
    leave the corpus scan, then two bucketed joins attach the sequences
    and a per-query ``map_groups`` scores through the registry."""
    oriented = oriented_ds.materialize()
    ids: set[int] = set()
    for b in oriented.iter_batches(batch_size=65536,
                                   batch_format="pyarrow"):
        ids.update(b["query_id"].to_numpy(zero_copy_only=False).tolist())
        ids.update(b["target_id"].to_numpy(zero_copy_only=False).tolist())
    if not ids:
        return oriented
    part = np.sort(np.array(sorted(ids), dtype=np.uint64))
    part_ref = ray.put(part)
    seq_type = pa.list_(pa.float64())

    def emit_seqs(t: pa.Table) -> pa.Table:
        pr = ray.get(part_ref)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(pr, d), len(pr) - 1)
        hit = pr[idx] == d
        sub = t.filter(pa.array(hit))
        seqs = [token_sequence(x) for x in sub["text"].to_pylist()]
        return pa.table({
            "doc_id": sub["doc_id"],
            "seq": pa.array(seqs, type=seq_type),
        })

    # materialize: both bucket_joins consume `seqs`, and without pinning
    # each would re-execute the full corpus normalize+tokenize scan. The
    # surviving rows are only the LSH-candidate ids — tiny by the
    # semi-join's construction — so pinning is O(candidates), not O(corpus)
    seqs = norm_ds.select_columns(["doc_id", "text"]).map_batches(
        emit_seqs, batch_format="pyarrow",
        zero_copy_batch=True).materialize()
    j = bucket_join(oriented, seqs, "query_id", "doc_id", ["seq"],
                    suffix="_q")
    j = bucket_join(j, seqs, "target_id", "doc_id", ["seq"], suffix="_t")
    return (j.groupby("query_id")
            .map_groups(lambda g: _rank_group_kernel(g, top_k, kernel),
                        batch_format="pyarrow"))


def search(corpus_ds, queries_ds, config: PipelineConfig = DEFAULT_CONFIG,
           top_k: int = 20, confidence_threshold: float | None = None,
           exclude_pairs: set[tuple[str, str]] | None = None,
           kernel: str = "jaccard"):
    """Retrieve the most similar corpus documents for each query document.

    ``corpus_ds`` / ``queries_ds``: document tables (url/doc_id + text).
    Returns a pandas DataFrame (query_url, doc_url, n_band_hits, jaccard,
    rank, confidence), ranked per query by exact Jaccard descending —
    ``top_k`` mirrors the reference's SHOW_TOP_X window (constants.py:3).

    ``confidence_threshold``: reference ``clip_false_candidates``
    (lsh.py:385-412) — a query's top-1 result is DROPPED when its
    confidence is <= the trained threshold (the threshold is the max
    confidence observed on known-wrong top-1s, ``utils.py:154-171``, so
    results shaped like the wrong training examples fail the gate).

    ``exclude_pairs``: (query_url, doc_url) pairs removed by an earlier
    cascade stage (reference ``removed_candidates``, lsh.py:498-525).

    ``kernel``: matching algorithm from the KERNELS registry (reference
    ``-ma`` flag, main.py:209-237). "jaccard" (default) ranks by the
    exact shingle-set Jaccard verify already computed; any other kernel
    (ls/bals/ra/ktra/manhattan/cosine) re-scores each LSH candidate pair
    over the documents' token sequences inside a distributed per-query
    ``map_groups`` — an extra ``score`` column carries the kernel value
    (distance or similarity; ranking respects ``reverse_order``).
    """
    if kernel not in ("jaccard",):
        from lsh_ray.functions.kernels import KERNELS
        if kernel not in KERNELS:
            raise ValueError(f"unknown kernel {kernel!r}; "
                             f"one of {sorted(KERNELS)}")
    qnorm = normalize(queries_ds, config).materialize()
    q_ids = set()
    for b in qnorm.iter_batches(batch_size=65536, batch_format="pyarrow"):
        q_ids.update(b["doc_id"].to_numpy(zero_copy_only=False).tolist())
    if not q_ids:
        return _empty_results(kernel)
    qid_sorted = np.array(sorted(q_ids), dtype=np.uint64)
    qid_ref = ray.put(qid_sorted)

    excl_ref = None
    if exclude_pairs:
        qs = np.array([q for q, _ in exclude_pairs], dtype=object)
        ds_ = np.array([d for _, d in exclude_pairs], dtype=object)
        excl_keys = np.sort(hash_pair(hash_strings(qs), hash_strings(ds_)))
        excl_ref = ray.put(excl_keys)

    cnorm = normalize(corpus_ds, config)
    combined = cnorm.union(qnorm)
    sigs = signatures(shingle(combined, config), config).materialize()
    pairs = candidate_pairs_from_signatures(sigs, config)

    def mixed_only(t: pa.Table) -> pa.Table:
        qids = ray.get(qid_ref)
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)

        def is_q(x):
            idx = np.searchsorted(qids, x)
            idx[idx == len(qids)] = max(len(qids) - 1, 0)
            return (qids[idx] == x) if len(qids) else np.zeros(len(x), bool)
        qa, qb = is_q(a), is_q(b)
        return t.filter(pa.array(qa != qb))  # exactly one endpoint a query

    pairs = pairs.map_batches(mixed_only, batch_format="pyarrow",
                              zero_copy_batch=True)
    # verification: exact Jaccard etc. via the standard fused verify;
    # loosen the dup gate so ranked retrieval keeps sub-threshold matches
    loose = dataclasses.replace(config, jaccard_threshold=0.0,
                                containment_threshold=2.0)
    ver = verify(pairs, sigs, loose)

    def orient(t: pa.Table) -> pa.Table:
        """(doc_a, doc_b) -> (query_id, target_id); drop excluded pairs."""
        qids = ray.get(qid_ref)
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(qids, a)
        idx[idx == len(qids)] = max(len(qids) - 1, 0)
        a_is_q = qids[idx] == a
        out = pa.table({
            "query_id": pa.array(np.where(a_is_q, a, b), type=pa.uint64()),
            "target_id": pa.array(np.where(a_is_q, b, a),
                                  type=pa.uint64()),
            "n_band_hits": t["n_band_hits"],
            "jaccard": t["jaccard"],
        })
        if excl_ref is not None:
            ek = ray.get(excl_ref)
            # url-derived ids: doc_id == siphash64(url), so the pair key
            # matches the one computed from (query_url, doc_url)
            pk = hash_pair(out["query_id"].to_numpy(zero_copy_only=False),
                           out["target_id"].to_numpy(zero_copy_only=False))
            pos = np.searchsorted(ek, pk)
            pos[pos == len(ek)] = max(len(ek) - 1, 0)
            hit = (ek[pos] == pk) if len(ek) else np.zeros(len(pk), bool)
            out = out.filter(pa.array(~hit))
        return out

    oriented = ver.map_batches(orient, batch_format="pyarrow",
                               zero_copy_batch=True)
    if kernel == "jaccard":
        ranked = (oriented.groupby("query_id")
                  .map_groups(lambda g: _rank_group(g, top_k),
                              batch_format="pyarrow"))
    else:
        ranked = _kernel_rank(oriented, combined, top_k, kernel)
    # pin the (<= top_k x n_queries)-row ranked set; an empty result has
    # no schema, which the url joins cannot consume
    ranked = ranked.materialize()
    if ranked.count() == 0:
        return _empty_results(kernel)

    # url resolution: bucketed joins against the signature table (NOT a
    # driver-side dict — the corpus side is unbounded)
    urls = sigs.select_columns(["doc_id", "url"])
    ranked = bucket_join(ranked, urls, "query_id", "doc_id", ["url"],
                         suffix="_q")
    ranked = bucket_join(ranked, urls, "target_id", "doc_id", ["url"],
                         suffix="_t")

    def project(t: pa.Table) -> pa.Table:
        cols = {
            "query_url": t["url_q"],
            "doc_url": t["url_t"],
            "n_band_hits": t["n_band_hits"].cast(pa.int64()),
            "jaccard": t["jaccard"].cast(pa.float64()),
            "rank": t["rank"],
            "confidence": t["confidence"],
        }
        if "score" in t.column_names:  # kernel-ranked path
            cols["score"] = t["score"]
        return pa.table(cols)

    # only the final <= top_k rows per query reach the driver
    out = ranked.map_batches(project, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    if out.empty:
        return _empty_results(kernel)
    out = out.sort_values(["query_url", "rank"]).reset_index(drop=True)
    if confidence_threshold is not None:
        # clip_false_candidates (lsh.py:400-407): candidates with
        # measurement <= threshold are removed
        bad = ((out["rank"] == 1)
               & (out["confidence"] <= confidence_threshold))
        out = out[~bad].reset_index(drop=True)
    return out


def search_cascade(corpus_ds, queries_ds,
                   configs: list[PipelineConfig],
                   top_k: int = 20,
                   confidence_threshold: float | None = None,
                   kernel: str = "jaccard") -> pd.DataFrame:
    """Staged fine -> coarse retrieval (reference NLSH -> PLSH sweep,
    ``lsh.py:498-570``): search with the first config; queries whose
    top-1 confidence clears the trained gate are DONE; the rest re-search
    under the next config with the rejected top-1 candidates carried over
    as ``removed_candidates`` (lsh.py:498,563-568). The last stage (or a
    gate-less call) accepts whatever it finds."""
    accepted: list[pd.DataFrame] = []
    pending = queries_ds
    removed: set[tuple[str, str]] = set()
    for i, cfg in enumerate(configs):
        last = i == len(configs) - 1
        res = search(corpus_ds, pending, cfg, top_k=top_k,
                     exclude_pairs=removed or None, kernel=kernel)
        if confidence_threshold is None or last:
            accepted.append(res)
            break
        top1 = res[res["rank"] == 1]
        passed_q = set(top1[top1.confidence > confidence_threshold]
                       .query_url)
        failed = top1[~top1.query_url.isin(passed_q)]
        accepted.append(res[res.query_url.isin(passed_q)])
        if failed.empty:  # no_need_of_second_filter (lsh.py:408-411)
            break
        removed |= set(zip(failed.query_url, failed.doc_url))
        failed_q = set(failed.query_url)
        # re-search ONLY the failed queries under the next config
        import pyarrow.compute as pc
        fq_ref = ray.put(np.sort(hash_strings(
            np.array(sorted(failed_q), dtype=object))))

        # bind the ref per iteration: datasets are lazy, so a late-bound
        # closure would make EVERY stacked filter layer see the LAST
        # stage's failed set instead of its own
        def keep_failed(t: pa.Table, fq_ref=fq_ref) -> pa.Table:
            fq = ray.get(fq_ref)
            names = set(t.column_names)
            if "url" in names:
                ids = hash_strings(t["url"].to_numpy(zero_copy_only=False))
            else:
                urls = pc.binary_join_element_wise(
                    pa.array(["doc://"] * t.num_rows),
                    pc.cast(t["doc_id"], pa.string()), "")
                ids = hash_strings(urls.to_numpy(zero_copy_only=False))
            pos = np.searchsorted(fq, ids)
            pos[pos == len(fq)] = max(len(fq) - 1, 0)
            hit = (fq[pos] == ids) if len(fq) else np.zeros(len(ids), bool)
            return t.filter(pa.array(hit))

        pending = pending.map_batches(keep_failed, batch_format="pyarrow")
    if not accepted:
        return _empty_results()
    return (pd.concat(accepted, ignore_index=True)
            .sort_values(["query_url", "rank"]).reset_index(drop=True))


def train_confidence_threshold(results: pd.DataFrame,
                               golden: dict[str, str]) -> float:
    """A9 (utils.py:154-171): max confidence over INCORRECT top-1 results —
    at inference, top-1s with confidence <= this value (i.e. shaped like
    the wrong training examples) fail the clip gate."""
    top1 = results[results["rank"] == 1]
    wrong = top1[[golden.get(q) != d for q, d in
                  zip(top1.query_url, top1.doc_url)]]
    if wrong.empty:
        return 0.0
    return float(wrong.confidence.max())


def save_confidence_threshold(path: str, threshold: float,
                              config: PipelineConfig | None = None) -> str:
    """Persist the trained clip threshold as a JSON artifact (reference
    ``utils.py:154-171`` writes ``generated_files/confidence_threshold.txt``
    and reloads it at inference; here the artifact carries the config
    hash so a threshold trained under one sketch config is never silently
    applied under another). Atomic write (tmp + rename)."""
    import json
    import os
    payload = {"schema_version": 1,
               "confidence_threshold": float(threshold)}
    if config is not None:
        payload["config_hash"] = config.config_hash()
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)
    return path


def load_confidence_threshold(path: str,
                              config: PipelineConfig | None = None
                              ) -> float:
    """Reload a persisted clip threshold (reference ``utils.py:165-171``).
    Raises ValueError when the artifact was trained under a different
    config than the one about to consume it."""
    import json
    with open(path) as f:
        payload = json.load(f)
    if config is not None and "config_hash" in payload \
            and payload["config_hash"] != config.config_hash():
        raise ValueError(
            f"confidence threshold at {path} was trained under config "
            f"{payload['config_hash']}, not {config.config_hash()}; "
            "retrain or pass the matching config")
    return float(payload["confidence_threshold"])


def evaluate_mrr(results: pd.DataFrame, golden: dict[str, str]) -> float:
    """A7 (lsh.py:320-350): mean reciprocal rank of the golden document."""
    ranks = []
    for q, expected in golden.items():
        hits = results[(results.query_url == q) &
                       (results.doc_url == expected)]
        ranks.append(int(hits["rank"].min()) if len(hits) else 0)
    return mean_reciprocal_rank(np.array(ranks))
