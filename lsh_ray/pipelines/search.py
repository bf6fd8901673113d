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
- collision counting  -> ``n_band_hits``       (lsh.py:272-317)
- candidate resolve   -> signature bucket join  (lsh.py:462-463)
- verification kernel -> exact Jaccard          (matching_algorithms.py:65-72)
- ranking             -> per-query sort desc    (matching_algorithms.py:375-384)
- confidence + clip   -> relative-margin gate   (lsh.py:353-412)
- evaluation          -> MRR                    (lsh.py:320-350)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from lsh_ray.config import DEFAULT_CONFIG, PipelineConfig
from lsh_ray.functions.metrics import (confidence_measurement,
                                       mean_reciprocal_rank)
from lsh_ray.stages.banding import band_rows
from lsh_ray.stages.candidates import candidate_pairs_two_family
from lsh_ray.stages.chunking import chunk_rows_from_signatures
from lsh_ray.stages.minhash import signatures
from lsh_ray.stages.normalize import normalize
from lsh_ray.stages.shingle import shingle
from lsh_ray.stages.verify import verify


def search(corpus_ds, queries_ds, config: PipelineConfig = DEFAULT_CONFIG,
           top_k: int = 20, confidence_threshold: float | None = None):
    """Retrieve the most similar corpus documents for each query document.

    ``corpus_ds`` / ``queries_ds``: document tables (url/doc_id + text).
    Returns a pandas DataFrame (query_url, doc_url, n_band_hits, jaccard,
    rank, confidence), ranked per query by exact Jaccard descending —
    ``top_k`` mirrors the reference's SHOW_TOP_X window (constants.py:3).
    """
    qnorm = normalize(queries_ds, config)
    q_ids = set()
    qnorm = qnorm.materialize()
    for b in qnorm.iter_batches(batch_size=65536, batch_format="pyarrow"):
        q_ids.update(b["doc_id"].to_numpy(zero_copy_only=False).tolist())
    qid_ref = ray.put(np.array(sorted(q_ids), dtype=np.uint64))

    cnorm = normalize(corpus_ds, config)
    combined = cnorm.union(qnorm)
    sigs = signatures(shingle(combined, config), config).materialize()
    pairs = candidate_pairs_two_family(
        band_rows(sigs, config), chunk_rows_from_signatures(sigs, config),
        config)

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
    import dataclasses
    loose = dataclasses.replace(config, jaccard_threshold=0.0,
                                containment_threshold=2.0)
    ver = verify(pairs, sigs, loose).to_pandas()
    if ver.empty:
        return pd.DataFrame(columns=["query_url", "doc_url", "n_band_hits",
                                     "jaccard", "rank", "confidence"])

    qids = np.array(sorted(q_ids), dtype=np.uint64)
    a_is_q = np.isin(ver.doc_a.to_numpy(), qids)
    ver["query_id"] = np.where(a_is_q, ver.doc_a, ver.doc_b)
    ver["target_id"] = np.where(a_is_q, ver.doc_b, ver.doc_a)

    # resolve urls (small driver-side maps; at scale this is a join)
    url_map = {}
    for b in sigs.select_columns(["doc_id", "url"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        url_map.update(zip(b["doc_id"].to_numpy(zero_copy_only=False)
                           .tolist(), b["url"].to_pylist()))

    rows = []
    for qid, grp in ver.groupby("query_id"):
        grp = grp.sort_values(["jaccard", "target_id"],
                              ascending=[False, True]).head(top_k)
        dists = (1.0 - grp.jaccard.to_numpy()).clip(min=1e-9)
        for rank, (_, r) in enumerate(grp.iterrows(), start=1):
            conf = confidence_measurement(dists, rank - 1)
            rows.append({
                "query_url": url_map.get(int(qid)),
                "doc_url": url_map.get(int(r.target_id)),
                "n_band_hits": int(r.n_band_hits),
                "jaccard": float(r.jaccard),
                "rank": rank,
                "confidence": conf,
            })
    out = pd.DataFrame(rows)
    if confidence_threshold is not None and not out.empty:
        # clip_false_candidates analog (lsh.py:385-412): drop top-1 results
        # whose confidence exceeds the trained threshold (low margin)
        bad = (out["rank"] == 1) & (out["confidence"] > confidence_threshold)
        out = out[~bad]
    return out


def train_confidence_threshold(results: pd.DataFrame,
                               golden: dict[str, str]) -> float:
    """A9 (utils.py:154-171): max confidence over INCORRECT top-1 results —
    queries whose best hit is wrong get gated out at inference."""
    top1 = results[results["rank"] == 1]
    wrong = top1[[golden.get(q) != d for q, d in
                  zip(top1.query_url, top1.doc_url)]]
    if wrong.empty:
        return 0.0
    return float(wrong.confidence.max())


def evaluate_mrr(results: pd.DataFrame, golden: dict[str, str]) -> float:
    """A7 (lsh.py:320-350): mean reciprocal rank of the golden document."""
    ranks = []
    for q, expected in golden.items():
        hits = results[(results.query_url == q) &
                       (results.doc_url == expected)]
        ranks.append(int(hits["rank"].min()) if len(hits) else 0)
    return mean_reciprocal_rank(np.array(ranks))
