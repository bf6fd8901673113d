"""Suffix-array pass: exact substring duplicates inside candidate groups.

North-star requirement: "a suffix-array pass for exact substring duplicates
within candidate groups". Candidate pairs whose shingle containment is high
but whose Jaccard is below threshold (one doc embedded in a longer one) are
verified EXACTLY here: the pair's two texts are joined in and checked with
(a) a definitive C-speed containment scan and (b) a suffix-array + Kasai
LCP longest-common-substring length (``lsh_ray.functions.suffix``).

Runs only over the (small) substring-candidate pair set — never a global
suffix structure (reference analog: alignment kernels run only on retrieved
candidates, ``matching_algorithms.py:319-386``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lsh_ray.config import PipelineConfig
from lsh_ray.functions.suffix import (is_exact_substring,
                                      longest_common_substring_len)


def _substring_batch(batch: pa.Table, min_lcs: int) -> pa.Table:
    texts_a = batch["text_a"].to_pylist()
    texts_b = batch["text_b"].to_pylist()
    n = batch.num_rows
    lcs = np.zeros(n, dtype=np.int64)
    is_sub = np.zeros(n, dtype=bool)
    for i in range(n):
        ta, tb = texts_a[i] or "", texts_b[i] or ""
        shorter, longer = (ta, tb) if len(ta) <= len(tb) else (tb, ta)
        if is_exact_substring(shorter, longer):
            is_sub[i] = True
            lcs[i] = len(shorter.encode())
        else:
            lcs[i] = longest_common_substring_len(ta.encode(), tb.encode())
            is_sub[i] = lcs[i] >= min_lcs and lcs[i] >= len(shorter.encode())
    return pa.table({
        "doc_a": batch["doc_a"],
        "doc_b": batch["doc_b"],
        "lcs_len": pa.array(lcs, type=pa.int64()),
        "is_substring": pa.array(is_sub),
    })


def substring_pass(verified_ds, normalized_ds, config: PipelineConfig,
                   min_lcs: int = 64, raw_ds=None):
    """Substring-candidate pairs -> exact substring verdicts.

    ``verified_ds``: output of the verify stage (filtered to
    ``is_substring_candidate`` here); ``normalized_ds``: (doc_id, text, ...).
    ``raw_ds``: optional UN-normalized source — when given (the no-
    checkpoint streaming path, where ``normalized_ds`` would re-run
    normalize over the whole corpus), candidate rows are selected on the
    raw batches by recomputing ``doc_id = hash(batch_urls)`` and only the
    survivors (<1% of the corpus) pay normalization; byte-identical to
    the normalized path because normalize is a pure per-row function.
    """
    cands = verified_ds.map_batches(
        lambda t: t.filter(t["is_substring_candidate"])
                   .select(["doc_a", "doc_b"]),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    # semi-join prefilter: broadcast the candidate doc_id set (tiny — two
    # ids per substring-candidate pair) and ship ONLY those texts into the
    # join, instead of shuffling the whole corpus's text twice
    import ray

    id_parts = [np.concatenate([
        b["doc_a"].to_numpy(zero_copy_only=False),
        b["doc_b"].to_numpy(zero_copy_only=False)])
        for b in cands.iter_batches(batch_size=65536,
                                    batch_format="pyarrow")]
    cand_ids = (np.unique(np.concatenate(id_parts)) if id_parts
                else np.empty(0, dtype=np.uint64))
    ids_ref = ray.put(cand_ids)

    def _hits(doc: np.ndarray, ids: np.ndarray) -> np.ndarray:
        if not len(ids):
            return np.zeros(len(doc), bool)
        idx = np.searchsorted(ids, doc)
        idx[idx == len(ids)] = len(ids) - 1
        return ids[idx] == doc

    if raw_ds is not None:
        # pre-normalize semi-join: recompute doc identity on the raw
        # batch, keep only candidate rows, THEN normalize the survivors
        from lsh_ray.stages.normalize import (batch_urls, hash_strings,
                                              normalize)

        def raw_candidates(t: pa.Table) -> pa.Table:
            ids = ray.get(ids_ref)
            doc = hash_strings(
                batch_urls(t).to_numpy(zero_copy_only=False))
            return t.filter(pa.array(_hits(doc, ids)))

        texts = normalize(
            raw_ds.map_batches(raw_candidates, batch_format="pyarrow",
                               zero_copy_batch=True),
            config).select_columns(["doc_id", "text"])
    else:
        def only_candidates(t: pa.Table) -> pa.Table:
            ids = ray.get(ids_ref)
            doc = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(_hits(doc, ids)))

        texts = normalized_ds.select_columns(["doc_id", "text"]).map_batches(
            only_candidates, batch_format="pyarrow", zero_copy_batch=True)

    if len(cand_ids) <= 200_000:
        # broadcast fast path: the filtered text table is small, so pin it
        # in the object store once and attach texts map-side — one
        # execution, zero shuffle barriers
        tmap: dict[int, str] = {}
        for b in texts.iter_batches(batch_size=65536,
                                    batch_format="pyarrow"):
            tmap.update(zip(b["doc_id"].to_numpy(zero_copy_only=False)
                            .tolist(), b["text"].to_pylist()))
        tmap_ref = ray.put(tmap)

        def attach_and_check(t: pa.Table) -> pa.Table:
            m = ray.get(tmap_ref)
            a = t["doc_a"].to_numpy(zero_copy_only=False).tolist()
            b = t["doc_b"].to_numpy(zero_copy_only=False).tolist()
            withtext = pa.table({
                "doc_a": t["doc_a"], "doc_b": t["doc_b"],
                "text_a": pa.array([m.get(x, "") for x in a]),
                "text_b": pa.array([m.get(x, "") for x in b]),
            })
            out = _substring_batch(withtext, min_lcs)
            return out.filter(out["is_substring"])

        return cands.map_batches(attach_and_check, batch_format="pyarrow",
                                 zero_copy_batch=True)

    # scale path: partitioned joins (candidate set too large to broadcast)
    from lsh_ray.stages.join import bucket_join
    texts = texts.materialize()  # feeds both joins
    j = bucket_join(cands, texts, "doc_a", "doc_id", ["text"],
                    suffix="_a")
    j = bucket_join(j, texts, "doc_b", "doc_id", ["text"],
                    suffix="_b")
    out = j.map_batches(lambda t: _substring_batch(t, min_lcs),
                        batch_format="pyarrow", zero_copy_batch=True)
    return out.map_batches(lambda t: t.filter(t["is_substring"]),
                           batch_format="pyarrow", zero_copy_batch=True)
