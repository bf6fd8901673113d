"""End-to-end pipeline vs brute-force oracle (SURVEY.md §5 strategy).

The oracle recomputes all-pairs exact shingle Jaccard (same shingle config
as the pipeline) in plain numpy — the rebuild analog of the reference's
golden ``expected_results.list`` labels (``loader.py:55-66``). Gates:
dup-pair recall >= 0.99 (BASELINE.md target), substring detection, and
cluster-partition agreement.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq
import pytest

from lsh_ray.config import PipelineConfig
from lsh_ray.functions.hashing import hash_strings
from lsh_ray.functions.unionfind import UnionFind
from lsh_ray.stages.shingle import shingle_sets_from_token_lists

CFG = PipelineConfig()


def brute_force_oracle(docs_tbl, cfg: PipelineConfig):
    """All-pairs exact Jaccard + substring check. Returns (dup_pairs,
    substring_pairs) as sets of (min_doc_id, max_doc_id)."""
    texts = docs_tbl["text"].to_pylist()
    urls = docs_tbl["url"].to_pylist()
    doc_ids = hash_strings(urls)
    tok_lists = [(t or "").lower().split() for t in texts]
    vals, offs = shingle_sets_from_token_lists(
        tok_lists, cfg.shingle_k, cfg.shingle_stride)
    sets = [vals[offs[i]:offs[i + 1]] for i in range(len(tok_lists))]
    keep = [i for i in range(len(sets)) if len(sets[i]) > 0]
    dup, sub = set(), set()
    for ii in range(len(keep)):
        for jj in range(ii + 1, len(keep)):
            i, j = keep[ii], keep[jj]
            a, b = sets[i], sets[j]
            if len(a) > len(b):
                a, b = b, a
            idx = np.searchsorted(b, a)
            idx[idx == len(b)] = len(b) - 1
            inter = int((b[idx] == a).sum())
            jac = inter / (len(a) + len(b) - inter)
            pid = tuple(sorted((int(doc_ids[i]), int(doc_ids[j]))))
            if jac >= cfg.jaccard_threshold:
                dup.add(pid)
            elif inter / min(len(a), len(b)) >= cfg.containment_threshold:
                ta, tb = texts[i], texts[j]
                s, l = (ta, tb) if len(ta) <= len(tb) else (tb, ta)
                if s in l:
                    sub.add(pid)
    return dup, sub


def _partition(mapping) -> set[frozenset]:
    groups = defaultdict(set)
    for k, v in mapping.items():
        groups[v].add(int(k))
    return {frozenset(s) for s in groups.values()}


@pytest.fixture(scope="module")
def pipeline_result(ray_session, corpus_dir):
    import ray.data

    from lsh_ray.pipelines.dedup_pipeline import run_dedup
    docs = ray.data.read_parquet(corpus_dir + "/documents")
    res = run_dedup(docs, CFG)
    return {
        "verified": res.verified.to_pandas(),
        "substring": res.substring_pairs.to_pandas(),
        "clusters": res.clusters.to_pandas(),
    }


@pytest.fixture(scope="module")
def oracle(corpus_dir):
    docs_tbl = pq.read_table(corpus_dir + "/documents")
    return brute_force_oracle(docs_tbl, CFG)


def test_dup_pair_recall_against_oracle(pipeline_result, oracle):
    oracle_dup, _ = oracle
    ver = pipeline_result["verified"]
    pipe = {tuple(sorted((int(a), int(b))))
            for a, b in zip(ver[ver.is_dup].doc_a, ver[ver.is_dup].doc_b)}
    assert len(oracle_dup) > 50, "fixture must plant enough duplicates"
    recall = len(oracle_dup & pipe) / len(oracle_dup)
    assert recall >= 0.99, f"dup-pair recall {recall}"


def test_dup_pair_precision_is_exact(pipeline_result, oracle):
    # every emitted dup pair was verified with EXACT Jaccard, so precision
    # against the oracle at the same threshold must be 1.0
    oracle_dup, _ = oracle
    ver = pipeline_result["verified"]
    pipe = {tuple(sorted((int(a), int(b))))
            for a, b in zip(ver[ver.is_dup].doc_a, ver[ver.is_dup].doc_b)}
    assert pipe <= oracle_dup


def test_substring_pairs_found(pipeline_result, oracle):
    _, oracle_sub = oracle
    sub = pipeline_result["substring"]
    pipe = {tuple(sorted((int(a), int(b))))
            for a, b in zip(sub.doc_a, sub.doc_b)}
    assert len(oracle_sub) > 3, "fixture must plant substring pairs"
    recall = len(oracle_sub & pipe) / len(oracle_sub)
    assert recall >= 0.99, f"substring recall {recall}"


def test_cluster_assignments_match_oracle(pipeline_result, oracle):
    oracle_dup, oracle_sub = oracle
    uf = UnionFind()
    for a, b in oracle_dup | oracle_sub:
        uf.union(a, b)
    oracle_comp = uf.components()
    clus = pipeline_result["clusters"]
    pipe_map = {int(d): int(c)
                for d, c in zip(clus.doc_id, clus.cluster_id)
                if int(d) in oracle_comp}
    assert _partition(oracle_comp) == _partition(pipe_map)


def test_cluster_ids_are_min_member(pipeline_result):
    clus = pipeline_result["clusters"]
    for cid, grp in clus.groupby("cluster_id"):
        assert int(cid) == int(grp.doc_id.min())


def test_verify_from_partial_matches_unfused(ray_session):
    """The fused sum-into-verify plan must produce byte-identical verified
    pairs to the two-stage plan (also checked at 200k docs offline)."""
    import ray.data

    from lsh_ray.config import PipelineConfig
    from lsh_ray.fixtures import generate_corpus
    from lsh_ray.stages.banding import band_rows
    from lsh_ray.stages.candidates import (partial_mixed_pairs,
                                           sum_mixed_pairs)
    from lsh_ray.stages.chunking import chunk_rows_from_signatures
    from lsh_ray.stages.minhash import signatures
    from lsh_ray.stages.normalize import normalize
    from lsh_ray.stages.shingle import shingle
    from lsh_ray.stages.verify import verify, verify_from_partial
    cfg = PipelineConfig()
    ds = ray.data.from_arrow(generate_corpus(400, seed=3)["documents"])
    sigs = signatures(shingle(normalize(ds, cfg), cfg), cfg).materialize()
    partial = partial_mixed_pairs(
        band_rows(sigs, cfg), chunk_rows_from_signatures(sigs, cfg),
        cfg).materialize()

    def canon(d):
        df = d.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(
            drop=True)
        return df[sorted(df.columns)]

    unfused = canon(verify(sum_mixed_pairs(partial, cfg), sigs, cfg))
    fused = canon(verify_from_partial(partial, sigs, cfg))
    assert len(unfused) > 0
    assert unfused.equals(fused)


def test_verify_broadcast_matches_exchange_plan(ray_session):
    """The broadcast-pairs and block-pair verify plans must produce
    byte-identical verified pairs to the two-exchange endpoint plan at
    every exchange mode."""
    import ray.data

    from lsh_ray.config import PipelineConfig
    from lsh_ray.fixtures import generate_corpus
    from lsh_ray.stages.banding import band_rows
    from lsh_ray.stages.candidates import (partial_mixed_pairs,
                                           sum_mixed_pairs)
    from lsh_ray.stages.chunking import chunk_rows_from_signatures
    from lsh_ray.stages.minhash import signatures
    from lsh_ray.stages.normalize import normalize
    from lsh_ray.stages.shingle import shingle
    from lsh_ray.stages.verify import (verify_blockpairs, verify_broadcast,
                                       verify_exchange)
    import dataclasses
    ds = ray.data.from_arrow(generate_corpus(400, seed=3)["documents"])

    def canon(d):
        df = d.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(
            drop=True)
        return df[sorted(df.columns)]

    outs = []
    for mode in ("tasks", "sort"):
        cfg = dataclasses.replace(PipelineConfig(), exchange=mode)
        sigs = signatures(shingle(normalize(ds, cfg), cfg),
                          cfg).materialize()
        pairs = sum_mixed_pairs(partial_mixed_pairs(
            band_rows(sigs, cfg), chunk_rows_from_signatures(sigs, cfg),
            cfg), cfg).materialize()
        outs.append(canon(verify_broadcast(pairs, sigs, cfg)))
        outs.append(canon(verify_exchange(pairs, sigs, cfg)))
        outs.append(canon(verify_blockpairs(pairs, sigs, cfg)))
    assert len(outs[0]) > 0
    for other in outs[1:]:
        assert outs[0].equals(other)


def test_verify_blockpairs_drops_missing_endpoints(ray_session):
    """A candidate pair whose endpoint is absent from the signature table
    cannot be verified; every plan drops it (the exchange plans lose it in
    the complete-pair regroup, blockpairs at the locate step)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lsh_ray.config import PipelineConfig
    from lsh_ray.stages.verify import verify_blockpairs

    cfg = PipelineConfig()
    sh = pa.array([[1, 2, 3], [1, 2, 3], [7, 8, 9]],
                  type=pa.list_(pa.uint32()))
    sigs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], pa.uint64()),
        "shingles": sh,
        "simhash": pa.array([0, 0, 1], pa.uint64()),
    }))
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([10, 10], pa.uint64()),
        "doc_b": pa.array([11, 99], pa.uint64()),  # 99 not in sigs
        "n_band_hits": pa.array([3, 3], pa.int32()),
    }))
    out = verify_blockpairs(pairs, sigs, cfg).to_pandas()
    assert list(out["doc_a"]) == [10] and list(out["doc_b"]) == [11]
    assert out["jaccard"].iloc[0] == 1.0


def test_verify_threshold_gate_is_float64(ray_session):
    """A pair whose float32 jaccard rounds BELOW the threshold must be
    dropped — numpy's value-based casting would otherwise compare in
    float32 (float32(0.7) >= 0.7 -> True) while the DuckDB oracle
    promotes REAL to DOUBLE (0.69999998... >= 0.7 -> False)."""
    import dataclasses

    import pyarrow as pa
    import ray.data

    from lsh_ray.config import PipelineConfig
    from lsh_ray.stages.verify import verify_blockpairs

    # |inter| = 7, |union| = 10 -> jaccard exactly 7/10, which is
    # 0.69999998... in float32; containment 7/8 stays under the gate
    cfg = dataclasses.replace(PipelineConfig(), jaccard_threshold=0.7,
                              containment_threshold=0.9)
    sh = pa.array([[1, 2, 3, 4, 5, 6, 7, 31, 32],
                   [1, 2, 3, 4, 5, 6, 7, 41]],
                  type=pa.list_(pa.uint32()))
    sigs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11], pa.uint64()),
        "shingles": sh,
        "simhash": pa.array([0, 0], pa.uint64()),
    }))
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([10], pa.uint64()),
        "doc_b": pa.array([11], pa.uint64()),
        "n_band_hits": pa.array([3], pa.int32()),
    }))
    out = verify_blockpairs(pairs, sigs, cfg).to_pandas()
    assert len(out) == 0


def test_verify_exchange_empty_signature_partition(ray_session):
    """Exchange partitions holding endpoint rows but ZERO signature rows
    (every pair endpoint missing from the corpus) must drop the pairs,
    not crash indexing into an empty dup-mask."""
    import pyarrow as pa
    import ray.data

    from lsh_ray.config import PipelineConfig
    from lsh_ray.stages.verify import verify_exchange

    cfg = PipelineConfig()
    sigs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.uint64()),
        "shingles": pa.array([], pa.list_(pa.uint32())),
        "simhash": pa.array([], pa.uint64()),
    }))
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([10, 12], pa.uint64()),
        "doc_b": pa.array([11, 13], pa.uint64()),
        "n_band_hits": pa.array([3, 3], pa.int32()),
    }))
    out = verify_exchange(pairs, sigs, cfg).to_pandas()
    assert len(out) == 0
