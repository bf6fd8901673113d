"""Round-4 fixes: payload decompression, truncation ValueErrors,
confidence-threshold persistence, shared-regex-engine text stats,
pruned-read file listing, verify-plan agreement on duplicate doc_ids."""

import gzip
import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data
    return ray.data


# ------------------------------------------------ payload decompression ----

def test_decode_gzip_wrapped_bmp_and_wav():
    from lsh_ray.stages.multimodal import (BinaryDecodeStage, decode_bmp,
                                           encode_bmp, encode_wav)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (6, 4, 3), dtype=np.uint8)
    stage = BinaryDecodeStage(use_fake_decoder=False)
    plain = stage._decode_one(encode_bmp(img))
    for wrap in (gzip.compress, zlib.compress):
        np.testing.assert_array_equal(
            stage._decode_one(wrap(encode_bmp(img))), plain)
    t = np.arange(800, dtype=np.float64) / 8000.0
    wav = encode_wav((0.25 * np.sin(2 * np.pi * 220 * t)).astype(
        np.float32), 8000)
    np.testing.assert_array_equal(
        stage._decode_one(gzip.compress(wav)), stage._decode_one(wav))
    # decompressed output re-dispatches by magic, not by wrapper
    assert decode_bmp(encode_bmp(img)).shape == (6, 4, 3)


def test_decode_lzma_bz2_and_corrupt_stream():
    import bz2
    import lzma

    from lsh_ray.stages.multimodal import BinaryDecodeStage, encode_bmp
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (3, 3, 3), dtype=np.uint8)
    stage = BinaryDecodeStage(use_fake_decoder=False)
    plain = stage._decode_one(encode_bmp(img))
    np.testing.assert_array_equal(
        stage._decode_one(lzma.compress(encode_bmp(img))), plain)
    np.testing.assert_array_equal(
        stage._decode_one(bz2.compress(encode_bmp(img))), plain)
    with pytest.raises(ValueError):
        stage._decode_one(b"\x1f\x8b" + b"\x00" * 20)  # corrupt gzip


# ------------------------------------------------ truncation ValueErrors ----

def test_truncated_payloads_raise_value_error():
    from lsh_ray.stages.multimodal import (decode_bmp, decode_wav,
                                           encode_bmp, encode_bmpv,
                                           encode_wav, sample_frames,
                                           video_features)
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    bmp = encode_bmp(img)
    with pytest.raises(ValueError):
        decode_bmp(bmp[:-8])  # pixel data cut short
    bmpv = encode_bmpv([img, img], fps=10)
    with pytest.raises(ValueError):
        sample_frames(bmpv[:-10])
    with pytest.raises(ValueError):
        video_features(bmpv[:20])
    # size-lying frame prefix
    lying = bytearray(bmpv)
    struct.pack_into("<I", lying, 12, 1 << 30)
    with pytest.raises(ValueError):
        sample_frames(bytes(lying))
    wav = encode_wav(np.zeros(64, dtype=np.int16), 8000)
    with pytest.raises(ValueError):
        decode_wav(wav[:-16])  # data chunk shorter than declared


# ------------------------------------------- threshold artifact persist ----

def test_confidence_threshold_round_trip(tmp_path):
    from lsh_ray.config import PipelineConfig
    from lsh_ray.pipelines.search import (load_confidence_threshold,
                                          save_confidence_threshold)
    cfg = PipelineConfig()
    p = str(tmp_path / "artifacts" / "confidence_threshold.json")
    save_confidence_threshold(p, 0.4375, cfg)
    assert load_confidence_threshold(p, cfg) == 0.4375
    assert load_confidence_threshold(p) == 0.4375  # configless read ok
    other = PipelineConfig(seed=7)
    with pytest.raises(ValueError):
        load_confidence_threshold(p, other)


# ------------------------------------ shared regex engine (RE2) parity ----

def test_text_stats_match_duckdb_on_non_ascii():
    """Stopword/token counts must agree with the DuckDB oracle even when
    stopwords abut non-ASCII letters or unicode whitespace appears —
    both sides now evaluate the SAME RE2 patterns (ADVICE r3)."""
    import duckdb

    from lsh_ray.pipelines.queries import ORACLE_SQL
    from lsh_ray.stages.text_stats import quality_batch, token_count_batch
    texts = [
        "the cat sat on a mat",
        "aí the sun is bright aí",   # stopword abutting non-ASCII +
                                           # unicode NBSP (not a separator)
        "é the\tend of it",           # unicode EM SPACE
        "  ",
        "",
    ]
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    got_q = quality_batch(batch).to_pandas().sort_values("doc_id")
    got_t = token_count_batch(batch).to_pandas().sort_values("doc_id")
    con = duckdb.connect()
    con.register("documents_src", batch.to_pandas())
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
    exp_q = con.execute(ORACLE_SQL["doc_quality"] + " ORDER BY doc_id"
                        ).fetch_df()
    exp_t = con.execute(ORACLE_SQL["token_counts"] + " ORDER BY doc_id"
                        ).fetch_df()
    assert got_t.n_tokens.tolist() == exp_t.n_tokens.tolist()
    for col in ("n_chars", "alpha_ratio", "digit_ratio", "space_ratio",
                "punct_ratio", "stopword_ratio"):
        np.testing.assert_allclose(got_q[col].to_numpy(),
                                   exp_q[col].to_numpy(), atol=0,
                                   err_msg=col)


# -------------------------------------------- pruned-read file listing ----

def test_prune_scan_covers_extensionless_parquet(rd, tmp_path):
    """A parquet file WITHOUT the .parquet extension is still read by
    ray.data.read_parquet — the prune footer-scan must see it too, so
    null-text rows in it disable the html prune (ADVICE r3 medium)."""
    import pyarrow.parquet as pq

    from lsh_ray.sources.readers import read_documents_for_dedup
    d = tmp_path / "corpus"
    d.mkdir()
    clean = pa.table({
        "url": ["u1"], "text": ["hello world"],
        "html": [b"<p>hello world</p>"], "lang": ["en"]})
    dirty = pa.table({
        "url": ["u2"], "text": pa.array([None], type=pa.string()),
        "html": [b"<p>from html only</p>"], "lang": ["en"]})
    pq.write_table(clean, str(d / "part-0.parquet"))
    pq.write_table(dirty, str(d / "part-1"))  # no extension
    ds = read_documents_for_dedup(str(d))
    # the null-text row forces the unpruned plan: html must survive
    assert "html" in ds.schema().names
    assert ds.count() == 2


# ------------------------------- verify plans agree on duplicate doc_id ----

def test_verify_plans_drop_multi_row_doc_ids(rd):
    """A doc_id present in TWO signature rows (e.g. duplicate urls): the
    exchange plan drops its pairs in the complete-pair regroup; the
    blockpairs plan must drop them too, not verify an arbitrary row."""
    from lsh_ray.config import PipelineConfig
    from lsh_ray.stages.verify import verify_blockpairs, verify_exchange
    cfg = PipelineConfig(shuffle_coalesce_blocks=4)
    sh = pa.list_(pa.uint32())

    def sig_row(doc, vals):
        return {"doc_id": doc, "url": f"doc://{doc}",
                "shingles": np.array(vals, dtype=np.uint32),
                "simhash": np.uint64(doc)}
    sigs = rd.from_items([
        sig_row(1, [1, 2, 3, 4]),
        sig_row(1, [9, 10, 11, 12]),     # duplicate doc_id row
        sig_row(2, [1, 2, 3, 4, 5, 6, 7, 8]),
        sig_row(3, [1, 2, 3, 4, 5, 6, 7, 8]),
    ]).map_batches(lambda t: pa.table({
        "doc_id": t["doc_id"].cast(pa.uint64()),
        "url": t["url"],
        "shingles": t["shingles"].cast(sh),
        "simhash": t["simhash"].cast(pa.uint64()),
        "n_shingles": pa.array([4] * t.num_rows, pa.int32()),
    }), batch_format="pyarrow").materialize()
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array([1, 2], type=pa.uint64()),
        "doc_b": pa.array([2, 3], type=pa.uint64()),
        "n_band_hits": pa.array([3, 3], type=pa.int32()),
    }))
    got_bp = verify_blockpairs(pairs, sigs, cfg).to_pandas()
    got_ex = verify_exchange(pairs, sigs, cfg).to_pandas()
    # pair (1,2) touches the duplicated doc 1 -> dropped by BOTH plans
    # (it would otherwise pass the containment gate: {1..4} ⊂ {1..8});
    # pair (2,3) survives with jaccard 1.0
    for got in (got_bp, got_ex):
        assert got.doc_a.tolist() == [2]
        assert got.doc_b.tolist() == [3]
        np.testing.assert_allclose(got.jaccard.to_numpy(),
                                   [1.0], rtol=1e-6)


# ----------------------------------- fused candidates == unfused plan ----

def test_fused_candidates_match_unfused(rd, corpus_dir):
    """The fused three-wave task pipeline (band+chunk emission inside the
    signature-block task, chained pair-gen/sum) must produce EXACTLY the
    generic two-exchange plan's candidate set."""
    from lsh_ray.config import PipelineConfig
    from lsh_ray.sources.readers import read_documents_for_dedup
    from lsh_ray.stages.banding import band_rows
    from lsh_ray.stages.candidates import (candidate_pairs_from_signatures,
                                           candidate_pairs_two_family)
    from lsh_ray.stages.chunking import chunk_rows_from_signatures
    from lsh_ray.stages.minhash import signatures
    from lsh_ray.stages.normalize import normalize
    from lsh_ray.stages.shingle import shingle
    cfg = PipelineConfig(shuffle_coalesce_blocks=8, exchange="tasks")
    docs = read_documents_for_dedup(corpus_dir + "/documents")
    sigs = signatures(shingle(normalize(docs, cfg), cfg), cfg).materialize()
    fused = candidate_pairs_from_signatures(sigs, cfg).to_pandas()
    unfused = candidate_pairs_two_family(
        band_rows(sigs, cfg), chunk_rows_from_signatures(sigs, cfg),
        cfg).to_pandas()

    def canon(df):
        return sorted(map(tuple, df[["doc_a", "doc_b", "n_band_hits"]]
                          .to_numpy().tolist()))

    assert len(fused) > 0
    assert canon(fused) == canon(unfused)


# ------------------------- giant-scale fallbacks, end-to-end in one run ----

def test_giant_scale_fallbacks_end_to_end(rd, corpus_dir, monkeypatch):
    """Drive run_dedup once with every scale fallback FORCED — the sort
    exchange above _TASKS_MAX_SLICES (here: 0), the two-exchange verify
    plan above verify_broadcast_max_pairs (0), and distributed
    large/small-star CC above DRIVER_EDGE_CAP (0) — and assert outputs
    identical to the default fast-path run. This is the 10^12-doc path's
    glue, previously only unit-tested on synthetic inputs."""
    import dataclasses

    from lsh_ray import config as config_mod
    from lsh_ray.pipelines.dedup_pipeline import run_dedup
    from lsh_ray.sources.readers import read_documents_for_dedup

    cfg = config_mod.PipelineConfig(shuffle_coalesce_blocks=8)

    def canon_pairs(res):
        df = res.verified.to_pandas()
        return sorted(map(tuple, df[["doc_a", "doc_b", "jaccard",
                                     "is_dup"]].to_numpy().tolist()))

    def canon_clusters(res):
        df = res.clusters.to_pandas()
        return sorted(map(tuple, df[["doc_id", "cluster_id"]]
                          .to_numpy().tolist()))

    docs = read_documents_for_dedup(corpus_dir + "/documents")
    base = run_dedup(docs, cfg)
    base_pairs, base_clusters = canon_pairs(base), canon_clusters(base)
    assert len(base_pairs) > 0 and len(base_clusters) > 0

    import lsh_ray.stages.cluster as cluster_mod
    import lsh_ray.stages.exchange as exchange_mod
    monkeypatch.setattr(exchange_mod, "_TASKS_MAX_SLICES", 0)
    monkeypatch.setattr(cluster_mod, "DRIVER_EDGE_CAP", 0)
    giant_cfg = dataclasses.replace(cfg, verify_broadcast_max_pairs=0)
    giant = run_dedup(read_documents_for_dedup(corpus_dir + "/documents"),
                      giant_cfg)
    assert canon_pairs(giant) == base_pairs
    assert canon_clusters(giant) == base_clusters


def test_near_dedup_keep_partitions_signed_docs(ray_session, sf_dir):
    """kept = signed \\ dropped, and every cluster representative
    (min-url member) survives the anti-join."""
    from lsh_ray.pipelines.queries import (
        _dedup_result, q_dedup_clusters, q_near_dedup_keep)
    kept = set(q_near_dedup_keep(sf_dir).to_pandas()["url"])
    cl = q_dedup_clusters(sf_dir).to_pandas()
    signed = set(_dedup_result(sf_dir).signatures
                 .select_columns(["url"]).to_pandas()["url"])
    dropped = set(cl.url[cl.url != cl.cluster_url])
    assert kept == signed - dropped
    assert set(cl.cluster_url) <= kept
