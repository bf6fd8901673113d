"""Checkpoint/resume semantics: config-hash lineage, skip-if-complete,
partial-output invalidation, end-to-end resume identity."""

import json
import os

import pyarrow as pa
import pytest

from lsh_ray.config import PipelineConfig


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data
    return ray.data


def test_checkpoint_skips_when_complete(rd, tmp_path):
    from lsh_ray.state.checkpoint import checkpoint_dataset, read_manifest
    cfg = PipelineConfig()
    ds = rd.from_items([{"x": i} for i in range(10)])
    out = str(tmp_path / "stage1")
    checkpoint_dataset(ds, out, cfg)
    m1 = read_manifest(out)
    assert m1["rows"] == 10 and m1["config_hash"] == cfg.config_hash()
    written1 = m1["written_at"]
    # second call with same config: no rewrite
    checkpoint_dataset(rd.from_items([{"x": 99}]), out, cfg)
    m2 = read_manifest(out)
    assert m2["written_at"] == written1  # untouched
    assert rd.read_parquet(out).count() == 10


def test_checkpoint_invalidated_by_config_change(rd, tmp_path):
    from lsh_ray.state.checkpoint import checkpoint_dataset
    out = str(tmp_path / "stage2")
    checkpoint_dataset(rd.from_items([{"x": 1}]), out, PipelineConfig())
    ds2 = checkpoint_dataset(rd.from_items([{"x": 2}]), out,
                             PipelineConfig(shingle_k=7))
    assert ds2.take_all() == [{"x": 2}]


def test_partial_output_not_trusted(rd, tmp_path):
    from lsh_ray.state.checkpoint import checkpoint_dataset
    cfg = PipelineConfig()
    out = str(tmp_path / "stage3")
    # simulate a killed run: parquet files present, NO manifest
    os.makedirs(out)
    import pyarrow.parquet as pq
    pq.write_table(pa.table({"x": [123]}), os.path.join(out, "junk.parquet"))
    ds = checkpoint_dataset(rd.from_items([{"x": 1}, {"x": 2}]), out, cfg)
    assert sorted(r["x"] for r in ds.take_all()) == [1, 2]


def test_missing_part_file_invalidates(rd, tmp_path):
    from lsh_ray.state.checkpoint import checkpoint_dataset, is_complete
    cfg = PipelineConfig()
    out = str(tmp_path / "stage4")
    checkpoint_dataset(rd.from_items([{"x": i} for i in range(5)]), out, cfg)
    assert is_complete(out, cfg)
    # delete one recorded part: lineage check must fail
    parts = [p for p in os.listdir(out) if p.endswith(".parquet")]
    os.remove(os.path.join(out, parts[0]))
    assert not is_complete(out, cfg)


def test_pipeline_resume_identical_outputs(rd, tmp_path, corpus_dir):
    """Kill + re-run => identical outputs, completed stages skipped
    (BASELINE.md resumability target)."""
    from lsh_ray.pipelines.dedup_pipeline import run_dedup
    from lsh_ray.state.checkpoint import read_manifest
    cfg = PipelineConfig()
    ck = str(tmp_path / "ck")
    docs = rd.read_parquet(corpus_dir + "/documents")
    r1 = run_dedup(docs, cfg, checkpoint_dir=ck)
    c1 = r1.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)
    stamp = read_manifest(os.path.join(ck, "signatures"))["written_at"]
    # resume: same config, same checkpoint dir -> stages skipped
    r2 = run_dedup(rd.read_parquet(corpus_dir + "/documents"), cfg,
                   checkpoint_dir=ck)
    c2 = r2.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert stamp == read_manifest(
        os.path.join(ck, "signatures"))["written_at"]
    assert c1.equals(c2)
