"""Incremental dedup: new-shard-vs-base-checkpoint must reproduce the
full run's new-touching surface exactly (small groups are exact; hot
groups are documented heuristics in BOTH runs and the fixture stays
under the cap)."""

import numpy as np
import pyarrow as pa
import pytest


def _canon(ds):
    df = ds.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def split_corpora(ray_session):
    from lsh_ray.fixtures import generate_corpus
    docs = generate_corpus(400, seed=3)["documents"]
    # interleaved split (3-of-4 base, 1-of-4 delta): planted dup pairs
    # sit on adjacent rows, so a contiguous split would never produce a
    # cross-shard pair and the test would prove nothing
    idx = np.arange(docs.num_rows)
    base = docs.take(pa.array(idx[idx % 4 != 0]))
    delta = docs.take(pa.array(idx[idx % 4 == 0]))
    return base, delta


def test_incremental_matches_full_run(ray_session, split_corpora, tmp_path):
    import ray.data

    from lsh_ray.config import PipelineConfig
    from lsh_ray.pipelines.dedup_pipeline import run_dedup
    from lsh_ray.pipelines.incremental import run_dedup_incremental

    base_t, delta_t = split_corpora
    cfg = PipelineConfig()

    full = run_dedup(ray.data.from_arrow(
        pa.concat_tables([base_t, delta_t])), cfg)
    base_dir = str(tmp_path / "base_ckpt")
    run_dedup(ray.data.from_arrow(base_t), cfg, checkpoint_dir=base_dir)
    inc = run_dedup_incremental(ray.data.from_arrow(delta_t), base_dir, cfg)

    new_ids = set(
        inc.new_signatures.select_columns(["doc_id"]).to_pandas()["doc_id"])
    # normalize may drop empty docs / merge duplicate urls; the id set
    # is whatever the signature stage actually produced
    assert len(new_ids) > 90

    vf = full.verified.to_pandas()
    expected = vf[vf.doc_a.isin(new_ids) | vf.doc_b.isin(new_ids)]
    # the fixture must actually exercise cross-shard pairs
    cross = expected[~(expected.doc_a.isin(new_ids)
                       & expected.doc_b.isin(new_ids))]
    assert len(expected) > 0 and len(cross) > 0
    got = inc.verified.to_pandas()
    expected = expected[sorted(expected.columns)].sort_values(
        sorted(expected.columns)).reset_index(drop=True)
    got = got[sorted(got.columns)].sort_values(
        sorted(got.columns)).reset_index(drop=True)
    assert got.equals(expected)

    # merged clustering == the full run's clustering (same edge set:
    # base edges from the checkpoint + the new-touching edges)
    assert _canon(inc.clusters).equals(_canon(full.clusters))


def test_incremental_rolling_checkpoint_is_valid_base(
        ray_session, split_corpora, tmp_path):
    """checkpoint_dir output of an increment is itself a usable base:
    two increments chained must equal one full run's clustering."""
    import ray.data

    from lsh_ray.config import PipelineConfig
    from lsh_ray.pipelines.dedup_pipeline import run_dedup
    from lsh_ray.pipelines.incremental import run_dedup_incremental

    base_t, delta_t = split_corpora
    d1, d2 = delta_t.slice(0, 50), delta_t.slice(50)
    cfg = PipelineConfig()

    base_dir = str(tmp_path / "roll0")
    run_dedup(ray.data.from_arrow(base_t), cfg, checkpoint_dir=base_dir)
    mid_dir = str(tmp_path / "roll1")
    run_dedup_incremental(ray.data.from_arrow(d1), base_dir, cfg,
                          checkpoint_dir=mid_dir)
    inc2 = run_dedup_incremental(ray.data.from_arrow(d2), mid_dir, cfg)

    full = run_dedup(ray.data.from_arrow(
        pa.concat_tables([base_t, delta_t])), cfg)
    assert _canon(inc2.clusters).equals(_canon(full.clusters))


def test_incremental_three_hop_chain_matches_full_run(
        ray_session, split_corpora, tmp_path):
    """THREE successive increments, each rolling its merged checkpoint
    into the next hop's base: the final clustering must equal one full
    run over everything — exercising the merged-checkpoint-as-base
    loop beyond a single hop (round-5 verdict item; each hop's base is
    itself a merge product, so drift would compound)."""
    import ray.data

    from lsh_ray.config import PipelineConfig
    from lsh_ray.pipelines.dedup_pipeline import run_dedup
    from lsh_ray.pipelines.incremental import run_dedup_incremental

    base_t, delta_t = split_corpora
    d1 = delta_t.slice(0, 34)
    d2 = delta_t.slice(34, 33)
    d3 = delta_t.slice(67)
    cfg = PipelineConfig()

    cur = str(tmp_path / "chain0")
    run_dedup(ray.data.from_arrow(base_t), cfg, checkpoint_dir=cur)
    last = None
    for i, d in enumerate((d1, d2, d3), start=1):
        nxt = str(tmp_path / f"chain{i}")
        last = run_dedup_incremental(ray.data.from_arrow(d), cur, cfg,
                                     checkpoint_dir=nxt)
        cur = nxt

    full = run_dedup(ray.data.from_arrow(
        pa.concat_tables([base_t, delta_t])), cfg)
    assert _canon(last.clusters).equals(_canon(full.clusters))
    # and the final merged checkpoint pair set == the full run's pairs
    from lsh_ray.pipelines.incremental import _read_stage
    merged_pairs = _read_stage(cur, "verified")
    assert _canon(merged_pairs).equals(_canon(full.verified))


def test_incremental_idempotent_reingestion(ray_session, split_corpora,
                                            tmp_path):
    """A delta overlapping the base (re-crawled urls / a re-delivered
    shard) skips the already-known doc_ids: re-running the SAME
    increment against its own merged checkpoint is a no-op, and a
    half-overlapping delta contributes only its new docs — no duplicate
    doc_id ever enters the rolling signature checkpoint."""
    import ray.data

    from lsh_ray.config import PipelineConfig
    from lsh_ray.pipelines.dedup_pipeline import run_dedup
    from lsh_ray.pipelines.incremental import run_dedup_incremental

    base_t, delta_t = split_corpora
    cfg = PipelineConfig()
    base_dir = str(tmp_path / "idem0")
    run_dedup(ray.data.from_arrow(base_t), cfg, checkpoint_dir=base_dir)

    mid_dir = str(tmp_path / "idem1")
    inc1 = run_dedup_incremental(ray.data.from_arrow(delta_t), base_dir,
                                 cfg, checkpoint_dir=mid_dir)
    assert inc1.n_skipped_existing == 0
    n1 = inc1.new_signatures.count()

    # exact re-delivery: everything skipped, zero new pairs, clustering
    # unchanged, and the re-run's checkpoint is byte-equal in content
    redo_dir = str(tmp_path / "idem2")
    inc2 = run_dedup_incremental(ray.data.from_arrow(delta_t), mid_dir,
                                 cfg, checkpoint_dir=redo_dir)
    assert inc2.n_skipped_existing == n1
    assert inc2.new_signatures.count() == 0
    assert inc2.verified.count() == 0
    assert _canon(inc2.clusters).equals(_canon(inc1.clusters))
    # merged signature checkpoint unchanged by the no-op increment
    # (scalar columns — the list payloads don't sort in pandas)
    assert _canon(inc2.signatures.select_columns(["doc_id"])).equals(
        _canon(inc1.signatures.select_columns(["doc_id"])))
    assert inc2.signatures.count() == inc1.signatures.count()

    # half-overlap: only the genuinely new half lands, and the result
    # equals feeding just that half
    half = delta_t.slice(0, delta_t.num_rows // 2)
    probe = pa.concat_tables([base_t.slice(0, 40), half])
    mixed = run_dedup_incremental(ray.data.from_arrow(probe), base_dir, cfg)
    clean = run_dedup_incremental(ray.data.from_arrow(half), base_dir, cfg)
    assert mixed.n_skipped_existing > 0
    assert _canon(mixed.verified).equals(_canon(clean.verified))
    assert _canon(mixed.clusters).equals(_canon(clean.clusters))


def test_incremental_rejects_config_mismatch(ray_session, split_corpora,
                                             tmp_path):
    import dataclasses

    import ray.data

    from lsh_ray.config import PipelineConfig
    from lsh_ray.pipelines.dedup_pipeline import run_dedup
    from lsh_ray.pipelines.incremental import run_dedup_incremental

    base_t, delta_t = split_corpora
    cfg = PipelineConfig()
    base_dir = str(tmp_path / "cfg_ckpt")
    run_dedup(ray.data.from_arrow(base_t), cfg, checkpoint_dir=base_dir)
    other = dataclasses.replace(cfg, bands=16, rows_per_band=8)
    with pytest.raises(ValueError, match="different PipelineConfig"):
        run_dedup_incremental(ray.data.from_arrow(delta_t), base_dir,
                              other)


def test_sided_kernel_excludes_base_base_pairs():
    from lsh_ray.stages.candidates import (_pairs_for_mixed_arrays,
                                           _pairs_for_mixed_arrays_sided)

    bk = np.array([5, 5, 5, 5, 9, 9], dtype=np.uint64)
    doc = np.array([10, 3, 7, 1, 10, 7], dtype=np.uint64)
    fam = np.array([0, 0, 0, 0, 1, 1], dtype=np.int8)
    side = np.array([0, 0, 1, 1, 0, 1], dtype=np.int8)
    ua, ub, bh, ch = _pairs_for_mixed_arrays_sided(bk, doc, fam, side, 256)
    got = set(zip(ua.tolist(), ub.tolist()))
    assert got == {(3, 10), (1, 3), (3, 7), (1, 10), (7, 10)}  # no (1,7)
    # == full kernel restricted to new-touching pairs
    fa, fb, _, _ = _pairs_for_mixed_arrays(bk, doc, fam, 256)
    full = set(zip(fa.tolist(), fb.tolist()))
    assert {(a, b) for a, b in full
            if a in (3, 10) or b in (3, 10)} == got
    # self-pair filtered when a doc_id is on both sides
    r = _pairs_for_mixed_arrays_sided(
        np.array([5, 5], dtype=np.uint64),
        np.array([7, 7], dtype=np.uint64),
        np.zeros(2, np.int8), np.array([0, 1], np.int8), 256)
    assert len(r[0]) == 0
    # hot band group: star from each new doc to the min member
    m = 300
    side_hot = np.ones(m, np.int8)
    side_hot[[10, 50]] = 0
    r = _pairs_for_mixed_arrays_sided(
        np.full(m, 5, np.uint64),
        np.arange(1, m + 1).astype(np.uint64),
        np.zeros(m, np.int8), side_hot, 256)
    assert sorted(zip(r[0].tolist(), r[1].tolist())) == [(1, 11), (1, 51)]
