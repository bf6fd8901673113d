"""End-to-end curation pipeline (pipelines/curate.py): quality filter
-> dedup keep-list -> decontamination composition, survivor metrics,
and the CLI surface."""

import json
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest

from lsh_ray.config import PipelineConfig


@pytest.fixture(scope="module")
def corpus_t(ray_session):
    from lsh_ray.fixtures import generate_corpus
    return generate_corpus(400, seed=9)["documents"]


def test_run_curate_stagewise_metrics_and_rules(ray_session, corpus_t):
    import ray.data

    from lsh_ray.pipelines.curate import run_curate
    from lsh_ray.stages.tfidf import flat_tokens

    cfg = PipelineConfig()
    res = run_curate(ray.data.from_arrow(corpus_t), cfg, min_tokens=40,
                     max_top_token_frac=0.5)
    m = res.metrics
    assert m["n_input"] == 400
    assert 0 < m["n_quality_kept"] < m["n_input"]  # min_tokens=40 bites
    # planted duplicate clusters shrink under the keep-list
    assert 0 < m["n_dedup_kept"] < m["n_quality_kept"]
    assert m["n_cleaned"] == m["n_dedup_kept"]
    assert m["n_contaminated_dropped"] == 0
    assert res.cleaned.count() == m["n_cleaned"]

    # the quality rule holds row-for-row on the survivors
    out = res.cleaned.to_pandas()
    batch = pa.table({"doc_id": pa.array(range(len(out)), pa.int64()),
                      "text": pa.array(out["text"])})
    _, lens, _ = flat_tokens(batch)
    assert (lens >= 40).all()

    # survivors are exactly the dedup keep-list restricted to the
    # quality-kept set: no cluster may retain two members
    clusters = res.dedup.clusters.to_pandas()
    survivors = set(out["url"])
    from collections import defaultdict
    per_cluster = defaultdict(int)
    sig = res.dedup.signatures.select_columns(["doc_id", "url"]) \
        .to_pandas()
    url_by_doc = dict(zip(sig["doc_id"], sig["url"]))
    for doc_id, cid in zip(clusters["doc_id"], clusters["cluster_id"]):
        if url_by_doc.get(doc_id) in survivors:
            per_cluster[cid] += 1
    assert per_cluster and max(per_cluster.values()) == 1


def test_run_curate_decontamination_stage(ray_session, corpus_t):
    import ray.data

    from lsh_ray.pipelines.curate import run_curate
    from lsh_ray.stages.repetition import decontaminate

    cfg = PipelineConfig()
    # held-out benchmark = every 8th doc (planted near-dups sit on
    # adjacent rows, so the split plants corpus<->benchmark overlap)
    idx = np.arange(corpus_t.num_rows)
    bench_t = corpus_t.take(pa.array(idx[idx % 8 == 0]))
    corp_t = corpus_t.take(pa.array(idx[idx % 8 != 0]))

    res = run_curate(ray.data.from_arrow(corp_t), cfg,
                     benchmark_ds=ray.data.from_arrow(bench_t),
                     min_tokens=5, max_top_token_frac=1.0,
                     ngram_n=5, max_dirty_frac=0.0)
    m = res.metrics
    assert m["n_contaminated_dropped"] > 0
    assert m["n_cleaned"] == m["n_dedup_kept"] - m["n_contaminated_dropped"]
    assert res.cleaned.count() == m["n_cleaned"]

    # no survivor shares ANY 5-gram with the benchmark (max_dirty_frac=0)
    from lsh_ray.stages.normalize import normalize
    stats = decontaminate(
        res.cleaned, normalize(ray.data.from_arrow(bench_t), cfg),
        n=5).to_pandas()
    assert (stats["n_dirty_grams"] == 0).all()


def test_cli_curate_smoke(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from lsh_ray.fixtures import generate_corpus
    inp = tmp_path / "docs.parquet"
    pq.write_table(generate_corpus(300, seed=4)["documents"], inp)
    out = tmp_path / "curated"
    r = subprocess.run(
        [sys.executable, "-m", "lsh_ray.cli", "curate", "--input",
         str(inp), "--output", str(out), "--num-cpus", "4",
         "--min-tokens", "30"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    line = json.loads(r.stdout.strip().splitlines()[-1])
    assert line["n_cleaned"] > 0
    assert line["n_cleaned"] <= line["n_quality_kept"] <= 300
    m = json.loads((out / "metrics.json").read_text())
    assert m["n_cleaned"] == line["n_cleaned"]
    import glob
    n_rows = sum(pq.read_table(f).num_rows
                 for f in glob.glob(str(out / "cleaned" / "*")))
    assert n_rows == line["n_cleaned"]


def test_run_curate_line_dedup_stage(ray_session, corpus_t):
    import ray.data

    from lsh_ray.pipelines.curate import run_curate

    cfg = PipelineConfig()
    W = 12
    res = run_curate(ray.data.from_arrow(corpus_t), cfg, min_tokens=40,
                     max_top_token_frac=0.5, line_dedup_words=W)
    m = res.metrics
    assert 0 < m["n_line_dedup_kept"] <= m["n_dedup_kept"]
    assert m["n_cleaned"] == m["n_line_dedup_kept"]
    out = res.cleaned.to_pandas()
    assert len(out) == m["n_cleaned"]
    assert "n_lines_kept" in out.columns

    # global line uniqueness: no W-word segment occurs twice anywhere
    # in the cleaned corpus, and per-doc counts match the rebuilt text
    seen = set()
    for text, n_kept in zip(out["text"], out["n_lines_kept"]):
        lines = text.split("\n")
        assert len(lines) == n_kept >= 1
        for ln in lines:
            assert ln not in seen
            seen.add(ln)

    # kept lines are verbatim W-word windows of the pre-line-dedup text
    # (reassembly never fabricates content): re-derive each survivor's
    # expected line view from the same corpus through the same curate
    # stages sans line dedup, then check containment
    base = run_curate(ray.data.from_arrow(corpus_t), cfg, min_tokens=40,
                      max_top_token_frac=0.5).cleaned.to_pandas()
    orig = dict(zip(base["doc_id"], base["text"]))
    for doc_id, text in zip(out["doc_id"], out["text"]):
        words = orig[doc_id].split(" ")
        full = {" ".join(words[j:j + W]) for j in range(0, len(words), W)}
        assert set(text.split("\n")) <= full


def test_run_curate_redact_pii_stage(ray_session, corpus_t):
    import ray.data

    from lsh_ray.pipelines.curate import run_curate
    from lsh_ray.stages.text_stats import PII_PATTERNS

    # plant PII into the first 40 docs' text so the stage is non-vacuous
    txt = corpus_t["text"].to_pylist()
    for i in range(40):
        txt[i] += " reach me at u%d@mail.org or 10.0.%d.9" % (i, i % 256)
    planted = corpus_t.set_column(
        corpus_t.column_names.index("text"), "text",
        pa.array(txt, pa.string()))

    cfg = PipelineConfig()
    res = run_curate(ray.data.from_arrow(planted), cfg, min_tokens=40,
                     max_top_token_frac=0.5, redact_pii=True)
    m = res.metrics
    out = res.cleaned.to_pandas()
    assert len(out) == m["n_cleaned"]
    for name, _, _ in PII_PATTERNS:
        assert name in out.columns
        assert m[f"pii_{name}"] == int(out[name].sum())
    # some planted docs survive curation, so totals are non-vacuous
    assert m["pii_n_emails"] > 0 and m["pii_n_ips"] > 0
    assert m["pii_n_phones"] == 0
    # every surviving text is scrubbed: the patterns match nothing
    joined = "\n".join(out["text"])
    import re
    for _, pattern, _ in PII_PATTERNS:
        assert re.search(pattern, joined, flags=re.ASCII) is None
    assert "<EMAIL>" in joined and "<IP>" in joined
