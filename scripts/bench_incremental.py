"""Incremental-dedup cost benchmark: what does a daily delta cost vs
re-running the whole corpus?

The rolling-corpus claim behind ``run_dedup_incremental`` (see
``lsh_ray/pipelines/incremental.py``) is that adding a shard to an
already-deduped corpus costs ~O(delta) per-byte compute plus streaming
scans of the base signatures — NOT a full re-run. This script measures
that on the bench corpus in one process:

1. full run over base+delta (the non-incremental daily cost),
2. base run with checkpoint (paid once, amortized),
3. incremental run of the delta against the checkpoint (the daily cost
   this feature buys), asserting its merged cluster count matches the
   full run's.

Split rule: md5 bucket >= 'e6' of url (~10% delta, deterministic, same
bucketing as stages/sampling.py; the bench corpus is CC-shaped with url
as the key — no doc_id column until normalize derives it) — dup
partners land on both sides so cross-shard pairs are exercised.

Usage:
  RAY_GRAFT_CPUS=32 GRAFT_BENCH_DOCS=220000 python scripts/bench_incremental.py
Prints one JSON line. Follow the BASELINE.md noise protocol: gate on
/proc/pressure/cpu avg10, archive samples in scaling_samples_r4.jsonl.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psi_avg10() -> float:
    try:
        with open("/proc/pressure/cpu") as f:
            return float(f.readline().split("avg10=")[1].split()[0])
    except Exception:
        return -1.0


def main() -> None:
    import ray
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("GRAFT_BENCH_DOCS", "220000"))
    seed = int(os.environ.get("GRAFT_BENCH_SEED", "42"))
    psi0 = psi_avg10()
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False

    import pyarrow as pa

    from lsh_ray.config import PipelineConfig
    from lsh_ray.fixtures import write_corpus
    from lsh_ray.pipelines.dedup_pipeline import run_dedup
    from lsh_ray.pipelines.incremental import run_dedup_incremental
    from lsh_ray.sources.readers import read_documents_for_dedup
    from lsh_ray.stages.sampling import _key_buckets

    corpus = f"/tmp/lshray_bench_corpus_{n_docs}_{seed}"
    if not os.path.isdir(corpus):
        write_corpus(corpus, n_docs=n_docs, seed=seed, n_shards=16)
    for f in glob.glob(corpus + "/documents/*"):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    cfg = PipelineConfig(signature_concurrency=max(2, ncpu // 2),
                         join_num_partitions=max(16, ncpu))
    n_blocks = max(64, n_docs // 400)

    def docs():
        return read_documents_for_dedup(corpus + "/documents",
                                        override_num_blocks=n_blocks)

    def side(want_delta: bool):
        def f(t: pa.Table) -> pa.Table:
            b = _key_buckets(t["url"].to_pylist())
            mask = (b >= "e6") if want_delta else (b < "e6")
            return t.filter(pa.array(mask))
        return f

    # the production input shape: base and delta each arrive as their
    # own parquet files (a crawl delivers today's shard as new files) —
    # the split itself is corpus prep, not part of any measured leg
    split_dir = corpus + "_split_e6"
    if not (os.path.isdir(split_dir + "/base")
            and os.path.isdir(split_dir + "/delta")):
        import ray.data  # noqa: F401  (docs() already imported readers)
        docs().map_batches(side(False), batch_format="pyarrow",
                           zero_copy_batch=True).write_parquet(
            split_dir + "/base")
        docs().map_batches(side(True), batch_format="pyarrow",
                           zero_copy_batch=True).write_parquet(
            split_dir + "/delta")
    for f in glob.glob(split_dir + "/*/*"):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    def read_side(name: str, blocks: int):
        return read_documents_for_dedup(split_dir + "/" + name,
                                        override_num_blocks=blocks)

    # 1. the non-incremental daily cost: full run over base + delta
    t0 = time.time()
    full = run_dedup(docs(), cfg)
    full_clusters = full.clusters.count()
    t_full = time.time() - t0

    # 2. the amortized base (paid once per corpus, not per delta)
    ckpt = tempfile.mkdtemp(prefix="lshray_incbench_")
    t0 = time.time()
    run_dedup(read_side("base", n_blocks), cfg, checkpoint_dir=ckpt)
    t_base = time.time() - t0

    # 3. the incremental daily cost
    delta = read_side("delta", max(16, n_blocks // 10))
    t0 = time.time()
    inc = run_dedup_incremental(delta, ckpt, cfg)
    n_new = inc.new_signatures.count()
    inc_clusters = inc.clusters.count()
    t_inc = time.time() - t0

    out = {
        "metric": "incremental_dedup_cost",
        "num_cpus": ncpu,
        "bench_docs": n_docs,
        "delta_docs": n_new,
        "delta_frac": round(n_new / n_docs, 4),
        "sec_full_rerun": round(t_full, 2),
        "sec_base_once": round(t_base, 2),
        "sec_incremental": round(t_inc, 2),
        "speedup_vs_rerun": round(t_full / t_inc, 2),
        "delta_docs_per_sec": round(n_new / t_inc, 1),
        "clusters_full": full_clusters,
        "clusters_incremental_merged": inc_clusters,
        "clusters_match": bool(full_clusters == inc_clusters),
        "psi_at_start": psi0,
        "psi_at_end": psi_avg10(),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
