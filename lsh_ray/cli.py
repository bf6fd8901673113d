"""CLI entry point — the rebuild of the reference's ``main.py`` command
surface (``main.py:48-182``: create_index / search / serialize flags become
dedup-pipeline stages and config flags).

Usage:
    python -m lsh_ray.cli dedup --input DIR --output DIR [--checkpoint DIR]
        [--num-perms 128] [--bands 32] [--rows 4] [--jaccard 0.8]
        [--seed 42] [--limit N] [--num-cpus N] [--distributed-cc]
    python -m lsh_ray.cli signatures --input DIR --output DIR ...
    python -m lsh_ray.cli exact|simhash|ngram --input DIR --output DIR ...
    python -m lsh_ray.cli knn --input embeddings.parquet --output DIR
        [--k 10] [--queries 5]
    python -m lsh_ray.cli curate --input DIR --output DIR
        [--benchmark PARQUET] [--min-tokens 10] [--max-top-token-frac 0.5]
        [--ngram-n 5] [--max-dirty-frac 0.0]
    python -m lsh_ray.cli gen-corpus --output DIR --docs 50000 [--seed 42]

Owns its Ray session (guarded init), per the driver contract: library code
never calls ray.init, the CLI does.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_config_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--num-perms", type=int, default=128)
    p.add_argument("--bands", type=int, default=32)
    p.add_argument("--rows", type=int, default=4)
    p.add_argument("--shingle-k", type=int, default=5)
    p.add_argument("--jaccard", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--limit", type=int, default=None,
                   help="corpus truncation (reference --num_audios analog)")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--address", default="local",
                   help="Ray cluster address: 'local' starts a "
                        "single-node session; 'auto' attaches to the "
                        "running cluster (the ray-job-submit driver "
                        "path, see scripts/submit_job.sh)")


def _config(args):
    from lsh_ray.config import PipelineConfig
    return PipelineConfig(seed=args.seed, shingle_k=args.shingle_k,
                          num_perms=args.num_perms, bands=args.bands,
                          rows_per_band=args.rows,
                          jaccard_threshold=args.jaccard)


def _init_ray(args) -> None:
    import logging

    import ray
    if not ray.is_initialized():
        address = getattr(args, "address", "local")
        kwargs = {"address": address, "logging_level": "ERROR"}
        if address == "local":
            # single-node session: size it ourselves
            kwargs["include_dashboard"] = False
            if args.num_cpus:
                kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    for name in ("ray.data._internal.execution.streaming_executor_state",
                 "ray.data._internal.arrow_ops.transform_pyarrow"):
        logging.getLogger(name).setLevel(logging.ERROR)
    from ray.data import DataContext
    # per-operator CPU reservation starves many-operator DAGs (2.2x
    # measured on the dedup pipeline); disable for the CLI session
    DataContext.get_current().op_resource_reservation_enabled = False


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="lsh_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("dedup", help="full near-duplicate pipeline")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--base", default=None,
                   help="prior run's checkpoint dir: dedup --input as a "
                        "NEW shard against that corpus (incremental; "
                        "base work is never redone)")
    p.add_argument("--distributed-cc", action="store_true",
                   default=None)  # None = auto by edge count
    p.add_argument("--write-kept", action="store_true",
                   help="also write OUTPUT/kept: the cleaned-corpus "
                        "keep list (signed urls minus non-representative "
                        "cluster members) as partitioned parquet")
    _add_config_flags(p)

    p = sub.add_parser("signatures", help="build the signature table only")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    _add_config_flags(p)

    p = sub.add_parser("exact", help="exact dedup (content-hash groups)")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    _add_config_flags(p)

    p = sub.add_parser("simhash", help="SimHash near-dup pairs")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--hamming-max", type=int, default=3)
    _add_config_flags(p)

    p = sub.add_parser("ngram", help="exact n-gram Jaccard near-dup pairs"
                       " (prefix-filter index, no sketch)")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--ngram-n", type=int, default=3)
    p.add_argument("--threshold", type=float, default=0.7)
    _add_config_flags(p)

    p = sub.add_parser("search", help="retrieve similar corpus docs per"
                       " query doc (reference main.py:209-237 search flow;"
                       " --matching-algorithm = the -ma kernel dispatch)")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--queries", default=None,
                   help="query documents parquet; default: plant the "
                        "first --n-queries corpus docs as queries")
    p.add_argument("--n-queries", type=int, default=5)
    p.add_argument("--top-k", type=int, default=20,
                   help="reference SHOW_TOP_X (constants.py:3)")
    p.add_argument("--matching-algorithm", "-m", dest="matching_algorithm",
                   default="jaccard",
                   choices=["jaccard", "cosine", "manhattan", "ls",
                            "bals", "ra", "ktra"])
    p.add_argument("--confidence-threshold", type=float, default=None,
                   help="clip gate value (reference lsh.py:385-412)")
    p.add_argument("--threshold-file", default=None,
                   help="JSON artifact from save_confidence_threshold "
                        "(reference generated_files/confidence_threshold"
                        ".txt analog); overrides --confidence-threshold")
    _add_config_flags(p)

    p = sub.add_parser("knn", help="brute-force cosine top-k over an"
                       " embeddings parquet (vec_id, embedding)")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--queries", type=int, default=5,
                   help="use the first N vec_ids as query vectors")
    _add_config_flags(p)

    p = sub.add_parser("curate", help="end-to-end training-data curation:"
                       " quality filter -> near-dup dedup -> keep-list"
                       " -> optional benchmark decontamination")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--benchmark", default=None,
                   help="held-out eval-set parquet: survivors sharing "
                        "n-grams with it beyond --max-dirty-frac are "
                        "dropped")
    p.add_argument("--min-tokens", type=int, default=10)
    p.add_argument("--max-top-token-frac", type=float, default=0.5)
    p.add_argument("--ngram-n", type=int, default=5)
    p.add_argument("--max-dirty-frac", type=float, default=0.0)
    p.add_argument("--line-dedup-words", type=int, default=None,
                   help="enable line-level exact dedup between the "
                        "doc keep-list and decontamination: survivors "
                        "are rebuilt from lines (this many words each) "
                        "that first occur in them")
    p.add_argument("--redact-pii", action="store_true",
                   help="final scrubbing scan: replace emails/IPv4s/"
                        "phone numbers in surviving text with sentinel "
                        "tokens; per-doc count columns + corpus totals "
                        "in the metrics")
    _add_config_flags(p)

    p = sub.add_parser("gen-corpus", help="deterministic synthetic corpus")
    p.add_argument("--output", required=True)
    p.add_argument("--docs", type=int, default=50_000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--shards", type=int, default=16)

    args = parser.parse_args(argv)

    if args.cmd == "gen-corpus":
        from lsh_ray.fixtures import write_corpus
        write_corpus(args.output, n_docs=args.docs, seed=args.seed,
                     n_shards=args.shards)
        print(json.dumps({"corpus": args.output, "docs": args.docs}))
        return 0

    import ray

    import ray.data
    _init_ray(args)
    cfg = _config(args)
    t0 = time.time()
    try:
        from lsh_ray.sources.readers import read_documents_for_dedup
        docs = read_documents_for_dedup(args.input)
        if args.limit:
            docs = docs.limit(args.limit)
        if args.cmd == "signatures":
            from lsh_ray.stages.minhash import signatures
            from lsh_ray.stages.normalize import normalize
            from lsh_ray.stages.shingle import shingle
            signatures(shingle(normalize(docs, cfg), cfg),
                       cfg).write_parquet(args.output)
            print(json.dumps({"output": args.output,
                              "wall_s": round(time.time() - t0, 2)}))
            return 0
        if args.cmd == "exact":
            from lsh_ray.stages.dedup import exact_dup_groups
            out = exact_dup_groups(docs)
            out.write_parquet(args.output)
            print(json.dumps({"output": args.output,
                              "groups": out.count(),
                              "wall_s": round(time.time() - t0, 2)}))
            return 0
        if args.cmd == "simhash":
            import dataclasses

            from lsh_ray.stages.dedup import simhash_near_dup_pairs
            from lsh_ray.stages.minhash import signatures
            from lsh_ray.stages.normalize import normalize
            from lsh_ray.stages.shingle import shingle
            scfg = dataclasses.replace(
                cfg, simhash_hamming_max=args.hamming_max)
            sigs = signatures(shingle(normalize(docs, scfg), scfg),
                              scfg).materialize()
            pairs = simhash_near_dup_pairs(sigs, scfg)
            pairs.write_parquet(args.output)
            print(json.dumps({"output": args.output,
                              "pairs": pairs.count(),
                              "wall_s": round(time.time() - t0, 2)}))
            return 0
        if args.cmd == "ngram":
            from lsh_ray.stages.dedup import ngram_jaccard_pairs
            pairs = ngram_jaccard_pairs(docs, cfg, n=args.ngram_n,
                                        threshold=args.threshold)
            pairs.write_parquet(args.output)
            print(json.dumps({"output": args.output,
                              "pairs": pairs.count(),
                              "wall_s": round(time.time() - t0, 2)}))
            return 0
        if args.cmd == "search":
            import pyarrow as pa
            import pyarrow.compute as pc

            from lsh_ray.pipelines.search import (load_confidence_threshold,
                                                  search)
            if args.queries:
                qds = read_documents_for_dedup(args.queries)
            else:
                # plant the first N corpus docs as queries with distinct
                # identity (url rewrite) — the fixture-free smoke path
                from lsh_ray.stages.normalize import normalize_batch
                n_q = args.n_queries

                def plant(t: pa.Table) -> pa.Table:
                    # normalize first: html-only corpora (no 'text'
                    # column) get the same extraction fallback as every
                    # other subcommand; text corpora pass through
                    # byte-identical (test_normalize M13 invariant)
                    nt = normalize_batch(t)
                    return pa.table({
                        "url": pc.binary_join_element_wise(
                            pa.array(["query://"] * nt.num_rows),
                            nt["url"], ""),
                        "text": nt["text"],
                    })
                qds = docs.limit(n_q).map_batches(
                    plant, batch_format="pyarrow", zero_copy_batch=True)
            thr = args.confidence_threshold
            if args.threshold_file:
                thr = load_confidence_threshold(args.threshold_file, cfg)
            res = search(docs, qds, cfg, top_k=args.top_k,
                         confidence_threshold=thr,
                         kernel=args.matching_algorithm)
            import os
            os.makedirs(args.output, exist_ok=True)
            out_path = os.path.join(args.output, "results.parquet")
            import pyarrow.parquet as pq
            pq.write_table(pa.Table.from_pandas(res, preserve_index=False),
                           out_path)
            print(json.dumps({
                "output": out_path, "rows": len(res),
                "queries": int(res["query_url"].nunique()) if len(res)
                else 0,
                "matching_algorithm": args.matching_algorithm,
                "wall_s": round(time.time() - t0, 2)}))
            return 0
        if args.cmd == "knn":
            import numpy as np

            from lsh_ray.stages.similarity import knn_brute_force
            head = docs.limit(args.queries).to_pandas()
            q = np.stack([np.asarray(v, dtype=np.float64)
                          for v in head["embedding"]])
            out = knn_brute_force(docs, q, head["vec_id"].to_numpy(),
                                  k=args.k)
            out.write_parquet(args.output)
            print(json.dumps({"output": args.output,
                              "rows": out.count(),
                              "wall_s": round(time.time() - t0, 2)}))
            return 0
        if args.cmd == "curate":
            import os

            from lsh_ray.pipelines.curate import run_curate
            bench = (read_documents_for_dedup(args.benchmark)
                     if args.benchmark else None)
            cres = run_curate(
                docs, cfg, benchmark_ds=bench,
                min_tokens=args.min_tokens,
                max_top_token_frac=args.max_top_token_frac,
                ngram_n=args.ngram_n, max_dirty_frac=args.max_dirty_frac,
                line_dedup_words=args.line_dedup_words,
                redact_pii=args.redact_pii,
                checkpoint_dir=args.checkpoint)
            cres.cleaned.write_parquet(args.output + "/cleaned")
            metrics = dict(cres.metrics)
            metrics["wall_s"] = round(time.time() - t0, 2)
            os.makedirs(args.output, exist_ok=True)
            with open(os.path.join(args.output, "metrics.json"), "w") as f:
                json.dump(metrics, f, indent=1)
            print(json.dumps({"output": args.output, **metrics}))
            return 0
        if getattr(args, "base", None):
            from lsh_ray.pipelines.incremental import run_dedup_incremental
            res = run_dedup_incremental(
                docs, args.base, cfg, checkpoint_dir=args.checkpoint,
                distributed_cc=args.distributed_cc)
        else:
            from lsh_ray.pipelines.dedup_pipeline import run_dedup
            res = run_dedup(docs, cfg, checkpoint_dir=args.checkpoint,
                            distributed_cc=args.distributed_cc)
        res.clusters.write_parquet(args.output + "/clusters")
        res.verified.write_parquet(args.output + "/verified_pairs")
        metrics = res.metrics()
        if getattr(args, "write_kept", False):
            from lsh_ray.stages.cluster import kept_after_dedup
            kept = kept_after_dedup(res).materialize()
            kept.write_parquet(args.output + "/kept")
            metrics["kept_docs"] = kept.count()
        metrics["wall_s"] = round(time.time() - t0, 2)
        import os
        with open(os.path.join(args.output, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=1)
        print(json.dumps({"output": args.output, **metrics}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
