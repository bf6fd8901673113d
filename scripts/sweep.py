"""Corpus-size evaluation sweep — rebuild of the reference's eval harness
(``scripts/plot_all_exec.py:21-31``: MAE/RMSE over a corpus-size grid;
``code_samples/test_searches.py``: retrieval smoke runs).

For each corpus size, runs the retrieval pipeline over a planted
golden-pair fixture and reports MRR, top-1 accuracy, and the MAE/RMSE of
the per-pair exact-Jaccard estimate vs the planted similarity — one JSON
line per size, then a summary table.

Usage: python scripts/sweep.py [--sizes 500,1000,2000] [--queries 25]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def run_one(n_docs: int, n_queries: int, seed: int) -> dict:
    import numpy as np
    import pyarrow as pa

    import ray.data

    from lsh_ray.config import DEFAULT_CONFIG
    from lsh_ray.fixtures import _make_vocab, _mutate, _zipf_doc
    from lsh_ray.functions.metrics import (mean_absolute_error,
                                           root_mean_squared_error)
    from lsh_ray.pipelines.search import evaluate_mrr, search

    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng)
    texts = [" ".join(_zipf_doc(rng, vocab, int(rng.integers(80, 400))))
             for _ in range(n_docs)]
    corpus = ray.data.from_arrow(pa.table({
        "url": [f"doc://{i}" for i in range(n_docs)],
        "text": texts, "lang": ["en"] * n_docs}))
    golden, rates = {}, {}
    q_urls, q_texts = [], []
    for qi in range(n_queries):
        src = int(rng.integers(0, n_docs))
        rate = float(rng.choice([0.01, 0.03, 0.05]))
        mut = _mutate(rng, texts[src].split(" "), rate, vocab)
        q_urls.append(f"query://{qi}")
        q_texts.append(" ".join(mut))
        golden[f"query://{qi}"] = f"doc://{src}"
        rates[f"query://{qi}"] = rate
    queries = ray.data.from_arrow(pa.table({
        "url": q_urls, "text": q_texts, "lang": ["en"] * n_queries}))

    t0 = time.time()
    res = search(corpus, queries, DEFAULT_CONFIG, top_k=10)
    wall = time.time() - t0
    mrr = evaluate_mrr(res, golden)
    top1 = res[res["rank"] == 1]
    acc = (sum(golden.get(q) == d for q, d in
               zip(top1.query_url, top1.doc_url)) / n_queries
           if n_queries else 0.0)
    # similarity-estimate error on the golden hits: a mutation rate r
    # leaves ~(1 - r)^k of k-shingles intact -> expected Jaccard
    est, expect = [], []
    k = DEFAULT_CONFIG.shingle_k
    for q, d in golden.items():
        hit = res[(res.query_url == q) & (res.doc_url == d)]
        if len(hit):
            est.append(float(hit.jaccard.iloc[0]))
            p = (1.0 - rates[q]) ** k
            expect.append(p / (2.0 - p))  # |A∩B|/|A∪B| under random edits
    est, expect = (list(map(float, est)), list(map(float, expect)))
    mae = mean_absolute_error(est, expect) if est else None
    rmse = root_mean_squared_error(est, expect) if est else None
    return {"n_docs": n_docs, "n_queries": n_queries, "wall_s": round(wall, 2),
            "mrr": round(mrr, 4), "top1_acc": round(acc, 4),
            "jaccard_mae": round(mae, 4) if mae is not None else None,
            "jaccard_rmse": round(rmse, 4) if rmse is not None else None}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="500,1000,2000")
    ap.add_argument("--queries", type=int, default=25)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False,
              "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)

    rows = []
    for s in (int(x) for x in args.sizes.split(",")):
        row = run_one(s, args.queries, args.seed)
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(f"{'n_docs':>8} {'wall_s':>7} {'mrr':>6} {'top1':>6} "
          f"{'mae':>7} {'rmse':>7}")
    for r in rows:
        print(f"{r['n_docs']:>8} {r['wall_s']:>7} {r['mrr']:>6} "
              f"{r['top1_acc']:>6} {r['jaccard_mae']:>7} "
              f"{r['jaccard_rmse']:>7}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
