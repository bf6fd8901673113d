"""ANN recall-vs-cost sweep: knn_ivf (nprobe) and knn_lsh (n_pieces)
against brute-force ground truth on 100k+ deterministic clustered
vectors — the artifact backing BASELINE.md's ANN scale-path table.

Usage: python scripts/ann_recall_sweep.py [n_vectors] [dim] [n_queries]
Prints one markdown table; each row = one config's recall@10 and warm
wall seconds (measured on the same pinned Dataset, so read cost is
excluded and config cost differences are real).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_vectors(n: int, dim: int, n_clusters: int = 256,
                 seed: int = 42) -> np.ndarray:
    """Deterministic clustered corpus: unit-ish Gaussian clusters with
    sigma small enough that true neighbors are intra-cluster (the
    regime IVF/LSH assume) but with enough overlap to be non-trivial."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n)
    x = centers[assign] + 0.18 * rng.standard_normal((n, dim))
    return x.astype(np.float32)


def recall_at_k(truth: dict, got: dict) -> float:
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(truth[q]) for q in truth)
    return hits / total


def pairs_to_sets(df) -> dict:
    out: dict = {}
    if len(df) == 0:
        return out   # empty Dataset.to_pandas() drops columns
    for q, n in zip(df["query_id"], df["neighbor_id"]):
        out.setdefault(int(q), set()).add(int(n))
    return out


def main() -> None:
    import pyarrow as pa

    import ray
    import ray.data

    from lsh_ray.stages.similarity import (knn_brute_force, knn_ivf,
                                           knn_lsh)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    k = 10

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")

    vecs = make_vectors(n, dim)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), type=pa.float32()), dim),
    })).map_batches(lambda t: t, batch_format="pyarrow",
                    batch_size=8192).materialize()
    q_ids = np.arange(0, n, n // n_q, dtype=np.int64)[:n_q]
    q_vecs = vecs[q_ids].astype(np.float64)

    def run(fn, label):
        t0 = time.time()
        df = fn().to_pandas()
        wall = time.time() - t0
        return pairs_to_sets(df), wall, label

    truth, t_bf, _ = run(lambda: knn_brute_force(ds, q_vecs, q_ids, k=k),
                         "brute")
    rows = [("brute_force (ground truth)", 1.000, t_bf)]
    for nprobe in (1, 2, 4, 8, 16, 32):
        got, w, _ = run(lambda: knn_ivf(ds, q_vecs, q_ids, k=k,
                                        n_cells=64, nprobe=nprobe),
                        f"ivf{nprobe}")
        rows.append((f"knn_ivf n_cells=64 nprobe={nprobe}",
                     recall_at_k(truth, got), w))
    for pieces in (4, 8, 16):
        got, w, _ = run(lambda: knn_lsh(ds, q_vecs, q_ids, dim, k=k,
                                        n_pieces=pieces), f"lsh{pieces}")
        rows.append((f"knn_lsh n_pieces={pieces} (64-bit SRP)",
                     recall_at_k(truth, got), w))

    print(f"\nANN recall@{k} vs cost — {n} vectors, dim={dim}, "
          f"{n_q} queries, 32 CPUs, warm pinned dataset\n")
    print("| config | recall@10 | wall (s) | vs brute |")
    print("|---|---|---|---|")
    for name, r, w in rows:
        print(f"| {name} | {r:.3f} | {w:.2f} | {w / t_bf:.2f}x |")
    ray.shutdown()


if __name__ == "__main__":
    main()
