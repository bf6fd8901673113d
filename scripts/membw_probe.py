"""Memory-bandwidth scaling probe for the single-box scaling analysis.

The north rule's N -> 4N criterion is about adding NODES — each with its
own memory channels. On this sandbox's single box, adding CPUs shares
one set of channels, so any bandwidth-bound stage has a hardware ceiling
on its CPU-scaling ratio that no code change can lift. This probe
measures that ceiling directly: K independent processes each stream a
buffer far larger than LLC through ``np.copyto`` (read + write, the same
access pattern as Arrow batch transforms), and we report aggregate GB/s
at K = 2, 8, 32 plus the derived 2->8 and 8->32 scaling efficiencies.

Usage: python scripts/membw_probe.py [--levels 2,8,32] [--seconds 6]
Prints one JSON line. Run in a quiet window (PSI-gated) like the
scaling samples; pure numpy, no Ray.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np

BUF_MB = 256  # far beyond any LLC; forces DRAM traffic


def _worker(seconds: float, out_q: mp.Queue) -> None:
    src = np.ones(BUF_MB * 1024 * 1024 // 8, dtype=np.float64)
    dst = np.empty_like(src)
    # warm both buffers (page-fault once, measure steady state)
    np.copyto(dst, src)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        np.copyto(dst, src)
        n += 1
    elapsed = time.perf_counter() - t0
    # each pass reads BUF and writes BUF: 2x bytes moved
    out_q.put(2 * n * src.nbytes / elapsed)


def measure(k: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(seconds, q)) for _ in range(k)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,8,32")
    ap.add_argument("--seconds", type=float, default=6.0)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    result: dict = {"metric": "memory_bandwidth_scaling",
                    "buf_mb_per_proc": BUF_MB, "seconds": args.seconds}
    agg = {}
    for k in levels:
        agg[k] = measure(k, args.seconds)
        result[f"gbps_{k}"] = round(agg[k] / 1e9, 2)
    for lo, hi in zip(levels, levels[1:]):
        eff = (agg[hi] / agg[lo]) / (hi / lo)
        result[f"efficiency_{lo}_to_{hi}"] = round(eff, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
