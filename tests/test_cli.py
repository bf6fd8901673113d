"""CLI surface: each dedup-family subcommand runs end-to-end in a fresh
process (its own Ray session, per the driver contract) and writes
parquet output."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _run(args: list[str]) -> dict:
    proc = subprocess.run(
        [sys.executable, "-m", "lsh_ray.cli", *args],
        cwd=REPO, capture_output=True, text=True, check=True)
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_cli_ngram_subcommand(tmp_path):
    out = str(tmp_path / "ngram")
    r = _run(["ngram", "--input", f"{SF}/documents.parquet",
              "--output", out, "--ngram-n", "3", "--threshold", "0.7",
              "--num-cpus", "4"])
    assert r["pairs"] > 0
    tbl = pq.read_table(out)
    assert set(tbl.column_names) == {"url_a", "url_b", "jaccard"}
    assert tbl.num_rows == r["pairs"]


def test_cli_exact_subcommand(tmp_path):
    out = str(tmp_path / "exact")
    r = _run(["exact", "--input", f"{SF}/documents.parquet",
              "--output", out, "--num-cpus", "4"])
    assert r["groups"] > 0
    tbl = pq.read_table(out)
    assert {"text_hash", "n_docs", "rep_doc_id"} <= set(tbl.column_names)
