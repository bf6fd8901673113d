"""Per-stage Parquet checkpoints with config-hash lineage + metrics.

Generalizes the reference's artifact-existence resume
(``scripts/tfidf_exec.py:76-105``: a step is skipped when its output file
exists) into something safe at scale:

- a stage's output directory carries a ``_MANIFEST.json`` recording the
  pipeline config hash, stage name, row count, and the part files present
  (per-partition lineage);
- a re-run with the SAME config hash re-reads the checkpoint instead of
  recomputing (kill + re-run => identical outputs, completed stages
  skipped);
- a run with a DIFFERENT config hash invalidates and recomputes — the
  reference would silently reuse stale artifacts;
- the manifest is written AFTER the data (write_parquet completes first),
  so a killed run leaves no manifest and the stage re-runs — partial
  output is overwritten, never trusted.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import ray.data

_MANIFEST = "_MANIFEST.json"

# On-disk schema version: bump when a checkpointed column's TYPE changes
# so stale checkpoints from older builds are invalidated even under an
# identical config hash. v2 = minhash lanes stored as uint32 (top halves
# of the 64-bit lane mix, lsh_ray/stages/minhash.py) — v1 wrote uint64.
SCHEMA_VERSION = 2


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, _MANIFEST)


def is_complete(out_dir: str, config) -> bool:
    """True iff a finished checkpoint with a matching config hash exists."""
    try:
        with open(_manifest_path(out_dir)) as f:
            m = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return False
    if m.get("config_hash") != config.config_hash():
        return False
    if m.get("schema_version") != SCHEMA_VERSION:
        return False
    # per-partition lineage: every recorded part file must still exist
    return all(os.path.exists(os.path.join(out_dir, p)) for p in m.get("parts", []))


def checkpoint_dataset(ds, out_dir: str, config, stage: str | None = None,
                       empty_schema=None):
    """Write ``ds`` to ``out_dir`` (or reuse a complete checkpoint) and
    return a Dataset re-read from Parquet.

    ``empty_schema``: the stage's pyarrow schema, used when ``ds`` has
    ZERO rows — Ray then reports ``schema() is None`` and writes no
    parquet file, so the schema must come from the caller for the
    checkpoint to round-trip."""
    stage = stage or os.path.basename(out_dir.rstrip("/"))
    if not is_complete(out_dir, config):
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)  # stale / partial output is never trusted
        t0 = time.time()
        ds.write_parquet(out_dir)
        os.makedirs(out_dir, exist_ok=True)
        parts = sorted(p for p in os.listdir(out_dir) if p.endswith(".parquet"))
        if not parts:
            # a ZERO-ROW dataset writes no file at all (Ray 2.49 sink:
            # "0 rows ... written", not even the directory) — persist an
            # explicit empty part so the checkpoint re-reads with the
            # stage's schema instead of crashing
            import pyarrow as pa
            import pyarrow.parquet as pq
            arrow_schema = empty_schema if empty_schema is not None \
                else getattr(ds.schema(), "base_schema", None)
            if not isinstance(arrow_schema, pa.Schema):
                raise ValueError(
                    f"cannot checkpoint empty dataset at {out_dir}: "
                    "schema unavailable (pass empty_schema)")
            pq.write_table(arrow_schema.empty_table(),
                           os.path.join(out_dir, "empty-0.parquet"))
            parts = ["empty-0.parquet"]
        reread = ray.data.read_parquet(out_dir)
        manifest = {
            "stage": stage,
            "config_hash": config.config_hash(),
            "schema_version": SCHEMA_VERSION,
            "parts": parts,
            "num_parts": len(parts),
            "rows": reread.count(),
            "wall_s": round(time.time() - t0, 3),
            "written_at": time.time(),
        }
        with open(_manifest_path(out_dir), "w") as f:
            json.dump(manifest, f, indent=1)
    from lsh_ray.sources.readers import strip_schema_metadata
    return strip_schema_metadata(ray.data.read_parquet(out_dir))


def read_manifest(out_dir: str) -> dict:
    with open(_manifest_path(out_dir)) as f:
        return json.load(f)
