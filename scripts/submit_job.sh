#!/usr/bin/env bash
# Launch the dedup pipeline as a Ray job on a running multi-node
# cluster — the production path the north rule names (`ray job submit`
# on fixed N-node / 4N-node clusters). The driver runs inside the
# cluster and attaches with --address auto, so the streaming executor
# schedules blocks across every node; nothing in the pipeline assumes
# single-node locality (all exchanges go through the object store).
#
# Usage:
#   RAY_ADDRESS=http://<head>:8265 ./scripts/submit_job.sh \
#       s3://bucket/crawl/*.parquet s3://bucket/dedup_out [extra flags]
#
# In this sandbox there is no multi-node cluster; the same entrypoint
# is exercised single-node by tests (tests/test_cli.py) and the
# N-vs-4N scaling criterion is evidenced by `bench.py --scaling`
# (fresh ray.init at two CPU counts — see BASELINE.md).
set -euo pipefail

INPUT=${1:?input parquet path}
OUTPUT=${2:?output dir}
shift 2

exec ray job submit \
    --working-dir "$(dirname "$0")/.." \
    -- python -m lsh_ray.cli dedup \
    --input "$INPUT" --output "$OUTPUT" --address auto \
    --checkpoint "$OUTPUT/checkpoint" --distributed-cc "$@"
