#!/usr/bin/env bash
# HEAR phase B: downstream probe training + scoring over cached embeddings
# (equivalent of the reference's eval_hear_metrics.sh driver).
# usage: eval_hear_metrics.sh <embeddings_dir> [grid]
set -euo pipefail

EMBED_DIR=$1
GRID=${2:-default}

python -m cacophony_tpu.hear.predictions_runner \
  --embeddings-dir "$EMBED_DIR" --grid "$GRID"
