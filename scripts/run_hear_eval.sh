#!/usr/bin/env bash
# HEAR phase A: embedding extraction over a task list
# (equivalent of the reference's run_hear_eval.sh driver).
# usage: run_hear_eval.sh <model_path> <tasks_dir> <embeddings_dir> [tasklist]
set -euo pipefail

MODEL_PATH=$1
TASKS_DIR=$2
EMBED_DIR=$3
TASKLIST=${4:-"$(dirname "$0")/../cacophony_tpu/hear/tasklists/hear_all_tasks.txt"}

grep -v '^#' "$TASKLIST" | while read -r task batch_size max_len; do
  [ -z "$task" ] && continue
  python -m cacophony_tpu.hear.runner \
    --model-path "$MODEL_PATH" \
    --tasks-dir "$TASKS_DIR" \
    --task "$task" \
    --embeddings-dir "$EMBED_DIR" \
    --batch-size "$batch_size" \
    --max-audio-len "$max_len"
done
