#!/usr/bin/env bash
# Arm the GENUINE sed_eval differential if the environment ever gains the
# package (VERDICT r4 next-round #9).
#
# tests/test_sed_differential.py runs a three-way differential between
# cacophony_tpu/hear/score.py, the from-spec shim in
# third_party/sed_eval_shim/, and — when importable — the real sed_eval
# package (reference dependency: /root/reference/src/eval/heareval/
# score.py:183-286 wraps sed_eval.sound_event.SegmentBasedMetrics /
# EventBasedMetrics).  This helper attempts the install and records the
# outcome either way, so the skip reason is a logged fact rather than a
# silent importorskip.
set -uo pipefail
cd "$(dirname "$0")/.."

LOG=cacophony_tpu/third_party/sed_eval_shim/INSTALL_ATTEMPT.log
{
    echo "date: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
    if python -c "import sed_eval" 2>/dev/null; then
        echo "status: already importable"
    elif pip install --quiet sed_eval 2>&1; then
        echo "status: installed"
    else
        echo "status: UNAVAILABLE (pip failed — this build environment has"
        echo "  no package egress; the three-way differential runs against"
        echo "  the from-spec shim instead: tests/test_sed_differential.py)"
    fi
    python - <<'EOF'
try:
    import sed_eval
    print(f"sed_eval: {sed_eval.__version__}")
except Exception as e:
    print(f"import: {type(e).__name__}: {e}")
EOF
} | tee "$LOG"

echo
echo "Running the differential with whatever is available:"
python -m pytest tests/test_sed_differential.py -q
