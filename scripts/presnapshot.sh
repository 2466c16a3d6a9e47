#!/usr/bin/env bash
# Pre-snapshot TPU smoke gate (VERDICT r4 "Next round" #2).
#
# Round 4 shipped a default-path kernel change that only a real TPU could
# validate; the CPU suite stayed green while bench.py crashed at its
# second metric, so the round's driver artifact was rc=1 and every perf
# number existed only in prose.  Rule, now executable: a change that
# touches any default compute path (ops/, models/, frontend/, runtime/)
# must pass THIS script on the real chip before it lands in a snapshot.
#
#   bash scripts/presnapshot.sh            # full bench (authoritative)
#   bash scripts/presnapshot.sh --smoke    # fast: compile+run each default
#                                          # kernel path once at serving
#                                          # shapes, skip the timed loops
#
# Exit 0 = safe to snapshot. Any other exit = DO NOT snapshot a default
# flip; fix or revert first.
set -euo pipefail
cd "$(dirname "$0")/.."

export PYTHONPATH="/root/repo:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
export JAX_PLATFORMS=axon

if [[ "${1:-}" == "--smoke" ]]; then
    exec python scripts/tpu_smoke.py
fi

out=$(python bench.py | tail -1) || { echo "presnapshot: bench.py FAILED" >&2; exit 1; }
echo "$out"

# Field-set regression: every key present in the last committed bench
# artifact must be present in this run (values may move; fields may not
# silently vanish).
python - "$out" <<'EOF'
import glob, json, sys
run = json.loads(sys.argv[1])
arts = sorted(glob.glob("BENCH_r0*.json"))
prev = None
for a in reversed(arts):
    try:
        doc = json.load(open(a))
    except Exception:
        continue
    if doc.get("rc", 1) == 0 and isinstance(doc.get("parsed"), dict):
        prev = doc["parsed"]
        break
if prev is None:
    print("presnapshot: no prior rc=0 artifact; field-diff skipped")
    sys.exit(0)
missing = sorted(set(prev) - set(run))
if missing:
    print(f"presnapshot: FIELDS DISAPPEARED vs last good artifact: {missing}")
    sys.exit(1)
print(f"presnapshot: all {len(prev)} prior fields present "
      f"({len(set(run) - set(prev))} new)")
EOF
echo "presnapshot: OK"
