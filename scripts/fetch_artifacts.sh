#!/usr/bin/env bash
# Fetch + verify the released Cacophony checkpoints, then run the
# golden-number regression (reference src/eval/README.md:16-46).
#
# The checkpoints are published on Google Drive (reference README.md:53):
#   https://drive.google.com/drive/folders/1lZHJuClyn4FK_Fhn92ylQqyAd40uJv0Y
# Direct fetch needs `gdown` (or a browser); this script downloads when it
# can, always verifies the published MD5 gates, and fails loudly otherwise.
#
# Usage:  scripts/fetch_artifacts.sh [ARTIFACT_DIR]   (default: ./artifacts)
# Then:   python -m cacophony_tpu.eval --task zs \
#             --ckpt_path "$ARTIFACT_DIR/Cacophony.ckpt" \
#             --expect cacophony_tpu/eval/goldens/reference_zs.json
set -euo pipefail

ARTIFACT_DIR="${1:-artifacts}"
DRIVE_FOLDER="https://drive.google.com/drive/folders/1lZHJuClyn4FK_Fhn92ylQqyAd40uJv0Y"

# Published MD5 gates — reference README.md:61 and :70.
declare -A MD5S=(
  [AudioMAE.ckpt]=3a8a7778a5e2013ceb4a418e1504d3d8
  [Cacophony.ckpt]=bb6aa4b4e8e90ea3595021bf8233add0
)

mkdir -p "$ARTIFACT_DIR"
status=0

for name in "${!MD5S[@]}"; do
  path="$ARTIFACT_DIR/$name"
  if [[ ! -f "$path" ]]; then
    if command -v gdown >/dev/null 2>&1; then
      echo "fetching $name from the published Drive folder..."
      gdown --folder "$DRIVE_FOLDER" -O "$ARTIFACT_DIR" || true
    fi
  fi
  if [[ ! -f "$path" ]]; then
    echo "MISSING $path — download $name from:"
    echo "  $DRIVE_FOLDER"
    echo "into $ARTIFACT_DIR/ and re-run."
    status=1
    continue
  fi
  got=$(md5sum "$path" | cut -d' ' -f1)
  want="${MD5S[$name]}"
  if [[ "$got" != "$want" ]]; then
    echo "MD5 MISMATCH $path: got $got, want $want (published gate)"
    status=1
  else
    echo "OK $path (md5 $got)"
  fi
done

if [[ $status -ne 0 ]]; then
  echo "artifact verification FAILED — golden-number regression cannot run."
  exit $status
fi

echo
echo "Artifacts verified. Golden-number regression commands:"
echo "  python -m cacophony_tpu.eval --task zs --ckpt_path $ARTIFACT_DIR/Cacophony.ckpt \\"
echo "      --expect cacophony_tpu/eval/goldens/reference_zs.json"
echo "  python -m cacophony_tpu.eval --task ar --dataset audiocaps --ckpt_path $ARTIFACT_DIR/Cacophony.ckpt \\"
echo "      --expect cacophony_tpu/eval/goldens/reference_ar_audiocaps.json"
echo "  python -m cacophony_tpu.eval --task ar --dataset clotho --ckpt_path $ARTIFACT_DIR/Cacophony.ckpt \\"
echo "      --expect cacophony_tpu/eval/goldens/reference_ar_clotho.json"
echo "(dataset roots come from CACOPHONY_*_DIR env vars — see eval/processors.py)"
