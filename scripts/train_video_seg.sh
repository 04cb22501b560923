#!/usr/bin/env bash
# Launcher wrapper for the video-seg trainer (counterpart of the reference's
# scripts/train_video_seg.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python train_video_seg.py \
  --dataset "${DATASET:-./data/water_train}" \
  --total-epochs "${EPOCHS:-100}" \
  --batch-size "${BATCH:-1}" \
  "$@"
