#!/usr/bin/env bash
# COCO zero-shot FID protocol (reference scripts/eval/text2img/
# eval_coco_zero_shot_clip8_select.sh): 30k captions x 8 seeds, CLIP
# best-of-8 re-rank, FID vs fid_stats_mscoco256_val.npz.
# Drives dreamllm_tpu.eval.text2img.run_protocol; see that module for the
# pipeline_fn/clip_score_fn wiring to a trained checkpoint.
set -euo pipefail
cd "$(dirname "$0")/../.."
python - "$@" <<'PY'
import sys
print("wire run_protocol with your checkpoint; see dreamllm_tpu/eval/text2img.py docstring")
PY
