#!/usr/bin/env bash
# COCO zero-shot FID protocol (reference scripts/eval/text2img/
# eval_coco_zero_shot_clip8_select.sh): 30k captions x 8 seeds x 150 steps,
# CLIP best-of-8 re-rank, FID vs fid_stats_mscoco256_val.npz.
set -euo pipefail
cd "$(dirname "$0")/../.."
python -m projects.dreamllm.eval_t2i \
  --config_file "${CONFIG:-projects/dreamllm/configs/sft.py}" \
  "+captions_json='${CAPTIONS:-data/coco_captions_30k.json}'" \
  "+fid_reference='${FID_STATS:-data/fid_stats_mscoco256_val.npz}'" \
  "+num_seeds=8" "+num_inference_steps=150" "+guidance_scale=2.0" "$@"
