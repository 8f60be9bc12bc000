#!/usr/bin/env bash
# VQA suite (reference scripts/eval/vqa/*.sh): task in {vqav2, okvqa, vizwiz,
# textvqa, docvqa, infovqa, pope, coco_caption, nocaps, mmbench, mmvet}
set -euo pipefail
cd "$(dirname "$0")/../.."
python -m projects.dreamllm.eval_vqa \
  --config_file "${CONFIG:-projects/dreamllm/configs/sft.py}" \
  "+task='${TASK:-vqav2}'" \
  "+data_json='${DATA_JSON:?set DATA_JSON}'" \
  "+image_root='${IMAGE_ROOT:-}'" "$@"
