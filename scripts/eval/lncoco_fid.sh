#!/usr/bin/env bash
# LN-COCO (Localized Narratives) FID protocol (reference
# omni/eval/text2img/ddp_sample_lncoco.py:29-42 launch recipe): captions from
# lncoco_captions_val2017.jsonl (one random caption per image), 100 steps,
# guidance 3.0, single seed, FID vs the LN-COCO val stats.
set -euo pipefail
cd "$(dirname "$0")/../.."
python -m projects.dreamllm.eval_t2i \
  --config_file "${CONFIG:-projects/dreamllm/configs/sft.py}" \
  "+protocol='lncoco'" \
  "+captions_jsonl='${CAPTIONS:-data/coco_fid_files/lncoco_captions_val2017.jsonl}'" \
  "+fid_reference='${FID_STATS:-data/fid_stats_lncoco256_val.npz}'" \
  "+max_captions=${N_SAMPLES:-30000}" "$@"
