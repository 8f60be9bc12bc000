#!/usr/bin/env bash
# Stage-1 comprehension-only pretraining (reference scripts/train/dreamllm/
# run_stage1_comprehension_only.sh: LLaVA-style alignment — frozen LLM+CLIP,
# train the vision projector on caption data).
set -euo pipefail
cd "$(dirname "$0")/../.."
python -m projects.dreamllm.train \
  --config_file projects/dreamllm/configs/stage1_comprehension.py "$@"
