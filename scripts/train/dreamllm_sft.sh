#!/usr/bin/env bash
set -euo pipefail
cd "$(dirname "$0")/../.."
python -m projects.dreamllm.train \
  --config_file projects/dreamllm/configs/sft.py "$@"
