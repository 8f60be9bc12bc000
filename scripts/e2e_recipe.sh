#!/usr/bin/env bash
# Chained full-recipe end-to-end at toy scale, through the REAL CLI entry
# points — the TPU-native counterpart of the reference's documented 4-recipe
# workflow (projects/dreamllm/README.md:21-27 + scripts/train/dreamllm/*.sh
# + the checkpoint mixing of configs/stage2/base.py:44-48):
#
#   stage1-creation ─┐
#                    ├─ checkpoint MIX ─ stage2 interleaved ─ SFT ─┐
#   stage1-comprehension ─┘                                        │
#     interleaved generation + VQA-smoke + FID-protocol-smoke ◀────┘
#
# Runs on CPU by default (DREAMLLM_PLATFORM=cpu + an 8-device virtual mesh)
# so the chain is verifiable anywhere; unset DREAMLLM_PLATFORM to run each
# stage on the real chip. tests/test_e2e_recipe.py runs the same chain with
# per-stage assertions.
set -euo pipefail
cd "$(dirname "$0")/.."

export DREAMLLM_E2E_ROOT="${DREAMLLM_E2E_ROOT:-./runs/e2e}"
export DREAMLLM_PLATFORM="${DREAMLLM_PLATFORM:-cpu}"
if [ "$DREAMLLM_PLATFORM" = "cpu" ]; then
  export XLA_FLAGS="${XLA_FLAGS:---xla_force_host_platform_device_count=8}"
fi
CFG=projects/dreamllm/configs/e2e
ROOT="$DREAMLLM_E2E_ROOT"

echo "== stage 1a: creation-only pretraining =="
python -m projects.dreamllm.train --config_file $CFG/stage1_creation.py

echo "== stage 1b: comprehension-only pretraining =="
python -m projects.dreamllm.train --config_file $CFG/stage1_comprehension.py

echo "== stage 2: interleaved pretraining (mixes the two stage-1 checkpoints) =="
python -m projects.dreamllm.train --config_file $CFG/stage2_interleaved.py

echo "== stage 3: SFT (resumes whole-model from stage 2; NEFTune on) =="
python -m projects.dreamllm.train --config_file $CFG/sft.py

echo "== interleaved generation from the SFT params =="
python -m projects.dreamllm.inference --config_file $CFG/sft.py \
  +mode=interleaved +prompt="a story about a robot" \
  +max_new_tokens=32 +max_images=1 +num_inference_steps=2

echo "== VQA smoke on the SFT params =="
python - <<'PY'
# tiny synthetic VQA shard: 4 questions over 4 random PNGs
import json, os
import numpy as np
from PIL import Image

root = os.environ["DREAMLLM_E2E_ROOT"]
d = os.path.join(root, "eval_assets")
os.makedirs(d, exist_ok=True)
rng = np.random.default_rng(0)
samples = []
for i in range(4):
    Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
        os.path.join(d, f"img{i}.png"))
    samples.append({"id": i, "question": f"what is in image {i}?",
                    "image": f"img{i}.png", "answers": ["a pattern"] * 10})
with open(os.path.join(d, "vqa.json"), "w") as f:
    json.dump(samples, f)
PY
python -m projects.dreamllm.eval_vqa --config_file $CFG/sft.py \
  +task=vqav2 +data_json="$ROOT/eval_assets/vqa.json" \
  +image_root="$ROOT/eval_assets" +eval_batch_size=4 +max_new_tokens=8

echo "== FID-protocol smoke on the SFT params =="
python - <<'PY'
# reference FID stats from random noise images through the real InceptionV3
import json, os
import numpy as np

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

if os.environ.get("DREAMLLM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DREAMLLM_PLATFORM"])
from dreamllm_tpu.eval.fid import activation_statistics, init_inception_params
from dreamllm_tpu.eval.text2img import extract_inception_features

root = os.environ["DREAMLLM_E2E_ROOT"]
d = os.path.join(root, "eval_assets")
os.makedirs(d, exist_ok=True)
rng = np.random.default_rng(1)
ref = rng.random((8, 32, 32, 3)).astype("float32")
feats = extract_inception_features(init_inception_params(jax.random.PRNGKey(2)), ref, 8)
mu, sigma = activation_statistics(feats)
np.savez(os.path.join(d, "fid_ref.npz"), mu=mu, sigma=sigma)
with open(os.path.join(d, "captions.json"), "w") as f:
    json.dump(["a red square", "a blue circle", "a green dot", "a dog"], f)
PY
python -m projects.dreamllm.eval_t2i --config_file $CFG/sft.py \
  +captions_json="$ROOT/eval_assets/captions.json" \
  +fid_reference="$ROOT/eval_assets/fid_ref.npz" \
  +num_seeds=1 +num_inference_steps=2 +fid_image_size=32 +sample_batch_size=2 \
  +max_captions=4

echo "== e2e recipe complete: artifacts under $ROOT =="
