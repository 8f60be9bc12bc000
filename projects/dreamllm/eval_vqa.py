"""VQA/caption/MMBench evaluation entry point.

TPU-native equivalent of the reference's eval driver (omni/eval/vqa/
eval_dreamllm.py): loads a checkpoint, shards the dataset across hosts,
runs the harness, merges shards, prints the metric.

    python -m projects.dreamllm.eval_vqa --config_file <model cfg> \
        task="vqav2" data_json=/path/samples.json image_root=/path/images

``data_json``: list of {question, image (path), answers|label|references, id}.
"""

from __future__ import annotations

import json
import os

import jax

from dreamllm_tpu.config import LazyArgumentParser, default_setup
from dreamllm_tpu.eval.vqa import merge_prediction_shards, run_vqa, shard_for_process
from dreamllm_tpu.train.checkpoints import latest_checkpoint, load_params
from dreamllm_tpu.utils.image import load_image
from dreamllm_tpu.utils.logging import get_logger

from projects.dreamllm.train import build_model_cfg, make_tokenizer

logger = get_logger("projects.dreamllm.eval_vqa")


def main(argv=None):
    args, config = LazyArgumentParser().parse(argv)
    run_dir = default_setup(args, config)
    cfg, head_cfg = build_model_cfg(config)
    tokenizer = make_tokenizer(config, cfg)

    from dreamllm_tpu.models.dreamllm import init_dreamllm_params

    params = jax.jit(lambda r: init_dreamllm_params(r, cfg))(jax.random.PRNGKey(0))
    ck = latest_checkpoint(config.get("checkpoint", config["trainer"]["output_dir"]))
    if ck:
        loaded = load_params(ck)
        for k in params:
            if k in loaded:
                params[k] = loaded[k]
        logger.info("loaded %s", ck)

    with open(config["data_json"]) as f:
        raw = json.load(f)
    image_root = config.get("image_root", "")

    def hydrate(s):
        img = load_image(os.path.join(image_root, s["image"])).astype("float32") / 255.0
        return {**s, "image": img}

    shard = shard_for_process(raw)
    samples = (hydrate(s) for s in shard)

    out_path = os.path.join(run_dir, f"preds_rank{jax.process_index()}.json")
    result = run_vqa(
        params, cfg, tokenizer, samples,
        task=config.get("task", "vqav2"),
        max_new_tokens=config.get("max_new_tokens", 32),
        batch_size=config.get("eval_batch_size", 8),
        num_beams=config.get("num_beams", 1),
        out_path=out_path,
    )
    logger.info("rank %d score: %.4f (%d samples)", jax.process_index(),
                result["score"], len(result["predictions"]))

    from dreamllm_tpu.utils.comm import all_gather_objects, is_main_process, synchronize

    synchronize("eval_done")
    paths = all_gather_objects(out_path)
    if is_main_process():
        merged = merge_prediction_shards(paths, os.path.join(run_dir, "preds_merged.json"))
        logger.info("MERGED %s: score=%.4f n=%d", merged["task"], merged["score"], merged["n"])
        print(json.dumps(merged))
    return result


if __name__ == "__main__":
    main()
