"""COCO zero-shot FID evaluation entry point.

TPU-native equivalent of the reference's 4-phase driver
(omni/eval/text2img/ddp_sample_coco.py + eval_coco_zero_shot_clip8_select.sh):
    python -m projects.dreamllm.eval_t2i --config_file <model cfg> \
        captions_json=/path/captions.json \
        fid_reference=/path/fid_stats_mscoco256_val.npz \
        num_seeds=8 num_inference_steps=150 guidance_scale=2.0

Phases: sample num_seeds images per caption via the dream pipeline →
CLIP best-of-N re-rank → InceptionV3 FID vs the reference stats. Work is
sharded across hosts by jax.process_index striding.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.config import LazyArgumentParser, default_setup
from dreamllm_tpu.eval.fid import init_inception_params
from dreamllm_tpu.eval.text2img import T2IProtocol, lncoco_protocol, run_protocol
from dreamllm_tpu.models.clip import clip_pooled_output, clip_preprocess, clip_vision_forward
from dreamllm_tpu.models.clip_text import (
    CLIPTextConfig,
    clip_similarity,
    clip_text_forward,
    init_clip_text_params,
)
from dreamllm_tpu.models.dreamllm import encode_prompt_embeds, unconditional_dream_hidden
from dreamllm_tpu.models.sd.head import sd_head_pipeline
from dreamllm_tpu.train.checkpoints import latest_checkpoint, load_params
from dreamllm_tpu.utils.logging import get_logger

from projects.dreamllm.train import build_model_cfg, make_tokenizer

logger = get_logger("projects.dreamllm.eval_t2i")


def main(argv=None):
    args, config = LazyArgumentParser().parse(argv)
    run_dir = default_setup(args, config)
    cfg, head_cfg = build_model_cfg(config)
    tokenizer = make_tokenizer(config, cfg)

    from dreamllm_tpu.models.dreamllm import init_dreamllm_params
    from dreamllm_tpu.models.sd.head import init_sd_head_params

    def make_params(rng):
        p = init_dreamllm_params(rng, cfg)
        p["sd_head"] = init_sd_head_params(jax.random.fold_in(rng, 1), head_cfg)
        return p

    params = jax.jit(make_params)(jax.random.PRNGKey(0))
    ck = latest_checkpoint(config.get("checkpoint", config["trainer"]["output_dir"]))
    if ck:
        params = load_params(ck, like=params)
        logger.info("loaded %s", ck)

    if config.get("captions_jsonl"):
        # LN-COCO jsonl ({image_id, caption} rows, one random caption/image)
        from dreamllm_tpu.eval.text2img import load_lncoco_captions

        captions = load_lncoco_captions(
            config["captions_jsonl"], seed=config.get("caption_seed", 0),
            max_images=config.get("max_captions", 30000),
        )
    else:
        with open(config["captions_json"]) as f:
            captions = json.load(f)  # list[str] or [{"caption": ...}]
        if captions and isinstance(captions[0], dict):
            captions = [c["caption"] for c in captions]
        captions = captions[: config.get("max_captions", 30000)]

    # protocol=lncoco → 100 steps / guidance 3.0 / 1 seed (ddp_sample_lncoco.py)
    lncoco = config.get("protocol", "coco") == "lncoco"
    base = lncoco_protocol() if lncoco else T2IProtocol()
    protocol = T2IProtocol(
        num_seeds=config.get("num_seeds", base.num_seeds),
        num_inference_steps=config.get("num_inference_steps", base.num_inference_steps),
        guidance_scale=config.get("guidance_scale", base.guidance_scale),
        image_size=config.get("fid_image_size", 256),
        batch_size=config.get("sample_batch_size", 4),
    )

    uncond = unconditional_dream_hidden(params, cfg)

    def pipeline_fn(caps, rng):
        conds = jnp.concatenate(
            [encode_prompt_embeds(params, cfg, tokenizer, c) for c in caps], axis=0
        )
        return sd_head_pipeline(
            params["sd_head"], head_cfg, conds,
            jnp.broadcast_to(uncond, conds.shape), rng,
            height=protocol.image_size, width=protocol.image_size,
            num_inference_steps=protocol.num_inference_steps,
            guidance_scale=protocol.guidance_scale,
            deepcache_interval=config.get("deepcache_interval", 1),
        )

    # CLIP scorer for best-of-N selection. Preferred: a full HF CLIPModel dir
    # (``clip_model_dir``) — vision+text towers, projections, logit_scale —
    # matching the reference's CLIP-L/14 re-ranker. Fallbacks: a random text
    # tower (plumbing tests) or no re-rank (keep seed 0).
    if config.get("clip_model_dir"):
        from dreamllm_tpu.convert.hf_clip import convert_clip_model_dir

        (vcfg, vparams), (tcfg, tparams), vproj, tproj, logit_scale = (
            convert_clip_model_dir(config["clip_model_dir"])
        )
        # The text tower needs CLIP's own BPE tokenizer (BOS=49406/EOT=49407,
        # EOT-argmax pooling) — the LLM tokenizer's ids would be garbage here.
        try:
            from transformers import AutoTokenizer

            clip_tok = AutoTokenizer.from_pretrained(config["clip_model_dir"])
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(
                f"clip_model_dir={config['clip_model_dir']} has no loadable CLIP "
                "tokenizer (tokenizer.json / vocab+merges); the re-ranker cannot "
                "score captions with the LLM tokenizer. Add the tokenizer files "
                "or use use_random_clip_text=True for plumbing tests."
            ) from e

        def clip_score_fn(images, caps):
            pix = clip_preprocess(jnp.asarray(images), vcfg.image_size)
            last = clip_vision_forward(vparams, vcfg, pix)
            img_emb = clip_pooled_output(vparams, vcfg, last)
            enc = clip_tok(
                list(caps), padding="max_length", truncation=True,
                max_length=tcfg.max_position_embeddings,
            )
            ids = np.asarray(enc["input_ids"], np.int64)
            _, txt_emb = clip_text_forward(tparams, tcfg, jnp.asarray(ids))
            sims = clip_similarity(img_emb, txt_emb, vproj, tproj, logit_scale)
            return np.asarray(jnp.diagonal(sims))
    elif config.get("use_random_clip_text"):
        tcfg = CLIPTextConfig(**config.get("clip_text_config", {}))
        tparams = init_clip_text_params(jax.random.PRNGKey(1), tcfg)
        vproj = jnp.eye(cfg.vision.hidden_size, tcfg.projection_dim)
        tproj = jnp.eye(tcfg.hidden_size, tcfg.projection_dim)

        def clip_score_fn(images, caps):
            pix = clip_preprocess(jnp.asarray(images), cfg.vision.image_size)
            last = clip_vision_forward(params["clip_vision_embedding"]["clip"], cfg.vision, pix)
            img_emb = clip_pooled_output(params["clip_vision_embedding"]["clip"], cfg.vision, last)
            ids = np.zeros((len(caps), 32), np.int64)
            for i, c in enumerate(caps):
                t = tokenizer.encode(c)[:32]
                ids[i, : len(t)] = t
            _, txt_emb = clip_text_forward(tparams, tcfg, jnp.asarray(ids % tcfg.vocab_size))
            sims = clip_similarity(img_emb, txt_emb, vproj, tproj)
            return np.asarray(jnp.diagonal(sims))
    else:
        def clip_score_fn(images, caps):  # no re-ranker: keep seed 0
            n = len(images)
            return np.arange(n) % 1 - np.arange(n)  # monotone-decreasing → argmax = first

    inception = init_inception_params(jax.random.PRNGKey(2))
    out = run_protocol(
        pipeline_fn, clip_score_fn, inception, captions,
        config["fid_reference"], protocol,
        save_dir=run_dir,
    )
    logger.info("FID: %.4f over %d captions (rank %d)", out["fid"], out["n"], jax.process_index())
    with open(f"{run_dir}/fid_rank{jax.process_index()}.json", "w") as f:
        json.dump(out, f)
    return out


if __name__ == "__main__":
    main()
