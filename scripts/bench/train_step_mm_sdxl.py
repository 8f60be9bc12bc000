"""SDXL-stage-1-style MULTIMODAL joint train step on the real chip.

The SDXL analogue of scripts/bench/train_step_mm.py: CLIP-ViT encode +
token splice -> LLM decoder -> joint LM + diffusion loss through the
SDXL-base-size UNet (dual conditioning: per-token context via the SD
projector + pooled text_embeds via the global projector + add_time_ids
micro-conditioning). Reference recipe being timed:
projects/dreamllm_sdxl/configs/stage1/base.py (UNet/VAE/CLIP frozen,
gradients flow through the UNet into the dream-query states).

Shape ladder (one 16 GB v5e): tries 1024px (the SDXL training
resolution) first, falls back to 768/512 px; batch 2, seq 512.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench/train_step_mm_sdxl.py
"""
import time

import bench
bench._enable_compile_cache()
import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.models.clip import CLIPVisionConfig
from dreamllm_tpu.models.dreamllm import (
    DreamLLMConfig, init_dreamllm_params, param_freeze_mask,
)
from dreamllm_tpu.models.llama import LlamaConfig
from dreamllm_tpu.models.sd.sdxl import (
    SDXLHeadConfig, encode_latents, init_sdxl_head_params,
    make_sdxl_head_loss_fn, sdxl_head_loss,
)
from dreamllm_tpu.models.sd.unet import sdxl_unet_config
from dreamllm_tpu.models.sd.vae import VAEConfig
from dreamllm_tpu.train import (
    OptimizerConfig, init_train_state, make_optimizer, make_train_step,
)

S = 512
IMG = 224


def build(img_dm: int, B: int):
    cfg = DreamLLMConfig(
        llm=LlamaConfig(
            vocab_size=32064, hidden_size=2048, intermediate_size=5504,
            num_hidden_layers=16, num_attention_heads=16, num_key_value_heads=16,
            max_position_embeddings=S, dtype=jnp.bfloat16,
        ),
        vision=CLIPVisionConfig(
            hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
            num_attention_heads=16, image_size=IMG, patch_size=14,
            dtype=jnp.bfloat16,
        ),
        image_embed_len=256,
        n_dream_queries=64,
        frozen=("clip_vision_embedding/clip",),
    )
    head_cfg = SDXLHeadConfig(
        unet=sdxl_unet_config(sample_size=img_dm // 8, dtype=jnp.bfloat16),
        vae=VAEConfig(scaling_factor=0.13025),
        llm_hidden_size=cfg.llm.hidden_size,
        dtype=jnp.bfloat16,
    )

    def make_params(rng):
        k1, k2 = jax.random.split(rng)
        p = init_dreamllm_params(k1, cfg)
        p["sd_head"] = init_sdxl_head_params(k2, head_cfg)
        return p

    params = jax.jit(make_params)(jax.random.PRNGKey(0))
    n_total = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    mask = param_freeze_mask(params, cfg)
    # SDXL stage-1 freezes UNet + VAE (vm loss backprops through them)
    mask["sd_head"]["unet"] = jax.tree.map(lambda _: False, mask["sd_head"]["unet"])
    mask["sd_head"]["vae"] = jax.tree.map(lambda _: False, mask["sd_head"]["vae"])
    n_train = sum(int(np.prod(x.shape)) for x, m in zip(
        jax.tree.leaves(params), jax.tree.leaves(mask)) if m)
    print(f"dm={img_dm}px  params: {n_total/1e9:.2f}B total, "
          f"{n_train/1e9:.2f}B trainable", flush=True)

    tx = make_optimizer(
        OptimizerConfig(learning_rate=2e-3, schedule="constant", warmup_steps=0,
                        total_steps=1000, max_grad_norm=1.0, optimizer_8bit=True),
        trainable_mask=mask,
    )
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, head_loss_fn=make_sdxl_head_loss_fn(head_cfg),
                           remat=True, use_flash=True, trainable_mask=mask)
    # split-VAE program: the frozen 1024px VAE encoder is a large slice of
    # the joint graph that this env's remote compiler chokes on; encoding
    # latents in their own compiled program (exact same math — the loss's
    # latents= path, parity-tested in tests/test_sdxl.py) shrinks the big
    # graph. Timed INSIDE the step wall-clock (it is part of the train cost).
    enc = jax.jit(lambda p, imgs, r: encode_latents(p, head_cfg, imgs, r))
    return cfg, state, step, enc


def make_batch(cfg, img_dm, B, seed):
    st = cfg.special_tokens
    r = np.random.default_rng(seed)
    ids = r.integers(10, 31000, (B, S), dtype=np.int32)
    labels = ids.copy()
    img_pos, dream_pos = 1, 300
    for b in range(B):
        ids[b, img_pos] = st.im_start
        ids[b, img_pos + 1: img_pos + 257] = st.im_patch
        ids[b, img_pos + 257] = st.im_end
        labels[b, img_pos: img_pos + 258] = -100
        ids[b, dream_pos] = st.dream_start
        ids[b, dream_pos + 1: dream_pos + 65] = st.im_patch
        ids[b, dream_pos + 65] = st.dream_end
        labels[b, dream_pos + 1: dream_pos + 66] = -100
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "images": jnp.asarray(
            r.standard_normal((B, 1, IMG, IMG, 3), np.float32) * 0.5),
        "image_positions": jnp.full((B, 1), img_pos + 1, jnp.int32),
        "dream_positions": jnp.full((B, 1), dream_pos + 1, jnp.int32),
        "images_dm": jnp.asarray(
            r.standard_normal((B, 1, img_dm, img_dm, 3), np.float32).clip(-1, 1)),
        # SDXL micro-conditioning: (orig_h, orig_w, crop_t, crop_l, tgt_h, tgt_w)
        "add_time_ids": jnp.tile(
            jnp.asarray([[[img_dm, img_dm, 0, 0, img_dm, img_dm]]], jnp.float32),
            (B, 1, 1)),
    }


def build_split2(img_dm: int, B: int):
    """TWO-program train step for shapes whose fused graph crashes this
    environment's remote compiler (1024px: fused crashed in r4, split-VAE
    fused crashed in r5, but each HALF compiles — the UNet-only backward
    measured a clean 229.7 s compile).

    Thin wrapper over the library implementation
    (``dreamllm_tpu.train.split_step.make_split_train_step`` — P_enc /
    P_fwd / P_head(remat_unet) / P_llm(dot-trick cotangent injection) /
    P_opt; gradient parity with the fused step in
    ``tests/test_split_step.py``). Measured 1146–1682 ms/step @1024px b1.
    """
    from dreamllm_tpu.train import make_split_train_step

    cfg = DreamLLMConfig(
        llm=LlamaConfig(
            vocab_size=32064, hidden_size=2048, intermediate_size=5504,
            num_hidden_layers=16, num_attention_heads=16, num_key_value_heads=16,
            max_position_embeddings=S, dtype=jnp.bfloat16,
        ),
        vision=CLIPVisionConfig(
            hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
            num_attention_heads=16, image_size=IMG, patch_size=14,
            dtype=jnp.bfloat16,
        ),
        image_embed_len=256,
        n_dream_queries=64,
        frozen=("clip_vision_embedding/clip",),
    )
    head_cfg = SDXLHeadConfig(
        unet=sdxl_unet_config(sample_size=img_dm // 8, dtype=jnp.bfloat16),
        vae=VAEConfig(scaling_factor=0.13025),
        llm_hidden_size=cfg.llm.hidden_size,
        dtype=jnp.bfloat16,
    )

    def make_params(rng):
        k1, k2 = jax.random.split(rng)
        p = init_dreamllm_params(k1, cfg)
        p["sd_head"] = init_sdxl_head_params(k2, head_cfg)
        return p

    params = jax.jit(make_params)(jax.random.PRNGKey(0))
    n_total = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    mask = param_freeze_mask(params, cfg)
    mask["sd_head"]["unet"] = jax.tree.map(lambda _: False, mask["sd_head"]["unet"])
    mask["sd_head"]["vae"] = jax.tree.map(lambda _: False, mask["sd_head"]["vae"])
    n_train = sum(int(np.prod(x.shape)) for x, m in zip(
        jax.tree.leaves(params), jax.tree.leaves(mask)) if m)
    print(f"dm={img_dm}px  params: {n_total/1e9:.2f}B total, "
          f"{n_train/1e9:.2f}B trainable (two-program step)", flush=True)

    tx = make_optimizer(
        OptimizerConfig(learning_rate=2e-3, schedule="constant", warmup_steps=0,
                        total_steps=1000, max_grad_norm=1.0, optimizer_8bit=True),
        trainable_mask=mask,
    )
    state = init_train_state(params, tx)
    step = make_split_train_step(
        cfg, tx, head_cfg=head_cfg, trainable_mask=mask,
        use_flash=True, remat=True, remat_unet=True,
    )
    enc = jax.jit(lambda hp, imgs, r: encode_latents(hp, head_cfg, imgs, r))
    return cfg, state, step, enc


import gc
import os

# Ladder override, e.g. SDXL_MM_LADDER="768:1" (bench.py passes this so the
# artifact run skips the 1024px attempt, which reliably crashes this
# environment's remote compiler after ~6 minutes — the full SDXL joint
# graph is too big for the tunnel compile service, same class as the
# monolithic-UNet limitation in bench_unet's docstring).
_ladder = ((1024, 1), (768, 1), (512, 2), (512, 1))
if os.environ.get("SDXL_MM_LADDER"):
    _ladder = tuple(
        (int(p.split(":")[0]), int(p.split(":")[1]))
        for p in os.environ["SDXL_MM_LADDER"].split(","))

state = None
# mode per rung: "fused" (one jitted step), "split" (fused step, VAE encode
# in its own program), "split2" (two-program step — the 1024px path: fused
# crashed the remote compiler in r4, split-VAE fused in r5, but the
# UNet-backward program alone compiles). Override via e.g.
# SDXL_MM_LADDER="1024:1:split2,768:1".
_default = ((1024, 1, "split2"), (768, 1, "fused"), (512, 2, "fused"),
            (512, 1, "fused"))
if os.environ.get("SDXL_MM_LADDER"):
    def _mode(p):
        if "split2" in p:
            return "split2"
        return "split" if "split" in p else "fused"

    _default = tuple(
        (int(p.split(":")[0]), int(p.split(":")[1]), _mode(p))
        for p in os.environ["SDXL_MM_LADDER"].split(","))
_ladder = _default

for img_dm, B, mode in _ladder:
    # free the previous rung COMPLETELY before allocating the next: a failed
    # 768px attempt otherwise pins ~8 GB of params and OOMs every rung after
    state = None
    gc.collect()
    try:
        if mode == "split2":
            cfg, state, step, enc = build_split2(img_dm, B)
        else:
            cfg, state, step, enc = build(img_dm, B)
        split_vae = mode == "split"

        def run(seed):
            global state
            batch = make_batch(cfg, img_dm, B, seed)
            key = jax.random.PRNGKey(seed)
            if split_vae:
                batch["latents"] = enc(state.params["sd_head"],
                                       batch["images_dm"], jax.random.fold_in(key, 1))
            state, aux = step(state, batch, key)
            return float(aux["loss"])

        t0 = time.perf_counter()
        loss0 = run(0)
        print(f"compile+step0 {time.perf_counter()-t0:.1f}s  loss={loss0:.3f}",
              flush=True)
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            run(i + 1)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        dt = ts[len(ts) // 2]
        tag = {"split": " (split-vae)", "split2": " (two-program)"}.get(mode, "")
        print(f"sdxl mm train step @{img_dm}px b{B}: {dt*1e3:.0f} ms -> "
              f"{B*S/dt:.0f} text tok/s (+ {B} images {B} sdxl diffusion "
              f"targets per step{tag}; all {[round(t,3) for t in ts]})", flush=True)
        break
    except Exception as e:
        print(f"dm={img_dm}px b{B} failed: {str(e)[:300]}", flush=True)
        continue
