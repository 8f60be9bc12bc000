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
    fused crashed in r5, but the UNet-only backward compiles fine alone —
    measured 229.7 s compile).

    Decomposition (exact same math as the fused step, one extra LLM
    forward):
      P_enc : images_dm -> sampled+scaled VAE latents (frozen VAE)
      P_fwd : LLM forward -> (cond, uncond) dream-query hidden states
      P_head: vm loss fwd+bwd w.r.t (cond, uncond, projector params) over
              the SDXL UNet — the big graph, ALONE in its program
      P_llm : LLM fwd+bwd of [w_lm*lm + w_vm*(<cond, d_cond> + <uncond,
              d_uncond>)] — the dot-trick injects the head cotangent, so
              grads equal the fused step's d_lm + w_vm * Jᵀ d_vm
      P_opt : masked 8-bit-AdamW update over the merged grads
    """
    import optax

    from dreamllm_tpu.models.dreamllm import (
        extract_dream_hidden, masked_cross_entropy, multimodal_embed,
        unconditional_dream_hidden,
    )
    from dreamllm_tpu.models.llama import llama_forward, llama_logits
    from dreamllm_tpu.train.step import TrainState

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
    llm_cfg = cfg.llm

    enc = jax.jit(lambda hp, imgs, r: encode_latents(hp, head_cfg, imgs, r))

    @jax.jit
    def p_fwd(params, batch):
        embeds = multimodal_embed(
            params, cfg, batch["input_ids"],
            images=batch.get("images"),
            image_positions=batch.get("image_positions"),
            dream_positions=batch.get("dream_positions"),
        )
        out = llama_forward(params["llm"], llm_cfg, inputs_embeds=embeds,
                            use_flash=True)
        cond, valid = extract_dream_hidden(
            out["last_hidden_state"], batch["dream_positions"], cfg.n_dream_queries)
        uncond = unconditional_dream_hidden(params, cfg)
        return cond, uncond, valid

    @jax.jit
    def p_head(head_params, latents, cond, uncond, valid, atids, rng, bm_dummy):
        frozen = {k: jax.lax.stop_gradient(head_params[k]) for k in ("unet", "vae")}

        def f(c, u, proj):
            hp = {**frozen, **proj}
            return sdxl_head_loss(
                hp, head_cfg, bm_dummy, c, u, valid, rng,
                add_time_ids=atids, latents=latents,
                remat_unet=True,  # 128x128-latent activations don't fit saved
            )[0]

        proj0 = {k: head_params[k] for k in ("projector", "global_projector")}
        vm, (d_cond, d_uncond, d_proj) = jax.value_and_grad(
            f, argnums=(0, 1, 2))(cond, uncond, proj0)
        return vm, d_cond, d_uncond, d_proj

    @jax.jit
    def p_llm(params, batch, d_cond, d_uncond, rng):
        # differentiate ONLY the trainable LLM-side subtree: a full-tree
        # value_and_grad would materialize ~5.3 GB of zero grads for the
        # frozen UNet/VAE/CLIP tower (that, not compute, OOM'd the first
        # split2 attempt)
        def f(tp):
            p = {
                **params,
                "llm": tp["llm"],
                "dream_embedding": tp["dream_embedding"],
                "clip_vision_embedding": {
                    **params["clip_vision_embedding"],
                    "projector": tp["clip_projector"],
                },
            }
            embeds = multimodal_embed(
                p, cfg, batch["input_ids"],
                images=batch.get("images"),
                image_positions=batch.get("image_positions"),
                dream_positions=batch.get("dream_positions"),
            )
            out = llama_forward(p["llm"], llm_cfg, inputs_embeds=embeds,
                                use_flash=True, remat=True)
            hidden = out["last_hidden_state"]
            logits = llama_logits(p["llm"], llm_cfg, hidden)
            lm = masked_cross_entropy(logits, batch["labels"])
            cond, _ = extract_dream_hidden(
                hidden, batch["dream_positions"], cfg.n_dream_queries)
            uncond = unconditional_dream_hidden(p, cfg, remat=True)
            inj = (jnp.sum(cond.astype(jnp.float32) * d_cond.astype(jnp.float32))
                   + jnp.sum(uncond.astype(jnp.float32) * d_uncond.astype(jnp.float32)))
            return (cfg.loss_weight_lm * lm
                    + cfg.loss_weight_vm * inj.astype(jnp.float32)), lm

        tp0 = {"llm": params["llm"], "dream_embedding": params["dream_embedding"],
               "clip_projector": params["clip_vision_embedding"]["projector"]}
        (_, lm), g = jax.value_and_grad(f, has_aux=True)(tp0)
        return lm, g

    from functools import partial as _partial

    @_partial(jax.jit, donate_argnums=(0,))
    def p_opt(state, g_tp, d_proj):
        # rebuild the full-tree grads (zeros for frozen leaves — the masked
        # optimizer never touches them) inside the donated update program
        g = jax.tree.map(jnp.zeros_like, state.params)
        g["llm"] = g_tp["llm"]
        g["dream_embedding"] = g_tp["dream_embedding"]
        g["clip_vision_embedding"] = {
            **g["clip_vision_embedding"], "projector": g_tp["clip_projector"],
        }
        g["sd_head"] = {**g["sd_head"], **d_proj}
        updates, opt_state = tx.update(g, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, opt_state)

    def step(state, batch, key):
        hp = state.params["sd_head"]
        latents = enc(hp, batch["images_dm"], jax.random.fold_in(key, 1))
        cond, uncond, valid = p_fwd(state.params, batch)
        bm_dummy = jnp.zeros(batch["images_dm"].shape[:2] + (1, 1, 3),
                             jnp.bfloat16)  # loss reads only b, m from it
        vm, d_cond, d_uncond, d_proj = p_head(
            hp, latents, cond, uncond, valid,
            batch["add_time_ids"], jax.random.fold_in(key, 2), bm_dummy)
        lm, g = p_llm(state.params, batch, d_cond, d_uncond,
                      jax.random.fold_in(key, 3))
        new_state = p_opt(state, g, d_proj)
        return new_state, {"loss": cfg.loss_weight_lm * lm + cfg.loss_weight_vm * vm}

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
