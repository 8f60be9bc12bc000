"""Stage-2-style MULTIMODAL joint train step on the real chip.

The reference's actual hot path (SURVEY §3.2): CLIP-ViT encode + token
splice -> LLM decoder -> joint LM loss + diffusion (vm) loss through the
SD-2.1-size UNet, one jitted step. Shapes chosen to fit one 16 GB v5e:
  - LLM 0.94B (h2048 L16), seq 512, batch 2
  - CLIP ViT-L/14-class tower (frozen, 224px, 256 patch embeddings)
  - SD-2.1-size UNet (frozen in stage-2 but backward flows THROUGH it to
    the dream-query hidden states), images_dm 256px (latent 32x32)
  - 8-bit AdamW over the trainables (llm + projectors + dream queries)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench/train_step_mm.py
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
from dreamllm_tpu.models.sd.head import (
    SDHeadConfig, init_sd_head_params, make_head_loss_fn,
)
from dreamllm_tpu.models.sd.unet import UNetConfig
from dreamllm_tpu.models.sd.vae import VAEConfig
from dreamllm_tpu.train import (
    OptimizerConfig, init_train_state, make_optimizer, make_train_step,
)

B, S = 2, 512
IMG, IMG_DM = 224, 256

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
    # stage-2 recipe: CLIP tower and UNet/VAE frozen; LLM, projectors and
    # dream queries train (configs/stage2/base.py:40-99)
    frozen=("clip_vision_embedding/clip",),
)
head_cfg = SDHeadConfig(
    unet=UNetConfig(sample_size=IMG_DM // 8, dtype=jnp.bfloat16),
    vae=VAEConfig(),
    llm_hidden_size=cfg.llm.hidden_size,
    dtype=jnp.bfloat16,
)


def make_params(rng):
    k1, k2 = jax.random.split(rng)
    p = init_dreamllm_params(k1, cfg)
    p["sd_head"] = init_sd_head_params(k2, head_cfg)
    return p


params = jax.jit(make_params)(jax.random.PRNGKey(0))
n_total = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
mask = param_freeze_mask(params, cfg)
# stage-2 also freezes the diffusion UNet/VAE (vm loss still backprops
# through them into the dream-query states)
mask["sd_head"]["unet"] = jax.tree.map(lambda _: False, mask["sd_head"]["unet"])
mask["sd_head"]["vae"] = jax.tree.map(lambda _: False, mask["sd_head"]["vae"])
n_train = sum(int(np.prod(x.shape)) for x, m in zip(
    jax.tree.leaves(params), jax.tree.leaves(mask)) if m)
print(f"params: {n_total/1e9:.2f}B total, {n_train/1e9:.2f}B trainable")

tx = make_optimizer(
    OptimizerConfig(learning_rate=2e-5, schedule="constant", warmup_steps=0,
                    total_steps=1000, max_grad_norm=1.0, optimizer_8bit=True),
    trainable_mask=mask,
)
state = init_train_state(params, tx)
step = make_train_step(cfg, tx, head_loss_fn=make_head_loss_fn(head_cfg),
                       remat=True, use_flash=True, trainable_mask=mask)

st = cfg.special_tokens


def make_batch(seed):
    r = np.random.default_rng(seed)
    ids = r.integers(10, 31000, (B, S), dtype=np.int32)
    labels = ids.copy()
    # one image span (<im_start> 256x<im_patch> <im_end>) + one dream span
    # (<dream_start> 64x<im_patch> <dream_end>) per sample, builder layout
    img_pos, dream_pos = 1, 300
    for b in range(B):
        ids[b, img_pos] = st.im_start
        ids[b, img_pos + 1: img_pos + 257] = st.im_patch
        ids[b, img_pos + 257] = st.im_end
        labels[b, img_pos: img_pos + 258] = -100
        ids[b, dream_pos] = st.dream_start
        ids[b, dream_pos + 1: dream_pos + 65] = st.im_patch
        ids[b, dream_pos + 65] = st.dream_end
        labels[b, dream_pos + 1: dream_pos + 66] = -100  # only <dream_start> learnable
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "images": jnp.asarray(
            r.standard_normal((B, 1, IMG, IMG, 3), np.float32) * 0.5),
        "image_positions": jnp.full((B, 1), img_pos + 1, jnp.int32),
        "dream_positions": jnp.full((B, 1), dream_pos + 1, jnp.int32),
        "images_dm": jnp.asarray(
            r.standard_normal((B, 1, IMG_DM, IMG_DM, 3), np.float32).clip(-1, 1)),
    }


def run(seed):
    global state
    state, aux = step(state, make_batch(seed), jax.random.PRNGKey(seed))
    return float(aux["loss"])  # scalar fetch = sync


t0 = time.perf_counter()
loss0 = run(0)
print(f"compile+step0 {time.perf_counter()-t0:.1f}s  loss={loss0:.3f}", flush=True)
ts = []
for i in range(5):
    t0 = time.perf_counter()
    run(i + 1)
    ts.append(time.perf_counter() - t0)
ts.sort()
dt = ts[len(ts) // 2]
print(f"mm train step: {dt*1e3:.0f} ms -> {B*S/dt:.0f} text tok/s "
      f"(+ {B} images {B} dream targets per step; all {[round(t,3) for t in ts]})")
