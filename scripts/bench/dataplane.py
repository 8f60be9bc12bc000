"""Input-pipeline bench: can the data plane feed the chip?

Measures, on this host, the REAL input path the training CLIs use —
native C++ tar/JPEG loader (data/native_loader.py) → DreamLLMBuilder
(stage-2 interleaved layout: dream span + image span per image) →
pinned-shape collate → data/prefetch.py overlap — against the demand side:
the 0.94B stage-2 multimodal joint train step (same config as
scripts/bench/train_step_mm.py: 275 ms/step ≈ 7.3 img/s + 3.7k tok/s).

Prints one parseable line:
  dataplane: <r> img/s loader | <r> img/s built | fed step: <ms> ms vs synthetic <ms> ms

The reference counterpart is the torch DataLoader worker pool around
webdataset (SURVEY §2.6, unified_it_pair_webdataset.py:93-149).
"""

import io
import os
import sys
import tarfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import bench  # noqa: E402

bench._enable_compile_cache()

import jax  # noqa: E402

if os.environ.get("DREAMLLM_PLATFORM") == "cpu":
    # same convention as the CLIs (config/arg_parser default_setup): env
    # JAX_PLATFORMS alone is too late — sitecustomize already imported jax
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
SHARD_DIR = os.path.abspath(os.path.join(REPO, "runs", "bench_shards"))

CAPTION = ("a photograph of a mountain lake at sunrise with pine trees "
           "reflected in still water under scattered clouds and a distant "
           "ridge line fading into morning haze beside a gravel shore")


def ensure_shards(n_shards=3, per_shard=120, size=512):
    """Synthetic LAION-style shards: {i}.jpg + {i}.txt members. Images are
    smooth gradients + noise so JPEG decode cost is realistic (pure noise
    compresses adversarially; flat color trivially)."""
    from PIL import Image

    os.makedirs(SHARD_DIR, exist_ok=True)
    paths = [os.path.join(SHARD_DIR, f"shard{k:03d}.tar") for k in range(n_shards)]
    if all(os.path.exists(p) for p in paths):
        return paths
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for k, path in enumerate(paths):
        with tarfile.open(path, "w") as tf:
            for i in range(per_shard):
                base = np.stack([yy * (0.3 + 0.1 * ((i + k) % 7)),
                                 xx * 0.8, (yy + xx) / 2], axis=-1)
                arr = ((base + rng.random((size, size, 3)) * 0.15) % 1.0 * 255)
                buf = io.BytesIO()
                Image.fromarray(arr.astype(np.uint8)).save(buf, "JPEG", quality=90)
                data = buf.getvalue()
                ti = tarfile.TarInfo(f"{k:02d}{i:05d}.jpg")
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))
                cap = f"{CAPTION} variant {k} {i}".encode()
                ti = tarfile.TarInfo(f"{k:02d}{i:05d}.txt")
                ti.size = len(cap)
                tf.addfile(ti, io.BytesIO(cap))
    return paths


def main():
    backend = jax.default_backend()
    smoke = backend != "tpu" or os.environ.get("DATAPLANE_SMOKE") == "1"

    from dreamllm_tpu.data.builder import BuilderConfig, DreamLLMBuilder
    from dreamllm_tpu.data.collator import collate
    from dreamllm_tpu.data.dataset_types import InterleavedImageText
    from dreamllm_tpu.data.native_loader import NativeImageTextLoader
    from dreamllm_tpu.data.prefetch import background_iterator, device_prefetch
    from dreamllm_tpu.data.tokenization import ToyTokenizer

    B = 2
    # smoke: tiny spans/images so the CPU compile stays minutes, not tens
    # (wiring proof only); real: the stage-2 mm step's exact shapes
    if smoke:
        S, IMG, IMG_DM, EMBED_LEN, PATCH = 256, 32, 32, 16, 8
    else:
        S, IMG, IMG_DM, EMBED_LEN, PATCH = 512, 224, 256, 256, 14
    shards = ensure_shards(per_shard=24 if smoke else 120,
                           size=128 if smoke else 512)

    # ---- 1. raw loader rate (decode + resize off the GIL) ----
    n_raw = 60 if smoke else 360
    loader = NativeImageTextLoader(shards, image_size=128 if smoke else 512,
                                   n_threads=2, capacity=64, loop=True)
    next(loader)  # spin-up
    t0 = time.perf_counter()
    for _ in range(n_raw):
        next(loader)
    loader_img_s = n_raw / (time.perf_counter() - t0)
    loader.close()

    # ---- 2. loader -> builder -> collate batch rate ----
    bcfg = BuilderConfig(max_seq_len=S, image_embed_len=EMBED_LEN,
                         n_dream_queries=64, max_images=1, max_dreams=1,
                         image_size=IMG, image_size_dm=IMG_DM)
    builder = DreamLLMBuilder(ToyTokenizer(vocab_size=32064), bcfg)
    collate_kw = dict(seq_len=S, max_images=1, max_dreams=1,
                      image_size=IMG, image_size_dm=IMG_DM,
                      image_embed_len=EMBED_LEN, n_dream_queries=64)

    loader = NativeImageTextLoader(shards, image_size=128 if smoke else 512,
                                   n_threads=2, capacity=64, loop=True)

    def batches():
        while True:
            built = []
            for _ in range(B):
                img, cap = next(loader)
                # pad the text to a stage-2-like ~180-token document so the
                # batch matches the mm step's text density
                built.append(builder.build(InterleavedImageText(
                    texts=[cap + " " + CAPTION * 3],
                    images=[img], matched_text_index=[0],
                )))
            yield collate(built, **collate_kw)

    gen = batches()
    next(gen)  # warm (tokenizer, builder paths)
    n_b = 5 if smoke else 40
    t0 = time.perf_counter()
    for _ in range(n_b):
        next(gen)
    built_img_s = n_b * B / (time.perf_counter() - t0)

    # ---- 3. fed vs synthetic train step ----
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

    if smoke:
        cfg = DreamLLMConfig(
            llm=LlamaConfig(vocab_size=32064, hidden_size=64, intermediate_size=128,
                            num_hidden_layers=2, num_attention_heads=4,
                            num_key_value_heads=4, max_position_embeddings=S,
                            dtype=jnp.float32),
            vision=CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                                    num_hidden_layers=2, num_attention_heads=2,
                                    image_size=IMG, patch_size=PATCH,
                                    dtype=jnp.float32),
            image_embed_len=EMBED_LEN,
            frozen=("clip_vision_embedding/clip",),
        )
        head_cfg = SDHeadConfig(
            unet=UNetConfig(sample_size=IMG_DM // 4, block_out_channels=(16, 32),
                            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
                            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
                            layers_per_block=1, transformer_layers_per_block=(1, 1),
                            num_attention_heads=(2, 4), cross_attention_dim=24,
                            norm_num_groups=4),
            vae=VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                          norm_num_groups=4),
            llm_hidden_size=64,
        )
        n_steps = 4
    else:
        # EXACT train_step_mm.py demand config: 0.94B stage-2 mm joint step
        cfg = DreamLLMConfig(
            llm=LlamaConfig(vocab_size=32064, hidden_size=2048, intermediate_size=5504,
                            num_hidden_layers=16, num_attention_heads=16,
                            num_key_value_heads=16, max_position_embeddings=S,
                            dtype=jnp.bfloat16),
            vision=CLIPVisionConfig(hidden_size=1024, intermediate_size=4096,
                                    num_hidden_layers=24, num_attention_heads=16,
                                    image_size=224, patch_size=14, dtype=jnp.bfloat16),
            image_embed_len=256,
            frozen=("clip_vision_embedding/clip",),
        )
        head_cfg = SDHeadConfig(
            unet=UNetConfig(sample_size=32, dtype=jnp.bfloat16),
            vae=VAEConfig(),
            llm_hidden_size=2048, dtype=jnp.bfloat16,
        )
        n_steps = 10

    def make_params(rng):
        k1, k2 = jax.random.split(rng)
        p = init_dreamllm_params(k1, cfg)
        p["sd_head"] = init_sd_head_params(k2, head_cfg)
        return p

    params = jax.jit(make_params)(jax.random.PRNGKey(0))
    mask = param_freeze_mask(params, cfg)
    mask["sd_head"]["unet"] = jax.tree.map(lambda _: False, mask["sd_head"]["unet"])
    mask["sd_head"]["vae"] = jax.tree.map(lambda _: False, mask["sd_head"]["vae"])
    tx = make_optimizer(
        OptimizerConfig(learning_rate=2e-5, schedule="constant", warmup_steps=0,
                        total_steps=1000, max_grad_norm=1.0,
                        optimizer_8bit=not smoke),
        trainable_mask=mask,
    )
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, head_loss_fn=make_head_loss_fn(head_cfg),
                           remat=True, use_flash=not smoke, trainable_mask=mask)

    def run(st, batch, seed):
        st, aux = step(st, batch, jax.random.PRNGKey(seed))
        return st, float(aux["loss"])  # scalar fetch = sync

    # synthetic: pre-staged device batches, pure device time
    pre = [jax.tree.map(jnp.asarray, next(gen)) for _ in range(n_steps)]
    jax.block_until_ready(pre)
    state, _ = run(state, pre[0], 0)  # compile
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, _ = run(state, pre[i], i + 1)
    synth_ms = (time.perf_counter() - t0) / n_steps * 1e3

    # fed: the full pipeline builds batches concurrently with device steps
    fed = device_prefetch(background_iterator(batches(), maxsize=4), size=2)
    state, _ = run(state, next(fed), 100)  # pipeline spin-up
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, _ = run(state, next(fed), 101 + i)
    fed_ms = (time.perf_counter() - t0) / n_steps * 1e3

    loader.close()
    print(f"dataplane: {loader_img_s:.1f} img/s loader | "
          f"{built_img_s:.1f} img/s built | "
          f"fed step: {fed_ms:.0f} ms vs synthetic {synth_ms:.0f} ms")


if __name__ == "__main__":
    main()
