"""North-star bench: BASELINE config #4 — DreamLLM-7B interleaved text+image
document generation, measured as ONE on-chip ``generate_interleaved()`` call.

Replaces the README's component-sum estimate with a single wall-clock run
that includes every seam the sum hides: host↔device transitions between
segments, KV-cache re-entry after the dream/image splice, CLIP re-encode of
the generated image, and the scalar fetches that sequence the host loop.

Configuration: 7B int8-weights+fused-proj decoder (the headline serving
config), CLIP ViT-L/14 re-encode span, SD-2.1-size UNet + VAE @512px with
50 DDIM steps (BASELINE.json configs[3]) — bench-scale random-weight
stand-ins, same as every other rung. A scripted image trigger
(``force_image_interval``) stands in for the trained model's learned
<dream_start> emission: ~150 text tokens → image → ~150 → image → remainder.

Prints: ``interleaved doc: <s> s | images: <s> s | text: <n> tok @ <r> tok/s``
"""

import os
import sys
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

from dreamllm_tpu.generation import (  # noqa: E402
    InterleavedConfig,
    SamplingConfig,
    generate_interleaved,
)
from dreamllm_tpu.models.clip import CLIPVisionConfig  # noqa: E402
from dreamllm_tpu.models.dreamllm import DreamLLMConfig, init_dreamllm_params  # noqa: E402
from dreamllm_tpu.models.llama import LlamaConfig, fuse_llama_params  # noqa: E402
from dreamllm_tpu.models.sd import UNetConfig  # noqa: E402
from dreamllm_tpu.models.sd.head import SDHeadConfig, init_sd_head_params  # noqa: E402
from dreamllm_tpu.models.sd.schedulers import (  # noqa: E402
    classifier_free_guidance,
    ddim_step,
    ddim_timesteps,
)
from dreamllm_tpu.models.sd.vae import VAEConfig, vae_decode  # noqa: E402
from dreamllm_tpu.ops.quant import quantize_llama_params  # noqa: E402


def make_piecewise_pipeline(head_cfg: SDHeadConfig, deepcache_interval: int = 1):
    """``pipeline_fn`` for generate_interleaved built from per-block jitted
    UNet programs (the monolithic sd_head_pipeline fori_loop graph overloads
    this environment's remote compiler — bench.make_piecewise_unet). Host
    loop over DDIM steps; dispatches pipeline asynchronously like bench_unet
    (measured ~25 ms/step at 512px including dispatch overhead).

    ``deepcache_interval > 1``: DeepCache — a full UNet step (monolithic
    jit with ``return_deep``) every k-th step, shallow cached steps between
    (``unet_forward_shallow``); the same two programs bench_unet's
    DeepCache rung compiles at these exact shapes, so the cache is warm."""
    pieces = bench.make_piecewise_unet(head_cfg.unet)
    if deepcache_interval > 1:
        from dreamllm_tpu.models.sd.unet import unet_forward, unet_forward_shallow

        @jax.jit
        def dc_full(p, lat_in, t, ctx):
            return unet_forward(p, head_cfg.unet, lat_in, t, ctx, return_deep=True)

        @jax.jit
        def dc_shallow(p, lat_in, t, ctx, deep):
            return unet_forward_shallow(p, head_cfg.unet, lat_in, t, ctx, deep)
    sched = head_cfg.schedule()
    pcfg = head_cfg.projector_cfg()

    from dreamllm_tpu.models.projector import projector_forward

    @jax.jit
    def prep(params, cond, uncond, rng, hw):
        ctx = jnp.concatenate(
            [
                projector_forward(params["projector"], pcfg, uncond),
                projector_forward(params["projector"], pcfg, cond),
            ],
            axis=0,
        ).astype(head_cfg.unet.dtype)
        latents = jax.random.normal(rng, (1, hw.shape[0], hw.shape[1], 4), jnp.float32)
        return ctx, latents

    @jax.jit
    def sched_step(model_out, t, t_prev, latents, g):
        # guidance is a TRACED operand: a closed-over Python float would be
        # baked into the first trace and silently reused by later calls
        # with a different guidance_scale
        out = model_out.astype(jnp.float32)
        un, co = jnp.split(out, 2, axis=0)
        return ddim_step(
            sched,
            classifier_free_guidance(co, un, g),
            jnp.broadcast_to(t, (1,)),
            jnp.broadcast_to(t_prev, (1,)),
            latents,
        )

    @jax.jit
    def dup(latents):
        lat = latents.astype(head_cfg.unet.dtype)
        return jnp.concatenate([lat, lat], axis=0)

    @jax.jit
    def decode_img(params, latents):
        imgs = vae_decode(
            params["vae"], head_cfg.vae, latents / head_cfg.vae.scaling_factor
        )
        return jnp.clip(imgs / 2.0 + 0.5, 0.0, 1.0)

    def pipeline_fn(head_params, _cfg, cond, uncond, rng, *, height, width,
                    num_inference_steps, guidance_scale, sampler):
        g = jnp.asarray(guidance_scale, jnp.float32)
        vae_factor = 2 ** (len(head_cfg.vae.block_out_channels) - 1)
        h = (height or head_cfg.unet.sample_size * vae_factor) // vae_factor
        w = (width or head_cfg.unet.sample_size * vae_factor) // vae_factor
        ctx, latents = prep(head_params, cond, uncond, rng, jnp.zeros((h, w)))
        ts = np.asarray(ddim_timesteps(sched.num_train_timesteps, num_inference_steps))
        ts_prev = np.concatenate([ts[1:], [-1]])
        deep = None
        for i, (t, tp) in enumerate(zip(ts, ts_prev)):
            if deepcache_interval > 1:
                if i % deepcache_interval == 0:
                    out, deep = dc_full(head_params["unet"], dup(latents),
                                        jnp.asarray([t, t]), ctx)
                else:
                    out = dc_shallow(head_params["unet"], dup(latents),
                                     jnp.asarray([t, t]), ctx, deep)
            else:
                out = pieces["step"](head_params["unet"], dup(latents),
                                     jnp.asarray([t, t]), ctx)
            latents = sched_step(out, jnp.asarray(t), jnp.asarray(tp), latents, g)
        return decode_img(head_params, latents)

    return pipeline_fn


def main():
    backend = jax.default_backend()
    smoke = backend != "tpu" or os.environ.get("INTERLEAVED_SMOKE") == "1"

    if smoke:  # tiny everything: proves the driver end-to-end off-chip
        llm = LlamaConfig(vocab_size=32008, hidden_size=64, intermediate_size=128,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=4, max_position_embeddings=2048,
                          dtype=jnp.float32)
        vision = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                                  num_hidden_layers=2, num_attention_heads=2,
                                  image_size=32, patch_size=16)
        cfg = DreamLLMConfig(llm=llm, vision=vision, image_embed_len=4,
                             n_dream_queries=8)
        unet = UNetConfig(
            sample_size=8, block_out_channels=(16, 32),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1, transformer_layers_per_block=(1, 1),
            num_attention_heads=(2, 4), cross_attention_dim=24,
            norm_num_groups=4)
        vae = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                        norm_num_groups=4)
        head_cfg = SDHeadConfig(unet=unet, vae=vae, llm_hidden_size=64)
        text_seg, n_images, steps, height = 6, 2, 2, 16
        quantize = False
    else:
        # 7B decoder (vocab +8 so the special tokens are real ids)
        llm = LlamaConfig(vocab_size=32008, hidden_size=4096,
                          intermediate_size=11008, num_hidden_layers=32,
                          num_attention_heads=32, num_key_value_heads=32,
                          max_position_embeddings=2048, dtype=jnp.bfloat16)
        vision = CLIPVisionConfig(dtype=jnp.bfloat16)  # ViT-L/14 defaults
        cfg = DreamLLMConfig(llm=llm, vision=vision)
        head_cfg = SDHeadConfig(
            unet=UNetConfig(dtype=jnp.bfloat16),   # SD-2.1 base, 512px
            vae=VAEConfig(dtype=jnp.bfloat16),
            llm_hidden_size=4096, dtype=jnp.bfloat16,
        )
        text_seg, n_images, steps, height = 150, 2, 50, 512
        quantize = True

    def make(r):
        p = init_dreamllm_params(r, cfg)
        if quantize:
            p["llm"] = quantize_llama_params(fuse_llama_params(p["llm"]))
        return p

    params = jax.jit(make)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    head_params = jax.jit(lambda r: init_sd_head_params(r, head_cfg))(
        jax.random.PRNGKey(1))
    jax.block_until_ready(head_params)

    pipeline_fn = make_piecewise_pipeline(head_cfg)

    img_time = [0.0]

    def timed_pipeline(*a, **kw):
        t0 = time.perf_counter()
        img = pipeline_fn(*a, **kw)
        float(jnp.sum(img))  # force completion (tunnel acks can lie)
        img_time[0] += time.perf_counter() - t0
        return img

    # doc shape: N full text segments of text_seg tokens (each ends in the
    # consumed trigger token) + images, then the remaining budget as text
    budget = text_seg * (n_images + 1)
    icfg = InterleavedConfig(
        max_new_tokens=budget, max_images=n_images,
        num_inference_steps=steps, guidance_scale=3.5, sampler="ddim",
        image_height=height, image_width=height,
        append_image_span=True, force_image_interval=text_seg,
        sampling=SamplingConfig(greedy=True, max_new_tokens=budget,
                                eos_token_id=-1),
    )

    def run(seed):
        ids = jax.random.randint(jax.random.PRNGKey(seed), (1, 16), 10, 31000)
        img_time[0] = 0.0
        t0 = time.perf_counter()
        out = generate_interleaved(
            params, cfg, head_params, head_cfg, ids, icfg,
            jax.random.PRNGKey(seed), pipeline_fn=timed_pipeline,
        )
        # force the last text segment's tokens to host (scalar-sized)
        n_text = sum(int(s[1].shape[0]) for s in out["segments"] if s[0] == "text")
        for kind, seg in out["segments"]:
            if kind == "text":
                np.asarray(seg)
        dt = time.perf_counter() - t0
        return out, dt, img_time[0], n_text

    out, dt, img_s, n_text = run(0)  # compile + warmup
    assert len(out["images"]) == n_images, (len(out["images"]), n_images)
    best = None
    for i in range(2 if not smoke else 1):
        out, dt, img_s, n_text = run(i + 1)
        if best is None or dt < best[0]:
            best = (dt, img_s, n_text)
    dt, img_s, n_text = best
    text_s = max(dt - img_s, 1e-9)
    print(f"interleaved doc: {dt:.2f} s | images: {img_s:.2f} s "
          f"({len(out['images'])}x{height}px, {steps} steps) | "
          f"text: {n_text} tok @ {n_text / text_s:.1f} tok/s", flush=True)

    # the quality/speed dial in the same north-star run: DeepCache interval 2
    # (full UNet step every 2nd step, shallow cached between)
    try:
        pipeline_fn2 = make_piecewise_pipeline(head_cfg, deepcache_interval=2)

        def timed_pipeline2(*a, **kw):
            t0 = time.perf_counter()
            img = pipeline_fn2(*a, **kw)
            float(jnp.sum(img))
            img_time[0] += time.perf_counter() - t0
            return img

        def run_dc(seed):
            ids = jax.random.randint(jax.random.PRNGKey(seed), (1, 16), 10, 31000)
            img_time[0] = 0.0
            t0 = time.perf_counter()
            o = generate_interleaved(
                params, cfg, head_params, head_cfg, ids, icfg,
                jax.random.PRNGKey(seed), pipeline_fn=timed_pipeline2,
            )
            for kind, seg in o["segments"]:
                if kind == "text":
                    np.asarray(seg)
            return time.perf_counter() - t0, img_time[0]

        run_dc(10)  # compile/warm (programs usually cached by bench_unet)
        dts = sorted(run_dc(11 + i) for i in range(2 if not smoke else 1))
        dt2, img_s2 = dts[0]
        print(f"interleaved doc deepcache2: {dt2:.2f} s | images: {img_s2:.2f} s",
              flush=True)
    except Exception as e:
        print(f"interleaved deepcache2 failed: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
