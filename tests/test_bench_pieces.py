"""bench.py helpers that carry correctness weight: the piecewise UNet step
(used by bench_unet AND the interleaved north-star pipeline) must match the
monolithic unet_forward, and the interleaved bench driver must run end-to-end
in smoke mode (it is the BENCH_r05 north-star rung)."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dreamllm_tpu.models.sd import UNetConfig, init_unet_params, unet_forward  # noqa: E402

TINY_UNET = UNetConfig(
    sample_size=8, block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1, transformer_layers_per_block=(1, 1),
    num_attention_heads=(2, 4), cross_attention_dim=24, norm_num_groups=4,
)


def test_piecewise_unet_matches_monolithic():
    import bench

    params = init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 24), jnp.float32)
    t = jnp.asarray([500, 17])

    ref = unet_forward(params, TINY_UNET, lat, t, ctx)
    pieces = bench.make_piecewise_unet(TINY_UNET)
    out = pieces["step"](params, lat, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_interleaved_bench_smoke_subprocess():
    """The north-star bench driver runs end-to-end (tiny shapes, CPU)."""
    env = {**os.environ, "INTERLEAVED_SMOKE": "1", "DREAMLLM_PLATFORM": "cpu",
           "PYTHONPATH": REPO + ":" + os.environ.get("PYTHONPATH", "")}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/bench/interleaved.py")],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "interleaved doc:" in r.stdout


@pytest.mark.slow
def test_dataplane_bench_smoke_subprocess():
    """The input-pipeline bench driver runs end-to-end (tiny shapes, CPU):
    real shards on disk -> native loader -> builder -> collate -> fed step."""
    env = {**os.environ, "DATAPLANE_SMOKE": "1", "DREAMLLM_PLATFORM": "cpu",
           "PYTHONPATH": REPO + ":" + os.environ.get("PYTHONPATH", "")}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/bench/dataplane.py")],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "dataplane:" in r.stdout and "fed step:" in r.stdout


def test_sync_readme_bench_roundtrip(tmp_path):
    """README's perf table is GENERATED from the artifact (r4 weak #6: hand
    transcription drifted twice) — the script must render every key it is
    given and be idempotent."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "sync_readme_bench", os.path.join(REPO, "scripts/sync_readme_bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    art = {"parsed": {"value": 94.6, "vs_baseline": 1.89, "extra": {
        "tunnel_rt_ms": 25.1, "decode_int8_fused_tok_s": 94.6,
        "decode_bf16_tok_s": 51.7, "prefill_tok_s_2048": 10048.7,
        "interleaved_doc_s": 8.69, "interleaved_img_s": 2.36,
        "interleaved_text_tok": 447, "interleaved_text_tok_s": 70.7,
        "interleaved_n_images": 2,
    }}}
    p = tmp_path / "BENCH_r99.json"
    p.write_text(json.dumps(art))
    flat, name = mod.load_artifact(str(p))
    out = mod.render(flat, name)
    assert "94.6 tok/s/chip" in out and "8.69 s/doc" in out
    assert "70.7 tok/s between images" in out
    # absent rungs drop out instead of stale numbers
    assert "DeepCache" not in out and "engine" not in out
    # rendering is deterministic/idempotent
    assert out == mod.render(flat, name)
    # and the checked-in README's block matches the artifact it CITES (not
    # "the latest file": the round driver drops a new BENCH_rNN.json after
    # the last commit, which must not retroactively redden the suite)
    import re

    readme = open(os.path.join(REPO, "README.md")).read()
    assert mod.BEGIN in readme and mod.END in readme
    block = readme.split(mod.BEGIN)[1].split(mod.END)[0].strip()
    cited = re.search(r"artifact: `([^`]+)`", block).group(1)
    flat2, name2 = mod.load_artifact(os.path.join(REPO, cited))
    assert block == mod.render(flat2, name2).strip(), (
        "README table drifted from its cited artifact — run "
        "scripts/sync_readme_bench.py " + cited)


def test_force_image_interval_scripted_trigger():
    """force_image_interval emits images on schedule with weights that never
    emit <dream_start> (the bench/demo mode contract)."""
    from dreamllm_tpu.generation import (
        InterleavedConfig,
        SamplingConfig,
        generate_interleaved,
    )
    from dreamllm_tpu.models.clip import CLIPVisionConfig
    from dreamllm_tpu.models.dreamllm import DreamLLMConfig, init_dreamllm_params
    from dreamllm_tpu.models.llama import LlamaConfig
    from dreamllm_tpu.models.projector import ProjectorConfig
    from dreamllm_tpu.models.sd.head import SDHeadConfig, init_sd_head_params
    from dreamllm_tpu.models.sd.vae import VAEConfig

    llm = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=2,
                      num_key_value_heads=2, max_position_embeddings=256,
                      dtype=jnp.float32)
    cfg = DreamLLMConfig(
        llm=llm,
        vision=CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                num_hidden_layers=2, num_attention_heads=2,
                                image_size=8, patch_size=4),
        vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=32),
        n_dream_queries=4, image_embed_len=4,
    )
    params = init_dreamllm_params(jax.random.PRNGKey(0), cfg)
    head_cfg = SDHeadConfig(
        unet=TINY_UNET,
        vae=VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4),
        llm_hidden_size=32,
        projector=ProjectorConfig(projector_type="linear", in_dim=32, out_dim=24),
    )
    head = init_sd_head_params(jax.random.PRNGKey(1), head_cfg)

    out = generate_interleaved(
        params, cfg, head, head_cfg,
        jnp.asarray([[5, 17, 30]]),
        InterleavedConfig(
            max_new_tokens=12, max_images=2, num_inference_steps=2,
            image_height=16, image_width=16, sampler="ddim",
            force_image_interval=4,
            sampling=SamplingConfig(greedy=True, eos_token_id=-1),
        ),
        jax.random.PRNGKey(2),
    )
    assert len(out["images"]) == 2
    kinds = [k for k, _ in out["segments"]]
    # every segment: 3 visible of 4 emitted — the trigger consumes one token
    # as the control token, including in the final (image-capped) segment
    assert kinds == ["text", "image", "text", "image", "text"]
    text_lens = [int(s.shape[0]) for k, s in out["segments"] if k == "text"]
    assert text_lens == [3, 3, 3]
