"""Reference-checkpoint converter: synthesize a reference-layout run dir with
torch modules (exact state-dict naming confirmed against the mounted
reference) and verify converted features match the torch computation."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from dreamllm_tpu.convert.dreamllm_checkpoint import (
    convert_clip_embedding_bin,
    convert_dream_embedding_bin,
    convert_reference_projector,
    convert_reference_run_dir,
)
from dreamllm_tpu.models.clip import CLIPVisionConfig, clip_vision_forward
from dreamllm_tpu.models.projector import ProjectorConfig, projector_forward


def test_projector_linear_parity():
    torch.manual_seed(0)
    lin = nn.Linear(16, 24, bias=True)
    sd = {"projector.weight": lin.weight, "projector.bias": lin.bias}
    params = convert_reference_projector(sd)
    cfg = ProjectorConfig(projector_type="linear", in_dim=16, out_dim=24)
    x = np.random.default_rng(0).standard_normal((2, 5, 16)).astype(np.float32)
    with torch.no_grad():
        golden = lin(torch.from_numpy(x)).numpy()
    got = projector_forward(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, rtol=1e-5, atol=1e-5)


def test_projector_mlp_parity():
    torch.manual_seed(1)
    seq = nn.Sequential(nn.Linear(16, 24, bias=False), nn.GELU(),
                        nn.Linear(24, 24, bias=False))
    sd = {f"projector.{i}.weight": m.weight for i, m in enumerate(seq) if hasattr(m, "weight")}
    params = convert_reference_projector(sd)
    cfg = ProjectorConfig(projector_type="mlp", in_dim=16, out_dim=24, depth=2)
    x = np.random.default_rng(1).standard_normal((1, 4, 16)).astype(np.float32)
    with torch.no_grad():
        golden = seq(torch.from_numpy(x)).numpy()
    got = projector_forward(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), golden, rtol=1e-4, atol=1e-5)


def test_dream_embedding_bin():
    sd = {"dream_queries": torch.randn(1, 8, 16)}
    out = convert_dream_embedding_bin(sd)
    assert out["queries"].shape == (8, 16)


def test_clip_embedding_bin_parity():
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModel

    torch.manual_seed(0)
    tiny = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=4, image_size=28, patch_size=7)
    clip = CLIPVisionModel(HFCfg(**tiny, attn_implementation="eager")).eval()
    proj = nn.Linear(32, 48, bias=True)
    # reference naming: plugin state dict prefixes
    sd = {f"clip_vision_model.{k}": v for k, v in clip.state_dict().items()}
    sd.update({"projector.projector.weight": proj.weight,
               "projector.projector.bias": proj.bias})

    cfg = CLIPVisionConfig(**tiny)
    out = convert_clip_embedding_bin(sd, cfg, dtype=jnp.float32)

    img = np.random.default_rng(0).standard_normal((1, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        hs = clip(torch.from_numpy(img).permute(0, 3, 1, 2), output_hidden_states=True).hidden_states
        golden = proj(hs[-2][:, 1:]).numpy()
    feats = clip_vision_forward(out["clip"], cfg, jnp.asarray(img), select_layer=-2, drop_cls=True)
    pcfg = ProjectorConfig(projector_type="linear", in_dim=32, out_dim=48)
    got = projector_forward(out["projector"], pcfg, feats)
    np.testing.assert_allclose(np.asarray(got), golden, rtol=2e-3, atol=2e-4)


def test_full_run_dir(tmp_path):
    """End-to-end: LLM save_pretrained + plugin bins → assembled params."""
    from transformers import LlamaConfig as HFLlama, LlamaForCausalLM

    torch.manual_seed(0)
    llm = LlamaForCausalLM(HFLlama(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    ))
    run = str(tmp_path / "run")
    llm.save_pretrained(run)
    torch.save({"dream_queries": torch.randn(1, 4, 32)},
               os.path.join(run, "dream_embedding.bin"))

    params = convert_reference_run_dir(run, dtype=jnp.float32)
    assert "llm" in params and "dream_embedding" in params
    assert params["dream_embedding"]["queries"].shape == (4, 32)
    assert params["llm"]["embed_tokens"].shape == (128, 32)
