"""End-to-end VQA harness: tiny model, synthetic images, prompt assembly,
batched decode (greedy + beams), shard merge."""

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.data.tokenization import ToyTokenizer
from dreamllm_tpu.eval.vqa import (
    build_vqa_prompt,
    encode_vqa_prompt,
    merge_prediction_shards,
    run_vqa,
    shard_for_process,
)
from dreamllm_tpu.models.clip import CLIPVisionConfig
from dreamllm_tpu.models.dreamllm import DreamLLMConfig, init_dreamllm_params
from dreamllm_tpu.models.llama import LlamaConfig
from dreamllm_tpu.models.projector import ProjectorConfig

CFG = DreamLLMConfig(
    llm=LlamaConfig(vocab_size=40000, hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                    max_position_embeddings=512),
    vision=CLIPVisionConfig(hidden_size=16, intermediate_size=32, num_hidden_layers=2,
                            num_attention_heads=2, image_size=8, patch_size=4),
    vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=32),
    n_dream_queries=4,
    image_embed_len=4,
)


class DecToy(ToyTokenizer):
    def decode(self, ids):
        return " ".join(f"t{int(i)}" for i in ids if int(i) > 9)


def make_samples(n=3):
    rng = np.random.default_rng(0)
    return [
        {
            "id": i,
            "question": f"what is in image {i}?",
            "image": rng.random((8, 8, 3)).astype(np.float32),
            "answers": ["something"] * 10,
        }
        for i in range(n)
    ]


def test_prompt_assembly():
    tok = DecToy()
    prompt = build_vqa_prompt(CFG, "what?")
    assert "<im_start>" in prompt and prompt.count("<im_patch>") == 4
    ids, pos = encode_vqa_prompt(tok, CFG, "what?")
    st = CFG.special_tokens
    assert ids[pos - 1] == st.im_start
    assert list(ids[pos : pos + 4]) == [st.im_patch] * 4
    assert ids[pos + 4] == st.im_end


def test_run_vqa_greedy_and_beams(tmp_path):
    params = init_dreamllm_params(jax.random.PRNGKey(0), CFG)
    tok = DecToy()
    samples = make_samples(3)
    out = run_vqa(params, CFG, tok, samples, task="vqav2",
                  max_new_tokens=4, batch_size=2,
                  out_path=str(tmp_path / "shard0.json"))
    assert len(out["predictions"]) == 3
    assert 0.0 <= out["score"] <= 1.0
    outb = run_vqa(params, CFG, tok, samples[:2], task="vqav2",
                   max_new_tokens=4, batch_size=2, num_beams=2)
    assert len(outb["predictions"]) == 2

    # shard merge
    run_vqa(params, CFG, tok, samples[:1], task="vqav2", max_new_tokens=4,
            batch_size=1, out_path=str(tmp_path / "shard1.json"))
    merged = merge_prediction_shards(
        [str(tmp_path / "shard0.json"), str(tmp_path / "shard1.json")],
        str(tmp_path / "merged.json"),
    )
    assert merged["n"] == 4


def test_shard_for_process():
    items = list(range(10))
    assert shard_for_process(items, index=0, count=3) == [0, 3, 6, 9]
    assert shard_for_process(items, index=2, count=3) == [2, 5, 8]
