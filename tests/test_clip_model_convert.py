"""Full CLIPModel converter: similarity parity vs transformers CLIPModel."""

import jax.numpy as jnp
import numpy as np
import torch

from dreamllm_tpu.convert.hf_clip import convert_clip_model_dir
from dreamllm_tpu.models.clip import clip_pooled_output, clip_vision_forward
from dreamllm_tpu.models.clip_text import clip_similarity, clip_text_forward


def test_clip_model_similarity_parity(tmp_path):
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    torch.manual_seed(0)
    cfg = CLIPConfig(
        text_config=CLIPTextConfig(
            vocab_size=99, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=16, eos_token_id=98,
        ).to_dict(),
        vision_config=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=7,
        ).to_dict(),
        projection_dim=24,
    )
    model = CLIPModel(cfg).eval()
    d = str(tmp_path / "clip")
    model.save_pretrained(d)

    (vcfg, vision), (tcfg, text), vproj, tproj, logit_scale = convert_clip_model_dir(d)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    ids = np.array([[5, 9, 30, 98], [7, 12, 98, 0]])

    with torch.no_grad():
        golden = model(
            input_ids=torch.from_numpy(ids),
            pixel_values=torch.from_numpy(img).permute(0, 3, 1, 2),
        ).logits_per_image.numpy()

    last = clip_vision_forward(vision, vcfg, jnp.asarray(img))
    img_emb = clip_pooled_output(vision, vcfg, last)
    _, txt_emb = clip_text_forward(text, tcfg, jnp.asarray(ids))
    got = clip_similarity(img_emb, txt_emb, vproj, tproj, logit_scale=logit_scale)
    np.testing.assert_allclose(np.asarray(got), golden, rtol=2e-3, atol=2e-3)
