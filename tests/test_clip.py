"""CLIP vision encoder parity vs transformers CLIPVisionModel, projector
shape/behavior tests, preprocessing checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dreamllm_tpu.convert.hf_clip import clip_config_from_hf, convert_clip_vision_state_dict
from dreamllm_tpu.models.clip import (
    CLIPVisionConfig,
    clip_preprocess,
    clip_vision_forward,
    init_clip_vision_params,
)
from dreamllm_tpu.models.projector import (
    ProjectorConfig,
    init_projector_params,
    projector_forward,
    projector_out_len,
)

TINY = dict(
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    image_size=28,
    patch_size=7,
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import CLIPVisionConfig as HFConfig, CLIPVisionModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(**TINY, attn_implementation="eager")
    hf = CLIPVisionModel(hf_cfg).eval()
    cfg = clip_config_from_hf(hf_cfg)
    params = convert_clip_vision_state_dict(hf.state_dict(), cfg)
    return hf, cfg, params


class TestCLIPParity:
    def test_final_output_matches_hf(self, hf_pair):
        hf, cfg, params = hf_pair
        rng = np.random.default_rng(0)
        img = rng.standard_normal((2, TINY["image_size"], TINY["image_size"], 3)).astype(np.float32)
        with torch.no_grad():
            golden = hf(torch.from_numpy(img).permute(0, 3, 1, 2)).last_hidden_state.numpy()
        got = clip_vision_forward(params, cfg, jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(got), golden, rtol=1e-3, atol=1e-4)

    def test_select_layer_minus2_matches_hf(self, hf_pair):
        """The reference's feature tap: hidden_states[-2][:, 1:]."""
        hf, cfg, params = hf_pair
        rng = np.random.default_rng(1)
        img = rng.standard_normal((1, TINY["image_size"], TINY["image_size"], 3)).astype(np.float32)
        with torch.no_grad():
            hs = hf(torch.from_numpy(img).permute(0, 3, 1, 2), output_hidden_states=True).hidden_states
        golden = hs[-2][:, 1:].numpy()
        got = clip_vision_forward(params, cfg, jnp.asarray(img), select_layer=-2, drop_cls=True)
        assert got.shape == golden.shape  # [1, num_patches, hidden]
        np.testing.assert_allclose(np.asarray(got), golden, rtol=1e-3, atol=1e-4)


class TestProjectors:
    @pytest.mark.parametrize("ptype,depth", [("linear", 1), ("mlp", 2), ("mlp", 3)])
    def test_dense_projector_shapes(self, ptype, depth):
        cfg = ProjectorConfig(projector_type=ptype, in_dim=16, out_dim=24, depth=depth)
        params = init_projector_params(jax.random.PRNGKey(0), cfg)
        x = jnp.ones((2, 9, 16))
        y = projector_forward(params, cfg, x)
        assert y.shape == (2, 9, 24)

    def test_mlp_is_nonlinear(self):
        cfg = ProjectorConfig(projector_type="mlp", in_dim=8, out_dim=8, depth=2)
        params = init_projector_params(jax.random.PRNGKey(1), cfg)
        x = jnp.ones((1, 4, 8))
        y1 = projector_forward(params, cfg, x)
        y2 = projector_forward(params, cfg, 2.0 * x)
        assert not np.allclose(np.asarray(y2), 2.0 * np.asarray(y1))

    def test_conv_projector_preserves_len(self):
        cfg = ProjectorConfig(projector_type="conv", in_dim=8, out_dim=12)
        params = init_projector_params(jax.random.PRNGKey(2), cfg)
        x = jnp.ones((2, 16, 8))  # 4x4 grid
        y = projector_forward(params, cfg, x)
        assert y.shape == (2, 16, 12)

    def test_sam_projector_downsamples_16x(self):
        cfg = ProjectorConfig(projector_type="sam", in_dim=8, out_dim=12)
        params = init_projector_params(jax.random.PRNGKey(3), cfg)
        x = jnp.ones((1, 256, 8))  # 16x16 grid -> 4x4
        y = projector_forward(params, cfg, x)
        assert y.shape == (1, 16, 12)
        assert projector_out_len(cfg, 256) == 16


class TestPreprocess:
    def test_resize_and_normalize(self):
        img = jnp.ones((1, 64, 48, 3)) * 0.5
        out = clip_preprocess(img, 28)
        assert out.shape == (1, 28, 28, 3)
        # 0.5 normalized by CLIP mean/std
        expected = (0.5 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
            [0.26862954, 0.26130258, 0.27577711]
        )
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expected, rtol=1e-4)

    def test_matches_hf_processor_resize(self):
        """Bicubic resize + normalize vs CLIPImageProcessor on the same array."""
        from transformers import CLIPImageProcessor

        rng = np.random.default_rng(0)
        img = (rng.random((1, 56, 56, 3)) * 255).astype(np.uint8)
        proc = CLIPImageProcessor(
            size={"shortest_edge": 28}, crop_size={"height": 28, "width": 28},
            do_resize=True, do_center_crop=True, do_rescale=True, do_normalize=True,
        )
        golden = proc(images=img[0], return_tensors="np")["pixel_values"]  # NCHW
        got = clip_preprocess(jnp.asarray(img[0][None], jnp.float32) / 255.0, 28)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), golden, rtol=0.1, atol=0.06
        )  # PIL bicubic vs jax bicubic differ slightly
