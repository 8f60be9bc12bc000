"""CLIP ViT vision encoder — pure-functional JAX, scan-over-layers.

TPU-native equivalent of the reference's `CLIPVisionEmbedding` backbone
(omni/models/dreamllm/modeling_plugins.py:184-331), which wraps HF
``CLIPVisionModel`` and takes ``hidden_states[select_layer][:, 1:]`` (the
second-to-last layer, CLS dropped) as 256 patch features for the LLM.

Architecture (CLIP ViT-L/14 defaults): patch conv (stride=patch, no bias) →
prepend class embedding → add position embeddings → pre-layernorm →
N pre-LN transformer blocks (MHA with bias, quick-gelu MLP). The feature tap
at ``select_layer`` is handled by collecting per-layer inputs from the scan,
mirroring HF's ``output_hidden_states`` semantics exactly (hidden_states[0]
is the embedding output; hidden_states[i] is the output of block i; no final
post-layernorm is applied to intermediate taps).

Layout: images are **NHWC** (TPU-native; torch reference is NCHW), conv
weights HWIO. Matmul weights [in, out].
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from dreamllm_tpu.ops.activations import quick_gelu
from dreamllm_tpu.ops.attention import dot_product_attention
from dreamllm_tpu.ops.norms import layer_norm

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """HF CLIPVisionConfig subset (ViT-L/14-336 ~ openai defaults)."""

    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + CLS


def init_clip_vision_params(rng: jax.Array, cfg: CLIPVisionConfig) -> Params:
    h, i, d = cfg.hidden_size, cfg.intermediate_size, cfg.dtype
    L, p = cfg.num_hidden_layers, cfg.patch_size
    k = jax.random.split(rng, 9)

    def dense(key, shape, scale=None):
        scale = scale if scale is not None else shape[0] ** -0.5
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(d)

    def stack(key, shape, scale=None):
        return jnp.stack([dense(kk, shape, scale) for kk in jax.random.split(key, L)])

    layers = {
        "ln1_w": jnp.ones((L, h), d),
        "ln1_b": jnp.zeros((L, h), d),
        "ln2_w": jnp.ones((L, h), d),
        "ln2_b": jnp.zeros((L, h), d),
        "wq": stack(k[0], (h, h)),
        "bq": jnp.zeros((L, h), d),
        "wk": stack(k[1], (h, h)),
        "bk": jnp.zeros((L, h), d),
        "wv": stack(k[2], (h, h)),
        "bv": jnp.zeros((L, h), d),
        "wo": stack(k[3], (h, h)),
        "bo": jnp.zeros((L, h), d),
        "fc1_w": stack(k[4], (h, i)),
        "fc1_b": jnp.zeros((L, i), d),
        "fc2_w": stack(k[5], (i, h)),
        "fc2_b": jnp.zeros((L, h), d),
    }
    return {
        "class_embedding": dense(k[6], (h,), scale=0.02),
        "patch_embedding": dense(k[7], (p, p, 3, h), scale=0.02),  # HWIO
        "position_embedding": dense(k[8], (cfg.seq_len, h), scale=0.02),
        "pre_ln_w": jnp.ones((h,), d),
        "pre_ln_b": jnp.zeros((h,), d),
        "post_ln_w": jnp.ones((h,), d),
        "post_ln_b": jnp.zeros((h,), d),
        "layers": layers,
    }


def _clip_block(layer: Params, x: jnp.ndarray, cfg: CLIPVisionConfig) -> jnp.ndarray:
    b, s, h = x.shape
    nh = cfg.num_attention_heads
    hd = h // nh
    eps = cfg.layer_norm_eps

    y = layer_norm(x, layer["ln1_w"], layer["ln1_b"], eps)
    q = (y @ layer["wq"] + layer["bq"]).reshape(b, s, nh, hd)
    k = (y @ layer["wk"] + layer["bk"]).reshape(b, s, nh, hd)
    v = (y @ layer["wv"] + layer["bv"]).reshape(b, s, nh, hd)
    a = dot_product_attention(q, k, v, causal=False)
    x = x + (a.reshape(b, s, h) @ layer["wo"] + layer["bo"])

    y = layer_norm(x, layer["ln2_w"], layer["ln2_b"], eps)
    y = quick_gelu(y @ layer["fc1_w"] + layer["fc1_b"]) @ layer["fc2_w"] + layer["fc2_b"]
    return x + y


def clip_vision_forward(
    params: Params,
    cfg: CLIPVisionConfig,
    pixel_values: jnp.ndarray,
    *,
    select_layer: int | None = None,
    drop_cls: bool = False,
):
    """Encode images.

    Args:
      pixel_values: ``[B, H, W, 3]`` NHWC, already CLIP-normalized.
      select_layer: HF-style hidden-state index (e.g. ``-2`` for the
        reference's feature tap, modeling_plugins.py:314-331). ``None``
        returns the last layer's output (post-layernorm is applied only to
        the pooled CLS, matching HF — see :func:`clip_pooled_output`).
      drop_cls: drop the CLS token (position 0) from the returned features.

    Returns:
      ``[B, S(-1), hidden]`` features.
    """
    b = pixel_values.shape[0]
    h = cfg.hidden_size

    patches = jax.lax.conv_general_dilated(
        pixel_values.astype(params["patch_embedding"].dtype),
        params["patch_embedding"],
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, H/p, W/p, hidden]
    patches = patches.reshape(b, -1, h)
    cls = jnp.broadcast_to(params["class_embedding"][None, None], (b, 1, h)).astype(patches.dtype)
    x = jnp.concatenate([cls, patches], axis=1)
    x = x + params["position_embedding"][None].astype(x.dtype)
    x = layer_norm(x, params["pre_ln_w"], params["pre_ln_b"], cfg.layer_norm_eps)

    # HF hidden_states semantics: index 0 = embeddings, i = block i output.
    # select_layer -2 == hidden_states[num_layers - 1] == input to last block.
    n_run = cfg.num_hidden_layers
    if select_layer is not None:
        idx = select_layer if select_layer >= 0 else cfg.num_hidden_layers + 1 + select_layer
        assert 0 <= idx <= cfg.num_hidden_layers, select_layer
        n_run = idx

    def step(x, layer):
        return _clip_block(layer, x, cfg), None

    if n_run == cfg.num_hidden_layers:
        x, _ = jax.lax.scan(step, x, params["layers"])
    elif n_run > 0:
        sliced = jax.tree.map(lambda p: p[:n_run], params["layers"])
        x, _ = jax.lax.scan(step, x, sliced)

    if drop_cls:
        x = x[:, 1:]
    return x


def clip_pooled_output(params: Params, cfg: CLIPVisionConfig, last_hidden: jnp.ndarray):
    """Post-layernormed CLS embedding (HF ``pooler_output``)."""
    return layer_norm(
        last_hidden[:, 0], params["post_ln_w"], params["post_ln_b"], cfg.layer_norm_eps
    )


# CLIP image normalization constants (openai/clip-vit-large-patch14 processor)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(images: jnp.ndarray, image_size: int) -> jnp.ndarray:
    """On-device preprocessing: resize (bicubic) + CLIP normalize.

    ``images``: ``[B, H, W, 3]`` float in [0, 1] (host does only PIL decode →
    uint8 → float; everything else runs on TPU, per the north star).
    """
    b = images.shape[0]
    if images.shape[1] != image_size or images.shape[2] != image_size:
        images = jax.image.resize(
            images, (b, image_size, image_size, 3), method="bicubic"
        )
        images = jnp.clip(images, 0.0, 1.0)
    mean = jnp.asarray(CLIP_IMAGE_MEAN, images.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, images.dtype)
    return (images - mean) / std
