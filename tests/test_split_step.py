"""Two-program train-step decomposition (the 1024px SDXL compile lever,
scripts/bench/train_step_mm_sdxl.py build_split2): the head backward runs in
its own program and its cotangent is injected into the LLM backward via the
dot-trick — grads must EQUAL the fused dreamllm_forward grads."""

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.models.clip import CLIPVisionConfig
from dreamllm_tpu.models.dreamllm import (
    DreamLLMConfig,
    dreamllm_forward,
    extract_dream_hidden,
    init_dreamllm_params,
    masked_cross_entropy,
    multimodal_embed,
    unconditional_dream_hidden,
)
from dreamllm_tpu.models.llama import LlamaConfig, llama_forward, llama_logits
from dreamllm_tpu.models.projector import ProjectorConfig
from dreamllm_tpu.models.sd.sdxl import (
    SDXLHeadConfig,
    encode_latents,
    init_sdxl_head_params,
    sdxl_head_loss,
)
from dreamllm_tpu.models.sd.unet import sdxl_unet_config
from dreamllm_tpu.models.sd.vae import VAEConfig

from dreamllm_tpu.models.dreamllm import SpecialTokens

CFG = DreamLLMConfig(
    llm=LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=2,
                    num_key_value_heads=2, max_position_embeddings=64,
                    dtype=jnp.float32),
    # in-vocab special ids: the real ids (32001+) would take() NaN embeds
    # out of this 128-wide test embedding table
    special_tokens=SpecialTokens(image=20, im_patch=21, im_start=22,
                                 im_end=23, dream=24, dream_start=25,
                                 dream_end=26),
    vision=CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=8, patch_size=4),
    vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=32),
    n_dream_queries=4, image_embed_len=4,
)
HEAD_CFG = SDXLHeadConfig(
    unet=sdxl_unet_config(
        sample_size=8, block_out_channels=(16, 32),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        transformer_layers_per_block=(1, 1), num_attention_heads=(2, 4),
        cross_attention_dim=24, addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=8 * 6 + 16,
        norm_num_groups=4, layers_per_block=1),
    vae=VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                  norm_num_groups=4, scaling_factor=0.13025),
    llm_hidden_size=32,
    projector=ProjectorConfig(projector_type="linear", in_dim=32, out_dim=24),
    pooled_dim=16,
)


def _batch():
    st = CFG.special_tokens
    ids = np.full((1, 24), 7, np.int32)
    ids[0, 0] = st.bos
    ids[0, 5] = st.dream_start
    ids[0, 6:10] = st.im_patch
    ids[0, 10] = st.dream_end
    labels = ids.copy()
    labels[:, 6:11] = -100
    rng = np.random.default_rng(0)
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "images_dm": jnp.asarray(rng.uniform(-1, 1, (1, 1, 16, 16, 3)), jnp.float32),
        "dream_positions": jnp.asarray([[6]], jnp.int32),
        "add_time_ids": jnp.asarray([[[16, 16, 0, 0, 16, 16]]], jnp.float32),
    }


def test_unet_remat_parity():
    """Per-block UNet checkpointing (unet_forward remat=True — the 1024px
    capacity knob) must not change outputs or gradients."""
    from dreamllm_tpu.models.sd.unet import init_unet_params, unet_forward

    ucfg = HEAD_CFG.unet
    p = init_unet_params(jax.random.PRNGKey(3), ucfg)
    lat = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 24), jnp.float32)
    t = jnp.asarray([500, 17])
    added = {"time_ids": jnp.zeros((2, 6)), "text_embeds": jnp.zeros((2, 16))}

    def f(remat):
        def loss(lat_in):
            out = unet_forward(p, ucfg, lat_in, t, ctx, added_cond=added,
                               remat=remat)
            return jnp.sum(out.astype(jnp.float32) ** 2), out

        (l, out), g = jax.value_and_grad(loss, has_aux=True)(lat)
        return l, out, g

    l0, o0, g0 = f(False)
    l1, o1, g1 = f(True)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)


def test_library_split_step_matches_fused_update():
    """train/split_step.make_split_train_step: one full optimizer step must
    produce the SAME updated params as a fused-reference update built from
    dreamllm_forward grads with identical rng discipline and frozen-leaf
    zeroing."""
    import optax

    from dreamllm_tpu.models.dreamllm import dreamllm_forward, param_freeze_mask
    from dreamllm_tpu.train.split_step import (
        _expand_mask,
        make_split_train_step,
    )
    from dreamllm_tpu.train.step import TrainState

    cfg = dataclasses_replace_frozen(CFG, frozen=("clip_vision_embedding/clip",))
    params = init_dreamllm_params(jax.random.PRNGKey(0), cfg)
    params["sd_head"] = init_sdxl_head_params(jax.random.PRNGKey(1), HEAD_CFG)
    mask = param_freeze_mask(params, cfg)
    mask["sd_head"]["unet"] = jax.tree.map(lambda _: False, mask["sd_head"]["unet"])
    mask["sd_head"]["vae"] = jax.tree.map(lambda _: False, mask["sd_head"]["vae"])

    batch = _batch()
    rng = jax.random.PRNGKey(9)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    # ---- fused reference FIRST: the split step's optimizer program
    # DONATES state (like make_train_step), deleting the original buffers
    lat = encode_latents(params["sd_head"], HEAD_CFG, batch["images_dm"],
                         jax.random.fold_in(rng, 1))

    def head_loss(hp, images_dm, cond, uncond, valid, r, add_time_ids=None,
                  latents=None, **_):
        return sdxl_head_loss(hp, HEAD_CFG, images_dm, cond, uncond, valid,
                              jax.random.fold_in(rng, 2),
                              add_time_ids=add_time_ids, latents=latents)

    fused_batch = dict(batch, latents=lat)

    def fused(p):
        loss, _ = dreamllm_forward(
            p, cfg, fused_batch, rng=None,
            head_loss_fn=head_loss, head_params=p["sd_head"], use_flash=False)
        return loss

    g = jax.grad(fused)(params)
    fmask = _expand_mask(mask, params)
    g = jax.tree.map(lambda m, gi: gi if m else jnp.zeros_like(gi), fmask, g)
    updates, _ = tx.update(g, opt_state, params)
    ref_params = optax.apply_updates(params, updates)
    ref_params = jax.tree.map(np.asarray, ref_params)  # off-device copy

    # ---- library split step ----
    step = make_split_train_step(
        cfg, tx, head_cfg=HEAD_CFG, trainable_mask=mask,
        use_flash=False, remat=False, remat_unet=False,
    )
    new_state, aux = step(TrainState(0, params, opt_state), batch, rng)
    assert np.isfinite(float(aux["loss"]))

    for (kp, a), b in zip(
            jax.tree_util.tree_flatten_with_path(new_state.params)[0],
            jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-6, rtol=2e-4, err_msg=jax.tree_util.keystr(kp))
    assert int(new_state.step) == 1


def dataclasses_replace_frozen(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def test_library_split_step_plain_sd_head():
    """Plain-SD head through the split step (review finding r5: the default
    SD loss used to discard the precomputed latents and train on the 1x1
    dummy): the update must match a fused reference using sd_head_loss's
    latents= path with the step's rng discipline."""
    import optax

    from dreamllm_tpu.models.dreamllm import dreamllm_forward, param_freeze_mask
    from dreamllm_tpu.models.sd.head import (
        SDHeadConfig,
        encode_sd_latents,
        init_sd_head_params,
        sd_head_loss,
    )
    from dreamllm_tpu.models.projector import ProjectorConfig
    from dreamllm_tpu.train.split_step import _expand_mask, make_split_train_step
    from dreamllm_tpu.train.step import TrainState

    sd_cfg = SDHeadConfig(
        unet=TINY_SD_UNET,
        vae=HEAD_CFG.vae,
        llm_hidden_size=32,
        projector=ProjectorConfig(projector_type="linear", in_dim=32, out_dim=24),
    )
    cfg = dataclasses_replace_frozen(CFG, frozen=("clip_vision_embedding/clip",))
    params = init_dreamllm_params(jax.random.PRNGKey(0), cfg)
    params["sd_head"] = init_sd_head_params(jax.random.PRNGKey(1), sd_cfg)
    mask = param_freeze_mask(params, cfg)
    mask["sd_head"]["unet"] = jax.tree.map(lambda _: False, mask["sd_head"]["unet"])
    mask["sd_head"]["vae"] = jax.tree.map(lambda _: False, mask["sd_head"]["vae"])

    batch = _batch()
    rng = jax.random.PRNGKey(5)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    lat = encode_sd_latents(params["sd_head"], sd_cfg, batch["images_dm"],
                            jax.random.fold_in(rng, 1))

    def head_loss(hp, images_dm, cond, uncond, valid, r, latents=None, **_):
        return sd_head_loss(hp, sd_cfg, images_dm, cond, uncond, valid,
                            jax.random.fold_in(rng, 2), latents=latents)

    def fused(p):
        loss, _ = dreamllm_forward(
            p, cfg, dict(batch, latents=lat), rng=None,
            head_loss_fn=head_loss, head_params=p["sd_head"], use_flash=False)
        return loss

    g = jax.grad(fused)(params)
    fmask = _expand_mask(mask, params)
    g = jax.tree.map(lambda m, gi: gi if m else jnp.zeros_like(gi), fmask, g)
    updates, _ = tx.update(g, opt_state, params)
    ref_params = jax.tree.map(np.asarray, optax.apply_updates(params, updates))

    step = make_split_train_step(
        cfg, tx, head_cfg=sd_cfg, trainable_mask=mask,
        use_flash=False, remat=False, remat_unet=False,
    )
    new_state, aux = step(TrainState(0, params, opt_state), batch, rng)
    assert np.isfinite(float(aux["loss"])) and float(aux["vm_loss"]) > 0

    for (kp, a), b in zip(
            jax.tree_util.tree_flatten_with_path(new_state.params)[0],
            jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-6, rtol=2e-4, err_msg=jax.tree_util.keystr(kp))


TINY_SD_UNET = sdxl_unet_config(
    sample_size=8, block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    transformer_layers_per_block=(1, 1), num_attention_heads=(2, 4),
    cross_attention_dim=24, norm_num_groups=4, layers_per_block=1,
    addition_embed_type=None,  # plain-SD UNet (no text_time conditioning)
)


def test_two_program_grads_match_fused():
    params = init_dreamllm_params(jax.random.PRNGKey(0), CFG)
    params["sd_head"] = init_sdxl_head_params(jax.random.PRNGKey(1), HEAD_CFG)
    batch = _batch()
    key = jax.random.PRNGKey(42)

    # ---- fused reference: dreamllm_forward with the latents= path, head
    # rng fixed to the same key the split path will use ----
    def head_loss(hp, images_dm, cond, uncond, valid, rng, add_time_ids=None,
                  latents=None, **_):
        return sdxl_head_loss(hp, HEAD_CFG, images_dm, cond, uncond, valid,
                              jax.random.fold_in(key, 2),
                              add_time_ids=add_time_ids, latents=latents)

    lat = encode_latents(params["sd_head"], HEAD_CFG, batch["images_dm"],
                         jax.random.fold_in(key, 1))
    fused_batch = dict(batch, latents=lat)

    def fused(p):
        loss, aux = dreamllm_forward(
            p, CFG, fused_batch, rng=jax.random.PRNGKey(0),
            head_loss_fn=head_loss, head_params=p["sd_head"], use_flash=False)
        return loss

    loss_f, g_f = jax.value_and_grad(fused)(params)

    # ---- two-program path (mirrors build_split2) ----
    def p_fwd(p):
        embeds = multimodal_embed(p, CFG, batch["input_ids"],
                                  dream_positions=batch["dream_positions"])
        out = llama_forward(p["llm"], CFG.llm, inputs_embeds=embeds, use_flash=False)
        cond, valid = extract_dream_hidden(
            out["last_hidden_state"], batch["dream_positions"], CFG.n_dream_queries)
        uncond = unconditional_dream_hidden(p, CFG)
        return cond, uncond, valid

    cond, uncond, valid = p_fwd(params)
    frozen = {k: jax.lax.stop_gradient(params["sd_head"][k]) for k in ("unet", "vae")}

    def f_head(c, u, proj):
        hp = {**frozen, **proj}
        return sdxl_head_loss(hp, HEAD_CFG, batch["images_dm"], c, u, valid,
                              jax.random.fold_in(key, 2),
                              add_time_ids=batch["add_time_ids"], latents=lat)[0]

    proj0 = {k: params["sd_head"][k] for k in ("projector", "global_projector")}
    vm, (d_cond, d_uncond, d_proj) = jax.value_and_grad(
        f_head, argnums=(0, 1, 2))(cond, uncond, proj0)

    def f_llm(p):
        embeds = multimodal_embed(p, CFG, batch["input_ids"],
                                  dream_positions=batch["dream_positions"])
        out = llama_forward(p["llm"], CFG.llm, inputs_embeds=embeds, use_flash=False)
        hidden = out["last_hidden_state"]
        lm = masked_cross_entropy(llama_logits(p["llm"], CFG.llm, hidden),
                                  batch["labels"])
        c, _ = extract_dream_hidden(hidden, batch["dream_positions"],
                                    CFG.n_dream_queries)
        u = unconditional_dream_hidden(p, CFG)
        inj = (jnp.sum(c.astype(jnp.float32) * d_cond)
               + jnp.sum(u.astype(jnp.float32) * d_uncond))
        return CFG.loss_weight_lm * lm + CFG.loss_weight_vm * inj, lm

    (_, lm), g_s = jax.value_and_grad(f_llm, has_aux=True)(params)
    # merge the head projector grads like p_opt does
    for k in d_proj:
        g_s["sd_head"][k] = jax.tree.map(lambda a, b: a + b,
                                         g_s["sd_head"][k], d_proj[k])

    # losses match
    loss_s = CFG.loss_weight_lm * lm + CFG.loss_weight_vm * vm
    np.testing.assert_allclose(float(loss_f), float(loss_s), rtol=1e-6)

    # every TRAINABLE grad matches (unet/vae frozen; fused computed their
    # grads through the vm path where split stop-gradients them)
    flat_f = jax.tree_util.tree_flatten_with_path(g_f)[0]
    flat_s = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_flatten_with_path(g_s)[0]}
    checked = 0
    for kp, vf in flat_f:
        ks = jax.tree_util.keystr(kp)
        if "'unet'" in ks or "'vae'" in ks or "clip_vision" in ks:
            continue
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(flat_s[ks]), rtol=2e-4, atol=1e-6,
            err_msg=ks)
        checked += 1
    assert checked > 10
