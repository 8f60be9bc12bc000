"""Independent PyTorch reference of the SD UNet / VAE for numerical parity.

Written from the published Stable Diffusion / diffusers architecture
semantics (UNet2DConditionModel with use_linear_projection, AutoencoderKL) —
NOT from the JAX implementation under test — so agreement between the two is
genuine cross-implementation evidence. diffusers itself is not installed in
this image; submodule names are chosen to produce diffusers-format
state_dict keys, so ``load_state_dict(export_*_state_dict(params),
strict=True)`` additionally validates the converter's key set and weight
layout (reference architecture: omni plugins drive diffusers
AutoencoderKL/UNet2DConditionModel, modeling_plugins.py:375-381).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    """get_timestep_embedding: flip_sin_to_cos=True, downscale_freq_shift=0."""
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class ResnetBlock2D(nn.Module):
    def __init__(self, cin, cout, temb_dim=None, groups=32, eps=1e-6):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class VAEAttention(nn.Module):
    """diffusers Attention as used in the VAE mid block (1 head, residual)."""

    def __init__(self, c, groups=32, eps=1e-6):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=eps)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        a = F.scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None]
        )[:, 0]
        return x + self.to_out[0](a).transpose(1, 2).reshape(b, c, h, w)


class CrossAttention(nn.Module):
    def __init__(self, c, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(ctx_dim, c)
        self.to_v = nn.Linear(ctx_dim, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, c = x.shape
        hd = c // self.heads
        q = self.to_q(x).reshape(b, s, self.heads, hd).transpose(1, 2)
        k = self.to_k(ctx).reshape(b, ctx.shape[1], self.heads, hd).transpose(1, 2)
        v = self.to_v(ctx).reshape(b, ctx.shape[1], self.heads, hd).transpose(1, 2)
        a = F.scaled_dot_product_attention(q, k, v)
        a = a.transpose(1, 2).reshape(b, s, c)
        return self.to_out[0](a)


class GEGLUFeedForward(nn.Module):
    """diffusers FeedForward with GEGLU: net.0 = GEGLU proj, net.2 = out."""

    def __init__(self, c, inner):
        super().__init__()
        self.net = nn.ModuleList([
            nn.Module(),            # net.0: GEGLU holder
            nn.Identity(),          # net.1: dropout
            nn.Linear(inner, c),    # net.2
        ])
        self.net[0].proj = nn.Linear(c, 2 * inner)

    def forward(self, x):
        hidden, gate = self.net[0].proj(x).chunk(2, dim=-1)
        return self.net[2](hidden * F.gelu(gate))


class BasicTransformerBlock(nn.Module):
    def __init__(self, c, ctx_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(c)
        self.attn1 = CrossAttention(c, c, heads)
        self.norm2 = nn.LayerNorm(c)
        self.attn2 = CrossAttention(c, ctx_dim, heads)
        self.norm3 = nn.LayerNorm(c)
        self.ff = GEGLUFeedForward(c, 4 * c)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class Transformer2DModel(nn.Module):
    """use_linear_projection=True variant (SD 2.x / SDXL)."""

    def __init__(self, c, ctx_dim, heads, n_layers, groups=32):
        super().__init__()
        self.norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = nn.Linear(c, c)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(c, ctx_dim, heads) for _ in range(n_layers)]
        )
        self.proj_out = nn.Linear(c, c)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        y = self.norm(x).reshape(b, c, h * w).transpose(1, 2)
        y = self.proj_in(y)
        for blk in self.transformer_blocks:
            y = blk(y, ctx)
        y = self.proj_out(y)
        return res + y.transpose(1, 2).reshape(b, c, h, w)


class Downsample2D(nn.Module):
    """UNet variant: stride-2 conv, symmetric padding 1. (The VAE encoder
    uses padding=0 + asymmetric (0,1,0,1) F.pad — see VAEDownsample.)"""

    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class VAEDownsample(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class Upsample2D(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


# ---------------------------------------------------------------------------
# UNet2DConditionModel
# ---------------------------------------------------------------------------


class TorchUNet(nn.Module):
    """Mirrors UNet2DConditionModel for the config subset our UNetConfig
    covers; built from `cfg` (our dataclass) but with diffusers semantics."""

    def __init__(self, cfg):
        super().__init__()
        ch = cfg.block_out_channels
        ted = cfg.time_embed_dim
        g = cfg.norm_num_groups
        self.cfg = cfg

        self.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(ch[0], ted)
        self.time_embedding.linear_2 = nn.Linear(ted, ted)
        if cfg.addition_embed_type == "text_time":
            self.add_embedding = nn.Module()
            self.add_embedding.linear_1 = nn.Linear(
                cfg.projection_class_embeddings_input_dim, ted
            )
            self.add_embedding.linear_2 = nn.Linear(ted, ted)

        self.down_blocks = nn.ModuleList()
        cin = ch[0]
        for i, btype in enumerate(cfg.down_block_types):
            cout = ch[i]
            blk = nn.Module()
            blk.resnets = nn.ModuleList([
                ResnetBlock2D(cin if j == 0 else cout, cout, ted, g, eps=1e-5)
                for j in range(cfg.layers_per_block)
            ])
            if btype == "CrossAttnDownBlock2D":
                blk.attentions = nn.ModuleList([
                    Transformer2DModel(
                        cout, cfg.cross_attention_dim, cfg.num_attention_heads[i],
                        cfg.transformer_layers_per_block[i], g,
                    )
                    for _ in range(cfg.layers_per_block)
                ])
            if i < len(ch) - 1:
                blk.downsamplers = nn.ModuleList([Downsample2D(cout)])
            self.down_blocks.append(blk)
            cin = cout

        c_mid = ch[-1]
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList([
            ResnetBlock2D(c_mid, c_mid, ted, g, eps=1e-5),
            ResnetBlock2D(c_mid, c_mid, ted, g, eps=1e-5),
        ])
        self.mid_block.attentions = nn.ModuleList([
            Transformer2DModel(
                c_mid, cfg.cross_attention_dim, cfg.num_attention_heads[-1],
                cfg.transformer_layers_per_block[-1], g,
            )
        ])

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(ch))
        rev_heads = list(reversed(cfg.num_attention_heads))
        rev_tl = list(reversed(cfg.transformer_layers_per_block))
        prev_out = rev[0]
        n = len(ch)
        for i, btype in enumerate(cfg.up_block_types):
            cout = rev[i]
            cin_skip_last = rev[min(i + 1, n - 1)]
            blk = nn.Module()
            resnets = []
            for j in range(cfg.layers_per_block + 1):
                skip_ch = cin_skip_last if j == cfg.layers_per_block else cout
                rin = prev_out if j == 0 else cout
                resnets.append(ResnetBlock2D(rin + skip_ch, cout, ted, g, eps=1e-5))
            blk.resnets = nn.ModuleList(resnets)
            if btype == "CrossAttnUpBlock2D":
                blk.attentions = nn.ModuleList([
                    Transformer2DModel(
                        cout, cfg.cross_attention_dim, rev_heads[i], rev_tl[i], g
                    )
                    for _ in range(cfg.layers_per_block + 1)
                ])
            if i < n - 1:
                blk.upsamplers = nn.ModuleList([Upsample2D(cout)])
            self.up_blocks.append(blk)
            prev_out = cout

        self.conv_norm_out = nn.GroupNorm(g, ch[0], eps=1e-5)
        self.conv_out = nn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states, added_cond=None):
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = timesteps.expand(sample.shape[0])
        temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(temb))
        )
        if cfg.addition_embed_type == "text_time":
            tids = added_cond["time_ids"]
            tid_emb = timestep_embedding(
                tids.reshape(-1), cfg.addition_time_embed_dim
            ).reshape(tids.shape[0], -1)
            add = torch.cat([added_cond["text_embeds"], tid_emb], dim=-1)
            temb = temb + self.add_embedding.linear_2(
                F.silu(self.add_embedding.linear_1(add))
            )
        ctx = encoder_hidden_states

        h = self.conv_in(sample)
        skips = [h]
        for blk in self.down_blocks:
            for j, r in enumerate(blk.resnets):
                h = r(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                skips.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)

        for blk in self.up_blocks:
            for j, r in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = r(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)

        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ---------------------------------------------------------------------------
# AutoencoderKL
# ---------------------------------------------------------------------------


class TorchVAE(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.cfg = cfg

        enc = nn.Module()
        enc.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        cin = ch[0]
        for i, cout in enumerate(ch):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([
                ResnetBlock2D(cin if j == 0 else cout, cout, None, g)
                for j in range(cfg.layers_per_block)
            ])
            if i < len(ch) - 1:
                blk.downsamplers = nn.ModuleList([VAEDownsample(cout)])
            enc.down_blocks.append(blk)
            cin = cout
        c_mid = ch[-1]
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(c_mid, c_mid, None, g), ResnetBlock2D(c_mid, c_mid, None, g)]
        )
        enc.mid_block.attentions = nn.ModuleList([VAEAttention(c_mid, g)])
        enc.conv_norm_out = nn.GroupNorm(g, c_mid, eps=1e-6)
        enc.conv_out = nn.Conv2d(c_mid, 2 * cfg.latent_channels, 3, padding=1)
        self.encoder = enc

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(cfg.latent_channels, ch[-1], 3, padding=1)
        dec.mid_block = nn.Module()
        dec.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(c_mid, c_mid, None, g), ResnetBlock2D(c_mid, c_mid, None, g)]
        )
        dec.mid_block.attentions = nn.ModuleList([VAEAttention(c_mid, g)])
        dec.up_blocks = nn.ModuleList()
        rev = list(reversed(ch))
        cin = rev[0]
        for i, cout in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([
                ResnetBlock2D(cin if j == 0 else cout, cout, None, g)
                for j in range(cfg.layers_per_block + 1)
            ])
            if i < len(rev) - 1:
                blk.upsamplers = nn.ModuleList([Upsample2D(cout)])
            dec.up_blocks.append(blk)
            cin = cout
        dec.conv_norm_out = nn.GroupNorm(g, ch[0], eps=1e-6)
        dec.conv_out = nn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)
        self.decoder = dec

        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels, cfg.latent_channels, 1)

    def encode_moments(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for blk in e.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.attentions[0](h)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        d = self.decoder
        h = self.post_quant_conv(z)
        h = d.conv_in(h)
        h = d.mid_block.resnets[0](h)
        h = d.mid_block.attentions[0](h)
        h = d.mid_block.resnets[1](h)
        for blk in d.up_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return d.conv_out(F.silu(d.conv_norm_out(h)))
