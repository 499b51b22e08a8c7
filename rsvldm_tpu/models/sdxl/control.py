"""GLVControl ControlNet + ZeroSFT/ZeroCrossAttn injection UNet.

Parity target: /root/reference models/modules/SR_modules.py —
GLVControl (SDXL encoder-half clone + zero-conv LQ hint, :152-537),
ZeroSFT (:59-110), ZeroCrossAttn (:113-149), LightGLVUNet XL-base wiring
(:540-657): 10 ZeroSFT built over channel plan cond=[320]*4+[640]*3+[1280]*3,
concat=[320]*2+[640]*3+[1280]*4+[0], project scale x2
(model_configs/juggernautXL.yaml:47), plus 2 ZeroCrossAttn inserted at
indices [6,3]; consumed from the top: middle, then one per output block
(skip site) and one extra before each Upsample.

TPU redesign of the fbcache split (SR_modules.py:659-883): instead of
Python-mode partial execution, the model exposes `input_stage` /
`rest_stage`; the sampler gates `rest_stage` behind lax.cond so the
first-block cache decision lives on-device in one compiled graph
(see diffusion/samplers.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.norm import GroupNorm32
from .unet import (CrossAttention, InputCell, ResBlock, SDXLUNetConfig,
                   SpatialTransformer, UNetModel, XL_BASE_CONFIG, _build_specs,
                   timestep_embedding, zeros_conv)


class ZeroSFT(nn.Module):
    """Zero-init spatial feature transform (SR_modules.py:59-110).

    __call__(c, h, h_ori=None, control_scale=1):
      pre-concat: h_raw = [h_ori|h]; h = h + zero_conv1x1(c); h = [h_ori|h];
      gamma/beta = zero 3x3 convs over silu(conv3x3(c)); out =
      GN(h)*(1+gamma)+beta, lerped with h_raw by control_scale.
    """
    norm_nc: int
    concat_nc: int = 0
    nhidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c, h, h_ori=None, control_scale=1.0):
        pre_concat = self.concat_nc != 0
        if h_ori is not None and pre_concat:
            h_raw = jnp.concatenate([h_ori, h], axis=-1)
        else:
            h_raw = h
        h = h + zeros_conv(self.norm_nc, (1, 1), self.dtype, "zero_conv")(c)
        if h_ori is not None and pre_concat:
            h = jnp.concatenate([h_ori, h], axis=-1)
        actv = nn.swish(nn.Conv(self.nhidden, (3, 3), padding=1,
                                dtype=self.dtype, name="mlp_shared")(c))
        total = self.norm_nc + self.concat_nc
        gamma = zeros_conv(total, (3, 3), self.dtype, "zero_mul", padding=1)(actv)
        beta = zeros_conv(total, (3, 3), self.dtype, "zero_add", padding=1)(actv)
        h = GroupNorm32(epsilon=1e-5, name="param_free_norm")(h)
        h = h * (gamma + 1.0) + beta
        return h * control_scale + h_raw * (1.0 - control_scale)


class ZeroCrossAttn(nn.Module):
    """Cross-attention injection control->features (SR_modules.py:113-149)."""
    query_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c, h, h_ori=None, control_scale=1.0):
        assert h_ori is None, "ZeroCrossAttn is only used at 2-arg sites"
        b, hh, ww, q_ch = h.shape
        x = GroupNorm32(epsilon=1e-5, name="norm1")(h).reshape(b, hh * ww, q_ch)
        ctx = GroupNorm32(epsilon=1e-5, name="norm2")(c)
        ctx = ctx.reshape(b, -1, c.shape[-1])
        x = CrossAttention(heads=q_ch // 64, dim_head=64, dtype=self.dtype,
                           name="attn")(x, ctx)
        return h + x.reshape(b, hh, ww, q_ch) * control_scale


class ZeroConv(nn.Module):
    """Plain zero-conv adapter (SR_modules.py:42-56; unused in the shipped
    path, kept for config parity)."""
    norm_nc: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c, h, h_ori=None, control_scale=1.0):
        h = h + zeros_conv(self.norm_nc, (1, 1), self.dtype, "zero_conv")(c)
        if h_ori is not None:
            h = jnp.concatenate([h_ori, h], axis=-1)
        return h


def derive_project_specs(cfg: SDXLUNetConfig):
    """Project-module plan in CONSUMPTION order (middle first, then per
    output block: skip site, plus a pre-upsample site for upsampling blocks).

    Generalizes the hardcoded XL-base table of SR_modules.py:544-548 — for
    the XL-base config this derivation reproduces it exactly (10 ZeroSFT +
    2 ZeroCrossAttn; validated in tests): ZeroSFT modulates every skip
    injection (norm_nc = skip channels, concat_nc = decoder stream channels)
    and the middle (concat 0); ZeroCrossAttn handles the two pre-upsample
    sites (query = block output channels).
    """
    _, out_specs, skip_ch = _build_specs(cfg)
    mid_ch = cfg.model_channels * cfg.channel_mult[-1]
    specs = [dict(kind="sft", norm_nc=mid_ch, concat_nc=0)]
    skips = list(skip_ch)
    h_ch = mid_ch
    for cell in out_specs:
        s = skips.pop()
        specs.append(dict(kind="sft", norm_nc=s, concat_nc=h_ch))
        h_ch = cell["out_ch"]
        if cell["has_up"]:
            specs.append(dict(kind="zca", query_dim=h_ch))
    return specs


def project_specs(mode: str = "XL-base", project_channel_scale: float = 2.0):
    """Reference-order (torch ModuleList index) plan, for converter parity
    (SR_modules.py:544-579). Consumption order is the reverse."""
    from .unet import XL_REFINE_CONFIG
    if mode == "XL-base":
        cfg = XL_BASE_CONFIG
    elif mode == "XL-refine":
        cfg = XL_REFINE_CONFIG
    else:
        raise NotImplementedError(mode)  # SR_modules.py:556
    return list(reversed(derive_project_specs(cfg)))


class GLVControl(nn.Module):
    """ControlNet: SDXL encoder half + zero-conv hint on the LQ latent.

    __call__(lq_latent, noisy_latent, timesteps, context, y) ->
    list of 10 multiscale features (9 input blocks + middle),
    SR_modules.py:496-537.
    """
    cfg: SDXLUNetConfig = XL_BASE_CONFIG
    input_upscale: float = 1.0

    def setup(self):
        cfg = self.cfg
        self.in_specs, _, _ = _build_specs(cfg)
        heads = lambda ch: ch // cfg.num_head_channels
        self.time_dense1 = nn.Dense(cfg.time_embed_dim, dtype=cfg.dtype)
        self.time_dense2 = nn.Dense(cfg.time_embed_dim, dtype=cfg.dtype)
        self.label_dense1 = nn.Dense(cfg.time_embed_dim, dtype=cfg.dtype)
        self.label_dense2 = nn.Dense(cfg.time_embed_dim, dtype=cfg.dtype)
        self.conv_in = nn.Conv(cfg.model_channels, (3, 3), padding=1,
                               dtype=cfg.dtype)
        self.input_cells = [
            InputCell(s["kind"], s["out_ch"], s["st_depth"],
                      heads(s["out_ch"]), cfg.num_head_channels, cfg.dtype,
                      cfg.dropout, name=f"input_{i}")
            for i, s in enumerate(self.in_specs)]
        mid_ch = cfg.model_channels * cfg.channel_mult[-1]
        self.mid_res1 = ResBlock(mid_ch, cfg.dropout, cfg.dtype)
        self.mid_transformer = SpatialTransformer(
            cfg.transformer_depth[-1], heads(mid_ch), cfg.num_head_channels,
            dtype=cfg.dtype)
        self.mid_res2 = ResBlock(mid_ch, cfg.dropout, cfg.dtype)
        self.input_hint = zeros_conv(cfg.model_channels, (3, 3), cfg.dtype,
                                     "input_hint", padding=1)

    def __call__(self, lq_latent, noisy_latent, timesteps, context, y):
        cfg = self.cfg
        x = lq_latent
        if self.input_upscale != 1.0:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, int(h * self.input_upscale),
                                     int(w * self.input_upscale), c),
                                 method="linear", antialias=True)
        t = timestep_embedding(timesteps, cfg.model_channels).astype(cfg.dtype)
        emb = self.time_dense2(nn.swish(self.time_dense1(t)))
        emb = emb + self.label_dense2(
            nn.swish(self.label_dense1(y.astype(cfg.dtype))))

        hint = self.input_hint(x.astype(cfg.dtype))
        h = self.conv_in(noisy_latent.astype(cfg.dtype)) + hint
        hs = [h]
        for cell in self.input_cells:
            h = cell(h, emb, context)
            hs.append(h)
        h = self.mid_res1(h, emb)
        h = self.mid_transformer(h, context)
        h = self.mid_res2(h, emb)
        hs.append(h)
        return hs


class ControlledUNet(nn.Module):
    """SDXL UNet + control injections (the LightGLVUNet equivalent).

    Exposes two stages for the dynamic first-block cache:
      input_stage(x, t, context, y)              -> (h, hs, emb)
      rest_stage(h, hs, emb, context, control, control_scale) -> eps-pred
    and `__call__` for the cache-off path. The injection walk mirrors
    SR_modules.py:621-657: middle injection, then per output block one
    injection replacing the plain skip-concat and one before each Upsample;
    control features are consumed from the deepest (middle) upward, the first
    three encoder features are unused.
    """
    cfg: SDXLUNetConfig = XL_BASE_CONFIG
    mode: str = "XL-base"
    project_channel_scale: float = 2.0

    def setup(self):
        self.unet = UNetModel(self.cfg, name="unet")
        specs = derive_project_specs(self.cfg)  # consumption order
        n = len(specs)
        mods = []
        for c, s in enumerate(specs):
            # names use the reference ModuleList index (= n-1-c) so torch
            # checkpoints map 1:1
            name = f"project_{n - 1 - c}"
            if s["kind"] == "sft":
                mods.append(ZeroSFT(s["norm_nc"], s["concat_nc"],
                                    dtype=self.cfg.dtype, name=name))
            else:
                mods.append(ZeroCrossAttn(s["query_dim"], dtype=self.cfg.dtype,
                                          name=name))
        self.projects = mods  # consumption order

    def input_stage(self, x, timesteps, context, y):
        emb = self.unet.time_cond(timesteps, y)
        h, hs = self.unet.encode(x, emb, context)
        return h, hs, emb

    def rest_stage(self, h, hs, emb, context, control, control_scale=1.0):
        h = self.unet.middle(h, emb, context)
        projects = list(self.projects)  # consumption order: middle first
        ci = len(control) - 1
        h = projects.pop(0)(control[ci], h, None, control_scale)
        ci -= 1
        hs = list(hs)
        for cell in self.unet.output_cells:
            skip = hs.pop()
            h = projects.pop(0)(control[ci], skip, h, control_scale)
            h = cell.main(h, emb, context)
            if cell.has_up:
                h = projects.pop(0)(control[ci], h, None, control_scale)
                h = cell.up(h)
            ci -= 1
        assert not projects
        return self.unet.final(h)

    def __call__(self, x, timesteps, context, y, control, control_scale=1.0):
        h, hs, emb = self.input_stage(x, timesteps, context, y)
        return self.rest_stage(h, hs, emb, context, control, control_scale)
