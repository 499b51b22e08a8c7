"""SDXL UNet (XL-base shape) in NHWC Flax, decomposed for first-block caching.

Parity target: /root/reference sgm/modules/diffusionmodules/openaimodel.py
(UNetModel:500-1007, ResBlock:207, Upsample:102/Downsample:164,
timestep_embedding at util.py:206) and sgm/modules/attention.py
(BasicTransformerBlock:376+, SpatialTransformer:533-635, GEGLU FF) with the
shipped hyperparams model_configs/juggernautXL.yaml:43-64 (320 ch, mult
[1,2,4], 2 res blocks, attn at ds {2,4}, transformer depth [1,2,10], heads =
ch/64, ctx 2048, adm 2816, 'sequential' label embedding).

TPU-first design
  * NHWC; transformer tokens are [B, H*W, C] fed to the shared Pallas/XLA
    attention op (ops/attention.py) — self-attn up to 16k tokens, cross-attn
    to 77 text tokens.
  * The model is exposed as three stages — `encode` (conv_in + input blocks),
    `middle_decode` (middle + output blocks + out) — so the sampler can gate
    middle_decode behind a lax.cond for the dynamic first-block cache
    (reference DFBCache / LightGLVUNet fbcache modes, SR_modules.py:659-883)
    while keeping ONE static compiled graph.
  * bf16 compute / fp32 GroupNorm+softmax via ops.norm / ops.attention.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.attention import attention
from ...ops.norm import GroupNorm32


@dataclasses.dataclass(frozen=True)
class SDXLUNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2)  # downsample factors with attn
    channel_mult: Sequence[int] = (1, 2, 4)
    num_head_channels: int = 64
    transformer_depth: Sequence[int] = (1, 2, 10)
    context_dim: int = 2048
    adm_in_channels: int = 2816
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.model_channels * 4


XL_BASE_CONFIG = SDXLUNetConfig()

# SDXL refiner UNet (the mode='XL-refine' branch of SR_modules.py:550-555;
# shape constants from Stability's sd_xl_refiner config): 384 base channels,
# 4 levels, depth-4 transformers at every attention level, 1280-d context
# (bigG only), 2560-d vector cond
XL_REFINE_CONFIG = SDXLUNetConfig(model_channels=384,
                                  channel_mult=(1, 2, 4, 4),
                                  num_res_blocks=2,
                                  attention_resolutions=(2, 4),
                                  transformer_depth=(4, 4, 4, 4),
                                  context_dim=1280, adm_in_channels=2560)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embedding, [cos|sin] order (util.py:206-231)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def zeros_conv(features, kernel, dtype, name, padding=0):
    return nn.Conv(features, kernel, padding=padding, dtype=dtype, name=name,
                   kernel_init=nn.initializers.zeros,
                   bias_init=nn.initializers.zeros)


class ResBlock(nn.Module):
    """GN/silu/conv -> +emb -> GN/silu/zero-conv + skip (openaimodel.py:207)."""
    out_channels: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        h = GroupNorm32(epsilon=1e-5, name="in_norm")(x)
        h = nn.swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="in_conv")(h)
        e = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="emb_proj")(nn.swish(emb))
        h = h + e[:, None, None, :].astype(h.dtype)
        h = GroupNorm32(epsilon=1e-5, name="out_norm")(h)
        h = nn.swish(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = zeros_conv(self.out_channels, (3, 3), self.dtype, "out_conv",
                       padding=1)(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="skip")(x)
        return x + h


class CrossAttention(nn.Module):
    """Projections around the shared attention op (attention.py:196-373)."""
    heads: int
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, sk, self.heads, self.dim_head)
        v = v.reshape(b, sk, self.heads, self.dim_head)
        out = attention(q, k, v).reshape(b, sq, inner)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class FeedForwardGEGLU(nn.Module):
    dtype: jnp.dtype = jnp.float32
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Dense(c * self.mult * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate)
        return nn.Dense(c, dtype=self.dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        ln = lambda n: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=n)
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype,
                               name="attn1")(ln("norm1")(x))
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype,
                               name="attn2")(ln("norm2")(x), context)
        x = x + FeedForwardGEGLU(self.dtype, name="ff")(ln("norm3")(x))
        return x


class SpatialTransformer(nn.Module):
    """GN -> linear proj_in -> depth x transformer block -> zero proj_out +
    residual (attention.py:533-635, use_linear=True)."""
    depth: int
    heads: int
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        y = GroupNorm32(epsilon=1e-6, name="norm")(x)
        y = y.reshape(b, h * w, c)
        y = nn.Dense(c, dtype=self.dtype, name="proj_in")(y)
        for d in range(self.depth):
            y = BasicTransformerBlock(self.heads, self.dim_head, self.dtype,
                                      name=f"block_{d}")(y, context)
        y = nn.Dense(c, dtype=self.dtype, name="proj_out",
                     kernel_init=nn.initializers.zeros)(y)
        return y.reshape(b, h, w, c) + residual


class InputCell(nn.Module):
    """One input_blocks entry: res(+transformer) or downsample."""
    kind: str              # "res" | "down"
    out_channels: int = 0
    st_depth: int = 0
    heads: int = 0
    dim_head: int = 64
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, h, emb, context):
        if self.kind == "down":
            return nn.Conv(h.shape[-1], (3, 3), strides=2, padding=1,
                           dtype=self.dtype, name="down_conv")(h)
        h = ResBlock(self.out_channels, self.dropout, self.dtype,
                     name="resblock")(h, emb)
        if self.st_depth > 0:
            h = SpatialTransformer(self.st_depth, self.heads, self.dim_head,
                                   dtype=self.dtype,
                                   name="transformer")(h, context)
        return h


class OutputCell(nn.Module):
    """One output_blocks entry. `main` runs res(+transformer); `up` runs the
    optional trailing Upsample — split so control injections can land between
    them (SR_modules.py:641-652)."""
    out_channels: int
    st_depth: int = 0
    heads: int = 0
    dim_head: int = 64
    has_up: bool = False
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0

    def setup(self):
        self.resblock = ResBlock(self.out_channels, self.dropout, self.dtype)
        if self.st_depth > 0:
            self.transformer = SpatialTransformer(self.st_depth, self.heads,
                                                  self.dim_head,
                                                  dtype=self.dtype)
        if self.has_up:
            self.up_conv = nn.Conv(self.out_channels, (3, 3), padding=1,
                                   dtype=self.dtype)

    def main(self, h, emb, context):
        h = self.resblock(h, emb)
        if self.st_depth > 0:
            h = self.transformer(h, context)
        return h

    def up(self, h):
        b, hh, ww, c = h.shape
        h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
        return self.up_conv(h)

    def __call__(self, h, emb, context):
        h = self.main(h, emb, context)
        if self.has_up:
            h = self.up(h)
        return h


def _build_specs(cfg: SDXLUNetConfig):
    """Static block plan: returns (input_specs, output_specs, skip_channels).

    input_specs entries: dict(kind, out_ch, st_depth); output mirrors the
    torch construction loop (openaimodel.py:629-759) so parameter trees line
    up 1:1 with checkpoints."""
    in_specs = []
    skip_ch = [cfg.model_channels]
    ch = cfg.model_channels
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        out_ch = cfg.model_channels * mult
        depth = cfg.transformer_depth[level] if ds in cfg.attention_resolutions else 0
        for _ in range(cfg.num_res_blocks):
            in_specs.append(dict(kind="res", out_ch=out_ch, st_depth=depth))
            ch = out_ch
            skip_ch.append(ch)
        if level != len(cfg.channel_mult) - 1:
            in_specs.append(dict(kind="down", out_ch=ch, st_depth=0))
            skip_ch.append(ch)
            ds *= 2

    out_specs = []
    for level in reversed(range(len(cfg.channel_mult))):
        out_ch = cfg.model_channels * cfg.channel_mult[level]
        depth = cfg.transformer_depth[level] if ds in cfg.attention_resolutions else 0
        for i in range(cfg.num_res_blocks + 1):
            has_up = (level != 0) and (i == cfg.num_res_blocks)
            out_specs.append(dict(out_ch=out_ch, st_depth=depth, has_up=has_up))
            if has_up:
                ds //= 2
    return in_specs, out_specs, skip_ch


class UNetModel(nn.Module):
    """Full SDXL UNet; also exposes encode/middle/decode stages."""
    cfg: SDXLUNetConfig = XL_BASE_CONFIG

    def setup(self):
        cfg = self.cfg
        self.in_specs, self.out_specs, _ = _build_specs(cfg)
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

        self.output_cells = [
            OutputCell(s["out_ch"], s["st_depth"], heads(s["out_ch"]),
                       cfg.num_head_channels, s["has_up"], cfg.dtype,
                       cfg.dropout, name=f"output_{i}")
            for i, s in enumerate(self.out_specs)]

        self.out_norm = GroupNorm32(epsilon=1e-5)
        self.out_conv = zeros_conv(cfg.out_channels, (3, 3), cfg.dtype,
                                   "out_conv", padding=1)

    # --- conditioning ---
    def time_cond(self, timesteps, y):
        """emb = time_embed(t_emb) + label_emb(y) (openaimodel.py:973-990)."""
        t = timestep_embedding(timesteps, self.cfg.model_channels)
        t = t.astype(self.cfg.dtype)
        emb = self.time_dense2(nn.swish(self.time_dense1(t)))
        if y is not None:
            emb = emb + self.label_dense2(
                nn.swish(self.label_dense1(y.astype(self.cfg.dtype))))
        return emb

    # --- stages ---
    def encode(self, x, emb, context):
        """conv_in + input blocks -> (h, skip list)."""
        h = self.conv_in(x.astype(self.cfg.dtype))
        hs = [h]
        for cell in self.input_cells:
            h = cell(h, emb, context)
            hs.append(h)
        return h, hs

    def middle(self, h, emb, context):
        h = self.mid_res1(h, emb)
        h = self.mid_transformer(h, context)
        return self.mid_res2(h, emb)

    def decode(self, h, hs, emb, context):
        """Plain skip-concat decode (no control injection)."""
        hs = list(hs)
        for cell in self.output_cells:
            h = cell(jnp.concatenate([h, hs.pop()], axis=-1), emb, context)
        return self.final(h)

    def final(self, h):
        h = self.out_norm(h)
        h = nn.swish(h)
        return self.out_conv(h).astype(jnp.float32)

    def __call__(self, x, timesteps, context, y):
        emb = self.time_cond(timesteps, y)
        h, hs = self.encode(x, emb, context)
        h = self.middle(h, emb, context)
        return self.decode(h, hs, emb, context)
