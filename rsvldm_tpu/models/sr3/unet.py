"""SR3 denoising UNet (WaveGrad-style continuous-noise conditioning), NHWC.

Functional parity target: /root/reference models/sr3_model/sr3_modules/unet.py
(PositionalEncoding:19-32, FeatureWiseAffine:35-51, ResnetBlock:95-111,
SelfAttention:114-143, UNet:162-261) with the shipped config
configs/sr_sr3.json:41-57 (in 6ch, inner 64, mults [1,2,4,8,8], 1 res block,
attn@28, image 224).

TPU-first design notes
  * NHWC layout end-to-end — convs map straight onto the MXU.
  * The full O((HW)^2) self-attention at 28x28 (784 tokens) is a single
    batched matmul pair — small enough that plain dot_general beats a flash
    kernel; it runs in fp32 accumulation via preferred_element_type.
  * Everything is shape-static; the 500-step sampling loop scans over this
    module without retracing.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SR3UNetConfig:
    in_channel: int = 6
    out_channel: int = 3
    inner_channel: int = 64
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8)
    attn_res: Sequence[int] = (28,)
    res_blocks: int = 1
    dropout: float = 0.0  # inference default; training uses 0.2
    image_size: int = 224
    dtype: jnp.dtype = jnp.float32  # compute dtype (bf16 on TPU)


def noise_level_embedding(noise_level: jnp.ndarray, dim: int) -> jnp.ndarray:
    """WaveGrad positional encoding of a continuous noise level (unet.py:19-32).

    noise_level: [B] or [B,1] sqrt-alpha-cumprod values -> [B, dim].
    """
    noise_level = noise_level.reshape(-1)
    count = dim // 2
    step = jnp.arange(count, dtype=jnp.float32) / count
    enc = noise_level[:, None].astype(jnp.float32) * jnp.exp(-math.log(1e4) * step[None, :])
    return jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-1)


class NoiseLevelMLP(nn.Module):
    """PositionalEncoding -> Dense(4d) -> swish -> Dense(d) (unet.py:180-185)."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, noise_level):
        t = noise_level_embedding(noise_level, self.dim)
        t = nn.Dense(self.dim * 4, dtype=self.dtype, name="fc1")(t)
        t = nn.swish(t)
        t = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(t)
        return t


class ConvBlock(nn.Module):
    """GroupNorm -> swish -> (dropout) -> 3x3 conv (unet.py:81-92)."""
    dim_out: int
    groups: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=jnp.float32,
                         name="norm")(x)
        h = nn.swish(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype, name="conv")(h)
        return h


class ResnetBlock(nn.Module):
    """Two ConvBlocks with additive noise-embedding injection between them
    (FeatureWiseAffine with use_affine_level=False, unet.py:35-51,95-111)."""
    dim_out: int
    groups: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, deterministic: bool = True):
        h = ConvBlock(self.dim_out, self.groups, dtype=self.dtype, name="block1")(x)
        h = h + nn.Dense(self.dim_out, dtype=self.dtype,
                         name="noise_func")(temb)[:, None, None, :]
        h = ConvBlock(self.dim_out, self.groups, self.dropout, dtype=self.dtype,
                      name="block2")(h, deterministic)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="res_conv")(x)
        return h + x


class SelfAttention2D(nn.Module):
    """Single-head full self-attention over spatial tokens (unet.py:114-143).

    qkv via 1x1 conv (no bias), scale 1/sqrt(C), residual output conv.
    At 28x28 this is a 784-token attention — one MXU-friendly matmul pair.
    """
    groups: int = 32
    n_head: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        head_dim = c // self.n_head
        norm = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=jnp.float32,
                            name="norm")(x)
        qkv = nn.Conv(c * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      name="qkv")(norm)
        qkv = qkv.reshape(b, h * w, self.n_head, 3 * head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # [b, hw, heads, hd]
        attn = jnp.einsum("bqnd,bknd->bnqk", q, k,
                          preferred_element_type=jnp.float32) / math.sqrt(c)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnqk,bknd->bqnd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="out")(out)
        return out + x


class ResnetBlockWithAttn(nn.Module):
    dim_out: int
    groups: int = 32
    dropout: float = 0.0
    with_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, deterministic: bool = True):
        x = ResnetBlock(self.dim_out, self.groups, self.dropout, self.dtype,
                        name="res_block")(x, temb, deterministic)
        if self.with_attn:
            x = SelfAttention2D(self.groups, dtype=self.dtype, name="attn")(x)
        return x


class SR3UNet(nn.Module):
    """Encoder/mid/decoder UNet with skip-concat at every recorded feature
    (unet.py:162-261). Input is channel-concat [bicubic_LR, x_t] (6 ch)."""
    cfg: SR3UNetConfig

    @nn.compact
    def __call__(self, x, noise_level, deterministic: bool = True):
        cfg = self.cfg
        temb = NoiseLevelMLP(cfg.inner_channel, cfg.dtype,
                             name="noise_level_mlp")(noise_level)

        num_mults = len(cfg.channel_mults)
        now_res = cfg.image_size

        x = x.astype(cfg.dtype)
        feats = []
        h = nn.Conv(cfg.inner_channel, (3, 3), padding=1, dtype=cfg.dtype,
                    name="conv_in")(x)
        feats.append(h)
        # --- encoder ---
        for ind in range(num_mults):
            is_last = ind == num_mults - 1
            use_attn = now_res in cfg.attn_res
            ch = cfg.inner_channel * cfg.channel_mults[ind]
            for blk in range(cfg.res_blocks):
                h = ResnetBlockWithAttn(ch, cfg.norm_groups, cfg.dropout, use_attn,
                                        cfg.dtype, name=f"down_{ind}_{blk}")(
                    h, temb, deterministic)
                feats.append(h)
            if not is_last:
                h = nn.Conv(h.shape[-1], (3, 3), strides=2, padding=1,
                            dtype=cfg.dtype, name=f"downsample_{ind}")(h)
                feats.append(h)
                now_res //= 2
        # --- middle ---
        h = ResnetBlockWithAttn(h.shape[-1], cfg.norm_groups, cfg.dropout, True,
                                cfg.dtype, name="mid_0")(h, temb, deterministic)
        h = ResnetBlockWithAttn(h.shape[-1], cfg.norm_groups, cfg.dropout, False,
                                cfg.dtype, name="mid_1")(h, temb, deterministic)
        # --- decoder ---
        for rev, ind in enumerate(reversed(range(num_mults))):
            is_last = ind < 1
            use_attn = now_res in cfg.attn_res
            ch = cfg.inner_channel * cfg.channel_mults[ind]
            for blk in range(cfg.res_blocks + 1):
                skip = feats.pop()
                h = ResnetBlockWithAttn(ch, cfg.norm_groups, cfg.dropout, use_attn,
                                        cfg.dtype, name=f"up_{ind}_{blk}")(
                    jnp.concatenate([h, skip], axis=-1), temb, deterministic)
            if not is_last:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), method="nearest")
                h = nn.Conv(cc, (3, 3), padding=1, dtype=cfg.dtype,
                            name=f"upsample_{ind}")(h)
                now_res *= 2
        assert not feats
        out = ConvBlock(cfg.out_channel, cfg.norm_groups, dtype=cfg.dtype,
                        name="final_conv")(h, deterministic)
        return out.astype(jnp.float32)
