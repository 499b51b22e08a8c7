"""SDXL KL autoencoder (encoder / decoder / diagonal gaussian), NHWC Flax.

Parity target: /root/reference sgm/modules/diffusionmodules/model.py
(ResnetBlock:91-148, AttnBlock:158-198, Encoder:482-597, Decoder:599-743),
sgm/models/autoencoder.py (AutoencoderKL:282-321) and
sgm/modules/distributions/distributions.py:24-60, with the shipped shape
model_configs/juggernautXL.yaml:107-124 (ch 128, mult [1,2,4,4], 2 res
blocks, no spatial attn — mid-block attn only, z=4, double_z).

The refinement engine keeps TWO encoders sharing one architecture: the
original SDXL `encoder` and a fine-tuned `denoise_encoder` (a weight-level
copy, models/SR_model.py:22); both feed the same `quant_conv`.

TPU notes: NHWC; GroupNorm in fp32; the single mid AttnBlock flattens to
(H/8*W/8) tokens and runs as one batched matmul pair; downsample uses the SD
asymmetric (0,1)x(0,1) pad + stride-2 VALID conv.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    double_z: bool = True
    in_channels: int = 3
    out_ch: int = 3
    scale_factor: float = 0.13025  # juggernautXL.yaml:6
    dtype: jnp.dtype = jnp.float32


SDXL_VAE_CONFIG = VAEConfig()

# Shared GroupNorm (fp32 stats, tile-collective option for the tiled VAE).
from ...ops.norm import GroupNorm32  # noqa: E402


def _norm(name: str):
    # SD 'Normalize': GroupNorm(32, eps=1e-6)
    return GroupNorm32(epsilon=1e-6, name=name)


class VAEResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _norm("norm1")(x)
        h = nn.swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = _norm("norm2")(h)
        h = nn.swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head full attention over spatial tokens (model.py:158-198)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hnorm = _norm("norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hnorm).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hnorm).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hnorm).reshape(b, h * w, c)
        attn = jnp.einsum("bqc,bkc->bqk", q, k,
                          preferred_element_type=jnp.float32) / math.sqrt(c)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    """SD asymmetric pad (right/bottom) + stride-2 VALID conv (model.py:71-88)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(c, (3, 3), strides=2, padding="VALID", dtype=self.dtype,
                       name="conv")(x)


class Upsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.ch, (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(
            x.astype(cfg.dtype))
        for i, mult in enumerate(cfg.ch_mult):
            ch = cfg.ch * mult
            for j in range(cfg.num_res_blocks):
                h = VAEResnetBlock(ch, cfg.dtype, name=f"down_{i}_block_{j}")(h)
            if i != len(cfg.ch_mult) - 1:
                h = Downsample(cfg.dtype, name=f"down_{i}_downsample")(h)
        h = VAEResnetBlock(h.shape[-1], cfg.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(cfg.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(h.shape[-1], cfg.dtype, name="mid_block_2")(h)
        h = _norm("norm_out")(h)
        h = nn.swish(h)
        out_ch = cfg.z_channels * (2 if cfg.double_z else 1)
        return nn.Conv(out_ch, (3, 3), padding=1, dtype=cfg.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=cfg.dtype, name="conv_in")(
            z.astype(cfg.dtype))
        h = VAEResnetBlock(block_in, cfg.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(cfg.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(block_in, cfg.dtype, name="mid_block_2")(h)
        for i in reversed(range(len(cfg.ch_mult))):
            ch = cfg.ch * cfg.ch_mult[i]
            for j in range(cfg.num_res_blocks + 1):
                h = VAEResnetBlock(ch, cfg.dtype, name=f"up_{i}_block_{j}")(h)
            if i != 0:
                h = Upsample(cfg.dtype, name=f"up_{i}_upsample")(h)
        h = _norm("norm_out")(h)
        h = nn.swish(h)
        return nn.Conv(cfg.out_ch, (3, 3), padding=1, dtype=cfg.dtype,
                       name="conv_out")(h).astype(jnp.float32)


class DiagonalGaussian:
    """distributions.py:24-60. moments: [..., 2*z] -> mean/logvar split."""

    def __init__(self, moments: jnp.ndarray):
        self.mean, logvar = jnp.split(moments, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape,
                                                        self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        return 0.5 * jnp.sum(self.mean**2 + jnp.exp(self.logvar) - 1.0 - self.logvar,
                             axis=(1, 2, 3))


class AutoencoderKL(nn.Module):
    """KL AE with twin encoders + quant convs (autoencoder.py:282-321 +
    SR_model.py:22,65-78). Methods:

      encode(x)              — original encoder -> scaled latent (mode)
      encode_with_denoise(x) — fine-tuned denoise encoder path
      decode(z)              — latent -> image
    """
    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.denoise_encoder = Encoder(self.cfg, name="denoise_encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        zf = 2 if self.cfg.double_z else 1
        self.quant_conv = nn.Conv(zf * self.cfg.embed_dim, (1, 1),
                                  dtype=self.cfg.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1),
                                       dtype=self.cfg.dtype, name="post_quant_conv")

    def _posterior(self, h):
        return DiagonalGaussian(self.quant_conv(h))

    def encode(self, x, sample_rng=None):
        """encode via the ORIGINAL encoder; scale_factor applied
        (SR_model.py:58-62; AutoencoderKLInferenceWrapper samples when a rng
        is given, autoencoder.py:319-321)."""
        post = self._posterior(self.encoder(x))
        z = post.sample(sample_rng) if sample_rng is not None else post.mode()
        return self.cfg.scale_factor * z

    def encode_with_denoise(self, x, sample_rng=None):
        """encode via the fine-tuned denoise encoder (SR_model.py:65-78)."""
        post = self._posterior(self.denoise_encoder(x))
        z = post.sample(sample_rng) if sample_rng is not None else post.mode()
        return self.cfg.scale_factor * z

    def decode(self, z):
        z = z / self.cfg.scale_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        """init-friendly full pass."""
        z = self.encode_with_denoise(x)
        _ = self.encode(x)
        return self.decode(z)
