"""Auxiliary sgm embedders (dormant in the shipped juggernautXL config but
part of the reference's conditioner inventory — sgm/modules/encoders/
modules.py): ClassEmbedder (:319-339), SpatialRescaler (:876-934),
LowScaleEncoder (:936-1028), GaussianEncoder (:1050-1066), and an image
embedder covering FrozenOpenCLIPImageEmbedder's pooled-CLIP contract
(:688-874).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class ClassEmbedder(nn.Module):
    """Class-label vector cond; class n_classes-1 is the ucg class
    (modules.py:332-339)."""
    embed_dim: int
    n_classes: int = 1000
    add_sequence_dim: bool = False

    @nn.compact
    def __call__(self, c: jnp.ndarray) -> jnp.ndarray:
        e = nn.Embed(self.n_classes, self.embed_dim, name="embedding")(c)
        return e[:, None, :] if self.add_sequence_dim else e

    def unconditional_class(self) -> int:
        return self.n_classes - 1


class SpatialRescaler(nn.Module):
    """n_stages x scale-by-multiplier resize (+ optional 1x1..k channel
    mapper). NHWC; method names follow torch interpolate modes."""
    n_stages: int = 1
    method: str = "bilinear"
    multiplier: float = 0.5
    out_channels: Optional[int] = None
    kernel_size: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        meth = {"nearest": "nearest", "bilinear": "linear",
                "linear": "linear", "bicubic": "cubic"}[self.method]
        for _ in range(self.n_stages):
            n, h, w, c = x.shape
            x = jax.image.resize(
                x, (n, int(h * self.multiplier), int(w * self.multiplier), c),
                method=meth)
        if self.out_channels is not None:
            x = nn.Conv(self.out_channels,
                        (self.kernel_size, self.kernel_size),
                        padding=self.kernel_size // 2,
                        use_bias=self.use_bias, name="channel_mapper")(x)
        return x


@dataclasses.dataclass
class LowScaleEncoder:
    """Noise-augmented low-res conditioning (modules.py:936-1022): VAE
    encode -> scale -> q_sample at a random noise level -> nearest resize.
    encode_fn: image -> latent (sampling the posterior is the caller's
    choice, matching `z.sample()` there)."""
    encode_fn: Callable
    betas: jnp.ndarray            # from diffusion.schedules.make_beta_schedule
    max_noise_level: int = 250
    out_size: Optional[int] = 64
    scale_factor: float = 1.0

    def __post_init__(self):
        a = jnp.cumprod(1.0 - self.betas)
        self.sqrt_ac = jnp.sqrt(a)
        self.sqrt_1mac = jnp.sqrt(1.0 - a)

    def q_sample(self, z, t, noise):
        shape = (-1,) + (1,) * (z.ndim - 1)
        return (self.sqrt_ac[t].reshape(shape) * z
                + self.sqrt_1mac[t].reshape(shape) * noise)

    def __call__(self, x: jnp.ndarray, rng: jax.Array):
        z = self.encode_fn(x) * self.scale_factor
        k1, k2 = jax.random.split(rng)
        t = jax.random.randint(k1, (x.shape[0],), 0, self.max_noise_level)
        z = self.q_sample(z, t, jax.random.normal(k2, z.shape, z.dtype))
        if self.out_size is not None:
            n, _, _, c = z.shape
            z = jax.image.resize(z, (n, self.out_size, self.out_size, c),
                                 method="nearest")
        return z, t


def gaussian_encode(encoder_apply: Callable, x: jnp.ndarray, rng: jax.Array,
                    flatten_output: bool = True):
    """GaussianEncoder (modules.py:1050-1066): VAE-encoder moments ->
    posterior sample (+ KL as the regularizer loss)."""
    from ..vae.model import DiagonalGaussian
    moments = encoder_apply(x)
    post = DiagonalGaussian(moments)
    z = post.sample(rng)
    log = {"kl_loss": jnp.mean(post.kl()), "loss": jnp.mean(post.kl())}
    if flatten_output:
        n, h, w, c = z.shape
        z = z.reshape(n, h * w, c)
    return log, z


@dataclasses.dataclass
class ImageEmbedder:
    """Pooled-CLIP image conditioning (FrozenOpenCLIPImageEmbedder's
    contract, modules.py:688-874): CLIP-normalize, vision forward, pool,
    optional ucg zeroing and repeat-to-max-len. vision_apply provides the
    tower (our CLIPVisionTower or a converted open_clip ViT-H)."""
    vision_apply: Callable        # pixels [N,H,W,3] -> tokens [N,T,C]
    pool: str = "cls"             # open_clip pooled output uses the CLS site
    repeat_to_max_len: int = 0

    MEAN = (0.48145466, 0.4578275, 0.40821073)
    STD = (0.26862954, 0.26130258, 0.27577711)

    def __call__(self, images: jnp.ndarray, ucg_mask=None) -> jnp.ndarray:
        """images in [-1, 1] (the reference preprocesses (x+1)/2 then
        normalizes, modules.py:746-760)."""
        x = (images + 1.0) / 2.0
        x = (x - jnp.asarray(self.MEAN)) / jnp.asarray(self.STD)
        tokens = self.vision_apply(x)
        emb = tokens[:, 0] if self.pool == "cls" else tokens.mean(axis=1)
        if ucg_mask is not None:  # zero unconditional rows (modules.py:781)
            emb = emb * ucg_mask[:, None].astype(emb.dtype)
        if self.repeat_to_max_len:
            return jnp.repeat(emb[:, None], self.repeat_to_max_len, axis=1)
        return emb


def byt5_tokenize(text: str, max_length: int = 77) -> "jnp.ndarray":
    """ByT5 byte-level tokenization (FrozenByT5Embedder, modules.py:428-470):
    utf-8 bytes + 3 (ids 0..2 are pad/eos/unk), eos-terminated, padded to
    max_length — the character-aware variant runs through the same
    T5Encoder."""
    ids = [b + 3 for b in text.encode("utf-8")][: max_length - 1] + [1]
    ids = ids + [0] * (max_length - len(ids))
    return jnp.asarray(ids, jnp.int32)[None]
