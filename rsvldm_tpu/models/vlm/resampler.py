"""Vision-token resamplers.

Parity target: /root/reference llava/model/multimodal_resampler/ —
builder.py dispatch over the five variants: identity (default for the
shipped model), masked_drop, spatial_pool, perceiver (flamingo-style,
perceiver.py:29-149) and qformer (BLIP-2 query transformer,
qformer.py:1092-1150 over the vendored BERT with query-branch FFN and
interleaved cross-attention, qformer.py:325-423).
"""

from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp


def identity_resampler(features: jnp.ndarray, **_) -> jnp.ndarray:
    """IdentityMap — the configured path for llama3-llava-next-8b."""
    return features


def spatial_pool(features: jnp.ndarray, stride: int = 2,
                 mode: str = "average") -> jnp.ndarray:
    """[N, T, C] (T = s*s) -> pooled [N, (s/stride)^2, C]
    (spatial_pool resampler)."""
    n, t, c = features.shape
    s = int(math.sqrt(t))
    x = features.reshape(n, s, s, c)
    if mode == "average":
        x = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                  (1, stride, stride, 1),
                                  (1, stride, stride, 1), "VALID")
        x = x / (stride * stride)
    elif mode == "max":
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                  (1, stride, stride, 1),
                                  (1, stride, stride, 1), "VALID")
    else:
        raise ValueError(mode)
    return x.reshape(n, -1, c)


def masked_drop(features: jnp.ndarray, rng: jax.Array,
                ratio: float = 0.5, deterministic: bool = False) -> jnp.ndarray:
    """Randomly keep a (1-ratio) fraction of tokens (masked_drop resampler;
    identity at inference)."""
    if deterministic or ratio <= 0:
        return features
    n, t, c = features.shape
    keep = max(int(t * (1.0 - ratio)), 1)
    noise = jax.random.uniform(rng, (n, t))
    idx = jnp.argsort(noise, axis=1)[:, :keep]
    return jnp.take_along_axis(features, idx[:, :, None], axis=1)


# ------------------------------------------------------------- qformer
# BLIP-2 query transformer (qformer.py): learned query tokens repeatedly
# self-attend, cross-attend to (layer-normed) image features every
# `cross_attention_freq` layers, and pass through the QUERY branch of the
# BERT FFN (intermediate_query/output_query — the text branch is deleted,
# qformer.py:1120-1122). Post-LN residuals throughout, exact-erf gelu.


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    hidden_size: int = 768          # bert-base (build_Qformer, :1108)
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    encoder_width: int = 1024       # vision tower hidden size (:1109)
    num_latents: int = 32           # mm_qformer_latents
    cross_attention_freq: int = 2   # mm_qformer_depth (:1107 arg name)
    ln_eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32


def _bert_mha(h, kv, heads: int, out_dim: int, dtype, name: str):
    """Post-LN BERT attention core: q from h, k/v from kv (hidden- or
    encoder-width), standard softmax(QK^T/sqrt(d))V, merged heads."""
    d = out_dim // heads
    q = nn.Dense(out_dim, dtype=dtype, name=f"{name}_query")(h)
    k = nn.Dense(out_dim, dtype=dtype, name=f"{name}_key")(kv)
    v = nn.Dense(out_dim, dtype=dtype, name=f"{name}_value")(kv)
    b, sq = q.shape[:2]
    sk = k.shape[1]
    q = q.reshape(b, sq, heads, d)
    k = k.reshape(b, sk, heads, d)
    v = v.reshape(b, sk, heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / (d ** 0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                   preferred_element_type=jnp.float32).astype(h.dtype)
    return o.reshape(b, sq, out_dim)


class QFormerBlock(nn.Module):
    cfg: QFormerConfig
    has_cross: bool

    @nn.compact
    def __call__(self, h, x):
        cfg = self.cfg
        ln = lambda nm: nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype,
                                     name=nm)
        sa = _bert_mha(h, h, cfg.heads, cfg.hidden_size, cfg.dtype, "self")
        sa = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="self_out")(sa)
        h = ln("self_ln")(sa + h)
        if self.has_cross:
            ca = _bert_mha(h, x, cfg.heads, cfg.hidden_size, cfg.dtype,
                           "cross")
            ca = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                          name="cross_out")(ca)
            h = ln("cross_ln")(ca + h)
        f = nn.Dense(cfg.intermediate, dtype=cfg.dtype, name="ffn_fc")(h)
        f = nn.gelu(f, approximate=False)
        f = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="ffn_out")(f)
        return ln("ffn_ln")(f + h)


class QFormerResampler(nn.Module):
    cfg: QFormerConfig = QFormerConfig()

    @nn.compact
    def __call__(self, image_features: jnp.ndarray) -> jnp.ndarray:
        """[B, v, encoder_width] -> [B, num_latents, hidden_size]
        (Qformer.forward, qformer.py:1125-1137)."""
        cfg = self.cfg
        # torch nn.LayerNorm default eps (build_Qformer's ln_vision,
        # qformer.py:1123) — NOT the BERT 1e-12
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype,
                         name="ln_vision")(image_features)
        q0 = self.param("query_tokens", nn.initializers.normal(0.02),
                        (cfg.num_latents, cfg.hidden_size))
        h = jnp.broadcast_to(q0[None], (x.shape[0],) + q0.shape)
        h = h.astype(cfg.dtype)
        # BertEmbeddings with no word/position embeddings = LayerNorm only
        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype, name="emb_ln")(h)
        for i in range(cfg.layers):
            h = QFormerBlock(cfg, has_cross=(i % cfg.cross_attention_freq == 0),
                             name=f"layer_{i}")(h, x)
        return h


# ----------------------------------------------------------- perceiver
# flamingo-style resampler (perceiver.py:29-149): learned latents gather
# image tokens via cross-attention where K/V also include the latents,
# pre-LN, bias-free projections, amax-stabilized softmax, final LayerNorm.


@dataclasses.dataclass(frozen=True)
class PerceiverConfig:
    dim: int = 1024                 # vision tower hidden size
    depth: int = 3                  # mm_perceiver_depth (train.py:96)
    dim_head: int = 64
    heads: int = 8
    num_latents: int = 32           # mm_perceiver_latents
    ff_mult: float = 4              # mm_perceiver_ff_mult
    dtype: jnp.dtype = jnp.float32


class PerceiverAttention(nn.Module):
    cfg: PerceiverConfig

    @nn.compact
    def __call__(self, x, latents):
        cfg = self.cfg
        inner = cfg.dim_head * cfg.heads
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="norm_media")(x)
        latents = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype,
                               name="norm_latents")(latents)
        q = nn.Dense(inner, use_bias=False, dtype=cfg.dtype,
                     name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=cfg.dtype,
                      name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        b, nq = q.shape[:2]
        nk = k.shape[1]
        q = q.reshape(b, nq, cfg.heads, cfg.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, nk, cfg.heads, cfg.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, nk, cfg.heads, cfg.dim_head).transpose(0, 2, 1, 3)
        sim = jnp.einsum("bhid,bhjd->bhij", q * (cfg.dim_head ** -0.5), k,
                         preferred_element_type=jnp.float32)
        sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                         preferred_element_type=jnp.float32).astype(cfg.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, inner)
        return nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype,
                        name="to_out")(out)


class PerceiverResampler(nn.Module):
    cfg: PerceiverConfig = PerceiverConfig()

    @nn.compact
    def __call__(self, image_features: jnp.ndarray) -> jnp.ndarray:
        """[B, v, dim] -> [B, num_latents, dim] (PerceiverResamplerModule.
        forward with T=F=1, perceiver.py:104-128)."""
        cfg = self.cfg
        lat = self.param("latents", nn.initializers.normal(1.0),
                         (cfg.num_latents, cfg.dim))
        latents = jnp.broadcast_to(
            lat[None], (image_features.shape[0],) + lat.shape).astype(cfg.dtype)
        x = image_features.astype(cfg.dtype)
        for i in range(cfg.depth):
            latents = PerceiverAttention(cfg, name=f"attn_{i}")(x, latents) \
                + latents
            if cfg.ff_mult > 0:
                inner = int(cfg.dim * cfg.ff_mult)
                f = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype,
                                 name=f"ff_{i}_norm")(latents)
                f = nn.Dense(inner, use_bias=False, dtype=cfg.dtype,
                             name=f"ff_{i}_fc")(f)
                f = nn.gelu(f, approximate=False)
                f = nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype,
                             name=f"ff_{i}_out")(f)
                latents = f + latents
            else:
                # reference quirk: ff_mult<=0 swaps FeedForward for
                # nn.Identity but the loop still computes
                # `latents = ff(latents) + latents` — i.e. latents DOUBLE
                # every layer (perceiver.py:97,127). Matched exactly.
                latents = latents + latents
        return nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype,
                            name="norm")(latents)


def build_resampler(resampler_type: str | None, **kwargs):
    """build_vision_resampler dispatch (builder.py:21-34). Returns either a
    pure function (identity/spatial_pool/masked_drop) or a Flax module
    (perceiver/qformer) whose params load via convert_hf converters."""
    if resampler_type in (None, "identity"):
        return identity_resampler
    if resampler_type == "spatial_pool":
        return lambda f, **kw: spatial_pool(f, **{**kwargs, **kw})
    if resampler_type == "masked_drop":
        return lambda f, **kw: masked_drop(f, **{**kwargs, **kw})
    if resampler_type == "perceiver":
        return PerceiverResampler(PerceiverConfig(**kwargs))
    if resampler_type == "qformer":
        return QFormerResampler(QFormerConfig(**kwargs))
    raise ValueError(f"Unknown resampler type: {resampler_type}")


RESAMPLERS = {"identity": identity_resampler, "spatial_pool": spatial_pool,
              "masked_drop": masked_drop, "perceiver": PerceiverResampler,
              "qformer": QFormerResampler}
