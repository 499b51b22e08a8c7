"""T5 text encoder (FrozenT5Embedder backbone, sgm/modules/encoders/
modules.py:353-400 — dormant in the shipped config but part of the sgm
embedder inventory).

HF-T5 semantics: T5LayerNorm (RMS without mean subtraction, scale only),
unscaled attention logits (no 1/sqrt(d)) with a shared relative-position
bias embedding computed by layer 0 (bidirectional bucketing), bias-free
projections with an independent d_kv, and the v1_1 gated-gelu FF.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096          # t5-v1_1-xxl
    d_kv: int = 64
    d_ff: int = 10240
    layers: int = 24
    heads: int = 64
    rel_buckets: int = 32
    rel_max_distance: int = 128
    ln_eps: float = 1e-6
    gated_ff: bool = True        # v1_1 gated-gelu; original t5 uses relu
    dtype: jnp.dtype = jnp.float32


T5_V1_1_XXL_CONFIG = T5Config()


class T5LayerNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
                ).astype(x.dtype) * w


def relative_position_bucket(rel_pos, num_buckets: int = 32,
                             max_distance: int = 128):
    """Bidirectional bucketing (HF T5Attention._relative_position_bucket)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, pos_bias):
        cfg = self.cfg
        inner = cfg.heads * cfg.d_kv
        h = T5LayerNorm(cfg.ln_eps, name="ln_attn")(x)
        b, s, _ = h.shape
        q = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="q")(h)
        k = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="k")(h)
        v = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="v")(h)
        q = q.reshape(b, s, cfg.heads, cfg.d_kv)
        k = k.reshape(b, s, cfg.heads, cfg.d_kv)
        v = v.reshape(b, s, cfg.heads, cfg.d_kv)
        # NOTE: T5 does NOT scale by 1/sqrt(d_kv)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + pos_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype,
                     name="o")(o.reshape(b, s, inner))
        x = x + o

        h = T5LayerNorm(cfg.ln_eps, name="ln_ff")(x)
        if cfg.gated_ff:
            g = nn.gelu(nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype,
                                 name="wi_0")(h), approximate=True)
            u = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype,
                         name="wi_1")(h)
            f = g * u
        else:
            f = nn.relu(nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype,
                                 name="wi")(h))
        f = nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype,
                     name="wo")(f)
        return x + f


class T5Encoder(nn.Module):
    cfg: T5Config = T5_V1_1_XXL_CONFIG

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens [B, S] -> last_hidden_state [B, S, d_model]."""
        cfg = self.cfg
        emb = nn.Embed(cfg.vocab_size, cfg.d_model, param_dtype=jnp.float32,
                       name="shared")
        x = emb(tokens).astype(cfg.dtype)
        s = tokens.shape[1]
        pos = jnp.arange(s)
        rel = pos[None, :] - pos[:, None]          # memory - query
        buckets = relative_position_bucket(rel, cfg.rel_buckets,
                                           cfg.rel_max_distance)
        bias_table = self.param(
            "relative_attention_bias", nn.initializers.normal(1.0),
            (cfg.rel_buckets, cfg.heads))
        pos_bias = bias_table[buckets].transpose(2, 0, 1)[None]  # [1,H,S,S]
        for i in range(cfg.layers):
            x = T5Block(cfg, name=f"block_{i}")(x, pos_bias)
        return T5LayerNorm(cfg.ln_eps, name="ln_final")(x)
