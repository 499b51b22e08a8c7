"""MPT decoder (the llava_mpt.py language binding family).

Parity target: /root/reference llava/model/language_model/llava_mpt.py,
which wraps HF MptForCausalLM — rebuilt here natively: LayerNorm (bias-free
when no_bias) pre-norm blocks, fused Wqkv attention with ALiBi position
bias (no RoPE), non-gated 4x GELU MLP, tied lm_head.

TPU design mirrors llama.py: new tokens' K/V are written into a
preallocated [L, B, T, H, hd] cache at a traced offset and the whole decode
loop compiles to one lax.scan. ALiBi is applied as slope*k_pos — per-query
constants cancel under softmax (the translation invariance the MPT alibi
implementation itself relies on, modeling_mpt.build_mpt_alibi_tensor).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MPTConfig:
    vocab_size: int = 50432
    dim: int = 4096
    layers: int = 32
    heads: int = 32
    ln_eps: float = 1e-5
    no_bias: bool = True           # mpt-7b ships bias-free LN/Linear
    clip_qkv: float | None = None
    alibi_bias_max: int = 8
    dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads


MPT_7B_CONFIG = MPTConfig()


class MPTKVCache(NamedTuple):
    k: jnp.ndarray  # [L, B, T, H, hd]
    v: jnp.ndarray

    @classmethod
    def init(cls, cfg: MPTConfig, batch: int, max_len: int,
             dtype=jnp.float32) -> "MPTKVCache":
        shape = (cfg.layers, batch, max_len, cfg.heads, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def alibi_slopes(num_heads: int, alibi_bias_max: int = 8) -> jnp.ndarray:
    """Per-head ALiBi slopes (build_mpt_alibi_tensor): powers of 2 over the
    next power-of-two head count, interleave-reordered when heads is not a
    power of two."""
    n2 = 2 ** math.ceil(math.log2(num_heads))
    base = jnp.arange(1, n2 + 1, dtype=jnp.float32) * (alibi_bias_max / n2)
    slopes = 1.0 / jnp.power(2.0, base)
    if n2 != num_heads:
        slopes = jnp.concatenate([slopes[1::2], slopes[0::2]])[:num_heads]
    return slopes


class MPTBlock(nn.Module):
    cfg: MPTConfig

    @nn.compact
    def __call__(self, x, layer_k, layer_v, start_pos, valid_len):
        cfg = self.cfg
        b, s, _ = x.shape
        hd = cfg.head_dim
        ln = lambda nm: nn.LayerNorm(epsilon=cfg.ln_eps,
                                     use_bias=not cfg.no_bias,
                                     use_scale=True, name=nm)
        h = ln("norm_1")(x)
        qkv = nn.Dense(3 * cfg.dim, use_bias=not cfg.no_bias, dtype=cfg.dtype,
                       name="wqkv")(h)
        if cfg.clip_qkv:
            qkv = jnp.clip(qkv, -cfg.clip_qkv, cfg.clip_qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, cfg.heads, hd)
        k = k.reshape(b, s, cfg.heads, hd)
        v = v.reshape(b, s, cfg.heads, hd)

        layer_k = jax.lax.dynamic_update_slice(
            layer_k, k.astype(layer_k.dtype), (0, start_pos, 0, 0))
        layer_v = jax.lax.dynamic_update_slice(
            layer_v, v.astype(layer_v.dtype), (0, start_pos, 0, 0))
        t = layer_k.shape[1]

        scale = 1.0 / math.sqrt(hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, layer_k.astype(q.dtype),
                            preferred_element_type=jnp.float32) * scale
        k_pos = jnp.arange(t)
        slopes = alibi_slopes(cfg.heads, cfg.alibi_bias_max)
        # slope * k_pos; the per-row constant (-slope * q_pos) is softmax-
        # invariant so absolute positions work for both prefill and decode
        logits = logits + (slopes[:, None, None]
                           * k_pos[None, None, :].astype(jnp.float32))
        positions = start_pos + jnp.arange(s)
        q_pos = positions[None, None, :, None]
        mask = (k_pos[None, None, None, :] <= q_pos) & (k_pos < valid_len)
        logits = jnp.where(mask, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(layer_v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, layer_v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = nn.Dense(cfg.dim, use_bias=not cfg.no_bias, dtype=cfg.dtype,
                     name="out_proj")(o.reshape(b, s, cfg.dim))
        x = x + o

        h = ln("norm_2")(x)
        up = nn.Dense(4 * cfg.dim, use_bias=not cfg.no_bias, dtype=cfg.dtype,
                      name="up_proj")(h)
        down = nn.Dense(cfg.dim, use_bias=not cfg.no_bias, dtype=cfg.dtype,
                        name="down_proj")(nn.gelu(up, approximate=False))
        return x + down, layer_k, layer_v


class MPTModel(nn.Module):
    cfg: MPTConfig = MPT_7B_CONFIG

    def setup(self):
        cfg = self.cfg
        self.wte = nn.Embed(cfg.vocab_size, cfg.dim,
                            param_dtype=jnp.float32, name="wte")
        self.blocks = [MPTBlock(cfg, name=f"block_{i}")
                       for i in range(cfg.layers)]
        self.norm_f = nn.LayerNorm(epsilon=cfg.ln_eps,
                                   use_bias=not cfg.no_bias, name="norm_f")

    def embed(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.wte(tokens).astype(self.cfg.dtype)

    def from_tokens(self, tokens, cache: MPTKVCache, start_pos):
        return self(self.embed(tokens), cache, start_pos)

    def __call__(self, embeds, cache: MPTKVCache, start_pos):
        """embeds [B,S,D] -> (logits [B,S,vocab] fp32, new cache).
        lm_head is tied to wte (MptConfig tie_word_embeddings)."""
        valid_len = start_pos + embeds.shape[1]
        x = embeds.astype(self.cfg.dtype)
        new_k, new_v = [], []
        for i, block in enumerate(self.blocks):
            x, lk, lv = block(x, cache.k[i], cache.v[i], start_pos, valid_len)
            new_k.append(lk)
            new_v.append(lv)
        x = self.norm_f(x)
        logits = self.wte.attend(x.astype(jnp.float32))
        return logits, MPTKVCache(jnp.stack(new_k), jnp.stack(new_v))
