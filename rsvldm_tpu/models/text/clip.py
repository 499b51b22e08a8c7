"""CLIP text transformers (CLIP-L/14 + OpenCLIP ViT-bigG-14) in Flax.

Parity target: /root/reference sgm/modules/encoders/modules.py —
FrozenCLIPEmbedder (:436-498, HF CLIPTextModel, layer="hidden" idx 11) and
FrozenOpenCLIPEmbedder2 (:501-612, penultimate + pooled, legacy=False) as
configured by model_configs/juggernautXL.yaml:70-87.

Both are pre-LN causal transformers over 77 BPE tokens; both conditioning
outputs are the PENULTIMATE hidden state (for 12-layer CLIP-L,
hidden_states[11] == input of the last block). The bigG pooled vector is
ln_final(last)[argmax(token_id)] @ text_projection.

One module serves both; differences are config: width/layers/heads and
quick_gelu (CLIP-L, HF) vs gelu (OpenCLIP).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    context_length: int = 77
    quick_gelu: bool = True     # HF CLIP-L; OpenCLIP bigG uses plain gelu
    use_text_projection: bool = False
    projection_dim: int | None = None   # None -> width (bigG is square)
    dtype: jnp.dtype = jnp.float32


CLIP_L_CONFIG = CLIPTextConfig()
OPENCLIP_BIGG_CONFIG = CLIPTextConfig(width=1280, layers=32, heads=20,
                                      quick_gelu=False, use_text_projection=True)


def _act(cfg):
    if cfg.quick_gelu:
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: nn.gelu(x, approximate=False)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, s, w = x.shape
        hd = w // cfg.heads
        q = nn.Dense(w, dtype=cfg.dtype, name="q_proj")(x)
        k = nn.Dense(w, dtype=cfg.dtype, name="k_proj")(x)
        v = nn.Dense(w, dtype=cfg.dtype, name="v_proj")(x)
        q = q.reshape(b, s, cfg.heads, hd)
        k = k.reshape(b, s, cfg.heads, hd)
        v = v.reshape(b, s, cfg.heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / (hd ** 0.5)
        mask = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(mask, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return nn.Dense(w, dtype=cfg.dtype, name="out_proj")(out.reshape(b, s, w))


class CLIPBlock(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        ln = lambda n: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=n)
        x = x + CLIPAttention(cfg, name="attn")(ln("ln_1")(x))
        h = nn.Dense(cfg.width * 4, dtype=cfg.dtype, name="mlp_fc")(ln("ln_2")(x))
        h = _act(cfg)(h)
        x = x + nn.Dense(cfg.width, dtype=cfg.dtype, name="mlp_proj")(h)
        return x


class CLIPTextTransformer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, tokens: jnp.ndarray):
        """tokens: [B, 77] int32 -> dict(penultimate, last, pooled).

        pooled is ln_final(last) at the argmax-token position (the EOT token
        has the highest id, modules.py:585-592), projected when the config
        has a text_projection (bigG)."""
        cfg = self.cfg
        tok_emb = self.param("token_embedding", nn.initializers.normal(0.02),
                             (cfg.vocab_size, cfg.width))
        pos_emb = self.param("positional_embedding", nn.initializers.normal(0.01),
                             (cfg.context_length, cfg.width))
        x = jnp.take(tok_emb, tokens, axis=0).astype(cfg.dtype)
        x = x + pos_emb[None, :x.shape[1], :].astype(cfg.dtype)
        penultimate = None
        for i in range(cfg.layers):
            if i == cfg.layers - 1:
                penultimate = x
            x = CLIPBlock(cfg, name=f"block_{i}")(x)
        last = x
        lnf = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(last)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = lnf[jnp.arange(tokens.shape[0]), eot]
        if cfg.use_text_projection:
            proj = self.param("text_projection", nn.initializers.normal(0.02),
                              (cfg.width, cfg.projection_dim or cfg.width))
            pooled = pooled @ proj.astype(pooled.dtype)
        return dict(penultimate=penultimate, last=last, pooled=pooled)
