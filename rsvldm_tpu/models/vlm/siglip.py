"""SigLIP vision tower (the alternate LLaVA tower family), NHWC Flax.

Parity target: /root/reference llava/model/multimodal_encoder/
siglip_encoder.py (self-contained SigLIP ViT: patch conv WITH bias, no CLS
token, learned position embedding, pre-LN blocks with tanh-approx GELU,
eps 1e-6; patch features from a selectable layer).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.attention import attention


@dataclasses.dataclass(frozen=True)
class SigLIPVisionConfig:
    image_size: int = 384
    patch_size: int = 14
    width: int = 1152
    layers: int = 27
    heads: int = 16
    mlp_dim: int = 4304
    select_layer: int = -2
    dtype: jnp.dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


SIGLIP_SO400M_384_CONFIG = SigLIPVisionConfig()


class SigLIPBlock(nn.Module):
    cfg: SigLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, s, w = x.shape
        hd = w // cfg.heads
        ln = lambda n: nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=n)
        h = ln("ln_1")(x)
        q = nn.Dense(w, dtype=cfg.dtype, name="q_proj")(h).reshape(b, s, cfg.heads, hd)
        k = nn.Dense(w, dtype=cfg.dtype, name="k_proj")(h).reshape(b, s, cfg.heads, hd)
        v = nn.Dense(w, dtype=cfg.dtype, name="v_proj")(h).reshape(b, s, cfg.heads, hd)
        o = attention(q, k, v).reshape(b, s, w)
        x = x + nn.Dense(w, dtype=cfg.dtype, name="out_proj")(o)
        h = nn.Dense(self.cfg.mlp_dim, dtype=cfg.dtype,
                     name="mlp_fc")(ln("ln_2")(x))
        h = nn.gelu(h, approximate=True)
        x = x + nn.Dense(w, dtype=cfg.dtype, name="mlp_proj")(h)
        return x


class SigLIPVisionTower(nn.Module):
    cfg: SigLIPVisionConfig = SIGLIP_SO400M_384_CONFIG

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels: [N, S, S, 3] -> [N, tokens, width] (no CLS, patch feats)."""
        cfg = self.cfg
        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=cfg.patch_size, use_bias=True, dtype=cfg.dtype,
                    name="patch_embed")(pixels.astype(cfg.dtype))
        n, hh, ww, c = x.shape
        x = x.reshape(n, hh * ww, c)
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (cfg.num_patches, cfg.width))
        x = x + pos[None].astype(x.dtype)
        n_run = cfg.layers + (cfg.select_layer + 1) if cfg.select_layer < 0 \
            else cfg.select_layer
        selected = x
        for i in range(cfg.layers):
            x = SigLIPBlock(cfg, name=f"block_{i}")(x)
            if i == n_run - 1:
                selected = x
        return selected


def convert_hf_siglip_vision(sd, cfg) -> dict:
    """HF SiglipVisionModel state_dict -> SigLIPVisionTower params."""
    from ...utils.convert import _dense, _lnorm, t2n
    pre = "vision_model"
    p = {
        "patch_embed": {
            "kernel": t2n(sd[f"{pre}.embeddings.patch_embedding.weight"]
                          ).transpose(2, 3, 1, 0),
            "bias": t2n(sd[f"{pre}.embeddings.patch_embedding.bias"])},
        "positional_embedding": t2n(
            sd[f"{pre}.embeddings.position_embedding.weight"]),
    }
    for i in range(cfg.layers):
        lp = f"{pre}.encoder.layers.{i}"
        p[f"block_{i}"] = {
            "ln_1": _lnorm(sd, f"{lp}.layer_norm1"),
            "ln_2": _lnorm(sd, f"{lp}.layer_norm2"),
            "q_proj": _dense(sd, f"{lp}.self_attn.q_proj"),
            "k_proj": _dense(sd, f"{lp}.self_attn.k_proj"),
            "v_proj": _dense(sd, f"{lp}.self_attn.v_proj"),
            "out_proj": _dense(sd, f"{lp}.self_attn.out_proj"),
            "mlp_fc": _dense(sd, f"{lp}.mlp.fc1"),
            "mlp_proj": _dense(sd, f"{lp}.mlp.fc2"),
        }
    return {"params": p}
