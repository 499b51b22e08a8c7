"""EVA-CLIP vision transformer (EVA01/EVA02 families), NHWC Flax.

Parity target: the reference's vendored EVA tree
/root/reference/llava/model/multimodal_encoder/eva_clip/eva_vit.py
(EVAVisionTransformer:505-715, Attention:246-378, SwiGLU:221-243,
VisionRotaryEmbeddingFast:39-87) behind the builder dispatch
`"internal-eva" in name or "eva02" in name` (builder.py:37-38, commented
out / dormant in the reference but fully vendored).

Feature semantics (EVAEncoderWrapper.forward, eva_vit.py:850-852):
`forward_features(return_all_features=True)` runs all blocks EXCEPT the
last one (the `if i == len(self.blocks)-1: continue` skip at
eva_vit.py:694-696), applies NO final norm, and the wrapper strips the CLS
token. The Flax tower therefore builds `layers - 1` blocks; the converter
ignores the checkpoint's final block.

Architecture knobs (model_configs/*.json via CLIPVisionCfg:770-796):
  subln       separate q/k/v projections (q/v bias only, no k bias) +
              an inner LayerNorm after the attention matmul and inside
              the FFN (sub-LayerNorm, EVA02)
  naiveswiglu SwiGLU FFN (w1/w2 -> silu gate -> ffn_ln -> w3)
  rope        2D rotary embedding on the patch grid, interleaved-pair
              rotate_half convention, CLS token NOT rotated
              (eva_vit.py:329-337); intp_freq rescales positions from the
              pretrain grid (pt_hw_seq_len) to the finetune grid
  postnorm    norm AFTER attn/mlp instead of before (EVA-CLIP-8B/18B)
  ls_init_value  layer-scale gammas (EVA01 g-14 uses None)

Not implemented (no EVA model config uses them): window relative-position
bias, shared rel_pos_bias, patch dropout (train-time only).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import attention


@dataclasses.dataclass(frozen=True)
class EvaVitConfig:
    image_size: int = 336
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    head_width: int = 64          # heads = width // head_width
    mlp_ratio: float = 2.6667
    qkv_bias: bool = True
    rope: bool = True
    pt_hw_seq_len: int = 16       # pretrain grid side (224/14)
    intp_freq: bool = True        # rescale rope positions to this grid
    naiveswiglu: bool = True
    subln: bool = True
    postnorm: bool = False
    ls_init_value: float | None = None
    dtype: jnp.dtype = jnp.float32

    @property
    def heads(self) -> int:
        return self.width // self.head_width

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.num_patches_per_side ** 2

    @property
    def mlp_hidden(self) -> int:
        return int(self.width * self.mlp_ratio)


# geometries of the reference's shipped model_configs/*.json (vision_cfg;
# embed_dim is the CLIP head size, unused by the feature tower)
EVA02_CLIP_L_336_CONFIG = EvaVitConfig()
EVA02_CLIP_L_224_CONFIG = dataclasses.replace(
    EVA02_CLIP_L_336_CONFIG, image_size=224)
EVA02_CLIP_B_16_CONFIG = EvaVitConfig(
    image_size=224, patch_size=16, width=768, layers=12, mlp_ratio=2.6667,
    pt_hw_seq_len=16, intp_freq=True)
EVA01_CLIP_G_14_CONFIG = EvaVitConfig(
    image_size=224, patch_size=14, width=1408, layers=40, head_width=88,
    mlp_ratio=4.3637, rope=False, naiveswiglu=False, subln=False,
    intp_freq=False)
EVA_GEOMETRIES = {
    "eva02-clip-l-14-336": EVA02_CLIP_L_336_CONFIG,
    "eva02-clip-l-14": EVA02_CLIP_L_224_CONFIG,
    "eva02-clip-b-16": EVA02_CLIP_B_16_CONFIG,
    "eva01-clip-g-14": EVA01_CLIP_G_14_CONFIG,
}


def _rope_tables(cfg: EvaVitConfig):
    """VisionRotaryEmbeddingFast tables (eva_vit.py:39-69): 'lang' freqs at
    dim = head_width//2, positions arange(ft)/ft*pt (intp_freq), each axis
    repeated pairwise then row/col broadcast-concatenated. Returns fp32
    numpy (cos, sin) of shape [T, head_width] — static at trace time."""
    dim = cfg.head_width // 2
    freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    ft = cfg.num_patches_per_side
    if cfg.intp_freq:
        t = np.arange(ft) / ft * cfg.pt_hw_seq_len
    else:
        # ft_seq_len defaults to pt_seq_len in the reference ONLY when the
        # grids match; EVA configs without intp_freq use the native grid
        t = np.arange(ft, dtype=np.float64)
    fr = np.einsum("i,j->ij", t, freqs)            # [ft, dim//2]
    fr = np.repeat(fr, 2, axis=-1)                 # [ft, dim]
    # broadcat((fr[:, None, :], fr[None, :, :]), dim=-1) -> [ft, ft, 2*dim]
    row = np.broadcast_to(fr[:, None, :], (ft, ft, fr.shape[-1]))
    col = np.broadcast_to(fr[None, :, :], (ft, ft, fr.shape[-1]))
    full = np.concatenate([row, col], axis=-1).reshape(ft * ft, -1)
    return (np.cos(full).astype(np.float32),
            np.sin(full).astype(np.float32))


def _rotate_half_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    """(x0,x1,x2,x3,...) -> (-x1,x0,-x3,x2,...) — the interleaved-pair
    convention (eva_vit.py rotate_half:32-36), NOT the half-split one."""
    shape = x.shape
    xr = x.reshape(*shape[:-1], shape[-1] // 2, 2)
    x1, x2 = xr[..., 0], xr[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(shape)


def _rope_apply(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x: [B, S, H, D] patch tokens (no CLS). fp32 rotate, cast back."""
    xf = x.astype(jnp.float32)
    out = xf * cos[None, :, None, :] + _rotate_half_interleaved(xf) * \
        sin[None, :, None, :]
    return out.astype(x.dtype)


class EvaBlock(nn.Module):
    cfg: EvaVitConfig

    @nn.compact
    def __call__(self, x, rope=None):
        cfg = self.cfg
        b, s, w = x.shape
        hd = cfg.head_width
        ln = lambda n: nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=n)

        def attn(h):
            if cfg.subln:
                # q/v biased, k un-biased (eva_vit.py:258-268,311-314)
                q = nn.Dense(w, use_bias=cfg.qkv_bias, dtype=cfg.dtype,
                             name="q_proj")(h)
                k = nn.Dense(w, use_bias=False, dtype=cfg.dtype,
                             name="k_proj")(h)
                v = nn.Dense(w, use_bias=cfg.qkv_bias, dtype=cfg.dtype,
                             name="v_proj")(h)
            else:
                qkv = nn.Dense(3 * w, use_bias=False, dtype=cfg.dtype,
                               name="qkv")(h)
                q, k, v = jnp.split(qkv, 3, axis=-1)
                if cfg.qkv_bias:
                    qb = self.param("q_bias", nn.initializers.zeros, (w,))
                    vb = self.param("v_bias", nn.initializers.zeros, (w,))
                    q = q + qb.astype(q.dtype)
                    v = v + vb.astype(v.dtype)
            q = q.reshape(b, s, cfg.heads, hd)
            k = k.reshape(b, s, cfg.heads, hd)
            v = v.reshape(b, s, cfg.heads, hd)
            if rope is not None:
                cos, sin = rope
                q = jnp.concatenate(
                    [q[:, :1], _rope_apply(q[:, 1:], cos, sin)], axis=1)
                k = jnp.concatenate(
                    [k[:, :1], _rope_apply(k[:, 1:], cos, sin)], axis=1)
            o = attention(q, k, v).reshape(b, s, w)
            if cfg.subln:
                o = ln("inner_attn_ln")(o)
            return nn.Dense(w, dtype=cfg.dtype, name="proj")(o)

        def mlp(h):
            if cfg.naiveswiglu:
                x1 = nn.Dense(cfg.mlp_hidden, dtype=cfg.dtype, name="w1")(h)
                x2 = nn.Dense(cfg.mlp_hidden, dtype=cfg.dtype, name="w2")(h)
                hid = jax.nn.silu(x1) * x2
                if cfg.subln:
                    hid = ln("ffn_ln")(hid)
                return nn.Dense(w, dtype=cfg.dtype, name="w3")(hid)
            hid = nn.Dense(cfg.mlp_hidden, dtype=cfg.dtype, name="fc1")(h)
            hid = jax.nn.gelu(hid, approximate=False)
            if cfg.subln:
                hid = ln("ffn_ln")(hid)
            return nn.Dense(w, dtype=cfg.dtype, name="fc2")(hid)

        g1 = g2 = None
        if cfg.ls_init_value is not None:
            g1 = self.param("gamma_1", nn.initializers.constant(
                cfg.ls_init_value), (w,))
            g2 = self.param("gamma_2", nn.initializers.constant(
                cfg.ls_init_value), (w,))

        def scaled(v, g):
            return v if g is None else v * g.astype(v.dtype)

        if cfg.postnorm:   # EVA-CLIP-8B/18B (eva_vit.py:434-436,441-443)
            x = x + scaled(ln("norm1")(attn(x)), g1)
            x = x + scaled(ln("norm2")(mlp(x)), g2)
        else:
            x = x + scaled(attn(ln("norm1")(x)), g1)
            x = x + scaled(mlp(ln("norm2")(x)), g2)
        return x


class EvaVisionTower(nn.Module):
    """EVAEncoderWrapper-equivalent feature tower: patch tokens from the
    penultimate block (the reference SKIPS the final block and strips CLS,
    eva_vit.py:694-696,851)."""
    cfg: EvaVitConfig = EVA02_CLIP_L_336_CONFIG
    keep_cls: bool = False

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels: [N, S, S, 3] normalized -> [N, T, width]."""
        cfg = self.cfg
        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=cfg.patch_size, use_bias=True, dtype=cfg.dtype,
                    name="patch_embed")(pixels.astype(cfg.dtype))
        n, hh, ww, c = x.shape
        x = x.reshape(n, hh * ww, c)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (cfg.width,))
        x = jnp.concatenate(
            [jnp.tile(cls[None, None], (n, 1, 1)).astype(x.dtype), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (cfg.num_patches + 1, cfg.width))
        x = x + pos[None].astype(x.dtype)
        rope = None
        if cfg.rope:
            cos, sin = _rope_tables(cfg)
            rope = (jnp.asarray(cos), jnp.asarray(sin))
        # all blocks but the LAST (reference feature-mode skip)
        for i in range(cfg.layers - 1):
            x = EvaBlock(cfg, name=f"block_{i}")(x, rope=rope)
        return x if self.keep_cls else x[:, 1:, :]
