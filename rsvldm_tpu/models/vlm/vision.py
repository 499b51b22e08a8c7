"""CLIP ViT-L/14-336 vision tower, NHWC Flax.

Parity target: /root/reference llava/model/multimodal_encoder/clip_encoder.py
(CLIPVisionTower:13-120 — HF CLIPVisionModel, select_layer=-2,
select_feature='patch') as used by llama3-llava-next-8b.

ViT: 14x14 patch conv (stride 14) -> 24x24=576 tokens + CLS, learned
positional embedding (577), pre-LN, 24 transformer blocks (non-causal,
quick_gelu). Features = hidden state BEFORE the last block (select_layer -2)
with the CLS token dropped ('patch').
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.attention import attention

# CLIP pixel normalization (CLIPImageProcessor defaults)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    select_layer: int = -2
    keep_cls: bool = False      # True: return [N, 1+T, W] with CLS at 0
    dtype: jnp.dtype = jnp.float32
    # tower-family knobs (build_vision_tower: open_clip / hf: / mlcd):
    # select_feature mirrors mm_vision_select_feature — "patch", "cls_patch",
    # "slicefour_*" (every-k-layer concat, hf_vision.py:50-52) and
    # "slice_m25811_f6_*" (fixed layer set, mlcd_encoder.py:60-62). Empty
    # means derive from keep_cls (the shipped CLIP-L default).
    select_feature: str = ""
    act: str = "quick_gelu"     # "gelu": MLCD; "gelu_tanh": SigLIP-arch hf
    ffn_width: int = 0          # 0 -> width * 4 (MLCD bigG: 8192 vs 1664*4)
    # "learned" absolute table (CLIP) | "rope2d" (MLCD: 2D rotary on the
    # patch grid + a learned class-token angle row, modeling_mlcd.py)
    pos_embed: str = "learned"
    # hidden-state indexing: "hf" counts the post-pre-LN embedding as
    # hidden_states[0] (HF output_hidden_states); "open_clip" collects only
    # after-block outputs (open_clip_encoder.py:81-104 forward_openclip)
    hidden_base: str = "hf"

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.num_patches_per_side ** 2

    @property
    def feature_mode(self) -> str:
        if self.select_feature:
            return self.select_feature
        return "cls_patch" if self.keep_cls else "patch"


CLIP_VIT_L_336_CONFIG = CLIPVisionConfig()


def _rope2d_angles(cfg: CLIPVisionConfig, class_row: jnp.ndarray,
                   grid_h: int, grid_w: int):
    """MLCD 2D rotary tables (modeling_mlcd.py MLCDRotaryEmbedding): h/w
    position ids each rotate head_dim//4 frequencies; the class token gets a
    learned angle row. Returns (cos, sin) [1+T, head_dim] fp32."""
    hd = cfg.width // cfg.heads
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, hd // 2, 2,
                                             dtype=jnp.float32) / (hd // 2)))
    seq = jnp.arange(max(grid_h, grid_w), dtype=jnp.float32)
    full = seq[:, None] * inv_freq[None]                     # [g, hd//4]
    hpos = jnp.repeat(jnp.arange(grid_h), grid_w)
    wpos = jnp.tile(jnp.arange(grid_w), grid_h)
    rpe = jnp.concatenate([full[hpos], full[wpos]], axis=-1)  # [T, hd//2]
    rpe = jnp.concatenate([class_row.astype(jnp.float32), rpe], axis=0)
    emb = jnp.concatenate([rpe, rpe], axis=-1)                # [1+T, hd]
    return jnp.cos(emb), jnp.sin(emb)


def _rope_apply(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """rotate_half convention on [B, S, H, D] (apply_rotary_pos_emb_vision)."""
    xf = x.astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    out = xf * cos[None, :, None, :] + rot * sin[None, :, None, :]
    return out.astype(x.dtype)


class ViTBlock(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x, rope=None):
        cfg = self.cfg
        b, s, w = x.shape
        hd = w // cfg.heads
        ln = lambda n: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=n)
        h = ln("ln_1")(x)
        q = nn.Dense(w, dtype=cfg.dtype, name="q_proj")(h).reshape(b, s, cfg.heads, hd)
        k = nn.Dense(w, dtype=cfg.dtype, name="k_proj")(h).reshape(b, s, cfg.heads, hd)
        v = nn.Dense(w, dtype=cfg.dtype, name="v_proj")(h).reshape(b, s, cfg.heads, hd)
        if rope is not None:
            q = _rope_apply(q, *rope)
            k = _rope_apply(k, *rope)
        o = attention(q, k, v).reshape(b, s, w)
        x = x + nn.Dense(w, dtype=cfg.dtype, name="out_proj")(o)
        h = nn.Dense(cfg.ffn_width or w * 4, dtype=cfg.dtype,
                     name="mlp_fc")(ln("ln_2")(x))
        if cfg.act == "gelu":
            h = jax.nn.gelu(h, approximate=False)
        elif cfg.act == "gelu_tanh":   # HF "gelu_pytorch_tanh" (SigLIP-arch)
            h = jax.nn.gelu(h, approximate=True)
        else:
            h = h * jax.nn.sigmoid(1.702 * h)  # quick_gelu
        x = x + nn.Dense(w, dtype=cfg.dtype, name="mlp_proj")(h)
        return x


def _slice_indices(cfg: CLIPVisionConfig) -> list:
    """Which hidden-state indices feature_select reads (HF indexing:
    hidden_states[0] = post-pre-LN embeddings, [i+1] = after block i;
    open_clip indexing: [i] = after block i)."""
    n_hidden = cfg.layers + (1 if cfg.hidden_base == "hf" else 0)
    mode = cfg.feature_mode
    if mode.startswith("slicefour_"):
        k = n_hidden // 4
        return list(range(k + cfg.select_layer, n_hidden, k))
    if mode.startswith("slice_m25811_f6_"):
        return [i % n_hidden for i in (-2, -5, -8, -11, 6)]
    return [cfg.select_layer % n_hidden]


class CLIPVisionTower(nn.Module):
    cfg: CLIPVisionConfig = CLIP_VIT_L_336_CONFIG

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels: [N, 336, 336, 3] CLIP-normalized -> [N, 576, width]
        (or [N, 1+576, k*width] per select_feature)."""
        cfg = self.cfg
        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=cfg.patch_size, use_bias=False, dtype=cfg.dtype,
                    name="patch_embed")(pixels.astype(cfg.dtype))
        n, hh, ww, c = x.shape
        x = x.reshape(n, hh * ww, c)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.width,))
        x = jnp.concatenate([jnp.tile(cls[None, None], (n, 1, 1)).astype(x.dtype),
                             x], axis=1)
        rope = None
        if cfg.pos_embed == "rope2d":
            class_row = self.param("class_pos_emb",
                                   nn.initializers.normal(0.02),
                                   (1, (cfg.width // cfg.heads) // 2))
            rope = _rope2d_angles(cfg, class_row, hh, ww)
        else:
            pos = self.param("positional_embedding",
                             nn.initializers.normal(0.02),
                             (cfg.num_patches + 1, cfg.width))
            x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x)
        want = _slice_indices(cfg)
        hidden = {}
        base = 1 if cfg.hidden_base == "hf" else 0
        if cfg.hidden_base == "hf" and 0 in want:
            hidden[0] = x
        for i in range(cfg.layers):
            x = ViTBlock(cfg, name=f"block_{i}")(x, rope=rope)
            if i + base in want:
                hidden[i + base] = x
        selected = jnp.concatenate([hidden[i] for i in want], axis=-1) \
            if len(want) > 1 else hidden[want[0]]
        if cfg.feature_mode.endswith("cls_patch"):
            return selected
        return selected[:, 1:, :]  # drop CLS ('patch' select_feature)


class CLIPVisionEmbedder(nn.Module):
    """Full CLIP image embedding: ViT CLS (all layers) -> post-LN -> visual
    projection. This is the HF CLIPModel.get_image_features surface the
    LLaVA tower (patch features only) doesn't expose — needed by the
    CLIP-IQA / SMS quality harness (utils/metrics.CLIPScorer), whose
    reference counterpart scores with a full CLIP model
    (torchmetrics CLIP-IQA; README.md:30-85 metric columns)."""
    cfg: CLIPVisionConfig
    projection_dim: int = 768

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        tower_cfg = dataclasses.replace(self.cfg, select_layer=-1,
                                        keep_cls=True)
        feats = CLIPVisionTower(tower_cfg, name="tower")(pixels)
        cls = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                           name="ln_post")(feats[:, 0])
        proj = self.param("visual_projection", nn.initializers.normal(0.02),
                          (self.cfg.width, self.projection_dim))
        return cls.astype(jnp.float32) @ proj.astype(jnp.float32)


def normalize_pixels(x: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W,3] in [0,1] -> CLIP-normalized."""
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (x - mean) / std


def s2_multiscale_features(vision_apply, images, scales=(336, 672),
                           patch_size: int = 14):
    """S2 multiscale wrapper (clip_encoder.py:129-174 via s2wrapper): for
    each scale, resize the [N, H, W, 3] batch, split into
    (scale/base)^2 base-size tiles, run the tower on all tiles in ONE
    batched call, reassemble the tile token grids spatially, average-pool
    back to the base token grid, and concatenate scales channel-wise.
    Output [N, T_base, C * len(scales)] — matching S2's hidden_size *
    len(s2_scales) contract (clip_encoder.py:172-174).

    TPU notes: tiles are batched (not looped) so every scale is one big
    MXU-friendly vision forward; resizes are jax.image bilinear like
    torch's interpolate(mode='bilinear')."""
    import jax
    import jax.numpy as jnp

    scales = sorted(scales)
    base = scales[0]
    n = images.shape[0]
    t_side = base // patch_size
    outs = []
    for scale in scales:
        k = scale // base
        img = jax.image.resize(images, (n, scale, scale, images.shape[-1]),
                               method="bilinear")
        # [N, k, base, k, base, C] -> [N*k*k, base, base, C]
        tiles = img.reshape(n, k, base, k, scale // k, images.shape[-1])
        tiles = tiles.transpose(0, 1, 3, 2, 4, 5).reshape(
            n * k * k, base, base, images.shape[-1])
        feats = vision_apply(tiles)                    # [N*k*k, t^2, C]
        c = feats.shape[-1]
        grid = feats.reshape(n, k, k, t_side, t_side, c)
        grid = grid.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, k * t_side, k * t_side, c)
        if k > 1:  # pool the high-res token grid back to the base grid
            grid = jnp.mean(grid.reshape(n, t_side, k, t_side, k, c),
                            axis=(2, 4))
        outs.append(grid.reshape(n, t_side * t_side, c))
    return jnp.concatenate(outs, axis=-1)
