"""Vision-tower registry parity (multimodal_encoder/builder.py dispatch):
MLCD 2D-RoPE tower vs the HF oracle, slicefour / slice_m25811_f6 feature
modes vs HF hidden_states concat, open_clip naming converter + indexing.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from rsvldm_tpu.models.vlm.towers import build_vision_tower
from rsvldm_tpu.models.vlm.vision import CLIPVisionConfig, CLIPVisionTower
from rsvldm_tpu.utils import convert_hf


def _hf_clip_vision(width=32, layers=7, heads=4, image=28, patch=14):
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModel
    torch.manual_seed(0)
    m = CLIPVisionModel(HFCfg(hidden_size=width, intermediate_size=width * 4,
                              num_hidden_layers=layers,
                              num_attention_heads=heads, image_size=image,
                              patch_size=patch, hidden_act="quick_gelu",
                              attn_implementation="eager"))
    m.eval()
    return m


def _ours_from_hf(m, cfg):
    sd = {k: v for k, v in m.state_dict().items()}
    return CLIPVisionTower(cfg), convert_hf.convert_hf_clip_vision(sd, cfg)


def _run_pair(m, cfg, seed=1):
    rng = np.random.default_rng(seed)
    px = rng.standard_normal(
        (2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    tower, params = _ours_from_hf(m, cfg)
    ours = np.asarray(tower.apply(params, jnp.asarray(px)))
    with torch.no_grad():
        out = m(torch.from_numpy(px.transpose(0, 3, 1, 2)),
                output_hidden_states=True)
    return ours, out.hidden_states


def test_select_feature_cls_patch_matches_hf():
    m = _hf_clip_vision()
    cfg = CLIPVisionConfig(image_size=28, patch_size=14, width=32, layers=7,
                           heads=4, select_layer=-2,
                           select_feature="cls_patch")
    ours, hs = _run_pair(m, cfg)
    np.testing.assert_allclose(ours, hs[-2].numpy(), atol=2e-5, rtol=1e-4)


def test_slicefour_patch_matches_hf():
    """slicefour_*: every-(L+1)//4-layer concat (hf_vision.py:50-52)."""
    m = _hf_clip_vision()
    cfg = CLIPVisionConfig(image_size=28, patch_size=14, width=32, layers=7,
                           heads=4, select_layer=-2,
                           select_feature="slicefour_patch")
    ours, hs = _run_pair(m, cfg)
    k = len(hs) // 4
    ref = torch.cat([hs[i] for i in range(k - 2, len(hs), k)], dim=-1)
    ref = ref[:, 1:].numpy()
    assert ours.shape == ref.shape  # width * 4
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_slice_m25811_f6_matches_hf():
    """Fixed layer set [-2,-5,-8,-11,6] (mlcd_encoder.py:60-62)."""
    m = _hf_clip_vision(layers=12)
    cfg = CLIPVisionConfig(image_size=28, patch_size=14, width=32, layers=12,
                           heads=4, select_layer=-2,
                           select_feature="slice_m25811_f6_cls_patch")
    ours, hs = _run_pair(m, cfg)
    ref = torch.cat([hs[i] for i in (-2, -5, -8, -11, 6)], dim=-1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_mlcd_rope2d_matches_hf_oracle():
    """MLCD tower (2D rotary, gelu, no absolute positions) vs transformers
    MLCDVisionModel at tiny geometry."""
    from transformers import MLCDVisionConfig as HFCfg
    from transformers.models.mlcd.modeling_mlcd import MLCDVisionModel
    torch.manual_seed(0)
    m = MLCDVisionModel(HFCfg(hidden_size=32, intermediate_size=48,
                              num_hidden_layers=3, num_attention_heads=4,
                              image_size=28, patch_size=14,
                              hidden_act="gelu",
                              attn_implementation="eager"))
    m.eval()
    cfg = CLIPVisionConfig(image_size=28, patch_size=14, width=32, layers=3,
                           heads=4, select_layer=-2, select_feature="patch",
                           act="gelu", ffn_width=48, pos_embed="rope2d")
    sd = {k: v for k, v in m.state_dict().items()}
    params = convert_hf.convert_mlcd_vision(sd, cfg)
    rng = np.random.default_rng(2)
    px = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    ours = np.asarray(CLIPVisionTower(cfg).apply(params, jnp.asarray(px)))
    with torch.no_grad():
        out = m(torch.from_numpy(px.transpose(0, 3, 1, 2)),
                output_hidden_states=True)
    ref = out.hidden_states[-2][:, 1:].numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


def _openclip_rename(sd):
    """HF CLIPVisionModel state_dict -> open_clip visual naming (fused qkv),
    to prove the converter's naming map without the open_clip package."""
    out = {
        "class_embedding": sd["vision_model.embeddings.class_embedding"],
        "positional_embedding":
            sd["vision_model.embeddings.position_embedding.weight"],
        "conv1.weight": sd["vision_model.embeddings.patch_embedding.weight"],
        "ln_pre.weight": sd["vision_model.pre_layrnorm.weight"],
        "ln_pre.bias": sd["vision_model.pre_layrnorm.bias"],
    }
    i = 0
    while f"vision_model.encoder.layers.{i}.layer_norm1.weight" in sd:
        lp = f"vision_model.encoder.layers.{i}"
        op = f"transformer.resblocks.{i}"
        out[f"{op}.ln_1.weight"] = sd[f"{lp}.layer_norm1.weight"]
        out[f"{op}.ln_1.bias"] = sd[f"{lp}.layer_norm1.bias"]
        out[f"{op}.ln_2.weight"] = sd[f"{lp}.layer_norm2.weight"]
        out[f"{op}.ln_2.bias"] = sd[f"{lp}.layer_norm2.bias"]
        out[f"{op}.attn.in_proj_weight"] = torch.cat(
            [sd[f"{lp}.self_attn.{n}_proj.weight"] for n in "qkv"], dim=0)
        out[f"{op}.attn.in_proj_bias"] = torch.cat(
            [sd[f"{lp}.self_attn.{n}_proj.bias"] for n in "qkv"], dim=0)
        out[f"{op}.attn.out_proj.weight"] = sd[f"{lp}.self_attn.out_proj.weight"]
        out[f"{op}.attn.out_proj.bias"] = sd[f"{lp}.self_attn.out_proj.bias"]
        out[f"{op}.mlp.c_fc.weight"] = sd[f"{lp}.mlp.fc1.weight"]
        out[f"{op}.mlp.c_fc.bias"] = sd[f"{lp}.mlp.fc1.bias"]
        out[f"{op}.mlp.c_proj.weight"] = sd[f"{lp}.mlp.fc2.weight"]
        out[f"{op}.mlp.c_proj.bias"] = sd[f"{lp}.mlp.fc2.bias"]
        i += 1
    return out


def test_openclip_converter_and_indexing():
    """convert_openclip_vision + hidden_base='open_clip': after-block-only
    indexing means select_layer=1 reads hf hidden_states[2]
    (open_clip_encoder.py:81-104 collects features after each resblock)."""
    m = _hf_clip_vision()
    oc_sd = _openclip_rename(m.state_dict())
    cfg = CLIPVisionConfig(image_size=28, patch_size=14, width=32, layers=7,
                           heads=4, select_layer=1, select_feature="patch",
                           hidden_base="open_clip")
    params = convert_hf.convert_openclip_vision(oc_sd, cfg)
    rng = np.random.default_rng(3)
    px = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    ours = np.asarray(CLIPVisionTower(cfg).apply(params, jnp.asarray(px)))
    with torch.no_grad():
        out = m(torch.from_numpy(px.transpose(0, 3, 1, 2)),
                output_hidden_states=True)
    ref = out.hidden_states[2][:, 1:].numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_build_vision_tower_dispatch():
    spec = build_vision_tower("openai/clip-vit-large-patch14-336")
    assert spec.module.cfg.width == 1024 and spec.image_size == 336
    spec = build_vision_tower(
        "open_clip_hub:ViT-H-14-378-quickgelu", select_layer=-2)
    assert spec.module.cfg.width == 1280
    assert spec.module.cfg.image_size == 378
    assert spec.module.cfg.hidden_base == "open_clip"
    spec = build_vision_tower("google/siglip-so400m-patch14-384")
    assert spec.module.cfg.width == 1152
    spec = build_vision_tower("DeepGlint-AI/mlcd-vit-bigG-patch14-336")
    assert spec.module.cfg.pos_embed == "rope2d"
    assert spec.module.cfg.ffn_width == 8192
    with pytest.raises(NotImplementedError):
        build_vision_tower("imagebind_huge")
    with pytest.raises(ValueError):
        build_vision_tower("totally-unknown-tower")
    with pytest.raises(FileNotFoundError):
        build_vision_tower("hf:/nonexistent/dir")
