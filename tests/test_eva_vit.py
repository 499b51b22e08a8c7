"""EVA-CLIP vision tower parity vs the reference's vendored torch tree.

Oracle: /root/reference/llava/model/multimodal_encoder/eva_clip/eva_vit.py
EVAVisionTransformer (random weights, eval mode), compared against
rsvldm_tpu.models.vlm.eva_vit.EvaVisionTower + convert_eva_vision at small
geometry, exercising both block families:
  - EVA02 style: subln q/k/v + inner_attn_ln, SwiGLU + ffn_ln, 2D rope
  - EVA01 style: fused qkv with q/v bias, plain GELU MLP, abs pos only
Feature semantics checked: the final block is SKIPPED and CLS stripped
(eva_vit.py:694-696, EVAEncoderWrapper:851).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import ref_oracle

from rsvldm_tpu.models.vlm.eva_vit import (EVA_GEOMETRIES, EvaVisionTower,
                                           EvaVitConfig)
from rsvldm_tpu.utils import convert_hf

pytestmark = pytest.mark.skipif(not ref_oracle.available(),
                                reason="reference repo not present")


def _load_eva_vit():
    """Load the vendored eva_vit.py by file path (llava/__init__ pulls the
    whole model stack; only rank0_print is needed from llava.utils)."""
    import importlib.util
    import sys
    import types
    ref_oracle.install()
    if "llava.utils" not in sys.modules:
        m = types.ModuleType("llava.utils")
        m.rank0_print = lambda *a, **k: None
        sys.modules["llava.utils"] = m
    name = "_ref_eva_vit"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/reference/llava/model/multimodal_encoder/"
              "eva_clip/eva_vit.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _ref_eva(cfg: EvaVitConfig, torch_seed=0):
    EVAVisionTransformer = _load_eva_vit().EVAVisionTransformer
    torch.manual_seed(torch_seed)
    m = EVAVisionTransformer(
        img_size=cfg.image_size, patch_size=cfg.patch_size,
        num_classes=16,                 # head unused in feature mode
        use_mean_pooling=False,
        init_values=cfg.ls_init_value,
        embed_dim=cfg.width, depth=cfg.layers, num_heads=cfg.heads,
        mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        xattn=False, rope=cfg.rope, postnorm=cfg.postnorm,
        pt_hw_seq_len=cfg.pt_hw_seq_len, intp_freq=cfg.intp_freq,
        naiveswiglu=cfg.naiveswiglu, subln=cfg.subln)
    m.eval()
    # randomize the zero-init biases/tables so parity is non-trivial
    g = torch.Generator().manual_seed(torch_seed + 1)
    with torch.no_grad():
        for n, p in m.named_parameters():
            if p.abs().sum() == 0:
                p.add_(torch.randn(p.shape, generator=g) * 0.02)
    return m


def _compare(cfg: EvaVitConfig, atol=2e-5, rtol=1e-4):
    m = _ref_eva(cfg)
    sd = {k: v for k, v in m.state_dict().items()}
    params = convert_hf.convert_eva_vision(sd, cfg)
    tower = EvaVisionTower(cfg)
    rng = np.random.default_rng(3)
    px = rng.standard_normal(
        (2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    ours = np.asarray(tower.apply(params, jnp.asarray(px)))
    with torch.no_grad():
        # EVAEncoderWrapper.forward: all features, strip CLS
        ref = m(torch.from_numpy(px.transpose(0, 3, 1, 2)),
                return_all_features=True)[:, 1:, :].numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=rtol)


def test_eva02_subln_swiglu_rope_parity():
    cfg = EvaVitConfig(image_size=28, patch_size=14, width=32, layers=4,
                       head_width=8, mlp_ratio=2.5, qkv_bias=True,
                       rope=True, pt_hw_seq_len=2, intp_freq=True,
                       naiveswiglu=True, subln=True)
    _compare(cfg)


def test_eva01_fused_qkv_gelu_parity():
    cfg = EvaVitConfig(image_size=28, patch_size=14, width=32, layers=3,
                       head_width=8, mlp_ratio=4.0, qkv_bias=True,
                       rope=False, naiveswiglu=False, subln=False,
                       intp_freq=False)
    _compare(cfg)


def test_eva_layer_scale_and_postnorm_parity():
    """postnorm + layer-scale gammas (EVA-CLIP-8B/18B block family)."""
    cfg = EvaVitConfig(image_size=28, patch_size=14, width=32, layers=3,
                       head_width=8, mlp_ratio=2.0, qkv_bias=True,
                       rope=False, naiveswiglu=True, subln=True,
                       postnorm=True, ls_init_value=0.1, intp_freq=False)
    _compare(cfg)


def test_registry_dispatch_eva():
    from rsvldm_tpu.models.vlm.towers import build_vision_tower
    spec = build_vision_tower("EVA02-CLIP-L-14-336")
    assert spec.image_size == 336
    assert spec.module.cfg is EVA_GEOMETRIES["eva02-clip-l-14-336"]
    spec224 = build_vision_tower("Internal-EVA02-CLIP-L-14")
    assert spec224.image_size == 224
    with pytest.raises(Exception):
        build_vision_tower("EVA99-unknown")


def test_rope_tables_match_reference():
    """The 2D rope cos/sin tables match VisionRotaryEmbeddingFast."""
    VisionRotaryEmbeddingFast = _load_eva_vit().VisionRotaryEmbeddingFast
    from rsvldm_tpu.models.vlm.eva_vit import _rope_tables
    cfg = EvaVitConfig(image_size=28, patch_size=14, width=32, layers=2,
                       head_width=8, pt_hw_seq_len=2, intp_freq=True)
    rope = VisionRotaryEmbeddingFast(dim=cfg.head_width // 2,
                                     pt_seq_len=cfg.pt_hw_seq_len,
                                     ft_seq_len=cfg.num_patches_per_side)
    cos, sin = _rope_tables(cfg)
    np.testing.assert_allclose(cos, rope.freqs_cos.numpy(), atol=1e-6)
    np.testing.assert_allclose(sin, rope.freqs_sin.numpy(), atol=1e-6)
