"""Vision-tower registry: name -> (tower module, params converter, size).

Parity target: /root/reference/llava/model/multimodal_encoder/builder.py
build_vision_tower — the same name-based dispatch over the tower families
the reference ships:

  openai/laion/ShareGPT4V/<path>  CLIP ViT (clip_encoder.py; +S2 wrapper)
  *siglip*                        SigLIP (siglip_encoder.py)
  hf:<name-or-local-dir>          config-driven CLIP-arch tower
                                  (hf_vision.py AutoModel; here the config
                                  comes from a LOCAL config.json — this
                                  environment has no hub egress, matching
                                  the rest of the framework's local-
                                  checkpoint convention)
  open_clip_hub:<model>           open_clip ViT (open_clip_encoder.py) with
                                  open_clip hidden-state indexing and the
                                  fused-qkv converter
  mlcd-vit-bigG-patch14*          MLCD ViT: 2D-RoPE CLIP variant
                                  (mlcd_encoder.py / HF modeling_mlcd)
  *eva02*/*eva01*/internal-eva*   EVA-CLIP ViT (vendored eva_clip tree;
                                  dispatch commented out at builder.py:37-38
                                  but implemented here — eva_vit.py)
  imagebind_huge                  needs the EXTERNAL `imagebind` package
                                  even in the reference (import guarded at
                                  imagebind.py:5-10) — descoped; raises

select_layer / select_feature mirror mm_vision_select_layer /
mm_vision_select_feature, including the slicefour_* and slice_m25811_f6_*
multi-layer concat modes (hf_vision.py:50-52, mlcd_encoder.py:56-63).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Callable, NamedTuple

from .siglip import SIGLIP_SO400M_384_CONFIG, SigLIPVisionConfig, \
    SigLIPVisionTower
from .vision import CLIP_VIT_L_336_CONFIG, CLIPVisionConfig, CLIPVisionTower

# open_clip model-name registry entries the reference names explicitly
# (open_clip_encoder.py HIDDEN_SIZE_DICT: ViT-H-14-378-quickgelu)
_OPEN_CLIP_GEOMETRY = {
    "ViT-H-14-378-quickgelu": dict(image_size=378, patch_size=14, width=1280,
                                   layers=32, heads=16, act="quick_gelu"),
    "ViT-H-14": dict(image_size=224, patch_size=14, width=1280,
                     layers=32, heads=16, act="gelu"),
    "ViT-bigG-14": dict(image_size=224, patch_size=14, width=1664,
                        layers=48, heads=16, act="gelu", ffn_width=8192),
}

# MLCD ViT-bigG/14 geometry (transformers MLCDVisionConfig defaults)
_MLCD_BIGG = dict(image_size=336, patch_size=14, width=1664, layers=48,
                  heads=16, act="gelu", ffn_width=8192, pos_embed="rope2d")


class VisionTowerSpec(NamedTuple):
    module: Any                      # flax module, __call__(pixels NHWC)
    convert: Callable[[dict], dict]  # torch state_dict -> flax params
    image_size: int
    s2: bool = False                 # caller should wrap with
    #                                  s2_multiscale_features (clip_encoder
    #                                  CLIPVisionTowerS2 contract)


def _load_hf_geometry(name: str) -> dict:
    """Map an `hf:` tower to CLIP-arch geometry from a LOCAL config.json
    (hf_vision.py loads the same config from the hub)."""
    cfg_path = Path(name) / "config.json"
    if not cfg_path.is_file():
        raise FileNotFoundError(
            f"hf: vision towers need a local checkout with config.json; "
            f"missing {cfg_path} (no hub egress in this environment)")
    raw = json.loads(cfg_path.read_text())
    raw = raw.get("vision_config", raw)
    act = raw.get("hidden_act", "quick_gelu")
    acts = {"gelu": "gelu", "gelu_pytorch_tanh": "gelu_tanh",
            "quick_gelu": "quick_gelu"}
    if act not in acts:
        raise ValueError(f"unsupported vision hidden_act {act!r} in "
                         f"{cfg_path} (supported: {sorted(acts)})")
    return dict(image_size=raw.get("image_size", 336),
                patch_size=raw.get("patch_size", 14),
                width=raw.get("hidden_size", 1024),
                layers=raw.get("num_hidden_layers", 24),
                heads=raw.get("num_attention_heads", 16),
                act=acts[act],
                ffn_width=raw.get("intermediate_size", 0) or 0)


def build_vision_tower(vision_tower: str, select_layer: int = -2,
                       select_feature: str = "patch",
                       s2: bool = False) -> VisionTowerSpec:
    """Dispatch a reference `mm_vision_tower` name to the TPU tower family
    (builder.py:14-43). Raises ValueError on unknown names like the
    reference does."""
    from ...utils import convert_hf

    name = vision_tower

    def clip_spec(geom: dict, convert, hidden_base: str = "hf"):
        cfg = dataclasses.replace(
            CLIP_VIT_L_336_CONFIG, select_layer=select_layer,
            select_feature=select_feature, hidden_base=hidden_base, **geom)
        return VisionTowerSpec(CLIPVisionTower(cfg),
                               lambda sd: convert(sd, cfg),
                               cfg.image_size, s2=s2)

    if (Path(name).exists() or name.startswith("openai")
            or name.startswith("laion") or "ShareGPT4V" in name):
        # the shipped family (clip_encoder.py CLIPVisionTower[S2]); geometry
        # from a local config.json when present, else the CLIP-L/336 default
        geom = {}
        if (Path(name) / "config.json").is_file():
            geom = _load_hf_geometry(name)
        return clip_spec(geom, convert_hf.convert_hf_clip_vision)
    if "siglip" in name:
        cfg = dataclasses.replace(SIGLIP_SO400M_384_CONFIG,
                                  select_layer=select_layer)
        return VisionTowerSpec(
            SigLIPVisionTower(cfg),
            lambda sd: convert_hf.convert_hf_siglip_vision(sd, cfg),
            cfg.image_size, s2=s2)
    if name.startswith("hf:"):
        return clip_spec(_load_hf_geometry(name[3:]),
                         convert_hf.convert_hf_clip_vision)
    if name in ("imagebind_huge",):
        raise NotImplementedError(
            "imagebind_huge depends on the EXTERNAL `imagebind` package "
            "even in the reference (imagebind.py:5-10 guards the import "
            "with a bare except; the tree is not vendored) — it cannot run "
            "there without a pip install and is descoped here "
            "(COMPONENTS.md)")
    if "internal-eva" in name.lower() or "eva02" in name.lower() \
            or "eva01" in name.lower():
        # the vendored EVA tree dispatch (builder.py:37-38, commented out
        # in the reference but fully vendored under eva_clip/)
        from .eva_vit import EVA_GEOMETRIES, EvaVisionTower
        cand = name.lower().replace("internal-", "")
        # longest match wins (EVA02-CLIP-L-14 is a prefix of ...-L-14-336)
        key = max((k for k in EVA_GEOMETRIES if k in cand),
                  key=len, default=None)
        if key is None:
            raise ValueError(f"Unknown EVA tower: {name} "
                             f"(known: {sorted(EVA_GEOMETRIES)})")
        cfg = EVA_GEOMETRIES[key]
        return VisionTowerSpec(
            EvaVisionTower(cfg, keep_cls=(select_feature == "cls_patch")),
            lambda sd: convert_hf.convert_eva_vision(sd, cfg),
            cfg.image_size, s2=s2)
    if name.startswith("open_clip_hub"):
        model = name.replace("open_clip_hub:", "")
        if model not in _OPEN_CLIP_GEOMETRY:
            raise ValueError(f"Unknown open_clip tower: {model} "
                             f"(known: {sorted(_OPEN_CLIP_GEOMETRY)})")
        return clip_spec(_OPEN_CLIP_GEOMETRY[model],
                         convert_hf.convert_openclip_vision,
                         hidden_base="open_clip")
    if "mlcd-vit-bigG-patch14" in name:
        geom = dict(_MLCD_BIGG)
        # the published 448 variant differs only in input resolution
        # (DeepGlint-AI/mlcd-vit-bigG-patch14-448; RoPE has no
        # size-dependent params, so the same converter serves both)
        if "448" in name.split("patch14", 1)[1]:
            geom["image_size"] = 448
        return clip_spec(geom, convert_hf.convert_mlcd_vision)
    raise ValueError(f"Unknown vision tower: {vision_tower}")
