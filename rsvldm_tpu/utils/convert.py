"""PyTorch checkpoint -> Flax param-tree converters.

One-time conversion from the reference's published checkpoints (SR3
I1000000_E800_gen.pth naming, juggernautXL/SR-v0Q safetensors, HF CLIP /
open_clip / Llama weights) into this framework's NHWC param trees, which are
then stored as orbax checkpoints (utils/checkpoint.py). torch is used only
here, host-side.

Layout rules:
  conv   [O, I, kh, kw] -> kernel [kh, kw, I, O]
  linear [O, I]         -> kernel [I, O]
  norm   weight/bias    -> scale/bias
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def t2n(t) -> np.ndarray:
    """torch tensor (or ndarray) -> float32 ndarray."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def conv_w(t) -> np.ndarray:
    return t2n(t).transpose(2, 3, 1, 0)


def lin_w(t) -> np.ndarray:
    return t2n(t).T


def _conv(sd, prefix):
    out = {"kernel": conv_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = t2n(sd[f"{prefix}.bias"])
    return out


def _dense(sd, prefix):
    out = {"kernel": lin_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = t2n(sd[f"{prefix}.bias"])
    return out


def _norm(sd, prefix):
    return {"scale": t2n(sd[f"{prefix}.weight"]),
            "bias": t2n(sd[f"{prefix}.bias"])}


# ---------------------------------------------------------------- SR3 UNet

def convert_sr3_unet(sd: Dict[str, Any], cfg) -> Dict:
    """Reference SR3 UNet state_dict -> SR3UNet params.

    torch layout (models/sr3_model/sr3_modules/unet.py:162-234): flat
    ModuleLists `downs` / `mid` / `ups` walked in the same construction
    order as our named tree; Block = Sequential(GN,Swish,Dropout,Conv) with
    indices 0/3; FeatureWiseAffine nests noise_func.noise_func.0."""
    p: Dict[str, Any] = {}

    p["noise_level_mlp"] = {"fc1": _dense(sd, "noise_level_mlp.1"),
                            "fc2": _dense(sd, "noise_level_mlp.3")}

    def block(prefix):
        return {"norm": _norm(sd, f"{prefix}.block.0"),
                "conv": _conv(sd, f"{prefix}.block.3")}

    def res_with_attn(prefix, has_attn):
        rb = {"block1": block(f"{prefix}.res_block.block1"),
              "noise_func": _dense(sd, f"{prefix}.res_block.noise_func.noise_func.0"),
              "block2": block(f"{prefix}.res_block.block2")}
        if f"{prefix}.res_block.res_conv.weight" in sd:
            rb["res_conv"] = _conv(sd, f"{prefix}.res_block.res_conv")
        out = {"res_block": rb}
        if has_attn:
            out["attn"] = {"norm": _norm(sd, f"{prefix}.attn.norm"),
                           "qkv": _conv(sd, f"{prefix}.attn.qkv"),
                           "out": _conv(sd, f"{prefix}.attn.out")}
        return out

    num_mults = len(cfg.channel_mults)
    now_res = cfg.image_size
    ti = 0  # torch downs index
    p["conv_in"] = _conv(sd, f"downs.{ti}")
    ti += 1
    for ind in range(num_mults):
        is_last = ind == num_mults - 1
        use_attn = now_res in cfg.attn_res
        for blk in range(cfg.res_blocks):
            p[f"down_{ind}_{blk}"] = res_with_attn(f"downs.{ti}", use_attn)
            ti += 1
        if not is_last:
            p[f"downsample_{ind}"] = _conv(sd, f"downs.{ti}.conv")
            ti += 1
            now_res //= 2

    p["mid_0"] = res_with_attn("mid.0", True)
    p["mid_1"] = res_with_attn("mid.1", False)

    ti = 0
    for ind in reversed(range(num_mults)):
        is_last = ind < 1
        use_attn = now_res in cfg.attn_res
        for blk in range(cfg.res_blocks + 1):
            p[f"up_{ind}_{blk}"] = res_with_attn(f"ups.{ti}", use_attn)
            ti += 1
        if not is_last:
            p[f"upsample_{ind}"] = _conv(sd, f"ups.{ti}.conv")
            ti += 1
            now_res *= 2

    p["final_conv"] = {"norm": _norm(sd, "final_conv.block.0"),
                       "conv": _conv(sd, "final_conv.block.3")}
    return {"params": p}
