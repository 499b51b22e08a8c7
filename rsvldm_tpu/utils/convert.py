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


def strip_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """Sub-dict of keys under `prefix.` (e.g. 'model.diffusion_model')."""
    pl = prefix + "."
    return {k[len(pl):]: v for k, v in sd.items() if k.startswith(pl)}


# ---------------------------------------------------------------- SDXL VAE

def _vae_resblock(sd, prefix):
    out = {"norm1": _norm(sd, f"{prefix}.norm1"),
           "conv1": _conv(sd, f"{prefix}.conv1"),
           "norm2": _norm(sd, f"{prefix}.norm2"),
           "conv2": _conv(sd, f"{prefix}.conv2")}
    if f"{prefix}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv(sd, f"{prefix}.nin_shortcut")
    return out


def _vae_attn(sd, prefix):
    return {"norm": _norm(sd, f"{prefix}.norm"),
            "q": _conv(sd, f"{prefix}.q"),
            "k": _conv(sd, f"{prefix}.k"),
            "v": _conv(sd, f"{prefix}.v"),
            "proj_out": _conv(sd, f"{prefix}.proj_out")}


def convert_vae_encoder(sd: Dict[str, Any], cfg) -> Dict:
    """sgm Encoder state_dict (model.py:482-597) -> Encoder params."""
    p = {"conv_in": _conv(sd, "conv_in")}
    for i in range(len(cfg.ch_mult)):
        for j in range(cfg.num_res_blocks):
            p[f"down_{i}_block_{j}"] = _vae_resblock(sd, f"down.{i}.block.{j}")
        if i != len(cfg.ch_mult) - 1:
            p[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"down.{i}.downsample.conv")}
    p["mid_block_1"] = _vae_resblock(sd, "mid.block_1")
    p["mid_attn_1"] = _vae_attn(sd, "mid.attn_1")
    p["mid_block_2"] = _vae_resblock(sd, "mid.block_2")
    p["norm_out"] = _norm(sd, "norm_out")
    p["conv_out"] = _conv(sd, "conv_out")
    return p


def convert_vae_decoder(sd: Dict[str, Any], cfg) -> Dict:
    """sgm Decoder state_dict (model.py:599-743) -> Decoder params."""
    p = {"conv_in": _conv(sd, "conv_in"),
         "mid_block_1": _vae_resblock(sd, "mid.block_1"),
         "mid_attn_1": _vae_attn(sd, "mid.attn_1"),
         "mid_block_2": _vae_resblock(sd, "mid.block_2")}
    for i in range(len(cfg.ch_mult)):
        for j in range(cfg.num_res_blocks + 1):
            p[f"up_{i}_block_{j}"] = _vae_resblock(sd, f"up.{i}.block.{j}")
        if i != 0:
            p[f"up_{i}_upsample"] = {"conv": _conv(sd, f"up.{i}.upsample.conv")}
    p["norm_out"] = _norm(sd, "norm_out")
    p["conv_out"] = _conv(sd, "conv_out")
    return p


def convert_autoencoder(sd: Dict[str, Any], cfg) -> Dict:
    """Full AutoencoderKL (+ denoise_encoder twin when present in the SR
    overlay ckpt, SR_model.py:22)."""
    p = {"encoder": convert_vae_encoder(strip_prefix(sd, "encoder"), cfg),
         "decoder": convert_vae_decoder(strip_prefix(sd, "decoder"), cfg),
         "quant_conv": _conv(sd, "quant_conv"),
         "post_quant_conv": _conv(sd, "post_quant_conv")}
    den = strip_prefix(sd, "denoise_encoder")
    p["denoise_encoder"] = convert_vae_encoder(den, cfg) if den \
        else p["encoder"]
    return {"params": p}


# ---------------------------------------------------------------- SDXL UNet

def _res(sd, prefix):
    out = {"in_norm": _norm(sd, f"{prefix}.in_layers.0"),
           "in_conv": _conv(sd, f"{prefix}.in_layers.2"),
           "emb_proj": _dense(sd, f"{prefix}.emb_layers.1"),
           "out_norm": _norm(sd, f"{prefix}.out_layers.0"),
           "out_conv": _conv(sd, f"{prefix}.out_layers.3")}
    if f"{prefix}.skip_connection.weight" in sd:
        out["skip"] = _conv(sd, f"{prefix}.skip_connection")
    return out


def _xattn(sd, prefix):
    return {"to_q": _dense(sd, f"{prefix}.to_q"),
            "to_k": _dense(sd, f"{prefix}.to_k"),
            "to_v": _dense(sd, f"{prefix}.to_v"),
            "to_out": _dense(sd, f"{prefix}.to_out.0")}


def _lnorm(sd, prefix):
    return {"scale": t2n(sd[f"{prefix}.weight"]),
            "bias": t2n(sd[f"{prefix}.bias"])}


def _spatial_transformer(sd, prefix, depth):
    p = {"norm": _norm(sd, f"{prefix}.norm"),
         "proj_in": _dense(sd, f"{prefix}.proj_in"),
         "proj_out": _dense(sd, f"{prefix}.proj_out")}
    for d in range(depth):
        bp = f"{prefix}.transformer_blocks.{d}"
        p[f"block_{d}"] = {
            "attn1": _xattn(sd, f"{bp}.attn1"),
            "attn2": _xattn(sd, f"{bp}.attn2"),
            "ff": {"proj": _dense(sd, f"{bp}.ff.net.0.proj"),
                   "out": _dense(sd, f"{bp}.ff.net.2")},
            "norm1": _lnorm(sd, f"{bp}.norm1"),
            "norm2": _lnorm(sd, f"{bp}.norm2"),
            "norm3": _lnorm(sd, f"{bp}.norm3"),
        }
    return p


def _unet_common(sd, cfg):
    """time/label embeds + conv_in + input cells + middle (shared by
    UNetModel and GLVControl)."""
    from ..models.sdxl.unet import _build_specs
    in_specs, out_specs, _ = _build_specs(cfg)
    p = {
        "time_dense1": _dense(sd, "time_embed.0"),
        "time_dense2": _dense(sd, "time_embed.2"),
        "label_dense1": _dense(sd, "label_emb.0.0"),
        "label_dense2": _dense(sd, "label_emb.0.2"),
        "conv_in": _conv(sd, "input_blocks.0.0"),
    }
    for i, s in enumerate(in_specs):
        ti = i + 1
        if s["kind"] == "down":
            p[f"input_{i}"] = {"down_conv": _conv(sd, f"input_blocks.{ti}.0.op")}
        else:
            cell = {"resblock": _res(sd, f"input_blocks.{ti}.0")}
            if s["st_depth"] > 0:
                cell["transformer"] = _spatial_transformer(
                    sd, f"input_blocks.{ti}.1", s["st_depth"])
            p[f"input_{i}"] = cell
    p["mid_res1"] = _res(sd, "middle_block.0")
    p["mid_transformer"] = _spatial_transformer(
        sd, "middle_block.1", cfg.transformer_depth[-1])
    p["mid_res2"] = _res(sd, "middle_block.2")
    return p, out_specs


def convert_sdxl_unet(sd: Dict[str, Any], cfg) -> Dict:
    """sgm UNetModel state_dict (openaimodel.py:500-1007) -> UNetModel
    params. Checkpoints usually prefix with 'model.diffusion_model.' — strip
    first."""
    p, out_specs = _unet_common(sd, cfg)
    for i, s in enumerate(out_specs):
        cell = {"resblock": _res(sd, f"output_blocks.{i}.0")}
        up_idx = 1
        if s["st_depth"] > 0:
            cell["transformer"] = _spatial_transformer(
                sd, f"output_blocks.{i}.1", s["st_depth"])
            up_idx = 2
        if s["has_up"]:
            cell["up_conv"] = _conv(sd, f"output_blocks.{i}.{up_idx}.conv")
        p[f"output_{i}"] = cell
    p["out_norm"] = _norm(sd, "out.0")
    p["out_conv"] = _conv(sd, "out.2")
    return {"params": p}


def convert_glv_control(sd: Dict[str, Any], cfg) -> Dict:
    """GLVControl (SR_modules.py:152-537): encoder half + input_hint."""
    p, _ = _unet_common(sd, cfg)
    p["input_hint"] = _conv(sd, "input_hint_block.0")
    return {"params": p}


def convert_controlled_unet(sd: Dict[str, Any], cfg) -> Dict:
    """LightGLVUNet: base UNet params + project_modules (SR_modules.py:
    540-579). Our project_{i} names already use the torch ModuleList index."""
    from ..models.sdxl.control import derive_project_specs
    unet = convert_sdxl_unet(sd, cfg)["params"]
    specs = derive_project_specs(cfg)
    n = len(specs)
    p = {"unet": unet}
    for c, s in enumerate(specs):
        i = n - 1 - c  # torch index
        tp = f"project_modules.{i}"
        if s["kind"] == "sft":
            p[f"project_{i}"] = {
                "param_free_norm": _norm(sd, f"{tp}.param_free_norm"),
                "mlp_shared": _conv(sd, f"{tp}.mlp_shared.0"),
                "zero_mul": _conv(sd, f"{tp}.zero_mul"),
                "zero_add": _conv(sd, f"{tp}.zero_add"),
                "zero_conv": _conv(sd, f"{tp}.zero_conv"),
            }
        else:
            p[f"project_{i}"] = {
                "norm1": _norm(sd, f"{tp}.norm1"),
                "norm2": _norm(sd, f"{tp}.norm2"),
                "attn": _xattn(sd, f"{tp}.attn"),
            }
    return {"params": p}

