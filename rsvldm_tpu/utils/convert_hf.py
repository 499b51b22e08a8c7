"""HF-transformers checkpoint -> Flax converters (CLIP text/vision, Llama,
LLaVA projector, open_clip bigG).

Covers the reference's pretrained towers: openai/clip-vit-large-patch14
(FrozenCLIPEmbedder), ViT-bigG-14 open_clip text (FrozenOpenCLIPEmbedder2),
openai/clip-vit-large-patch14-336 (LLaVA vision tower),
llama3-llava-next-8b language model (+ merged PEFT LoRA), and the
mlp2x_gelu mm_projector.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .convert import _dense, _lnorm, lin_w, t2n


# ----------------------------------------------------------- HF CLIP text

def convert_hf_clip_text(sd: Dict[str, Any], cfg) -> Dict:
    """HF CLIPTextModel state_dict -> CLIPTextTransformer params.

    HF naming: text_model.embeddings.{token_embedding,position_embedding},
    text_model.encoder.layers.{i}.{self_attn.{q,k,v,out}_proj, layer_norm1,
    layer_norm2, mlp.fc1, mlp.fc2}, text_model.final_layer_norm."""
    pre = "text_model"
    p: Dict[str, Any] = {
        "token_embedding": t2n(sd[f"{pre}.embeddings.token_embedding.weight"]),
        "positional_embedding": t2n(
            sd[f"{pre}.embeddings.position_embedding.weight"]),
        "ln_final": _lnorm(sd, f"{pre}.final_layer_norm"),
    }
    for i in range(cfg.layers):
        lp = f"{pre}.encoder.layers.{i}"
        p[f"block_{i}"] = {
            "ln_1": _lnorm(sd, f"{lp}.layer_norm1"),
            "ln_2": _lnorm(sd, f"{lp}.layer_norm2"),
            "attn": {"q_proj": _dense(sd, f"{lp}.self_attn.q_proj"),
                     "k_proj": _dense(sd, f"{lp}.self_attn.k_proj"),
                     "v_proj": _dense(sd, f"{lp}.self_attn.v_proj"),
                     "out_proj": _dense(sd, f"{lp}.self_attn.out_proj")},
            "mlp_fc": _dense(sd, f"{lp}.mlp.fc1"),
            "mlp_proj": _dense(sd, f"{lp}.mlp.fc2"),
        }
    return {"params": p}


def convert_openclip_text(sd: Dict[str, Any], cfg) -> Dict:
    """open_clip text tower state_dict -> CLIPTextTransformer params.

    open_clip naming: token_embedding, positional_embedding,
    transformer.resblocks.{i}.{attn.{in_proj_weight,in_proj_bias,out_proj},
    ln_1, ln_2, mlp.c_fc, mlp.c_proj}, ln_final, text_projection."""
    p: Dict[str, Any] = {
        "token_embedding": t2n(sd["token_embedding.weight"]),
        "positional_embedding": t2n(sd["positional_embedding"]),
        "ln_final": _lnorm(sd, "ln_final"),
    }
    if "text_projection" in sd:
        p["text_projection"] = t2n(sd["text_projection"])
    for i in range(cfg.layers):
        lp = f"transformer.resblocks.{i}"
        w = t2n(sd[f"{lp}.attn.in_proj_weight"])  # [3W, W]
        b = t2n(sd[f"{lp}.attn.in_proj_bias"])
        ws = np.split(w, 3, axis=0)
        bs = np.split(b, 3, axis=0)
        p[f"block_{i}"] = {
            "ln_1": _lnorm(sd, f"{lp}.ln_1"),
            "ln_2": _lnorm(sd, f"{lp}.ln_2"),
            "attn": {"q_proj": {"kernel": ws[0].T, "bias": bs[0]},
                     "k_proj": {"kernel": ws[1].T, "bias": bs[1]},
                     "v_proj": {"kernel": ws[2].T, "bias": bs[2]},
                     "out_proj": _dense(sd, f"{lp}.attn.out_proj")},
            "mlp_fc": _dense(sd, f"{lp}.mlp.c_fc"),
            "mlp_proj": _dense(sd, f"{lp}.mlp.c_proj"),
        }
    return {"params": p}


# --------------------------------------------------------- HF CLIP vision

def convert_hf_clip_vision(sd: Dict[str, Any], cfg) -> Dict:
    """HF CLIPVisionModel state_dict -> CLIPVisionTower params."""
    pre = "vision_model"
    p: Dict[str, Any] = {
        "class_embedding": t2n(sd[f"{pre}.embeddings.class_embedding"]),
        "positional_embedding": t2n(
            sd[f"{pre}.embeddings.position_embedding.weight"]),
        "patch_embed": {"kernel": t2n(
            sd[f"{pre}.embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)},
        "ln_pre": _lnorm(sd, f"{pre}.pre_layrnorm"),
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


# ---------------------------------------------------------------- Llama-3

def merge_lora(base: np.ndarray, lora_a, lora_b, scale: float) -> np.ndarray:
    """W' = W + scale * B @ A (PEFT merge, folded at conversion so no
    runtime PEFT is needed — models/util.py:115)."""
    return base + scale * (t2n(lora_b) @ t2n(lora_a))


def convert_llama(sd: Dict[str, Any], cfg, prefix: str = "model") -> Dict:
    """HF LlamaForCausalLM state_dict -> LlamaModel params.

    HF naming: model.embed_tokens, model.layers.{i}.{self_attn.{q,k,v,o}_proj,
    mlp.{gate,up,down}_proj, input_layernorm, post_attention_layernorm},
    model.norm, lm_head."""
    rms = lambda pfx: {"weight": t2n(sd[f"{pfx}.weight"])}
    p: Dict[str, Any] = {
        "embed_tokens": {"embedding": t2n(sd[f"{prefix}.embed_tokens.weight"])},
        "norm": rms(f"{prefix}.norm"),
    }
    if "lm_head.weight" in sd and not getattr(cfg, "tie_lm_head", False):
        p["lm_head"] = {"kernel": lin_w(sd["lm_head.weight"])}
    for i in range(cfg.layers):
        lp = f"{prefix}.layers.{i}"
        p[f"layer_{i}"] = {
            "attn_norm": rms(f"{lp}.input_layernorm"),
            "mlp_norm": rms(f"{lp}.post_attention_layernorm"),
            "q_proj": _dense(sd, f"{lp}.self_attn.q_proj"),
            "k_proj": _dense(sd, f"{lp}.self_attn.k_proj"),
            "v_proj": _dense(sd, f"{lp}.self_attn.v_proj"),
            "o_proj": _dense(sd, f"{lp}.self_attn.o_proj"),
            "gate_proj": _dense(sd, f"{lp}.mlp.gate_proj"),
            "up_proj": _dense(sd, f"{lp}.mlp.up_proj"),
            "down_proj": _dense(sd, f"{lp}.mlp.down_proj"),
        }
    return {"params": p}


def convert_mm_projector(sd: Dict[str, Any], prefix: str = "model.mm_projector") -> Dict:
    """mlp2x_gelu projector: Sequential(Linear, GELU, Linear) -> fc0/fc1."""
    return {"params": {"fc0": _dense(sd, f"{prefix}.0"),
                       "fc1": _dense(sd, f"{prefix}.2")}}
