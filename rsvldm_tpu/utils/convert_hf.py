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
    if getattr(cfg, "use_text_projection", False) \
            and "text_projection.weight" in sd:
        # HF CLIPModel text_projection: Linear no-bias, weight [proj, width]
        p["text_projection"] = t2n(sd["text_projection.weight"]).T
    return {"params": p}


def convert_hf_clip_embedder(sd: Dict[str, Any], cfg) -> Dict:
    """HF CLIPModel (full, vision side) -> CLIPVisionEmbedder params:
    the vision tower plus post_layernorm + visual_projection (the
    get_image_features head the quality harness scores with)."""
    tower = convert_hf_clip_vision(sd, cfg)["params"]
    p = {"tower": tower,
         "ln_post": _lnorm(sd, "vision_model.post_layernorm"),
         "visual_projection": t2n(sd["visual_projection.weight"]).T}
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


def convert_openclip_vision(sd: Dict[str, Any], cfg) -> Dict:
    """open_clip VisionTransformer (`visual.`-stripped) state_dict ->
    CLIPVisionTower params (OpenCLIPVisionTower parity,
    llava/model/multimodal_encoder/open_clip_encoder.py:81-104).

    open_clip naming: conv1, class_embedding, positional_embedding, ln_pre,
    transformer.resblocks.{i}.{ln_1, attn.in_proj_*, attn.out_proj, ln_2,
    mlp.c_fc, mlp.c_proj} — fused qkv split three ways like the text side."""
    p: Dict[str, Any] = {
        "class_embedding": t2n(sd["class_embedding"]),
        "positional_embedding": t2n(sd["positional_embedding"]),
        "patch_embed": {"kernel": t2n(sd["conv1.weight"]).transpose(2, 3, 1, 0)},
        "ln_pre": _lnorm(sd, "ln_pre"),
    }
    for i in range(cfg.layers):
        lp = f"transformer.resblocks.{i}"
        w = np.split(t2n(sd[f"{lp}.attn.in_proj_weight"]), 3, axis=0)
        b = np.split(t2n(sd[f"{lp}.attn.in_proj_bias"]), 3, axis=0)
        p[f"block_{i}"] = {
            "ln_1": _lnorm(sd, f"{lp}.ln_1"),
            "ln_2": _lnorm(sd, f"{lp}.ln_2"),
            "q_proj": {"kernel": w[0].T, "bias": b[0]},
            "k_proj": {"kernel": w[1].T, "bias": b[1]},
            "v_proj": {"kernel": w[2].T, "bias": b[2]},
            "out_proj": _dense(sd, f"{lp}.attn.out_proj"),
            "mlp_fc": _dense(sd, f"{lp}.mlp.c_fc"),
            "mlp_proj": _dense(sd, f"{lp}.mlp.c_proj"),
        }
    return {"params": p}


def convert_mlcd_vision(sd: Dict[str, Any], cfg) -> Dict:
    """HF MLCDVisionModel state_dict -> CLIPVisionTower(pos_embed='rope2d')
    params (MLCDVisionTower parity, mlcd_encoder.py:17-100). Same tree as
    CLIP vision minus the absolute position table, plus the learned
    class-token rotary row (vision_model.class_pos_emb)."""
    pre = "vision_model"
    p: Dict[str, Any] = {
        "class_embedding": t2n(sd[f"{pre}.embeddings.class_embedding"]),
        "class_pos_emb": t2n(sd[f"{pre}.class_pos_emb"]),
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


def convert_eva_vision(sd: Dict[str, Any], cfg) -> Dict:
    """Vendored EVA ViT state_dict (eva_vit.py EVAVisionTransformer) ->
    EvaVisionTower params.

    Torch naming: patch_embed.proj, cls_token [1,1,C], pos_embed [1,T+1,C],
    blocks.{i}.{norm1, norm2, attn.{q_proj,k_proj,v_proj | qkv} +
    q_bias/v_bias params, attn.inner_attn_ln, attn.proj,
    mlp.{w1,w2,ffn_ln,w3 | fc1,fc2}}, gamma_1/gamma_2 (layer scale).
    The FINAL block is intentionally not converted — the reference feature
    path skips it (eva_vit.py:694-696) and the Flax tower does not build
    it. rope freqs_cos/freqs_sin buffers are recomputed, not loaded."""
    p: Dict[str, Any] = {
        "cls_token": t2n(sd["cls_token"]).reshape(-1),
        "pos_embed": t2n(sd["pos_embed"])[0],
        "patch_embed": {
            "kernel": t2n(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": t2n(sd["patch_embed.proj.bias"]),
        },
    }
    for i in range(cfg.layers - 1):
        lp = f"blocks.{i}"
        b: Dict[str, Any] = {
            "norm1": _lnorm(sd, f"{lp}.norm1"),
            "norm2": _lnorm(sd, f"{lp}.norm2"),
            "proj": _dense(sd, f"{lp}.attn.proj"),
        }
        if cfg.subln:
            b["q_proj"] = {"kernel": lin_w(sd[f"{lp}.attn.q_proj.weight"])}
            b["k_proj"] = {"kernel": lin_w(sd[f"{lp}.attn.k_proj.weight"])}
            b["v_proj"] = {"kernel": lin_w(sd[f"{lp}.attn.v_proj.weight"])}
            if cfg.qkv_bias:
                b["q_proj"]["bias"] = t2n(sd[f"{lp}.attn.q_bias"])
                b["v_proj"]["bias"] = t2n(sd[f"{lp}.attn.v_bias"])
            b["inner_attn_ln"] = _lnorm(sd, f"{lp}.attn.inner_attn_ln")
        else:
            b["qkv"] = {"kernel": lin_w(sd[f"{lp}.attn.qkv.weight"])}
            if cfg.qkv_bias:
                b["q_bias"] = t2n(sd[f"{lp}.attn.q_bias"])
                b["v_bias"] = t2n(sd[f"{lp}.attn.v_bias"])
        if cfg.naiveswiglu:
            b["w1"] = _dense(sd, f"{lp}.mlp.w1")
            b["w2"] = _dense(sd, f"{lp}.mlp.w2")
            b["w3"] = _dense(sd, f"{lp}.mlp.w3")
            if cfg.subln:
                b["ffn_ln"] = _lnorm(sd, f"{lp}.mlp.ffn_ln")
        else:
            b["fc1"] = _dense(sd, f"{lp}.mlp.fc1")
            b["fc2"] = _dense(sd, f"{lp}.mlp.fc2")
            if cfg.subln:
                b["ffn_ln"] = _lnorm(sd, f"{lp}.mlp.ffn_ln")
        if cfg.ls_init_value is not None:
            b["gamma_1"] = t2n(sd[f"{lp}.gamma_1"])
            b["gamma_2"] = t2n(sd[f"{lp}.gamma_2"])
        p[f"block_{i}"] = b
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
        layer = {
            "attn_norm": rms(f"{lp}.input_layernorm"),
            "mlp_norm": rms(f"{lp}.post_attention_layernorm"),
            "q_proj": _dense(sd, f"{lp}.self_attn.q_proj"),
            "k_proj": _dense(sd, f"{lp}.self_attn.k_proj"),
            "v_proj": _dense(sd, f"{lp}.self_attn.v_proj"),
            "o_proj": _dense(sd, f"{lp}.self_attn.o_proj"),
        }
        if getattr(cfg, "num_experts", 0):
            layer["moe"] = _convert_moe_layer(sd, lp, cfg)
        else:
            layer.update({
                "gate_proj": _dense(sd, f"{lp}.mlp.gate_proj"),
                "up_proj": _dense(sd, f"{lp}.mlp.up_proj"),
                "down_proj": _dense(sd, f"{lp}.mlp.down_proj"),
            })
        p[f"layer_{i}"] = layer
    return {"params": p}


def _convert_moe_layer(sd: Dict[str, Any], lp: str, cfg) -> Dict:
    """MoE FFN of one decoder layer -> stacked-expert MoEFFN params.

    Mixtral naming (modeling_mixtral): {lp}.block_sparse_moe.gate.weight +
    .experts.{e}.{w1=gate, w3=up, w2=down}.weight.
    Qwen2-MoE naming (modeling_qwen2_moe): {lp}.mlp.gate.weight +
    .experts.{e}.{gate,up,down}_proj.weight + shared_expert(+gate)."""
    if f"{lp}.block_sparse_moe.gate.weight" in sd:  # Mixtral
        mp = f"{lp}.block_sparse_moe"
        names = {"gate": "w1", "up": "w3", "down": "w2"}
        expert = lambda e, part: lin_w(sd[f"{mp}.experts.{e}.{names[part]}.weight"])
    else:  # Qwen2-MoE
        mp = f"{lp}.mlp"
        expert = lambda e, part: lin_w(sd[f"{mp}.experts.{e}.{part}_proj.weight"])
    out = {
        "router": {"kernel": lin_w(sd[f"{mp}.gate.weight"])},
        "experts_gate": np.stack([expert(e, "gate")
                                  for e in range(cfg.num_experts)]),
        "experts_up": np.stack([expert(e, "up")
                                for e in range(cfg.num_experts)]),
        "experts_down": np.stack([expert(e, "down")
                                  for e in range(cfg.num_experts)]),
    }
    if f"{mp}.shared_expert.gate_proj.weight" in sd:
        out["shared_gate_proj"] = {
            "kernel": lin_w(sd[f"{mp}.shared_expert.gate_proj.weight"])}
        out["shared_up_proj"] = {
            "kernel": lin_w(sd[f"{mp}.shared_expert.up_proj.weight"])}
        out["shared_down_proj"] = {
            "kernel": lin_w(sd[f"{mp}.shared_expert.down_proj.weight"])}
        out["shared_expert_gate"] = {
            "kernel": lin_w(sd[f"{mp}.shared_expert_gate.weight"])}
    return out


def convert_mm_projector(sd: Dict[str, Any], prefix: str = "model.mm_projector") -> Dict:
    """mlp2x_gelu projector: Sequential(Linear, GELU, Linear) -> fc0/fc1."""
    return {"params": {"fc0": _dense(sd, f"{prefix}.0"),
                       "fc1": _dense(sd, f"{prefix}.2")}}


def convert_t5_encoder(sd: Dict[str, Any], cfg) -> Dict:
    """HF T5EncoderModel state_dict -> T5Encoder params. HF naming:
    shared.weight, encoder.block.{i}.layer.0.SelfAttention.{q,k,v,o}
    (+ layer 0's relative_attention_bias), layer.0/1.layer_norm,
    encoder.block.{i}.layer.1.DenseReluDense.{wi_0,wi_1|wi,wo},
    encoder.final_layer_norm."""
    p: Dict[str, Any] = {
        "shared": {"embedding": t2n(sd["shared.weight"])},
        "relative_attention_bias": t2n(
            sd["encoder.block.0.layer.0.SelfAttention."
               "relative_attention_bias.weight"]),
        "ln_final": {"weight": t2n(sd["encoder.final_layer_norm.weight"])},
    }
    for i in range(cfg.layers):
        bp = f"encoder.block.{i}"
        blk = {
            "ln_attn": {"weight": t2n(sd[f"{bp}.layer.0.layer_norm.weight"])},
            "ln_ff": {"weight": t2n(sd[f"{bp}.layer.1.layer_norm.weight"])},
            "q": _dense(sd, f"{bp}.layer.0.SelfAttention.q"),
            "k": _dense(sd, f"{bp}.layer.0.SelfAttention.k"),
            "v": _dense(sd, f"{bp}.layer.0.SelfAttention.v"),
            "o": _dense(sd, f"{bp}.layer.0.SelfAttention.o"),
        }
        ff = f"{bp}.layer.1.DenseReluDense"
        if f"{ff}.wi_0.weight" in sd:
            blk["wi_0"] = _dense(sd, f"{ff}.wi_0")
            blk["wi_1"] = _dense(sd, f"{ff}.wi_1")
        else:
            blk["wi"] = _dense(sd, f"{ff}.wi")
        blk["wo"] = _dense(sd, f"{ff}.wo")
        p[f"block_{i}"] = blk
    return {"params": p}


def convert_pooler_projector(sd: Dict[str, Any],
                             prefix: str = "model.mm_projector") -> Dict:
    """PoolerProjector: conv_pool (NCHW conv -> HWIO kernel) + proj
    Sequential(GELU, Linear) (pooler_projector.py:14-19)."""
    from .convert import conv_w
    return {"params": {
        "conv_pool": {"kernel": conv_w(sd[f"{prefix}.conv_pool.weight"]),
                      "bias": t2n(sd[f"{prefix}.conv_pool.bias"])},
        "proj": _dense(sd, f"{prefix}.proj.1"),
    }}


def convert_mpt(sd: Dict[str, Any], cfg) -> Dict:
    """HF MptForCausalLM state_dict -> MPTModel params. HF naming:
    transformer.wte, transformer.blocks.{i}.{norm_1, attn.Wqkv,
    attn.out_proj, norm_2, ffn.up_proj, ffn.down_proj}, transformer.norm_f;
    lm_head is tied to wte."""
    def ln(pfx):
        out = {"scale": t2n(sd[f"{pfx}.weight"])}
        if f"{pfx}.bias" in sd and sd[f"{pfx}.bias"] is not None:
            out["bias"] = t2n(sd[f"{pfx}.bias"])
        return out

    p: Dict[str, Any] = {
        "wte": {"embedding": t2n(sd["transformer.wte.weight"])},
        "norm_f": ln("transformer.norm_f"),
    }
    for i in range(cfg.layers):
        lp = f"transformer.blocks.{i}"
        p[f"block_{i}"] = {
            "norm_1": ln(f"{lp}.norm_1"),
            "wqkv": _dense(sd, f"{lp}.attn.Wqkv"),
            "out_proj": _dense(sd, f"{lp}.attn.out_proj"),
            "norm_2": ln(f"{lp}.norm_2"),
            "up_proj": _dense(sd, f"{lp}.ffn.up_proj"),
            "down_proj": _dense(sd, f"{lp}.ffn.down_proj"),
        }
    return {"params": p}


# ------------------------------------------------------------- resamplers

def convert_qformer(sd: Dict[str, Any], cfg) -> Dict:
    """BLIP-2 Qformer resampler state_dict (llava/model/multimodal_resampler/
    qformer.py:1092-1123) -> QFormerResampler params. Torch naming:
    query_tokens, ln_vision, Qformer.bert.embeddings.LayerNorm,
    Qformer.bert.encoder.layer.{i}.{attention.{self.{query,key,value},
    output.{dense,LayerNorm}}, crossattention.<same>, intermediate_query,
    output_query.{dense,LayerNorm}}."""
    p: Dict[str, Any] = {
        "query_tokens": t2n(sd["query_tokens"]).reshape(
            cfg.num_latents, cfg.hidden_size),
        "ln_vision": _lnorm(sd, "ln_vision"),
        "emb_ln": _lnorm(sd, "Qformer.bert.embeddings.LayerNorm"),
    }
    for i in range(cfg.layers):
        lp = f"Qformer.bert.encoder.layer.{i}"
        blk = {
            "self_query": _dense(sd, f"{lp}.attention.self.query"),
            "self_key": _dense(sd, f"{lp}.attention.self.key"),
            "self_value": _dense(sd, f"{lp}.attention.self.value"),
            "self_out": _dense(sd, f"{lp}.attention.output.dense"),
            "self_ln": _lnorm(sd, f"{lp}.attention.output.LayerNorm"),
            "ffn_fc": _dense(sd, f"{lp}.intermediate_query.dense"),
            "ffn_out": _dense(sd, f"{lp}.output_query.dense"),
            "ffn_ln": _lnorm(sd, f"{lp}.output_query.LayerNorm"),
        }
        if f"{lp}.crossattention.self.query.weight" in sd:
            blk.update({
                "cross_query": _dense(sd, f"{lp}.crossattention.self.query"),
                "cross_key": _dense(sd, f"{lp}.crossattention.self.key"),
                "cross_value": _dense(sd, f"{lp}.crossattention.self.value"),
                "cross_out": _dense(sd, f"{lp}.crossattention.output.dense"),
                "cross_ln": _lnorm(sd, f"{lp}.crossattention.output.LayerNorm"),
            })
        p[f"layer_{i}"] = blk
    return {"params": p}


def convert_perceiver(sd: Dict[str, Any], cfg) -> Dict:
    """Flamingo perceiver resampler state_dict (llava/model/
    multimodal_resampler/perceiver.py:131-149) -> PerceiverResampler params.
    Torch naming: perceiver.latents, perceiver.layers.{i}.0 (attention:
    norm_media/norm_latents/to_q/to_kv/to_out), perceiver.layers.{i}.1
    (FeedForward Sequential: 0=LayerNorm, 1=Linear, 3=Linear),
    perceiver.norm."""
    p: Dict[str, Any] = {
        "latents": t2n(sd["perceiver.latents"]),
        "norm": _lnorm(sd, "perceiver.norm"),
    }
    for i in range(cfg.depth):
        ap = f"perceiver.layers.{i}.0"
        p[f"attn_{i}"] = {
            "norm_media": _lnorm(sd, f"{ap}.norm_media"),
            "norm_latents": _lnorm(sd, f"{ap}.norm_latents"),
            "to_q": {"kernel": lin_w(sd[f"{ap}.to_q.weight"])},
            "to_kv": {"kernel": lin_w(sd[f"{ap}.to_kv.weight"])},
            "to_out": {"kernel": lin_w(sd[f"{ap}.to_out.weight"])},
        }
        fp = f"perceiver.layers.{i}.1"
        if f"{fp}.0.weight" in sd:  # ff_mult > 0
            p[f"ff_{i}_norm"] = _lnorm(sd, f"{fp}.0")
            p[f"ff_{i}_fc"] = {"kernel": lin_w(sd[f"{fp}.1.weight"])}
            p[f"ff_{i}_out"] = {"kernel": lin_w(sd[f"{fp}.3.weight"])}
    return {"params": p}


# SigLIP's converter lives next to its model (models/vlm/siglip.py) but the
# tower registry dereferences every converter off this module — keep the
# re-export or build_vision_tower('...siglip...') dies with AttributeError
from ..models.vlm.siglip import convert_hf_siglip_vision  # noqa: E402,F401
