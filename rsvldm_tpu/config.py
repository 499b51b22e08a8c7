"""Unified typed configuration for the whole pipeline.

Replaces the reference's three heterogeneous config systems (SURVEY §5):
JSON-with-comments + NoneDict (utils/logger.py:21-111), the OmegaConf
target-tree DI (sgm/util.py:168-185) and the CLI dataclasses
(infer.py:21-77). One dataclass tree, explicit defaults matching the shipped
configs, CLI overrides via argparse in the entry scripts.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path


@dataclasses.dataclass
class Stage1Config:
    """SR3 DDPM (configs/sr_sr3.json:38-92)."""
    steps: int = 500               # val schedule n_timestep
    schedule: str = "linear"
    linear_start: float = 1e-6
    linear_end: float = 1e-2
    image_size: int = 224
    inner_channel: int = 64
    channel_mults: tuple = (1, 2, 4, 8, 8)
    attn_res: tuple = (28,)
    res_blocks: int = 1
    # "ddpm" = the reference's 500-step ancestral loop; "ddim" runs the
    # few-step DDIM sampler on the same schedule (~steps/ddim_steps speedup)
    sampler: str = "ddpm"
    ddim_steps: int = 50
    ddim_eta: float = 0.0


# prompts/prompt_config.yaml img_prompt, verbatim (YAML folded scalar: the
# source's line breaks fold to spaces and a single trailing newline remains;
# the hyphen in "aerial‐image" is U+2010 exactly as in the reference file)
REFERENCE_IMG_PROMPT = (
    "{DEFAULT_IMAGE_TOKEN} As an expert aerial‐image analyst, describe "
    "every visible detail: terrain and land use, vegetation patterns, water "
    "bodies, roads and buildings, textures, colors, shadows, spatial "
    "relationships, and any human activity. Be precise yet concise.\n")


def load_prompt_yaml(path) -> str:
    """Read img_prompt from a prompt_config.yaml (infer.py:28,154). Uses
    pyyaml when available; falls back to a minimal folded-scalar parser so
    the pipeline has no hard yaml dependency."""
    text = Path(path).read_text()
    try:
        import yaml
        return yaml.safe_load(text)["img_prompt"]
    except ImportError:
        lines = text.splitlines()
        out, folding, seen = [], False, False
        for ln in lines:
            if ln.startswith("img_prompt:"):
                seen = True
                rest = ln.split(":", 1)[1].strip()
                if rest == ">":
                    folding = True
                else:
                    return rest
            elif folding:
                if ln.startswith((" ", "\t")):
                    out.append(ln.strip())
                elif ln.strip():
                    break
        if not seen:  # match the pyyaml path's KeyError, never silently ""
            raise KeyError("img_prompt")
        return " ".join(out) + "\n"


@dataclasses.dataclass
class LlavaConfig:
    """Stage-2a captioning (infer.py:145-166, prompts/prompt_config.yaml)."""
    max_new_tokens: int = 256
    temperature: float = 0.2
    do_sample: bool = True
    img_prompt: str = REFERENCE_IMG_PROMPT
    prompt_yaml: str = ""          # optional external prompt file override
    # Weight-only quantized decoder (TPU-native bitsandbytes 8/4-bit
    # equivalent, llava/model/builder.py:33-37): 8B fits one 16GB chip,
    # int8 ~2x decode, int4 ~2x again (group-128 RTN)
    quant: str = "int8"      # "int8" | "int4" | "" (bf16; needs TP for 8B)
    # Speculative decoding: path to a Llama-family draft checkpoint
    # (safetensors + config.json; same hidden dim/tokenizer as the target).
    # Empty = auto-detect <ckpt_dir>/llava_draft/. Output-identical to
    # vanilla decode; measured ~3x single-stream at acceptance 4
    # (models/vlm/speculative.py, bench_spec.py).
    draft_dir: str = ""
    spec_k: int = 4          # draft tokens proposed per verify round
    # Depth-pruned SELF-draft (first N target layers, zero extra HBM)
    # when no draft checkpoint exists; 0 = off. Output stays exact for
    # any draft — N only moves the acceptance rate (speculative.py).
    self_draft_layers: int = 0
    # LoRA adapter archive from train_vlm.py (save_lora_npz): folded into
    # fp kernels, or attached as the runtime QLoRA branch on a quantized
    # decoder. Empty = none.
    lora_npz: str = ""
    # Projector archive from train_vlm.py --tune projector (pretrain
    # artifact): replaces the checkpoint's mm_projector. Empty = none.
    projector_npz: str = ""

    def __post_init__(self):
        if self.prompt_yaml:
            self.img_prompt = load_prompt_yaml(self.prompt_yaml)


@dataclasses.dataclass
class RefinementConfig:
    """Stage-2b SDXL+ControlNet (infer.py:44-60 defaults)."""
    min_size: int = 1024
    edm_steps: int = 50
    s_churn: float = 5.0
    s_noise: float = 1.003
    s_cfg: float = 7.5
    s_stage1: float = -1.0         # restoration_scale
    s_stage2: float = 1.0          # control_scale
    img_threshold: float = 0.3
    num_samples: int = 1
    color_fix_type: str = "Wavelet"
    linear_cfg: bool = True
    linear_s_stage2: bool = False
    spt_linear_cfg: float = 4.0
    spt_linear_s_stage2: float = 0.0
    use_tile_vae: bool = False
    encoder_tile_size: int = 512
    decoder_tile_size: int = 64
    # pixel-size bucket for the sampling jit: inputs are edge-padded up to the
    # next multiple so a folder of mixed /64 sizes reuses ONE compiled scan
    # (the reference recompiles nothing because torch is eager; under jit an
    # exact-shape key would recompile the 50-step program per size). 0 = off.
    size_bucket: int = 512
    a_prompt: str = (
        "Cinematic, High Contrast, highly detailed aerial photo taken using a "
        "high-resolution drone or satellite, hyper detailed photo-realistic "
        "maximum detail, 32k, Color Grading, ultra HD, extreme meticulous "
        "detailing of terrain textures and structures, hyper sharpness, no "
        "deformations.")
    n_prompt: str = (
        "painting, oil painting, illustration, drawing, art, sketch, oil "
        "painting, cartoon, CG Style, 3D render, unreal engine, blurring, "
        "dirty, messy, worst quality, low quality, frames, watermark, "
        "signature, jpeg artifacts, deformed, lowres, over-smooth, cloud "
        "cover, heavy fog, motion blur, lens flare")


@dataclasses.dataclass
class PipelineConfig:
    input_img: str = ""
    image_dir: str = ""
    output_dir: str = "./results"
    ckpt_dir: str = "./CKPT_PTH"
    upscale: int = 8
    seed: int = 42
    no_llava: bool = False
    stage1_only: bool = False
    # storage dtype for model params on device; bf16 keeps the whole Stage-2
    # stack (~4B params) inside one v5e's 16GB HBM (the reference's fp16
    # autocast policy equivalent; GroupNorm/softmax stats stay fp32)
    params_dtype: str = "bf16"
    stage1: Stage1Config = dataclasses.field(default_factory=Stage1Config)
    llava: LlavaConfig = dataclasses.field(default_factory=LlavaConfig)
    refine: RefinementConfig = dataclasses.field(default_factory=RefinementConfig)

    def __post_init__(self):
        self.output_dir = Path(self.output_dir)
