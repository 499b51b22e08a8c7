from .vision import (CLIPVisionConfig, CLIPVisionTower,
                     CLIP_VIT_L_336_CONFIG, s2_multiscale_features)
from .projector import MLPProjector, PoolerProjector, build_projector
from .llama import (LlamaConfig, LlamaModel, LLAMA3_8B_CONFIG, KVCache,
                    MIXTRAL_8X7B_CONFIG, QWEN2_MOE_A2_7B_CONFIG, MoEFFN)
from .mpt import MPTConfig, MPTModel, MPTKVCache, MPT_7B_CONFIG
from .resampler import build_resampler, RESAMPLERS
from .speculative import make_round_fn, speculative_generate
from . import anyres
