from .vision import CLIPVisionConfig, CLIPVisionTower, CLIP_VIT_L_336_CONFIG
from .projector import MLPProjector
from .llama import LlamaConfig, LlamaModel, LLAMA3_8B_CONFIG, KVCache
from . import anyres
