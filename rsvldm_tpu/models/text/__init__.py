from .clip import CLIPTextConfig, CLIPTextTransformer, CLIP_L_CONFIG, OPENCLIP_BIGG_CONFIG
from .conditioner import SDXLConditioner, concat_timestep_embedding
from .t5 import T5Config, T5Encoder, T5_V1_1_XXL_CONFIG
from .embedders import (ClassEmbedder, SpatialRescaler, LowScaleEncoder,
                        ImageEmbedder, gaussian_encode)
