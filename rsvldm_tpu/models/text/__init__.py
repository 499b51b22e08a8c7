from .clip import CLIPTextConfig, CLIPTextTransformer, CLIP_L_CONFIG, OPENCLIP_BIGG_CONFIG
from .conditioner import SDXLConditioner, concat_timestep_embedding
