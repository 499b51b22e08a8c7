from .unet import (SDXLUNetConfig, UNetModel, timestep_embedding,
                   XL_BASE_CONFIG, XL_REFINE_CONFIG)
from .control import GLVControl, ControlledUNet, ZeroSFT, ZeroCrossAttn
