from .unet import SDXLUNetConfig, UNetModel, timestep_embedding, XL_BASE_CONFIG
from .control import GLVControl, ControlledUNet, ZeroSFT, ZeroCrossAttn
