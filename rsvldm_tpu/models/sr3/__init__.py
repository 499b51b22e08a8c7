from .unet import SR3UNet, SR3UNetConfig
from .diffusion import (SR3Diffusion, sr3_sample, sr3_sample_ddim,
                        sr3_loss)
