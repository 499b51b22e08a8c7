from .model import (VAEConfig, Encoder, Decoder, AutoencoderKL,
                    DiagonalGaussian, SDXL_VAE_CONFIG)
