from .ema import EmaState, ema_init, ema_update
from .losses import (StandardDiffusionLossConfig, standard_diffusion_loss,
                     edm_sigma_sampling, discrete_sigma_sampling)
from .lr_schedule import lambda_warmup_cosine, lambda_warmup_cosine2
from .sr3_trainer import SR3Trainer, SR3TrainConfig
