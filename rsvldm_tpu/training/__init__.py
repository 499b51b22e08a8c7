from .ema import EmaState, ema_init, ema_update
from .losses import (StandardDiffusionLossConfig, standard_diffusion_loss,
                     edm_sigma_sampling, discrete_sigma_sampling)
from .lr_schedule import lambda_warmup_cosine, lambda_warmup_cosine2
from .sr3_trainer import SR3Trainer, SR3TrainConfig
from .vlm_trainer import (LoraConfig, VLMTrainer, init_lora, apply_lora,
                          export_merged, vlm_loss, dpo_loss)
from .vlm_data import (LazyConversationDataset, collate, iter_batches,
                       preprocess, get_length_grouped_indices,
                       get_modality_length_grouped_indices)
