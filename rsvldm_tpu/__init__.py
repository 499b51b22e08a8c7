"""rsvldm_tpu — TPU-native remote-sensing vision-language diffusion SR framework.

A from-scratch JAX/XLA/Pallas rebuild of the two-stage remote-sensing
super-resolution pipeline published as
`Bluear7878/Remote-Sensing-Vision-Language-Diffusion-Model`:

  Stage 1  — guidance-free SR3 DDPM (pixel space, conditional on bicubic LR)
  Stage 2a — LLaVA-NeXT (Llama-3-8B) captioning of the Stage-1 output
  Stage 2b — SDXL UNet + ControlNet restoration-EDM refinement guided by the
             caption, with a first-block dynamic cache, tiled VAE and wavelet
             color fix.

Everything on the compute path is pure JAX (jit/pjit + lax.scan + Pallas
kernels), laid out NHWC for the TPU MXU, bf16 by default, and sharded over a
`jax.sharding.Mesh` for multi-chip batch/tile parallelism.
"""

__version__ = "0.1.0"
