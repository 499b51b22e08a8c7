"""Noise schedules, diffusion buffer tables and sigma discretizations.

Pure functions (NumPy for table construction — these run once at setup time —
and JAX arrays for anything consumed inside jit). Semantics match the
reference pipeline:

  * beta schedules      — /root/reference models/sr3_model/sr3_modules/diffusion.py:12-50
  * SR3 buffer family   — diffusion.py:93-140
  * LegacyDDPM sigmas   — sgm/modules/diffusionmodules/discretizer.py:42-69
  * EDM (Karras) sigmas — discretizer.py:28-39
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


def _warmup_beta(linear_start: float, linear_end: float, n_timestep: int,
                 warmup_frac: float) -> np.ndarray:
    betas = linear_end * np.ones(n_timestep, dtype=np.float64)
    warmup_time = int(n_timestep * warmup_frac)
    betas[:warmup_time] = np.linspace(linear_start, linear_end, warmup_time,
                                      dtype=np.float64)
    return betas


def make_beta_schedule(schedule: str, n_timestep: int, linear_start: float = 1e-4,
                       linear_end: float = 2e-2, cosine_s: float = 8e-3) -> np.ndarray:
    """Beta schedule table in float64 (matches reference formulas exactly)."""
    if schedule == "quad":
        betas = np.linspace(linear_start ** 0.5, linear_end ** 0.5, n_timestep,
                            dtype=np.float64) ** 2
    elif schedule == "linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "warmup10":
        betas = _warmup_beta(linear_start, linear_end, n_timestep, 0.1)
    elif schedule == "warmup50":
        betas = _warmup_beta(linear_start, linear_end, n_timestep, 0.5)
    elif schedule == "const":
        betas = linear_end * np.ones(n_timestep, dtype=np.float64)
    elif schedule == "jsd":
        betas = 1.0 / np.linspace(n_timestep, 1, n_timestep, dtype=np.float64)
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * math.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, None, 0.999)
    else:
        raise NotImplementedError(schedule)
    return betas


@dataclasses.dataclass(frozen=True)
class DDPMBuffers:
    """All alpha-cumprod-family tables needed by the SR3 ancestral sampler.

    Each field is a jnp.float32 array of length T (or T+1 where noted).
    """
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod_prev: jnp.ndarray  # length T+1: sqrt(append(1, acp))
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def ddpm_buffers(betas: np.ndarray) -> DDPMBuffers:
    """Build the posterior/forward tables from a beta schedule (float64 math)."""
    betas = np.asarray(betas, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DDPMBuffers(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod_prev=f32(np.sqrt(np.append(1.0, alphas_cumprod))),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
        posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=f32((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
    )


def equally_spaced_steps(num_substeps: int, max_step: int) -> np.ndarray:
    """Roughly-equally-spaced timestep subset, ascending (discretizer.py:11-14)."""
    return np.linspace(max_step - 1, 0, num_substeps, endpoint=False).astype(int)[::-1]


def sd_linear_betas(n_timestep: int, linear_start: float = 0.00085,
                    linear_end: float = 0.0120) -> np.ndarray:
    """Stable-Diffusion 'linear' schedule: linspace in sqrt-space, squared
    (sgm/modules/diffusionmodules/util.py:19-32 — NOT the SR3 true-linear)."""
    return np.linspace(linear_start ** 0.5, linear_end ** 0.5, n_timestep,
                       dtype=np.float64) ** 2


def legacy_ddpm_sigmas(n: int, linear_start: float = 0.00085, linear_end: float = 0.0120,
                       num_timesteps: int = 1000, do_append_zero: bool = True,
                       flip: bool = False) -> jnp.ndarray:
    """SDXL LegacyDDPM sigma table, descending with appended 0 by default.

    sigma_t = sqrt((1 - acp_t) / acp_t) over the SD-linear beta schedule,
    subset to n roughly-equally-spaced steps (discretizer.py:42-69). The full
    table's sigma_max is 14.6146 — the constant baked into LinearCFG and the
    restore-CFG drift term.
    """
    betas = sd_linear_betas(num_timesteps, linear_start, linear_end)
    alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
    if n < num_timesteps:
        alphas_cumprod = alphas_cumprod[equally_spaced_steps(n, num_timesteps)]
    elif n > num_timesteps:
        raise ValueError(f"n={n} > num_timesteps={num_timesteps}")
    sigmas = np.sqrt((1 - alphas_cumprod) / alphas_cumprod).astype(np.float32)
    sigmas = sigmas[::-1]  # descending
    if do_append_zero:
        sigmas = np.append(sigmas, 0.0).astype(np.float32)
    if flip:
        sigmas = sigmas[::-1]
    return jnp.asarray(sigmas)


def karras_sigmas(n: int, sigma_min: float = 0.02, sigma_max: float = 80.0,
                  rho: float = 7.0, do_append_zero: bool = True) -> jnp.ndarray:
    """EDM (Karras) sigma ramp, descending (discretizer.py:28-39)."""
    ramp = np.linspace(0, 1, n, dtype=np.float64)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    if do_append_zero:
        sigmas = np.append(sigmas, 0.0)
    return jnp.asarray(sigmas, dtype=jnp.float32)


def sigma_to_idx(sigma: jnp.ndarray, sigma_table_asc: jnp.ndarray) -> jnp.ndarray:
    """Quantize sigma to the nearest index of an ascending full sigma table.

    Equivalent of DiscreteDenoiser.sigma_to_idx (sgm denoiser.py:44-48):
    argmin |sigma - table|.
    """
    dists = jnp.abs(sigma[..., None] - sigma_table_asc[None, ...])
    return jnp.argmin(dists, axis=-1)
