"""Diffusion training losses + sigma samplers for the SDXL stage.

Parity target: /root/reference sgm/modules/diffusionmodules/loss.py
(StandardDiffusionLoss:11-69: sigma ~ sampler, noised input, denoiser
forward, w(sigma)*MSE), sigma_sampling.py (EDMSampling lognormal :
DiscreteSampling uniform index) and denoiser_weighting.py (EpsWeighting
w = sigma^-2 for eps-param, UnitWeighting).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..diffusion.schedules import legacy_ddpm_sigmas


def edm_sigma_sampling(rng, n: int, p_mean: float = -1.2, p_std: float = 1.2):
    """EDMSampling: lognormal sigma (sigma_sampling.py:9-17)."""
    return jnp.exp(p_mean + p_std * jax.random.normal(rng, (n,)))


def discrete_sigma_sampling(rng, n: int, num_idx: int = 1000,
                            sigmas: jnp.ndarray | None = None):
    """DiscreteSampling: uniform table index (sigma_sampling.py:20-39)."""
    if sigmas is None:
        sigmas = legacy_ddpm_sigmas(num_idx, do_append_zero=False, flip=True)
    idx = jax.random.randint(rng, (n,), 0, num_idx)
    return sigmas[idx]


def eps_weighting(sigma):
    """EpsWeighting: w = sigma^-2 (denoiser_weighting.py)."""
    return sigma ** -2.0


def unit_weighting(sigma):
    return jnp.ones_like(sigma)


@dataclasses.dataclass(frozen=True)
class StandardDiffusionLossConfig:
    sigma_sampler: str = "discrete"     # "discrete" | "edm"
    weighting: str = "eps"              # "eps" | "unit"
    loss_type: str = "l2"


def standard_diffusion_loss(denoise_fn: Callable, x0: jnp.ndarray,
                            rng: jax.Array,
                            cfg: StandardDiffusionLossConfig =
                            StandardDiffusionLossConfig()):
    """loss = mean_b [ w(sigma) * mean_pix (D(x0 + sigma*eps, sigma) - x0)^2 ]
    (loss.py:39-56). denoise_fn(x_noised, sigma[N]) -> denoised (the full
    preconditioned denoiser, conditioning closed over)."""
    n = x0.shape[0]
    rng_s, rng_n = jax.random.split(rng)
    if cfg.sigma_sampler == "edm":
        sigma = edm_sigma_sampling(rng_s, n)
    else:
        sigma = discrete_sigma_sampling(rng_s, n)
    noise = jax.random.normal(rng_n, x0.shape, x0.dtype)
    s4 = sigma.reshape(-1, 1, 1, 1)
    noised = x0 + s4 * noise
    pred = denoise_fn(noised, sigma)
    w = eps_weighting(s4) if cfg.weighting == "eps" else unit_weighting(s4)
    if cfg.loss_type == "l2":
        per = jnp.mean(w * (pred - x0) ** 2, axis=(1, 2, 3))
    else:
        per = jnp.mean(w * jnp.abs(pred - x0), axis=(1, 2, 3))
    return jnp.mean(per)
