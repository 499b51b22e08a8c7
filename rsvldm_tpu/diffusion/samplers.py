"""Diffusion samplers as jitted lax.scan loops.

Parity target: /root/reference sgm/modules/diffusionmodules/sampling.py —
BaseDiffusionSampler init scaling (:44-55), EDMSampler (:85-140),
EulerAncestralSampler, DPMPP2MSampler, and the production
RestoreEDMSampler (:527-694) whose denoise() integrates the DFBCache
first-block cache (models/modules/DFBCache.py:98-134) and whose
sampler_step adds s_churn noise, linear control scale and restore-CFG drift
correction.

TPU redesign of the dynamic cache: the reference decides cache hits in
Python between two partial UNet calls. Here the WHOLE sampling loop is one
compiled lax.scan; every step always runs ControlNet + UNet input blocks
(the cache key), then a lax.cond either reuses the carried post-CFG
denoised latent or runs middle+decode+CFG. The relative-L1 similarity test
and the adaptive threshold (threshold <- measured diff on miss, *= dec_img
each step, SR_model.py:274-291) live on-device in the scan carry — zero
host sync inside the 50-step loop.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from .guidance import apply_cfg, linear_cfg_scale
from .schedules import legacy_ddpm_sigmas


def to_d(x, sigma, denoised):
    """EDM ODE direction (sampling_utils.to_d)."""
    return (x - denoised) / sigma


def init_noise_scaling(noise, sigma0):
    """x *= sqrt(1 + sigma_0^2) (sampling.py:50)."""
    return noise * jnp.sqrt(1.0 + sigma0 ** 2)


@dataclasses.dataclass(frozen=True)
class RestoreEDMConfig:
    """Knobs of just_sampling/RestoreEDMSampler (SR_model.py:200-252,
    infer.py:44-60 defaults)."""
    num_steps: int = 50
    cfg_scale: float = 7.5          # infer.py s_cfg
    cfg_scale_start: float = 4.0    # infer.py spt_linear_cfg (scale at sigma_max)
    use_linear_cfg: bool = True
    restore_cfg: float = -1.0       # infer.py s_stage1 (-1 disables)
    restore_cfg_s_tmin: float = 0.05
    s_churn: float = 5.0
    s_tmin: float = 0.0
    s_tmax: float = float("inf")
    s_noise: float = 1.003
    sigma_max: float = 14.6146
    control_scale: float = 1.0      # infer.py s_stage2
    use_linear_control_scale: bool = False
    control_scale_start: float = 0.0
    img_threshold: float = 0.3      # first-block cache threshold; <=0 disables
    dec_img: float = 1.0

    def cfg_at(self, sigma):
        """Per-step CFG scale. With linear CFG the scale ramps from
        cfg_scale_start at sigma_max to cfg_scale at sigma=0
        (just_sampling's guider mutation, SR_model.py:243-248)."""
        if self.use_linear_cfg:
            return linear_cfg_scale(sigma, self.cfg_scale_start, self.cfg_scale)
        return jnp.asarray(self.cfg_scale)

    def control_scale_at(self, sigma):
        """Linear control-scale schedule (sampling.py:608-609)."""
        if not self.use_linear_control_scale:
            return jnp.asarray(self.control_scale)
        return (sigma / self.sigma_max) * (self.control_scale_start
                                           - self.control_scale) + self.control_scale


def _rel_l1(cur, prev):
    """are_two_tensors_similar metric: mean|Δ| / (mean|prev| + 1e-6)
    (DFBCache.py:98-112). fp32 regardless of compute dtype."""
    cur = cur.astype(jnp.float32)
    prev = prev.astype(jnp.float32)
    return jnp.mean(jnp.abs(prev - cur)) / (jnp.mean(jnp.abs(prev)) + 1e-6)


def restore_edm_sample(denoiser, cond: Dict, uc: Dict, noise: jnp.ndarray,
                       x_center_init: jnp.ndarray, cfg: RestoreEDMConfig,
                       rng: jax.Array, return_aux: bool = False,
                       churn_noise: jnp.ndarray | None = None):
    """Full RestoreEDM loop with first-block cache, as one lax.scan.

    denoiser: ControlDenoiser (models/sdxl/denoiser.py). cond/uc: dicts with
    keys crossattn/vector/control of batch N. noise: [N,h,w,4] unit normal.
    x_center_init: z_stage1 (the re-encoded stage-1 latent).
    Returns the final latent; with return_aux, (latent, aux) where aux has
    the on-device cache-hit count and per-step thresholds (observability for
    the dynamic acceleration, cf. VERBOSE_SIMILARITY in DFBCache.py).
    """
    n = noise.shape[0]
    sigmas = legacy_ddpm_sigmas(cfg.num_steps)  # descending, trailing 0
    num_sigmas = sigmas.shape[0]
    x = init_noise_scaling(noise, sigmas[0])

    cond2 = {k: jnp.concatenate([uc[k], cond[k]], axis=0) for k in cond}
    gamma_val = min(cfg.s_churn / (num_sigmas - 1), 2 ** 0.5 - 1) \
        if cfg.s_churn > 0 else 0.0
    use_cache = cfg.img_threshold > 0

    def denoise(x, sigma_scalar, sigma_plain, prev_h, cached, threshold,
                step_idx):
        sigma2 = jnp.full((2 * n,), sigma_scalar)
        part = denoiser.first(jnp.concatenate([x, x], axis=0), sigma2, cond2)
        # linear control scale uses the PRE-churn sigma (sampler_step
        # computes it from `sigma` before denoising at sigma_hat,
        # sampling.py:608-609)
        cs = cfg.control_scale_at(sigma_plain)

        def run_rest(part):
            d2 = denoiser.rest(part, cond2, cs)
            return apply_cfg(d2, cfg.cfg_at(sigma_scalar))

        if not use_cache:
            return run_rest(part), prev_h, cached, threshold, jnp.bool_(False)

        diff = _rel_l1(part.h, prev_h)
        can_use = jnp.logical_and(step_idx > 0, diff < threshold)

        def hit(_):
            return cached, prev_h, threshold

        def miss(_):
            den = run_rest(part)
            # step 0 has no prev buffer: get_can_use_cache_multi returns the
            # INPUT threshold, not a measured diff (DFBCache.py:125-128) —
            # the adaptive threshold only starts tracking from step 1
            return den, part.h, jnp.where(step_idx > 0, diff, threshold)

        denoised, new_prev, new_th = jax.lax.cond(can_use, hit, miss, None)
        return denoised, new_prev, denoised, new_th, can_use

    def body(carry, i):
        x, x_center, prev_h, cached, threshold = carry
        sigma = sigmas[i]
        next_sigma = sigmas[i + 1]
        gamma = jnp.where((sigma >= cfg.s_tmin) & (sigma <= cfg.s_tmax),
                          gamma_val, 0.0)
        sigma_hat = sigma * (gamma + 1.0)
        if gamma_val > 0:
            # churn_noise [steps, *x.shape]: injected unit normals (parity
            # tests drive torch + jax loops with identical noise; the
            # reference's sampler_step eps_noise hook, sampling.py:598-606)
            if churn_noise is not None:
                eps = churn_noise[i].astype(x.dtype) * cfg.s_noise
            else:
                eps = jax.random.normal(jax.random.fold_in(rng, i), x.shape,
                                        x.dtype) * cfg.s_noise
            x = x + eps * jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))

        denoised, prev_h, cached, new_th, was_hit = denoise(
            x, sigma_hat, sigma, prev_h, cached, threshold, i)

        if cfg.restore_cfg > 0:
            # drift toward x_center at high sigma (sampling.py:614-616)
            w = (sigma / cfg.sigma_max) ** cfg.restore_cfg
            corrected = denoised - (denoised - x_center) * w
            denoised = jnp.where(next_sigma > cfg.restore_cfg_s_tmin,
                                 corrected, denoised)

        d = to_d(x, sigma_hat, denoised)
        x = x + d * (next_sigma - sigma_hat)
        # caller semantics: x_center <- z after each step; threshold *= dec_img
        return (x, x, prev_h, cached, new_th * cfg.dec_img), (new_th, was_hit)

    # carry init: prev_h shaped like the last input-block feature (2N batch,
    # the denoiser's COMPUTE dtype); step 0 always misses (step_idx > 0 is
    # False) so the zeros are never used
    h_dtype = getattr(getattr(denoiser, "unet", None), "cfg", None)
    h_dtype = h_dtype.dtype if h_dtype is not None else jnp.float32
    prev_h0 = jnp.zeros(denoiser.first_block_shape(2 * n, *noise.shape[1:3]),
                        h_dtype)
    carry = (x, x_center_init, prev_h0, jnp.zeros_like(x),
             jnp.float32(cfg.img_threshold))
    xs = jnp.arange(0, num_sigmas - 1)
    (x_final, *_), (thresholds, hits) = jax.lax.scan(body, carry, xs)
    if return_aux:
        # hit_trace: the raw per-step cache decisions (the reference's
        # VERBOSE_SIMILARITY print, DFBCache.py:115-134) — lets callers
        # report a MEASURED hit rate for a real trajectory instead of the
        # [all-hit, all-miss] bound (round-4 review Weak #3); thresholds
        # doubles as the per-step _rel_l1 trace (on a miss past step 0 the
        # new threshold IS the measured diff)
        return x_final, dict(cache_hits=jnp.sum(hits),
                             num_steps=num_sigmas - 1,
                             thresholds=thresholds,
                             hit_trace=hits)
    return x_final
