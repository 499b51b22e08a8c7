"""SR3 Gaussian diffusion: ancestral sampling as a single jitted lax.scan.

Parity target: /root/reference models/sr3_model/sr3_modules/diffusion.py —
continuous-noise-level training loss (p_losses:222-247), conditional ancestral
reverse loop (p_sample_loop:177-201, p_mean_variance:152-168).

TPU-first: the 500-step reverse loop is ONE compiled lax.scan — no per-step
host sync, noise drawn on-device with jax.random.fold_in, all schedule tables
gathered by traced index. The conditioning (bicubic-upsampled LR) is
channel-concatenated inside the scan body.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ...diffusion.schedules import DDPMBuffers, ddpm_buffers, make_beta_schedule


@dataclasses.dataclass(frozen=True)
class SR3Diffusion:
    """Schedule container bound to a denoiser apply-fn.

    apply_fn(params, x_in[N,H,W,6], noise_level[N,1]) -> eps[N,H,W,3]
    """
    buffers: DDPMBuffers
    clip_denoised: bool = True

    @classmethod
    def from_schedule(cls, schedule: str = "linear", n_timestep: int = 500,
                      linear_start: float = 1e-6, linear_end: float = 1e-2,
                      **kw) -> "SR3Diffusion":
        betas = make_beta_schedule(schedule, n_timestep, linear_start, linear_end)
        return cls(buffers=ddpm_buffers(betas), **kw)


def _p_step(diff: SR3Diffusion, apply_fn, params, cond, x, t, rng,
            noise: jnp.ndarray | None = None):
    """One ancestral step x_t -> x_{t-1} (diffusion.py:152-175)."""
    buf = diff.buffers
    b = x.shape[0]
    noise_level = jnp.full((b, 1), buf.sqrt_alphas_cumprod_prev[t + 1])
    eps = apply_fn(params, jnp.concatenate([cond, x], axis=-1), noise_level)
    x_recon = buf.sqrt_recip_alphas_cumprod[t] * x - \
        buf.sqrt_recipm1_alphas_cumprod[t] * eps
    if diff.clip_denoised:
        x_recon = jnp.clip(x_recon, -1.0, 1.0)
    mean = buf.posterior_mean_coef1[t] * x_recon + buf.posterior_mean_coef2[t] * x
    log_var = buf.posterior_log_variance_clipped[t]
    if noise is None:
        noise = jax.random.normal(rng, x.shape, x.dtype)
        noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))
    return mean + noise * jnp.exp(0.5 * log_var)


def sr3_sample(diff: SR3Diffusion, apply_fn: Callable, params: Any,
               cond: jnp.ndarray, rng: jax.Array,
               return_intermediates: bool = False,
               noise_override: jnp.ndarray | None = None):
    """Full reverse diffusion conditioned on `cond` ([N,H,W,3] in [-1,1]).

    Equivalent of GaussianDiffusion.super_resolution / p_sample_loop
    (diffusion.py:177-211) as a lax.scan from t=T-1 down to 0.

    noise_override [T+1, *cond.shape]: injected unit normals — [0] is the
    initial x_T, [1+i] the posterior noise of loop step i (E2E parity tests
    drive the torch and jax loops with identical noise).
    """
    T = diff.buffers.num_timesteps
    rng, init_rng = jax.random.split(rng)
    if noise_override is not None:
        x0 = noise_override[0].astype(cond.dtype)
    else:
        x0 = jax.random.normal(init_rng, cond.shape, cond.dtype)

    def body(carry, ti):
        x = carry
        i, t = ti
        if noise_override is not None:
            noise = noise_override[1 + i].astype(x.dtype)
            noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))
            x_next = _p_step(diff, apply_fn, params, cond, x, t, None,
                             noise=noise)
        else:
            step_rng = jax.random.fold_in(rng, t)
            x_next = _p_step(diff, apply_fn, params, cond, x, t, step_rng)
        out = x_next if return_intermediates else 0.0
        return x_next, out

    ts = jnp.arange(T - 1, -1, -1)
    x_final, inter = jax.lax.scan(body, x0, (jnp.arange(T), ts))
    if return_intermediates:
        return x_final, inter
    return x_final


def sr3_sample_ddim(diff: SR3Diffusion, apply_fn: Callable, params: Any,
                    cond: jnp.ndarray, rng: jax.Array, num_steps: int = 50,
                    eta: float = 0.0):
    """DDIM sampling (Song et al., arXiv:2010.02502) on the SR3 schedule —
    a few-step alternative to the 500-step ancestral loop (the reference
    ships only ancestral; 25-50 DDIM steps give a ~10-20x Stage-1 speedup).

    Same UNet conditioning as ancestral (continuous noise level
    sqrt(abar_t)). With eta=1 and the full step count this reduces exactly
    to the ancestral sampler (sigma^2 equals the DDPM posterior variance
    and the mean identity holds) — tested; eta=0 is deterministic."""
    buf = diff.buffers
    T = buf.num_timesteps
    num_steps = min(num_steps, T)
    # equally-spaced subset, descending; conceptual "-1" maps to abar=1.
    # Deduplicate on host: as num_steps -> T the rounding repeats timesteps,
    # which would both waste steps and reuse fold_in noise keys.
    import numpy as np
    ts_np = np.unique(np.round(np.linspace(T - 1, 0, num_steps)))[::-1]
    ts = jnp.asarray(ts_np, jnp.int32)
    prev_ts = jnp.concatenate([ts[1:], jnp.asarray([-1], jnp.int32)])
    # abar from the buffers: sqrt_recip_alphas_cumprod = 1/sqrt(abar)
    abar = 1.0 / (buf.sqrt_recip_alphas_cumprod ** 2)
    abar_with_one = jnp.concatenate([abar, jnp.ones((1,), abar.dtype)])

    rng, init_rng = jax.random.split(rng)
    x0 = jax.random.normal(init_rng, cond.shape, cond.dtype)

    def body(x, tt):
        t, t_prev = tt
        b = x.shape[0]
        noise_level = jnp.full((b, 1), buf.sqrt_alphas_cumprod_prev[t + 1])
        eps = apply_fn(params, jnp.concatenate([cond, x], axis=-1),
                       noise_level)
        x_recon = buf.sqrt_recip_alphas_cumprod[t] * x - \
            buf.sqrt_recipm1_alphas_cumprod[t] * eps
        if diff.clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        # recompute eps from the (possibly clipped) x0 so the update stays
        # consistent with the clip, mirroring the ancestral posterior path
        eps_eff = (x - jnp.sqrt(abar[t]) * x_recon) / \
            jnp.sqrt(jnp.maximum(1.0 - abar[t], 1e-20))
        a_prev = abar_with_one[t_prev]  # t_prev=-1 -> abar=1 (final step)
        sigma = eta * jnp.sqrt(
            jnp.maximum((1.0 - a_prev) / jnp.maximum(1.0 - abar[t], 1e-20)
                        * (1.0 - abar[t] / a_prev), 0.0))
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma ** 2, 0.0)) \
            * eps_eff
        noise = jax.random.normal(jax.random.fold_in(rng, t), x.shape,
                                  x.dtype)
        noise = jnp.where(t_prev >= 0, noise, jnp.zeros_like(noise))
        x_next = jnp.sqrt(a_prev) * x_recon + dir_xt + sigma * noise
        return x_next, 0.0

    x_final, _ = jax.lax.scan(body, x0, (ts, prev_ts))
    return x_final


def sr3_loss(diff: SR3Diffusion, apply_fn: Callable, params: Any,
             hr: jnp.ndarray, sr_bicubic: jnp.ndarray, rng: jax.Array,
             loss_type: str = "l1"):
    """Continuous-noise-level training loss (p_losses, diffusion.py:222-247).

    t ~ U{1..T}; gamma ~ U[sqrt_acp_prev[t-1], sqrt_acp_prev[t]];
    x_noisy = gamma*HR + sqrt(1-gamma^2)*eps; loss = |eps - eps_hat| (sum).
    """
    buf = diff.buffers
    b = hr.shape[0]
    rng_t, rng_g, rng_n = jax.random.split(rng, 3)
    t = jax.random.randint(rng_t, (b,), 1, buf.num_timesteps + 1)
    lo = buf.sqrt_alphas_cumprod_prev[t - 1]
    hi = buf.sqrt_alphas_cumprod_prev[t]
    u = jax.random.uniform(rng_g, (b,))
    gamma = lo + u * (hi - lo)
    noise = jax.random.normal(rng_n, hr.shape, hr.dtype)
    g = gamma.reshape(b, 1, 1, 1)
    x_noisy = g * hr + jnp.sqrt(1.0 - g**2) * noise
    eps_hat = apply_fn(params, jnp.concatenate([sr_bicubic, x_noisy], axis=-1),
                       gamma.reshape(b, 1))
    if loss_type == "l1":
        loss = jnp.abs(noise - eps_hat).sum()
    else:
        loss = ((noise - eps_hat) ** 2).sum()
    # reference divides the summed loss by b*c*h*w (model.py:56)
    return loss / float(hr.size)
