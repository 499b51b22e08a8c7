"""The full sgm sampler family as jitted lax.scan loops.

Parity target: /root/reference sgm/modules/diffusionmodules/sampling.py —
EDMSampler(+Heun):85-140, AncestralSampler/EulerAncestral:143-200,
DPMPP2SAncestral:233-278, DPMPP2M:281-340, LinearMultistep:343-367,
SubstepSampler:370-418, RestoreDPMPP2MSampler:421-514 and the tiled
variants:697-827 (gaussian-weighted sliding latent tiles) — and
sampling_utils.py (to_d, get_ancestral_step, linear_multistep_coeff).

All samplers consume a closure `denoise_fn(x, sigma_scalar) -> denoised`
(CFG already applied inside) so they compose with any conditioning.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .brownian import BrownianTreeNoiseSampler
from .schedules import legacy_ddpm_sigmas, karras_sigmas
from .samplers import to_d, init_noise_scaling


def get_ancestral_step(sigma_from, sigma_to, eta: float = 1.0):
    """sampling_utils.get_ancestral_step."""
    sigma_up = jnp.minimum(
        sigma_to,
        eta * jnp.sqrt(sigma_to**2 * (sigma_from**2 - sigma_to**2)
                       / jnp.maximum(sigma_from**2, 1e-20)))
    sigma_down = jnp.sqrt(jnp.maximum(sigma_to**2 - sigma_up**2, 0.0))
    return sigma_down, sigma_up


def t_of(sigma):
    return -jnp.log(jnp.maximum(sigma, 1e-20))


def sigma_of(t):
    return jnp.exp(-t)


def _scan(body, x, n_steps):
    x_final, _ = jax.lax.scan(body, x, jnp.arange(n_steps))
    return x_final


def edm_sample(denoise_fn: Callable, noise: jnp.ndarray, sigmas: jnp.ndarray,
               rng: jax.Array, s_churn: float = 0.0, s_tmin: float = 0.0,
               s_tmax: float = float("inf"), s_noise: float = 1.0,
               heun: bool = False) -> jnp.ndarray:
    """EDM sampler with optional 2nd-order (Heun) correction
    (sampling.py:85-140)."""
    n = sigmas.shape[0]
    x = init_noise_scaling(noise, sigmas[0])
    gamma_val = min(s_churn / (n - 1), 2 ** 0.5 - 1) if s_churn > 0 else 0.0

    def body(x, i):
        sigma, nxt = sigmas[i], sigmas[i + 1]
        gamma = jnp.where((sigma >= s_tmin) & (sigma <= s_tmax), gamma_val, 0.0)
        sigma_hat = sigma * (gamma + 1.0)
        if gamma_val > 0:
            eps = jax.random.normal(jax.random.fold_in(rng, i), x.shape,
                                    x.dtype) * s_noise
            x = x + eps * jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
        denoised = denoise_fn(x, sigma_hat)
        d = to_d(x, sigma_hat, denoised)
        dt = nxt - sigma_hat
        x_euler = x + d * dt
        if heun:
            def corr(xe):
                d2 = to_d(xe, nxt, denoise_fn(xe, nxt))
                return x + 0.5 * (d + d2) * dt
            x_next = jax.lax.cond(nxt > 0.0, corr, lambda xe: xe, x_euler)
        else:
            x_next = x_euler
        return x_next, 0.0

    return _scan(body, x, n - 1)


def euler_ancestral_sample(denoise_fn, noise, sigmas, rng,
                           eta: float = 1.0, s_noise: float = 1.0):
    """EulerAncestralSampler (sampling.py:167-200)."""
    x = init_noise_scaling(noise, sigmas[0])

    def body(x, i):
        sigma, nxt = sigmas[i], sigmas[i + 1]
        down, up = get_ancestral_step(sigma, nxt, eta)
        denoised = denoise_fn(x, sigma)
        d = to_d(x, sigma, denoised)
        x = x + d * (down - sigma)
        eps = jax.random.normal(jax.random.fold_in(rng, i), x.shape, x.dtype)
        x = jnp.where(nxt > 0, x + eps * s_noise * up, x)
        return x, 0.0

    return _scan(body, x, sigmas.shape[0] - 1)


def dpmpp2s_ancestral_sample(denoise_fn, noise, sigmas, rng,
                             eta: float = 1.0, s_noise: float = 1.0):
    """DPMPP2SAncestralSampler (sampling.py:233-278)."""
    x = init_noise_scaling(noise, sigmas[0])

    def body(x, i):
        sigma, nxt = sigmas[i], sigmas[i + 1]
        down, up = get_ancestral_step(sigma, nxt, eta)
        denoised = denoise_fn(x, sigma)

        def euler(_):
            d = to_d(x, sigma, denoised)
            return x + d * (down - sigma)

        def dpmpp(_):
            t, t_next = t_of(sigma), t_of(down)
            r = 1 / 2
            h = t_next - t
            s = t + r * h
            x2 = sigma_of(s) / sigma_of(t) * x - jnp.expm1(-h * r) * denoised
            denoised2 = denoise_fn(x2, sigma_of(s))
            return sigma_of(t_next) / sigma_of(t) * x - jnp.expm1(-h) * denoised2

        x_new = jax.lax.cond(down > 1e-14, dpmpp, euler, None)
        eps = jax.random.normal(jax.random.fold_in(rng, i), x.shape, x.dtype)
        x_new = jnp.where(nxt > 0, x_new + eps * s_noise * up, x_new)
        return x_new, 0.0

    return _scan(body, x, sigmas.shape[0] - 1)


def dpmpp2m_sample(denoise_fn, noise, sigmas, rng=None):
    """DPMPP2MSampler (sampling.py:281-340): 2nd-order multistep."""
    x = init_noise_scaling(noise, sigmas[0])

    def body(carry, i):
        x, old_denoised = carry
        sigma, nxt = sigmas[i], sigmas[i + 1]
        denoised = denoise_fn(x, sigma)
        t, t_next = t_of(sigma), t_of(nxt)
        h = t_next - t
        x_std = sigma_of(t_next) / sigma_of(t) * x - jnp.expm1(-h) * denoised

        prev_sigma = sigmas[jnp.maximum(i - 1, 0)]
        h_last = t - t_of(prev_sigma)
        r = h_last / h
        denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
        x_adv = sigma_of(t_next) / sigma_of(t) * x - jnp.expm1(-h) * denoised_d

        use_adv = (i > 0) & (nxt > 1e-14)
        x_new = jnp.where(use_adv, x_adv, x_std)
        return (x_new, denoised), 0.0

    (x_final, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)),
                                   jnp.arange(sigmas.shape[0] - 1))
    return x_final


def linear_multistep_sample(denoise_fn, noise, sigmas, order: int = 4):
    """LinearMultistepSampler (sampling.py:343-367): Adams-Bashforth with
    coefficients integrated numerically (host-side, static sigmas)."""
    sig = np.asarray(sigmas, dtype=np.float64)
    n = len(sig) - 1

    def lms_coeff(o, i, j):
        # integral of the Lagrange basis over [sigma_i, sigma_{i+1}]
        def fn(tau):
            prod = 1.0
            for k in range(o):
                if k == j:
                    continue
                prod *= (tau - sig[i - k]) / (sig[i - j] - sig[i - k])
            return prod
        xs = np.linspace(sig[i], sig[i + 1], 257)
        return np.trapezoid([fn(t) for t in xs], xs)

    coeffs = np.zeros((n, order))
    for i in range(n):
        o = min(i + 1, order)
        for j in range(o):
            coeffs[i, j] = lms_coeff(o, i, j)
    coeffs = jnp.asarray(coeffs, jnp.float32)

    x = init_noise_scaling(noise, sigmas[0])
    d_hist = jnp.zeros((order,) + x.shape, x.dtype)

    def body(carry, i):
        x, d_hist = carry
        denoised = denoise_fn(x, sigmas[i])
        d = to_d(x, sigmas[i], denoised)
        d_hist = jnp.roll(d_hist, 1, axis=0).at[0].set(d)
        x = x + jnp.tensordot(coeffs[i], d_hist, axes=1)
        return (x, d_hist), 0.0

    (x_final, _), _ = jax.lax.scan(body, (x, d_hist), jnp.arange(n))
    return x_final


def substep_sigmas(n_sample_steps: int = 4, num_timesteps: int = 1000):
    """SubstepSampler's sigma subset (sampling.py:370-387): indices
    steps_subset[:n] + steps_subset[-1:] into the DESCENDING 1001-entry
    table (index 0 = sigma_max ~14.61, index 1000 = the appended 0), i.e.
    [14.61, sigma(t=899), sigma(t=799), sigma(t=699), 0] at the default
    n=4 — truncation keeps the HIGH-sigma end + the terminal 0."""
    full = legacy_ddpm_sigmas(num_timesteps)  # descending + appended 0
    subset = [0, 100, 200, 300, 1000]
    idx = subset[:n_sample_steps] + subset[-1:]
    return jnp.asarray([float(full[i]) for i in idx], jnp.float32)


def restore_dpmpp2m_sample(denoise_fn, noise, sigmas, rng=None,
                           eta: float = 1.0, s_noise: float = 1.0,
                           eps_override=None):
    """RestoreDPMPP2MSampler (sampling.py:421-514): STOCHASTIC DPM++(2M).

    Reference semantics (eta=1 default): the class RE-DERIVES its schedule
    as a Karras ramp over [sigmas[-2], sigmas[0]] of the prepared table;
    eta folds into the update (mult1 = sigma_next/sigma * exp(-eta*h),
    mult2 = expm1(-h - eta*h)) and fresh gaussian noise scaled by
    next_sigma * sqrt(-expm1(-2*eta*h)) * s_noise is injected on every
    non-first step with next_sigma > 0. Its restore_cfg/x_center __init__
    params are never used in sampler_step — not reproduced here.

    Noise source: a Brownian-tree path (diffusion/brownian.py), matching
    the reference's BrownianTreeNoiseSampler over [sigmas[-2], sigmas[0]]
    (sampling.py:489-498) — one fixed path W; step i's injection is the
    normalized increment (W(sigma_{i+1}) - W(sigma_i)) / sqrt(dsigma), so
    results vary smoothly with the step count. Each step reuses the
    previous step's endpoint value through the scan carry (one tree-point
    evaluation per step). Bit-parity with torchsde's generator is out of
    scope. eps_override [n_steps, *x.shape] injects an explicit noise
    sequence instead (the oracle-parity hook)."""
    n = sigmas.shape[0] - 1
    sigmas = karras_sigmas(n, float(sigmas[-2]), float(sigmas[0]))
    rng = jax.random.PRNGKey(0) if rng is None else rng
    x = init_noise_scaling(noise, sigmas[0])
    tree = BrownianTreeNoiseSampler(rng, float(sigmas[-2]), float(sigmas[0]),
                                    x.shape, x.dtype)

    def body(carry, i):
        x, old_denoised, w_cur = carry
        sigma, nxt = sigmas[i], sigmas[i + 1]
        denoised = denoise_fn(x, sigma)
        t, t_next = t_of(sigma), t_of(nxt)
        h = t_next - t
        eta_h = eta * h
        mult1 = sigma_of(t_next) / sigma_of(t) * jnp.exp(-eta_h)
        mult2 = jnp.expm1(-h - eta_h)
        x_std = mult1 * x - mult2 * denoised
        prev_sigma = sigmas[jnp.maximum(i - 1, 0)]
        r = (t - t_of(prev_sigma)) / h
        denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
        x_adv = mult1 * x - mult2 * denoised_d
        use_adv = (i > 0) & (nxt > 1e-14)
        x_new = jnp.where(use_adv, x_adv, x_std)
        w_next = tree.w(nxt)
        if eta > 0:
            if eps_override is not None:
                eps = eps_override[i]
            else:
                dsig = jnp.maximum(jnp.abs(nxt - sigma), 1e-20)
                eps = (w_next - w_cur) / jnp.sqrt(dsig).astype(x.dtype)
            inj = eps * nxt * jnp.sqrt(-jnp.expm1(-2 * eta_h)) * s_noise
            x_new = jnp.where(use_adv, x_new + inj, x_new)
        return (x_new, denoised, w_next), 0.0

    (x_final, _, _), _ = jax.lax.scan(
        body, (x, jnp.zeros_like(x), tree.w(sigmas[0])),
        jnp.arange(sigmas.shape[0] - 1))
    return x_final


# --------------------------------------------------------------- tiled loop

def gaussian_tile_weights(tile_h: int, tile_w: int) -> jnp.ndarray:
    """Gaussian contribution mask for sliding latent tiles
    (sampling.py:830-847)."""
    var = 0.01
    midx = (tile_w - 1) / 2
    xs = np.exp(-(np.arange(tile_w) - midx) ** 2 / (tile_w * tile_w) / (2 * var)) \
        / math.sqrt(2 * math.pi * var)
    midy = tile_h / 2
    ys = np.exp(-(np.arange(tile_h) - midy) ** 2 / (tile_h * tile_h) / (2 * var)) \
        / math.sqrt(2 * math.pi * var)
    return jnp.asarray(np.outer(ys, xs), jnp.float32)


def sliding_windows(h: int, w: int, tile: int, stride: int):
    """Tile coordinate list (sampling.py:850-863)."""
    hs = list(range(0, h - tile + 1, stride))
    if (h - tile) % stride != 0 and h > tile:
        hs.append(h - tile)
    ws = list(range(0, w - tile + 1, stride))
    if (w - tile) % stride != 0 and w > tile:
        ws.append(w - tile)
    if not hs:
        hs = [0]
    if not ws:
        ws = [0]
    return [(i, i + tile, j, j + tile) for i in hs for j in ws]


def tile_slices(canvas, wins):
    """Stack every window of `canvas` on the batch axis (one batched
    denoise call per step instead of the reference's sequential tile
    loop). Shared by both tiled samplers."""
    return jnp.concatenate([canvas[:, hi:he, wi:we, :]
                            for hi, he, wi, we in wins], axis=0)


def tile_stitch(tiles, wins, weights, out_shape, out_dtype):
    """Scatter-add gaussian-weighted tiles back onto a canvas of
    `out_shape`/`out_dtype` (batch b = out_shape[0] tiles per window)."""
    b = out_shape[0]
    acc = jnp.zeros(out_shape, out_dtype)
    for t_idx, (hi, he, wi, we) in enumerate(wins):
        acc = acc.at[:, hi:he, wi:we, :].add(
            tiles[t_idx * b:(t_idx + 1) * b] * weights)
    return acc


def tile_weight_canvas(wins, weights, out_shape, out_dtype):
    """The step-invariant weight-normalization canvas (built once per
    sample, not once per scan iteration)."""
    acc = jnp.zeros(out_shape, out_dtype)
    for hi, he, wi, we in wins:
        acc = acc.at[:, hi:he, wi:we, :].add(weights)
    return acc


def tiled_restore_edm_sample(denoise_tile_fn, noise, sigmas, x_center,
                             lq_latent, rng, tile: int = 128,
                             stride: int = 64, restore_cfg: float = -1.0,
                             restore_cfg_s_tmin: float = 0.05,
                             s_noise: float = 1.003, s_churn: float = 0.0,
                             sigma_max: float = 14.6146):
    """TiledRestoreEDMSampler (sampling.py:697-757): every step denoises
    gaussian-weighted sliding tiles; each tile's control slice is the
    matching LQ-latent crop. denoise_tile_fn(x_tile, sigma, lq_tile) ->
    denoised tile (CFG inside).

    TPU design: the tile grid is static, tiles are stacked on the batch axis
    and denoised as ONE batched call per step (the reference loops tiles
    sequentially), then scatter-added with the gaussian weights.
    """
    b, h, w, c = noise.shape
    wins = sliding_windows(h, w, tile, stride)
    weights = gaussian_tile_weights(tile, tile)[None, :, :, None]
    x = init_noise_scaling(noise, sigmas[0])
    n = sigmas.shape[0]
    gamma_val = min(s_churn / (n - 1), 2 ** 0.5 - 1) if s_churn > 0 else 0.0

    lq_tiles = tile_slices(lq_latent, wins)
    xc_tiles = tile_slices(x_center, wins)
    cnt = tile_weight_canvas(wins, weights, x.shape, x.dtype)

    def body(x, i):
        sigma, nxt = sigmas[i], sigmas[i + 1]
        gamma = gamma_val
        sigma_hat = sigma * (1.0 + gamma)
        if gamma_val > 0:
            eps = jax.random.normal(jax.random.fold_in(rng, i), x.shape,
                                    x.dtype) * s_noise
            x = x + eps * jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
        tiles = tile_slices(x, wins)
        den = denoise_tile_fn(tiles, sigma_hat, lq_tiles)
        if restore_cfg > 0:
            wgt = (sigma / sigma_max) ** restore_cfg
            corrected = den - (den - xc_tiles) * wgt
            den = jnp.where(nxt > restore_cfg_s_tmin, corrected, den)
        d = (tiles - den) / sigma_hat
        stepped = tiles + d * (nxt - sigma_hat)
        return tile_stitch(stepped, wins, weights, x.shape, x.dtype) / cnt, 0.0

    return _scan(body, x, n - 1)


def tiled_restore_dpmpp2m_sample(denoise_tile_fn, noise, sigmas, lq_latent,
                                 rng=None, tile: int = 128, stride: int = 64,
                                 eta: float = 1.0, s_noise: float = 1.0):
    """TiledRestoreDPMPP2MSampler (sampling.py:760-827): the stochastic
    DPM++(2M) update applied per gaussian-weighted sliding tile; each
    tile's control slice is the matching LQ-latent crop, and BOTH the
    stepped x and the step's `denoised` are stitched back to canvases
    (the reference carries old_denoised as a stitched canvas and re-slices
    it next step — reproduced exactly).

    TPU design: static tile grid stacked on the batch axis, ONE batched
    denoise call per step (the reference loops tiles sequentially with a
    Python for); per-step Brownian-tree noise is drawn once on the full
    canvas and sliced per tile, exactly like the reference's
    `eps_noise[:, :, hi:hi_end, wi:wi_end]`. Local-prompt tiling
    (cond-as-list) folds into denoise_tile_fn: the tile axis IS the batch
    axis, so per-tile conditioning is a batched cond stack in the closure.
    """
    b, h, w, c = noise.shape
    n = sigmas.shape[0] - 1
    sigmas = karras_sigmas(n, float(sigmas[-2]), float(sigmas[0]))
    rng = jax.random.PRNGKey(0) if rng is None else rng
    wins = sliding_windows(h, w, tile, stride)
    weights = gaussian_tile_weights(tile, tile)[None, :, :, None]
    x = init_noise_scaling(noise, sigmas[0])
    tree = BrownianTreeNoiseSampler(rng, float(sigmas[-2]), float(sigmas[0]),
                                    x.shape, x.dtype)

    def slices(canvas):
        return tile_slices(canvas, wins)

    def stitch(tiles):
        return tile_stitch(tiles, wins, weights, (b, h, w, c), tiles.dtype)

    lq_tiles = slices(lq_latent)
    cnt = tile_weight_canvas(wins, weights, (b, h, w, c), jnp.float32)

    def body(carry, i):
        x, old_den, w_cur = carry
        sigma, nxt = sigmas[i], sigmas[i + 1]
        tiles = slices(x)
        den = denoise_tile_fn(tiles, sigma, lq_tiles)
        t, t_next = t_of(sigma), t_of(nxt)
        h_step = t_next - t
        eta_h = eta * h_step
        mult1 = sigma_of(t_next) / sigma_of(t) * jnp.exp(-eta_h)
        mult2 = jnp.expm1(-h_step - eta_h)
        x_std = mult1 * tiles - mult2 * den
        prev_sigma = sigmas[jnp.maximum(i - 1, 0)]
        r = (t - t_of(prev_sigma)) / h_step
        den_d = (1 + 1 / (2 * r)) * den - (1 / (2 * r)) * slices(old_den)
        x_adv = mult1 * tiles - mult2 * den_d
        use_adv = (i > 0) & (nxt > 1e-14)
        stepped = jnp.where(use_adv, x_adv, x_std)
        w_next = tree.w(nxt)
        if eta > 0:
            dsig = jnp.maximum(jnp.abs(nxt - sigma), 1e-20)
            eps = (w_next - w_cur) / jnp.sqrt(dsig).astype(x.dtype)
            inj = slices(eps) * nxt * jnp.sqrt(-jnp.expm1(-2 * eta_h)) * s_noise
            stepped = jnp.where(use_adv, stepped + inj, stepped)
        return (stitch(stepped) / cnt, stitch(den) / cnt, w_next), 0.0

    (x_final, _, _), _ = jax.lax.scan(
        body, (x, jnp.zeros_like(x), tree.w(sigmas[0])), jnp.arange(n))
    return x_final
