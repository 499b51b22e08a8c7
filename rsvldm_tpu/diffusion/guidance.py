"""Classifier-free guidance combiners.

Matches /root/reference sgm/modules/diffusionmodules/guiders.py. On TPU the
uncond/cond pair is run as a single batch of 2N (one big MXU-friendly batch);
these functions combine the halves.
"""

from __future__ import annotations

import jax.numpy as jnp

SIGMA_MAX = 14.6146  # LegacyDDPM sigma_max used by LinearCFG (guiders.py:48)


def linear_cfg_scale(sigma: jnp.ndarray, scale: float, scale_min: float | None = None) -> jnp.ndarray:
    """scale(sigma) = (scale - scale_min) * sigma / 14.6146 + scale_min (guiders.py:44-48)."""
    if scale_min is None:
        scale_min = scale
    return (scale - scale_min) * sigma / SIGMA_MAX + scale_min


def apply_cfg(denoised_pair: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Combine a [2N, ...] (uncond first, cond second) prediction batch.

    x = x_u + scale * (x_c - x_u)   (sampling_utils NoDynamicThresholding)
    `scale` may be scalar or per-example [N].
    """
    n = denoised_pair.shape[0] // 2
    x_u, x_c = denoised_pair[:n], denoised_pair[n:]
    scale = jnp.asarray(scale)
    if scale.ndim > 0:
        scale = scale.reshape((-1,) + (1,) * (x_u.ndim - 1))
    return x_u + scale * (x_c - x_u)
