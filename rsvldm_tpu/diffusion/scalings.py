"""EDM-style denoiser preconditioning scalings.

Each returns (c_skip, c_out, c_in, c_noise) for a sigma array, matching
/root/reference sgm/modules/diffusionmodules/denoiser_scaling.py.
The denoiser output is: D(x, sigma) = c_skip * x + c_out * F(c_in * x, c_noise).
"""

from __future__ import annotations

import jax.numpy as jnp


def eps_scaling(sigma: jnp.ndarray):
    """c_skip=1, c_out=-sigma, c_in=1/sqrt(sigma^2+1) (denoiser_scaling.py:16-22)."""
    c_skip = jnp.ones_like(sigma)
    c_out = -sigma
    c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
    c_noise = sigma
    return c_skip, c_out, c_in, c_noise


def v_scaling(sigma: jnp.ndarray):
    c_skip = 1.0 / (sigma**2 + 1.0)
    c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
    c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
    c_noise = sigma
    return c_skip, c_out, c_in, c_noise


def edm_scaling(sigma: jnp.ndarray, sigma_data: float = 0.5):
    c_skip = sigma_data**2 / (sigma**2 + sigma_data**2)
    c_out = sigma * sigma_data / jnp.sqrt(sigma**2 + sigma_data**2)
    c_in = 1.0 / jnp.sqrt(sigma**2 + sigma_data**2)
    c_noise = 0.25 * jnp.log(sigma)
    return c_skip, c_out, c_in, c_noise


SCALINGS = {"eps": eps_scaling, "v": v_scaling, "edm": edm_scaling}
