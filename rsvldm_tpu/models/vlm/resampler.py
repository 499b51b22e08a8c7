"""Vision-token resamplers.

Parity target: /root/reference llava/model/multimodal_resampler/ —
builder.py dispatch over identity (default for the shipped model) /
masked_drop / spatial_pool; (perceiver/qformer are heavier BERT-based
variants, dormant for the shipped checkpoint — noted for later rounds).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


def identity_resampler(features: jnp.ndarray, **_) -> jnp.ndarray:
    """IdentityMap — the configured path for llama3-llava-next-8b."""
    return features


def spatial_pool(features: jnp.ndarray, stride: int = 2,
                 mode: str = "average") -> jnp.ndarray:
    """[N, T, C] (T = s*s) -> pooled [N, (s/stride)^2, C]
    (spatial_pool resampler)."""
    n, t, c = features.shape
    s = int(math.sqrt(t))
    x = features.reshape(n, s, s, c)
    if mode == "average":
        x = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                  (1, stride, stride, 1),
                                  (1, stride, stride, 1), "VALID")
        x = x / (stride * stride)
    elif mode == "max":
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                  (1, stride, stride, 1),
                                  (1, stride, stride, 1), "VALID")
    else:
        raise ValueError(mode)
    return x.reshape(n, -1, c)


def masked_drop(features: jnp.ndarray, rng: jax.Array,
                ratio: float = 0.5, deterministic: bool = False) -> jnp.ndarray:
    """Randomly keep a (1-ratio) fraction of tokens (masked_drop resampler;
    identity at inference)."""
    if deterministic or ratio <= 0:
        return features
    n, t, c = features.shape
    keep = max(int(t * (1.0 - ratio)), 1)
    noise = jax.random.uniform(rng, (n, t))
    idx = jnp.argsort(noise, axis=1)[:, :keep]
    return jnp.take_along_axis(features, idx[:, :, None], axis=1)


RESAMPLERS = {"identity": identity_resampler, "spatial_pool": spatial_pool,
              "masked_drop": masked_drop}
