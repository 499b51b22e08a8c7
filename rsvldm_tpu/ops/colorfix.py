"""Wavelet / AdaIN color correction as jitted XLA kernels (NHWC).

Semantics match /root/reference utils/colorfix.py (wavelet_blur:73-92,
wavelet_decomposition:94-106, wavelet_reconstruction:108-119,
adaptive_instance_normalization:59-71). Layout is NHWC (TPU-native); the
dilated 3x3 blur lowers to a depthwise conv that XLA fuses into one pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# 3x3 binomial kernel used by the wavelet pyramid (colorfix.py:79-83).
# Kept as a HOST numpy constant: a module-level jnp.array would initialize
# the device backend at import time — before any CLI's --platform override
# runs — and hang every entry point whenever the TPU relay is unreachable.
_KERNEL = np.array(
    [[0.0625, 0.125, 0.0625],
     [0.125, 0.25, 0.125],
     [0.0625, 0.125, 0.0625]], dtype=np.float32)


def wavelet_blur(image: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Dilated depthwise 3x3 blur with replicate padding. image: [N,H,W,C]."""
    c = image.shape[-1]
    kernel = jnp.tile(_KERNEL[:, :, None, None], (1, 1, 1, c)).astype(image.dtype)
    padded = jnp.pad(image, ((0, 0), (radius, radius), (radius, radius), (0, 0)),
                     mode="edge")
    return jax.lax.conv_general_dilated(
        padded, kernel,
        window_strides=(1, 1), padding="VALID",
        rhs_dilation=(radius, radius),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def wavelet_decomposition(image: jnp.ndarray, levels: int = 5):
    """Returns (high_freq, low_freq); radii 1,2,4,...,2^(levels-1)."""
    high_freq = jnp.zeros_like(image)
    low_freq = image
    for i in range(levels):
        radius = 2 ** i
        blurred = wavelet_blur(low_freq, radius)
        high_freq = high_freq + (low_freq - blurred)
        low_freq = blurred
    return high_freq, low_freq


@jax.jit
def wavelet_reconstruction(content: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """content high-frequency + style low-frequency (colorfix.py:108-119)."""
    content_high, _ = wavelet_decomposition(content)
    _, style_low = wavelet_decomposition(style)
    return content_high + style_low


def _mean_std(feat: jnp.ndarray, eps: float = 1e-5):
    """Per-(batch, channel) mean/std over spatial dims; unbiased variance to
    match torch.Tensor.var default (colorfix.py:44-57)."""
    n, h, w, c = feat.shape
    flat = feat.reshape(n, h * w, c)
    mean = jnp.mean(flat, axis=1, keepdims=True)
    var = jnp.sum((flat - mean) ** 2, axis=1, keepdims=True) / max(h * w - 1, 1)
    std = jnp.sqrt(var + eps)
    return mean.reshape(n, 1, 1, c), std.reshape(n, 1, 1, c)


@jax.jit
def adaptive_instance_normalization(content: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """AdaIN color fix (colorfix.py:59-71). NHWC in [-1,1] or [0,1]."""
    style_mean, style_std = _mean_std(style)
    content_mean, content_std = _mean_std(content)
    normalized = (content - content_mean) / content_std
    return normalized * style_std + style_mean
