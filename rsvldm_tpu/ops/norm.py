"""GroupNorm with fp32 stats + optional tile-collective reduction.

One implementation serves the VAE (eps 1e-6, SD 'Normalize'), the SDXL UNet
(eps 1e-5, openaimodel 'normalization') and ZeroSFT. Params match flax
nn.GroupNorm (per-channel scale/bias) so torch GroupNorm weights map 1:1.

Tile-collective mode (used by the tiled VAE, see models/vae/tiled.py): the
mean/var reduction additionally spans the leading tile axis and — when tiles
are sharded over a named mesh axis — crosses devices via pmean. This is the
TPU-native equivalent of the reference tiled-VAE's accumulated global
GroupNorm statistics (utils/tilevae.py:599-674).
"""

from __future__ import annotations

import contextlib
import math

import flax.linen as nn
import jax
import jax.numpy as jnp

_TILE_COLLECTIVE_GN: dict = {"on": False, "axis_name": None}


@contextlib.contextmanager
def tile_collective_gn(axis_name: str | None = None):
    """Trace-scope switch: GroupNorms reduce over the leading tile axis."""
    prev = dict(_TILE_COLLECTIVE_GN)
    _TILE_COLLECTIVE_GN["on"] = True
    _TILE_COLLECTIVE_GN["axis_name"] = axis_name
    try:
        yield
    finally:
        _TILE_COLLECTIVE_GN.update(prev)


class GroupNorm32(nn.Module):
    """32-group GroupNorm, stats in fp32, optional tile-collective reduction."""
    epsilon: float = 1e-6
    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        g = math.gcd(self.num_groups, c)  # = num_groups for all real configs
        xf = x.astype(jnp.float32)
        shp = xf.shape
        xg = xf.reshape(shp[:-1] + (g, c // g))
        collective = _TILE_COLLECTIVE_GN["on"]
        axes = tuple(range(0 if collective else 1, xg.ndim - 2)) + (xg.ndim - 1,)
        mean = jnp.mean(xg, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=axes, keepdims=True)
        axis_name = _TILE_COLLECTIVE_GN["axis_name"]
        if collective and axis_name is not None:
            mean_g = jax.lax.pmean(mean, axis_name)
            ex2 = jax.lax.pmean(var + jnp.square(mean), axis_name)
            var = ex2 - jnp.square(mean_g)
            mean = mean_g
        y = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y.reshape(shp)
        return (y * scale + bias).astype(x.dtype)
