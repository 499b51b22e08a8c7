"""Multimodal projector: vision features -> LLM embedding space.

Parity target: /root/reference llava/model/multimodal_projector/builder.py
(:33-66) — llama3-llava-next-8b uses 'mlp2x_gelu': Linear(1024->4096),
GELU, Linear(4096->4096).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MLPProjector(nn.Module):
    out_dim: int = 4096
    depth: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc0")(x)
        for i in range(1, self.depth):
            x = nn.gelu(x, approximate=False)
            x = nn.Dense(self.out_dim, dtype=self.dtype, name=f"fc{i}")(x)
        return x


class PoolerProjector(nn.Module):
    """2x2 stride-2 conv pool over the patch grid, then GELU+Linear
    (llava/model/multimodal_projector/pooler_projector.py:8-28). Input
    [N, T, C] with T = hw*hw; output [N, T/4, out_dim]."""
    out_dim: int = 4096
    hw: int = 24                  # image_size // patch_size
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, t, c = x.shape
        assert t == self.hw * self.hw, (t, self.hw)
        g = x.reshape(n, self.hw, self.hw, c)
        g = nn.Conv(self.out_dim, kernel_size=(2, 2), strides=(2, 2),
                    padding="VALID", dtype=self.dtype, name="conv_pool")(g)
        g = g.reshape(n, -1, self.out_dim)
        g = nn.gelu(g, approximate=False)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(g)


def build_projector(projector_type: str, out_dim: int = 4096, **kw):
    """multimodal_projector/builder.py dispatch: linear / mlpNx_gelu /
    pooler / identity."""
    import re as _re
    if projector_type == "linear":
        return MLPProjector(out_dim=out_dim, depth=1)
    m = _re.match(r"^mlp(\d+)x_gelu$", projector_type)
    if m:
        return MLPProjector(out_dim=out_dim, depth=int(m.group(1)))
    if projector_type == "pooler":
        return PoolerProjector(out_dim=out_dim, **kw)
    if projector_type == "identity":
        return lambda x: x
    raise ValueError(f"Unknown projector type: {projector_type}")
