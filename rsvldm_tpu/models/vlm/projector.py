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
