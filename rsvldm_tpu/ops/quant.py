"""Int8 weight-only quantization on the native s8 MXU path.

Reference parity target: the 4/8-bit loading options of the LLaVA builder
(/root/reference/llava/model/builder.py:33-37, bitsandbytes). TPU-native
design: weights are stored int8 with per-output-channel fp32 scales;
activations are quantized per-token (symmetric absmax) right before each
matmul; the contraction runs int8 x int8 -> int32 on the MXU
(lax.dot_general with preferred_element_type=int32), and the two scales are
applied to the small int32 accumulator — the weight stream out of HBM stays
int8, which is what makes batch-1 decode (memory-bound) ~2x faster than
bf16 and lets an 8B model fit a single 16 GB v5e chip (~8 GB weights).

This deliberately avoids the round-2 failure mode (ROUND2.md): dequantizing
the weights (in-kernel on the VPU, or at the XLA level) materializes a bf16
copy and loses the bandwidth win. Here nothing ever widens the weights.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedLinear(NamedTuple):
    """Per-output-channel symmetric int8 weight. kernel layout [in, out]
    (flax Dense convention); scale [out] fp32 such that
    w ~= q.astype(f32) * scale."""
    q: jnp.ndarray       # int8 [in, out]
    scale: jnp.ndarray   # float32 [out]


def quantize_weight(w: jnp.ndarray, axis: int = 0) -> QuantizedLinear:
    """Symmetric absmax int8 quantization, per channel of the non-`axis`
    dim. w: [in, out] (contract over `axis`=0)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantizedLinear(q, scale.reshape(-1))


def quantize_acts(x: jnp.ndarray):
    """Per-token (last-axis) symmetric absmax int8 quantization.
    Returns (x_q int8, x_scale fp32 with trailing dim 1)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return xq, s


def int8_matmul(x: jnp.ndarray, w: QuantizedLinear,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """y = x @ dequant(w), computed as s8xs8->s32 on the MXU with scales on
    the accumulator. x: [..., in]; returns [..., out] in out_dtype."""
    xq, xs = quantize_acts(x)
    nd = xq.ndim
    acc = jax.lax.dot_general(
        xq, w.q, (((nd - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * w.scale
    return y.astype(out_dtype)
