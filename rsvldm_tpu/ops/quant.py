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


# ---------------------------------------------------------------------------
# Int4 weight-only (group-wise) — the load_4bit / bitsandbytes-NF4 stand-in
# (/root/reference/llava/model/builder.py:35-37). Two 4-bit values pack into
# one int8 byte along the contraction dim, so the decode weight stream out
# of HBM halves again vs int8 (~4.3 GB for 8B). Per-(group, out) scales
# (group ~128 along `in`) keep RTN-int4 accuracy usable — the contraction is
# blocked per group (Gb becomes a dot_general batch dim) so scales apply to
# the int32 group accumulator, exactly like the int8 path; nothing ever
# widens the weight stream.
# ---------------------------------------------------------------------------


class Int4Linear(NamedTuple):
    """packed: int8 [in//2, out] — row 2i in the LOW nibble, 2i+1 in the
    HIGH nibble (both sign-extended int4 in [-7, 7]).
    scale: float32 [in//group, out] such that w[i, o] ~= q[i, o] * scale[i//group, o].
    group = (2 * packed.shape[0]) // scale.shape[0]."""
    packed: jnp.ndarray
    scale: jnp.ndarray


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """q: int8 [in, out] with values in [-8, 7] -> int8 [in//2, out]."""
    lo = q[0::2].astype(jnp.int8)
    hi = q[1::2].astype(jnp.int8)
    return ((hi << 4) | (lo & 0xF)).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """int8 [in//2, out] -> int8 [in, out] (sign-extended nibbles)."""
    lo = (packed << 4) >> 4          # arithmetic shifts sign-extend
    hi = packed >> 4
    half, out = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(half * 2, out)


def quantize_weight_int4(w: jnp.ndarray, group: int = 128) -> Int4Linear:
    """Symmetric absmax RTN int4, per (group-of-`group`-input-rows, output
    channel). w: [in, out], in % (2, group) == 0."""
    wf = w.astype(jnp.float32)
    inf, out = wf.shape
    group = min(group, inf)
    assert inf % group == 0 and inf % 2 == 0, (inf, group)
    g = wf.reshape(inf // group, group, out)
    amax = jnp.max(jnp.abs(g), axis=1, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(g / scale), -7, 7).astype(jnp.int8)
    return Int4Linear(pack_int4(q.reshape(inf, out)),
                      scale.reshape(inf // group, out))


def quantize_acts_grouped(x: jnp.ndarray, group: int):
    """Per-(token, group-of-`group`-features) symmetric absmax int8.
    x: [..., in] -> (xq int8 [..., Gb, group], xs fp32 [..., Gb, 1])."""
    xf = x.astype(jnp.float32)
    gb = x.shape[-1] // group
    xf = xf.reshape(*x.shape[:-1], gb, group)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return xq, s


def int4_matmul(x: jnp.ndarray, w: Int4Linear,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """y = x @ dequant(w): unpack nibbles -> s8xs8->s32 per group block on
    the MXU (group axis as a dot_general batch dim) -> both scales on the
    int32 group accumulator -> sum over groups. x: [..., in]."""
    inf = 2 * w.packed.shape[0]
    gb = w.scale.shape[0]
    group = inf // gb
    q = unpack_int4(w.packed).reshape(gb, group, -1)       # [Gb, G, out]
    xq, xs = quantize_acts_grouped(x, group)               # [..., Gb, G]
    lead = tuple(range(xq.ndim - 2))
    # batch over Gb: [..., Gb, G] x [Gb, G, out] -> [Gb, ..., out]
    acc = jax.lax.dot_general(
        xq, q,
        (((xq.ndim - 1,), (1,)), ((xq.ndim - 2,), (0,))),
        preferred_element_type=jnp.int32)
    # acc: [Gb, ..., out]; move scales to match
    xs_t = jnp.moveaxis(xs, -2, 0)                          # [Gb, ..., 1]
    ws = w.scale.reshape(gb, *(1,) * len(lead), -1)         # [Gb, 1.., out]
    y = (acc.astype(jnp.float32) * xs_t * ws).sum(axis=0)
    return y.astype(out_dtype)
